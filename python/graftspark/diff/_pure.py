"""Pure-Python diff: the same semantics as graft.diff.Differ, expressed with
the PySpark Column API only — no py4j, so it runs on Spark Connect sessions
where the JVM bridge is unavailable.

Mirrors src/main/scala/graft/diff/Diff.scala exactly: one full-outer null-safe
equi-join on the id columns plus one projection; all comparisons are Column
algebra, so the plan Catalyst sees is the same shape the Scala path produces.
The dispatch between this and the JVM path lives in graftspark.diff.Differ.
"""

import re
from functools import reduce
from typing import Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IDENT = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")


def _bt(name: str) -> str:
    if _IDENT.fullmatch(name):
        return name
    return "`" + name.replace("`", "``") + "`"


def _distinct_prefix_for(existing: List[str]) -> str:
    longest = 0
    for name in existing:
        run = len(name) - len(name.lstrip("_"))
        longest = max(longest, run)
    return "_" * (longest + 1)


def _canon(name: str, case_sensitive: bool) -> str:
    return name if case_sensitive else name.lower()


def _contains(names: List[str], case_sensitive: bool) -> Callable[[str], bool]:
    canon_set = {_canon(n, case_sensitive) for n in names}
    return lambda name: _canon(name, case_sensitive) in canon_set


def _type_str(data_type) -> str:
    # simpleString drops nullability at every nesting level, giving the same
    # nullability-insensitive type equality as the Scala path's sameType.
    return data_type.simpleString()


def _case_sensitive(df: DataFrame) -> bool:
    return (df.sparkSession.conf.get("spark.sql.caseSensitive", "false") or "false").lower() == "true"


def _comparator_for(options, field, case_sensitive: bool):
    """Resolution order column name -> data type -> default, with the
    case-insensitive ambiguity check of DiffOptions.comparatorFor."""
    by_name = None
    if case_sensitive:
        by_name = options.column_name_comparators.get(field.name)
    else:
        matches = {n: c for n, c in options.column_name_comparators.items()
                   if n.lower() == field.name.lower()}
        if len(matches) > 1:
            raise ValueError(
                f"Column name comparators {', '.join(sorted(matches))} all match column "
                f"'{field.name}' case-insensitively; rename the comparators or enable "
                "spark.sql.caseSensitive.")
        if matches:
            by_name = next(iter(matches.values()))
    if by_name is not None:
        return by_name
    type_key = _type_str(field.dataType)
    for ddl, comparator in options.data_type_comparators.items():
        if _normalize_ddl(ddl) == type_key:
            return comparator
    return options.default_comparator


def _normalize_ddl(ddl) -> str:
    if not isinstance(ddl, str):  # a pyspark DataType
        return _type_str(ddl)
    return re.sub(r"\s+", "", ddl).lower()


def _check_schema(options, left: DataFrame, right: DataFrame,
                  id_columns: List[str], ignore_columns: List[str],
                  case_sensitive: bool) -> None:
    def require(condition: bool, message: str) -> None:
        if not condition:
            raise ValueError(message)

    def distinct_count(names: List[str]) -> int:
        return len({_canon(n, case_sensitive) for n in names})

    require(len(left.columns) == distinct_count(left.columns) and
            len(right.columns) == distinct_count(right.columns),
            "The datasets have duplicate columns.\n"
            f"Left column names: {', '.join(left.columns)}\n"
            f"Right column names: {', '.join(right.columns)}")

    ignored = _contains(ignore_columns, case_sensitive)
    left_non_ignored = [c for c in left.columns if not ignored(c)]

    left_fields = {(_canon(f.name, case_sensitive)): _type_str(f.dataType)
                   for f in left.schema.fields if not ignored(f.name)}
    right_fields = {(_canon(f.name, case_sensitive)): _type_str(f.dataType)
                    for f in right.schema.fields if not ignored(f.name)}
    left_extra = [n for n in left_fields if n not in right_fields]
    right_extra = [n for n in right_fields if n not in left_fields]
    require(not left_extra and not right_extra and
            all(left_fields[n] == right_fields[n] for n in left_fields),
            "The datasets do not have the same schema.\n"
            f"Left extra columns: {', '.join(left_extra)}\n"
            f"Right extra columns: {', '.join(right_extra)}")

    pk_columns = id_columns if id_columns else left_non_ignored
    require(len(pk_columns) > 0, "The schema must not be empty")
    in_left = _contains(left_non_ignored, case_sensitive)
    missing = [c for c in pk_columns if not in_left(c)]
    require(not missing,
            f"Some id columns do not exist: {', '.join(missing)} missing among "
            f"{', '.join(left_non_ignored)}")

    # ignore columns must exist on at least one side (same as the Scala path)
    all_columns = left.columns + right.columns
    in_either = _contains(all_columns, case_sensitive)
    missing_ignores = [c for c in ignore_columns if not in_either(c)]
    require(not missing_ignores,
            f"Some ignore columns do not exist: {', '.join(missing_ignores)} missing among "
            f"{', '.join(sorted({_canon(c, case_sensitive) for c in all_columns}))}")

    out = _output_column_names(options, left, right, pk_columns, ignore_columns, case_sensitive)
    seen: Dict[str, int] = {}
    for name in out:
        key = _canon(name, case_sensitive)
        seen[key] = seen.get(key, 0) + 1
    dups = [n for n, k in seen.items() if k > 1]
    require(not dups,
            f"Diff output columns would collide: {', '.join(dups)}. "
            "Change the diff/change column name or the column prefixes.")


def _value_columns_of(left: DataFrame, pk_columns: List[str],
                      ignore_columns: List[str], case_sensitive: bool) -> List[str]:
    ignored = _contains(ignore_columns, case_sensitive)
    is_pk = _contains(pk_columns, case_sensitive)
    return [c for c in left.columns if not ignored(c) and not is_pk(c)]


def _right_name_of(right: DataFrame, case_sensitive: bool) -> Callable[[str], str]:
    """The right dataset's own spelling of a (left-cased) column name, so output
    columns preserve each side's case in case-insensitive sessions (same as the
    Scala path's rightNameOf)."""
    by_canon = {}
    for n in right.columns:
        by_canon.setdefault(_canon(n, case_sensitive), n)
    return lambda c: by_canon.get(_canon(c, case_sensitive), c)


def _output_column_names(options, left: DataFrame, right: DataFrame,
                         pk_columns: List[str], ignore_columns: List[str],
                         case_sensitive: bool) -> List[str]:
    value_columns = _value_columns_of(left, pk_columns, ignore_columns, case_sensitive)
    ignored = _contains(ignore_columns, case_sensitive)
    left_ignored = [c for c in left.columns if ignored(c)]
    right_ignored = [c for c in right.columns if ignored(c)]
    right_name = _right_name_of(right, case_sensitive)
    lp, rp = options.left_column_prefix, options.right_column_prefix
    mode = options.diff_mode.value
    if mode in ("Default", "ColumnByColumn"):
        values = [n for c in value_columns for n in (f"{lp}_{c}", f"{rp}_{right_name(c)}")] + \
                 [f"{lp}_{c}" for c in left_ignored] + [f"{rp}_{c}" for c in right_ignored]
    elif mode == "SideBySide":
        values = [f"{lp}_{c}" for c in value_columns] + [f"{lp}_{c}" for c in left_ignored] + \
                 [f"{rp}_{right_name(c)}" for c in value_columns] + [f"{rp}_{c}" for c in right_ignored]
    elif mode == "LeftSide":
        values = value_columns + left_ignored
    else:  # RightSide
        values = [right_name(c) for c in value_columns] + right_ignored
    change = [options.change_column] if options.change_column is not None else []
    return [options.diff_column] + change + list(pk_columns) + values


def pure_diff(options, left: DataFrame, right: DataFrame,
              id_columns: List[str], ignore_columns: List[str]) -> DataFrame:
    cs = _case_sensitive(left)
    _check_schema(options, left, right, id_columns, ignore_columns, cs)

    ignored = _contains(ignore_columns, cs)
    pk_columns = list(id_columns) if id_columns else [c for c in left.columns if not ignored(c)]
    value_columns = _value_columns_of(left, pk_columns, ignore_columns, cs)
    left_ignored = [c for c in left.columns if ignored(c)]
    right_ignored = [c for c in right.columns if ignored(c)]

    # Rename both sides to unique internal names before the join (same
    # ambiguous-self-join dodge as the Scala path).
    prefix = _distinct_prefix_for(left.columns + right.columns)
    exists = prefix + "exists"

    def ln(c: str) -> Column:
        return F.col(_bt(f"{prefix}l_{c}"))

    def rn(c: str) -> Column:
        return F.col(_bt(f"{prefix}r_{c}"))

    l = left.select(*[F.col(_bt(c)).alias(f"{prefix}l_{c}") for c in left.columns],
                    F.lit(1).alias(f"{prefix}l_{exists}"))
    r = right.select(*[F.col(_bt(c)).alias(f"{prefix}r_{c}") for c in right.columns],
                     F.lit(1).alias(f"{prefix}r_{exists}"))

    fields = {(_canon(f.name, cs)): f for f in left.schema.fields}

    def equiv_of(c: str) -> Column:
        field = fields[_canon(c, cs)]
        comparator = _comparator_for(options, field, cs)
        if comparator is None:  # DiffOptions.default_comparator unset -> null-safe equality
            return ln(c).eqNullSafe(rn(c))
        return comparator._equiv(ln(c), rn(c), field)

    join_condition = reduce(lambda a, b: a & b,
                            [ln(c).eqNullSafe(rn(c)) for c in pk_columns])

    if value_columns:
        change_condition = reduce(lambda a, b: a | b, [~equiv_of(c) for c in value_columns])
    else:
        change_condition = F.lit(False)

    diff_action = (
        F.when(ln(exists).isNull(), F.lit(options.insert_diff_value))
         .when(rn(exists).isNull(), F.lit(options.delete_diff_value))
         .when(change_condition, F.lit(options.change_diff_value))
         .otherwise(F.lit(options.nochange_diff_value))
         .alias(options.diff_column))

    change_columns: List[Column] = []
    if options.change_column is not None:
        if value_columns:
            body = F.concat(*[F.when(equiv_of(c), F.array()).otherwise(F.array(F.lit(c)))
                              for c in value_columns])
        else:
            from pyspark.sql.types import ArrayType, StringType
            body = F.array().cast(ArrayType(StringType(), False))
        change_columns = [
            F.when(ln(exists).isNull() | rn(exists).isNull(), F.lit(None))
             .otherwise(body)
             .alias(options.change_column)]

    id_columns_out = [F.coalesce(ln(c), rn(c)).alias(c) for c in pk_columns]

    # sparse mode nulls values that are null-safe-EQUAL on both sides — raw
    # eqNullSafe, not the configured comparator (same as the Scala path).
    def side_value(side_col: Column, c: str) -> Column:
        if options.sparse_mode:
            return F.when(~ln(c).eqNullSafe(rn(c)), side_col)
        return side_col

    on_both_ignored = _contains([c for c in left_ignored
                                 if _contains(right_ignored, cs)(c)], cs)

    def ignored_value(side_col: Column, c: str) -> Column:
        if options.sparse_mode and on_both_ignored(c):
            return F.when(~ln(c).eqNullSafe(rn(c)), side_col)
        return side_col

    lp, rp = options.left_column_prefix, options.right_column_prefix
    right_name = _right_name_of(right, cs)
    mode = options.diff_mode.value
    if mode in ("Default", "ColumnByColumn"):
        values_out = [col for c in value_columns
                      for col in (side_value(ln(c), c).alias(f"{lp}_{c}"),
                                  side_value(rn(c), c).alias(f"{rp}_{right_name(c)}"))] + \
                     [ignored_value(ln(c), c).alias(f"{lp}_{c}") for c in left_ignored] + \
                     [ignored_value(rn(c), c).alias(f"{rp}_{c}") for c in right_ignored]
    elif mode == "SideBySide":
        values_out = [side_value(ln(c), c).alias(f"{lp}_{c}") for c in value_columns] + \
                     [ignored_value(ln(c), c).alias(f"{lp}_{c}") for c in left_ignored] + \
                     [side_value(rn(c), c).alias(f"{rp}_{right_name(c)}") for c in value_columns] + \
                     [ignored_value(rn(c), c).alias(f"{rp}_{c}") for c in right_ignored]
    elif mode == "LeftSide":
        values_out = [side_value(ln(c), c).alias(c) for c in value_columns] + \
                     [ignored_value(ln(c), c).alias(c) for c in left_ignored]
    else:  # RightSide
        values_out = [side_value(rn(c), c).alias(right_name(c)) for c in value_columns] + \
                     [ignored_value(rn(c), c).alias(c) for c in right_ignored]

    return (l.join(r, join_condition, "full_outer")
             .select(diff_action, *change_columns, *id_columns_out, *values_out))


def pure_diff_with(options, left: DataFrame, right: DataFrame,
                   id_columns: List[str], ignore_columns: List[str]) -> DataFrame:
    """Diff as (_1 action, _2 left struct, _3 right struct); _2 is null for
    inserts, _3 for deletes. Mirrors Differ.diffWith (Diff.scala:236-264)."""
    plain = options._copy(diff_mode=type(options.diff_mode).ColumnByColumn,
                          sparse_mode=False, change_column=None)

    df = pure_diff(plain, left, right, id_columns, ignore_columns)
    cs = _case_sensitive(left)
    ignored = _contains(ignore_columns, cs)
    pk_columns = list(id_columns) if id_columns else [c for c in left.columns if not ignored(c)]
    is_pk = _contains(pk_columns, cs)

    def side_struct(columns: List[str], prefix: str) -> Column:
        return F.struct(*[
            (F.col(_bt(c)) if is_pk(c) else F.col(_bt(f"{prefix}_{c}"))).alias(c)
            for c in columns])

    diff_col = F.col(_bt(plain.diff_column))
    left_struct = (F.when(diff_col == plain.insert_diff_value, F.lit(None))
                    .otherwise(side_struct(left.columns, plain.left_column_prefix))
                    .alias("_2"))
    right_struct = (F.when(diff_col == plain.delete_diff_value, F.lit(None))
                     .otherwise(side_struct(right.columns, plain.right_column_prefix))
                     .alias("_3"))
    return df.select(diff_col.alias("_1"), left_struct, right_struct)
