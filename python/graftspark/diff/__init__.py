"""Dataset diff for PySpark.

Two engines, one semantics matrix:

- ``jvm`` — bridges to the graft Scala implementation via py4j (classic
  sessions); comparators run codegen'd (e.g. the map comparator's MapEquiv).
- ``pure`` — the same algorithm expressed with the PySpark Column API only
  (graftspark.diff._pure), used automatically on Spark Connect sessions where
  no JVM bridge exists.

``engine='auto'`` (default) picks jvm when the DataFrame has a ``_jdf``
(classic), pure otherwise. The two are parity-tested against each other in
python/test/test_graftspark.py.
"""

import re as _re
from datetime import timedelta
from enum import Enum
from typing import List, Optional, Union

from pyspark.sql import functions as F
from pyspark.sql import DataFrame

from graftspark import _bridge
from graftspark.diff import _pure

__all__ = ["DiffMode", "DiffComparators", "DiffOptions", "Differ", "diff",
           "diff_with", "patch_right", "patch_left"]


_ISO_DURATION = _re.compile(
    r"([+-]?)P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?",
    _re.IGNORECASE)


def _parse_iso_duration(value: str) -> timedelta:
    m = _ISO_DURATION.fullmatch(value.strip())
    if not m or not any(m.group(i) for i in (2, 3, 4, 5)):
        raise ValueError(f"Cannot parse ISO-8601 duration: {value!r}")
    sign = -1 if m.group(1) == "-" else 1
    days = int(m.group(2) or 0)
    hours = int(m.group(3) or 0)
    minutes = int(m.group(4) or 0)
    seconds = float(m.group(5) or 0)
    return sign * timedelta(days=days, hours=hours, minutes=minutes, seconds=seconds)


def _to_iso_duration(value: timedelta) -> str:
    total = value.total_seconds()
    sign = "-" if total < 0 else ""
    total = abs(total)
    micros = round(total * 1_000_000)
    secs, rem = divmod(micros, 1_000_000)
    frac = f".{rem:06d}".rstrip("0") if rem else ""
    return f"{sign}PT{secs}{frac}S"


class DiffMode(Enum):
    Default = "Default"
    ColumnByColumn = "ColumnByColumn"
    SideBySide = "SideBySide"
    LeftSide = "LeftSide"
    RightSide = "RightSide"


class _Comparator:
    """Deferred comparator: materialized to a JVM object (jvm engine) or a
    Column-algebra equivalence (pure engine) per use."""

    def __init__(self, factory, *args):
        self._factory = factory
        self._args = args

    def _to_java(self, bridge):
        return getattr(bridge, self._factory)(*self._args)

    # Pure-engine equivalence, mirroring graft.diff.comparator semantics.
    # `field` is the left column's StructField (for type-aware comparators).
    def _equiv(self, left, right, field):
        if self._factory in ("comparatorDefault", "comparatorNullSafeEqual"):
            return left.eqNullSafe(right)
        if self._factory == "comparatorEpsilon":
            epsilon, relative, inclusive = self._args
            threshold = (F.lit(epsilon) * F.greatest(F.abs(left), F.abs(right))
                         if relative else F.lit(epsilon))
            delta = F.abs(left - right)
            in_range = delta <= threshold if inclusive else delta < threshold
            return (left.isNull() & right.isNull()) | \
                   (left.isNotNull() & right.isNotNull() & in_range)
        if self._factory == "comparatorString":
            (whitespace_agnostic,) = self._args
            if not whitespace_agnostic:
                return left.eqNullSafe(right)

            def norm(c):
                # collapse runs first, then trim — trim strips ASCII spaces only
                return F.trim(F.regexp_replace(c, r"\s+", " "))

            return norm(left).eqNullSafe(norm(right))
        if self._factory == "comparatorDuration":
            iso, inclusive = self._args
            bound = F.lit(_parse_iso_duration(iso))
            l, r = left.cast("timestamp"), right.cast("timestamp")
            delta = F.abs(l - r)
            in_range = delta <= bound if inclusive else delta < bound
            return (left.isNull() & right.isNull()) | \
                   (left.isNotNull() & right.isNotNull() & in_range)
        if self._factory == "comparatorMap":
            (key_order_sensitive,) = self._args
            if key_order_sensitive:
                keys_ok = F.map_keys(left).eqNullSafe(F.map_keys(right))
            else:
                keys_ok = (F.size(left) == F.size(right)) & \
                    F.forall(F.map_keys(left), lambda k: F.map_contains_key(right, k))
            # try_element_at: null (not an ANSI error) on a key missing from
            # `right`; keys_ok has already required equal key sets by then.
            values_ok = F.forall(
                F.map_entries(left),
                lambda e: F.try_element_at(right, e.getField("key"))
                           .eqNullSafe(e.getField("value")))
            return (left.isNull() & right.isNull()) | \
                   (left.isNotNull() & right.isNotNull() & keys_ok & values_ok)
        raise ValueError(f"Comparator {self._factory} has no pure-Python equivalent")


class DiffComparators:
    @staticmethod
    def default() -> _Comparator:
        return _Comparator("comparatorDefault")

    @staticmethod
    def null_safe_equal() -> _Comparator:
        return _Comparator("comparatorNullSafeEqual")

    @staticmethod
    def epsilon(epsilon: float, relative: bool = True, inclusive: bool = True) -> _Comparator:
        return _Comparator("comparatorEpsilon", epsilon, relative, inclusive)

    @staticmethod
    def string(whitespace_agnostic: bool = True) -> _Comparator:
        return _Comparator("comparatorString", whitespace_agnostic)

    @staticmethod
    def duration(duration: Union[str, timedelta], inclusive: bool = True) -> _Comparator:
        """`duration` as ISO-8601 (e.g. "PT24H") or a datetime.timedelta."""
        iso = _to_iso_duration(duration) if isinstance(duration, timedelta) else duration
        _parse_iso_duration(iso)  # validate eagerly, before any Spark work
        return _Comparator("comparatorDuration", iso, inclusive)

    @staticmethod
    def map(key_order_sensitive: bool = False) -> _Comparator:
        return _Comparator("comparatorMap", key_order_sensitive)


class DiffOptions:
    """Immutable diff configuration; built lazily into the JVM options so it
    can be constructed before a Spark session exists."""

    def __init__(self,
                 diff_column: str = "diff",
                 left_column_prefix: str = "left",
                 right_column_prefix: str = "right",
                 insert_diff_value: str = "I",
                 change_diff_value: str = "C",
                 delete_diff_value: str = "D",
                 nochange_diff_value: str = "N",
                 change_column: Optional[str] = None,
                 diff_mode: DiffMode = DiffMode.Default,
                 sparse_mode: bool = False,
                 default_comparator: Optional[_Comparator] = None,
                 data_type_comparators: Optional[dict] = None,
                 column_name_comparators: Optional[dict] = None):
        self.diff_column = diff_column
        self.left_column_prefix = left_column_prefix
        self.right_column_prefix = right_column_prefix
        self.insert_diff_value = insert_diff_value
        self.change_diff_value = change_diff_value
        self.delete_diff_value = delete_diff_value
        self.nochange_diff_value = nochange_diff_value
        self.change_column = change_column
        self.diff_mode = diff_mode
        self.sparse_mode = sparse_mode
        self.default_comparator = default_comparator
        # {ddl-type-string: comparator} / {column-name: comparator}
        self.data_type_comparators = dict(data_type_comparators or {})
        self.column_name_comparators = dict(column_name_comparators or {})

    def _copy(self, **kwargs) -> "DiffOptions":
        fields = dict(
            diff_column=self.diff_column,
            left_column_prefix=self.left_column_prefix,
            right_column_prefix=self.right_column_prefix,
            insert_diff_value=self.insert_diff_value,
            change_diff_value=self.change_diff_value,
            delete_diff_value=self.delete_diff_value,
            nochange_diff_value=self.nochange_diff_value,
            change_column=self.change_column,
            diff_mode=self.diff_mode,
            sparse_mode=self.sparse_mode,
            default_comparator=self.default_comparator,
            data_type_comparators=self.data_type_comparators,
            column_name_comparators=self.column_name_comparators,
        )
        fields.update(kwargs)
        return DiffOptions(**fields)

    def with_diff_column(self, name: str) -> "DiffOptions":
        return self._copy(diff_column=name)

    def with_left_column_prefix(self, prefix: str) -> "DiffOptions":
        return self._copy(left_column_prefix=prefix)

    def with_right_column_prefix(self, prefix: str) -> "DiffOptions":
        return self._copy(right_column_prefix=prefix)

    def with_insert_diff_value(self, value: str) -> "DiffOptions":
        return self._copy(insert_diff_value=value)

    def with_change_diff_value(self, value: str) -> "DiffOptions":
        return self._copy(change_diff_value=value)

    def with_delete_diff_value(self, value: str) -> "DiffOptions":
        return self._copy(delete_diff_value=value)

    def with_nochange_diff_value(self, value: str) -> "DiffOptions":
        return self._copy(nochange_diff_value=value)

    def with_change_column(self, name: str) -> "DiffOptions":
        return self._copy(change_column=name)

    def without_change_column(self) -> "DiffOptions":
        return self._copy(change_column=None)

    def with_diff_mode(self, mode: DiffMode) -> "DiffOptions":
        return self._copy(diff_mode=mode)

    def with_sparse_mode(self, sparse: bool = True) -> "DiffOptions":
        return self._copy(sparse_mode=sparse)

    def with_default_comparator(self, comparator: _Comparator) -> "DiffOptions":
        return self._copy(default_comparator=comparator)

    def with_column_name_comparator(self, comparator: _Comparator, *names: str) -> "DiffOptions":
        merged = dict(self.column_name_comparators)
        for name in names:
            if name in merged:
                raise ValueError(f"A comparator for column name {name} exists already.")
            merged[name] = comparator
        return self._copy(column_name_comparators=merged)

    def with_data_type_comparator(self, comparator: _Comparator, *ddl_types) -> "DiffOptions":
        """Data types given as DDL strings (e.g. "int", "map<string,int>") or
        pyspark DataType instances."""
        merged = dict(self.data_type_comparators)
        for t in ddl_types:
            key = t if isinstance(t, str) else t.simpleString()
            if key in merged:
                raise ValueError(f"A comparator for data type {key} exists already.")
            merged[key] = comparator
        return self._copy(data_type_comparators=merged)

    def _to_java(self, bridge):
        joptions = bridge.diffOptions() \
            .withDiffColumn(self.diff_column) \
            .withLeftColumnPrefix(self.left_column_prefix) \
            .withRightColumnPrefix(self.right_column_prefix) \
            .withInsertDiffValue(self.insert_diff_value) \
            .withChangeDiffValue(self.change_diff_value) \
            .withDeleteDiffValue(self.delete_diff_value) \
            .withNochangeDiffValue(self.nochange_diff_value)
        if self.change_column is not None:
            joptions = joptions.withChangeColumn(self.change_column)
        joptions = bridge.withDiffMode(joptions, self.diff_mode.value)
        joptions = joptions.withSparseMode(self.sparse_mode)
        if self.default_comparator is not None:
            joptions = joptions.withDefaultComparator(self.default_comparator._to_java(bridge))
        for name, comparator in self.column_name_comparators.items():
            joptions = bridge.withColumnComparator(joptions, comparator._to_java(bridge), [name])
        for ddl, comparator in self.data_type_comparators.items():
            joptions = bridge.withTypeComparator(joptions, comparator._to_java(bridge), [ddl])
        return joptions


def _resolve_engine(df: DataFrame, engine: str) -> str:
    if engine not in ("auto", "jvm", "pure"):
        raise ValueError(f"Unknown diff engine {engine!r}; use 'auto', 'jvm' or 'pure'")
    if engine == "auto":
        return "jvm" if hasattr(df, "_jdf") else "pure"
    return engine


class Differ:
    def __init__(self, options: Optional[DiffOptions] = None, engine: str = "auto"):
        self._options = options or DiffOptions()
        self._engine = engine

    def diff(self, left: DataFrame, right: DataFrame, *id_columns: str,
             ignore_columns: Optional[List[str]] = None) -> DataFrame:
        if _resolve_engine(left, self._engine) == "pure":
            return _pure.pure_diff(self._options, left, right,
                                   list(id_columns), list(ignore_columns or []))
        bridge = _bridge(left)
        jdf = bridge.diff(self._options._to_java(bridge), left._jdf, right._jdf,
                          list(id_columns), list(ignore_columns or []))
        return DataFrame(jdf, left.sparkSession)

    def patch_right(self, diff_result: DataFrame) -> DataFrame:
        """Reconstruct the RIGHT snapshot from a (non-sparse) diff result:
        drop deletes, take right-prefixed values under their original
        names — patch_right(left.diff(right, id)) == right, row for row.
        Pure column algebra, so it works on any engine's diff output."""
        return self._patch(diff_result, self._options.right_column_prefix,
                           self._options.delete_diff_value)

    def patch_left(self, diff_result: DataFrame) -> DataFrame:
        """Mirror of patch_right: drop inserts, take left values — replay a
        diff backwards to roll a snapshot back."""
        return self._patch(diff_result, self._options.left_column_prefix,
                           self._options.insert_diff_value)

    def _patch(self, d: DataFrame, prefix: str, drop_action: str) -> DataFrame:
        from pyspark.sql.functions import col as _c
        o = self._options
        lp, rp, take = (o.left_column_prefix + "_",
                        o.right_column_prefix + "_", prefix + "_")
        cols = d.columns
        if o.diff_column not in cols:
            raise ValueError(f"not a diff result: no {o.diff_column!r} column")
        ids = [c for c in cols
               if c != o.diff_column and c != o.change_column
               and not c.startswith(lp) and not c.startswith(rp)]
        vals = [c for c in cols if c.startswith(take)]
        return (d.filter(_c(o.diff_column) != drop_action)
                .select([_c(f"`{c}`") for c in ids] +
                        [_c(f"`{c}`").alias(c[len(take):]) for c in vals]))

    def diff_with(self, left: DataFrame, right: DataFrame, *id_columns: str,
                  ignore_columns: Optional[List[str]] = None) -> DataFrame:
        """Diff as an (action, left-struct, right-struct) triple: columns
        _1/_2/_3, with _2 null for inserts and _3 null for deletes."""
        if _resolve_engine(left, self._engine) == "pure":
            return _pure.pure_diff_with(self._options, left, right,
                                        list(id_columns), list(ignore_columns or []))
        bridge = _bridge(left)
        jdf = bridge.diffWith(self._options._to_java(bridge), left._jdf, right._jdf,
                              list(id_columns), list(ignore_columns or []))
        return DataFrame(jdf, left.sparkSession)


def diff(left: DataFrame, right: DataFrame, *id_columns: str,
         options: Optional[DiffOptions] = None,
         ignore_columns: Optional[List[str]] = None,
         engine: str = "auto") -> DataFrame:
    """Full-outer compare of two DataFrames on id columns; emits the diff
    action column N/C/D/I, id columns, and per-side value columns."""
    return Differ(options, engine).diff(left, right, *id_columns, ignore_columns=ignore_columns)


def patch_right(diff_result: DataFrame,
                options: Optional[DiffOptions] = None) -> DataFrame:
    """Reconstruct the right snapshot from a (non-sparse) diff result."""
    return Differ(options).patch_right(diff_result)


def patch_left(diff_result: DataFrame,
               options: Optional[DiffOptions] = None) -> DataFrame:
    """Reconstruct the left snapshot from a (non-sparse) diff result."""
    return Differ(options).patch_left(diff_result)


def diff_with(left: DataFrame, right: DataFrame, *id_columns: str,
              options: Optional[DiffOptions] = None,
              ignore_columns: Optional[List[str]] = None,
              engine: str = "auto") -> DataFrame:
    return Differ(options, engine).diff_with(left, right, *id_columns, ignore_columns=ignore_columns)


def _df_diff(self: DataFrame, other: DataFrame, *id_columns: str,
             options: Optional[DiffOptions] = None,
             ignore_columns: Optional[List[str]] = None,
             engine: str = "auto") -> DataFrame:
    return diff(self, other, *id_columns, options=options,
                ignore_columns=ignore_columns, engine=engine)


def _df_diff_with(self: DataFrame, other: DataFrame, *id_columns: str,
                  options: Optional[DiffOptions] = None,
                  ignore_columns: Optional[List[str]] = None,
                  engine: str = "auto") -> DataFrame:
    return diff_with(self, other, *id_columns, options=options,
                     ignore_columns=ignore_columns, engine=engine)


DataFrame.diff = _df_diff
DataFrame.diff_with = _df_diff_with
