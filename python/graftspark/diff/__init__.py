"""Dataset diff for PySpark, bridging to the graft Scala implementation.

Unlike the reference's pure-Python diff reimplementation, this keeps a single
implementation in the JVM (one set of semantics, one test matrix) at the cost
of requiring a classic session — documented in python/README.md.
"""

from enum import Enum
from typing import List, Optional, Union

from pyspark.sql import DataFrame

from graftspark import _bridge

__all__ = ["DiffMode", "DiffComparators", "DiffOptions", "Differ", "diff", "diff_with"]


class DiffMode(Enum):
    Default = "Default"
    ColumnByColumn = "ColumnByColumn"
    SideBySide = "SideBySide"
    LeftSide = "LeftSide"
    RightSide = "RightSide"


class _Comparator:
    """Deferred comparator: materialized to a JVM object per session."""

    def __init__(self, factory, *args):
        self._factory = factory
        self._args = args

    def _to_java(self, bridge):
        return getattr(bridge, self._factory)(*self._args)


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
    def duration(duration: str, inclusive: bool = True) -> _Comparator:
        """`duration` in ISO-8601, e.g. "PT24H"."""
        return _Comparator("comparatorDuration", duration, inclusive)

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

    def with_data_type_comparator(self, comparator: _Comparator, *ddl_types: str) -> "DiffOptions":
        """Data types given as DDL strings, e.g. "int", "map<string,int>"."""
        merged = dict(self.data_type_comparators)
        for t in ddl_types:
            if t in merged:
                raise ValueError(f"A comparator for data type {t} exists already.")
            merged[t] = comparator
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


class Differ:
    def __init__(self, options: Optional[DiffOptions] = None):
        self._options = options or DiffOptions()

    def diff(self, left: DataFrame, right: DataFrame, *id_columns: str,
             ignore_columns: Optional[List[str]] = None) -> DataFrame:
        bridge = _bridge(left)
        jdf = bridge.diff(self._options._to_java(bridge), left._jdf, right._jdf,
                          list(id_columns), list(ignore_columns or []))
        return DataFrame(jdf, left.sparkSession)

    def diff_with(self, left: DataFrame, right: DataFrame, *id_columns: str,
                  ignore_columns: Optional[List[str]] = None) -> DataFrame:
        """Diff as an (action, left-struct, right-struct) triple: columns
        _1/_2/_3, with _2 null for inserts and _3 null for deletes."""
        bridge = _bridge(left)
        jdf = bridge.diffWith(self._options._to_java(bridge), left._jdf, right._jdf,
                              list(id_columns), list(ignore_columns or []))
        return DataFrame(jdf, left.sparkSession)


def diff(left: DataFrame, right: DataFrame, *id_columns: str,
         options: Optional[DiffOptions] = None,
         ignore_columns: Optional[List[str]] = None) -> DataFrame:
    """Full-outer compare of two DataFrames on id columns; emits the diff
    action column N/C/D/I, id columns, and per-side value columns."""
    return Differ(options).diff(left, right, *id_columns, ignore_columns=ignore_columns)


def diff_with(left: DataFrame, right: DataFrame, *id_columns: str,
              options: Optional[DiffOptions] = None,
              ignore_columns: Optional[List[str]] = None) -> DataFrame:
    return Differ(options).diff_with(left, right, *id_columns, ignore_columns=ignore_columns)


def _df_diff(self: DataFrame, other: DataFrame, *id_columns: str,
             options: Optional[DiffOptions] = None,
             ignore_columns: Optional[List[str]] = None) -> DataFrame:
    return diff(self, other, *id_columns, options=options, ignore_columns=ignore_columns)


def _df_diff_with(self: DataFrame, other: DataFrame, *id_columns: str,
                  options: Optional[DiffOptions] = None,
                  ignore_columns: Optional[List[str]] = None) -> DataFrame:
    return diff_with(self, other, *id_columns, options=options, ignore_columns=ignore_columns)


DataFrame.diff = _df_diff
DataFrame.diff_with = _df_diff_with
