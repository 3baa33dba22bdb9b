"""Parquet metadata scans for PySpark, bridging to graft.parquet.ParquetMeta.

Adds parquet_metadata / parquet_schema / parquet_blocks / parquet_block_columns
/ parquet_partitions to DataFrameReader; reader options (e.g.
recursiveFileLookup) are honored because the underlying JVM reader is passed
through.
"""

from typing import Optional

from pyspark.sql import DataFrame, DataFrameReader

from graftspark import _bridge

__all__ = [
    "parquet_metadata", "parquet_schema", "parquet_blocks",
    "parquet_block_columns", "parquet_partitions",
    "zonemap_pruning_report", "zonemap_pruning_summary",
]


def _scan(name: str, reader: DataFrameReader, paths, parallelism: Optional[int]) -> DataFrame:
    if not paths:
        raise ValueError("at least one path is required")
    spark = reader._spark
    bridge = _bridge(spark)
    jdf = getattr(bridge, name)(
        reader._jreader, spark._jsparkSession, parallelism, list(paths))
    return DataFrame(jdf, spark)


def parquet_metadata(self: DataFrameReader, *paths: str,
                     parallelism: Optional[int] = None) -> DataFrame:
    """Per-file Parquet footer facts (blocks, bytes, rows, values, nulls, ...)."""
    return _scan("parquetMetadata", self, paths, parallelism)


def parquet_schema(self: DataFrameReader, *paths: str,
                   parallelism: Optional[int] = None) -> DataFrame:
    """Per-column Parquet schema facts (type, repetition, logical type, ...)."""
    return _scan("parquetSchema", self, paths, parallelism)


def parquet_blocks(self: DataFrameReader, *paths: str,
                   parallelism: Optional[int] = None) -> DataFrame:
    """Per-row-group facts (start, bytes, rows, values, nulls, ...)."""
    return _scan("parquetBlocks", self, paths, parallelism)


def parquet_block_columns(self: DataFrameReader, *paths: str,
                          parallelism: Optional[int] = None) -> DataFrame:
    """Per-(row-group, column) facts (codec, encodings, min/max, ...)."""
    return _scan("parquetBlockColumns", self, paths, parallelism)


def parquet_partitions(self: DataFrameReader, *paths: str,
                       parallelism: Optional[int] = None) -> DataFrame:
    """How Spark plans the files into partitions (splits + block assignment)."""
    return _scan("parquetPartitions", self, paths, parallelism)


DataFrameReader.parquet_metadata = parquet_metadata
DataFrameReader.parquet_schema = parquet_schema
DataFrameReader.parquet_blocks = parquet_blocks
DataFrameReader.parquet_block_columns = parquet_block_columns
DataFrameReader.parquet_partitions = parquet_partitions


def zonemap_pruning_report(spark, paths, column: str, lo: float,
                           hi: float) -> DataFrame:
    """Per-row-group skip decision (filename, block, n_values, skippable)
    for lo <= column <= hi, from footer min/max — the measurement half of
    zorder/sorted layouts. Groups without stats are NOT skippable."""
    jdf = _bridge(spark).zoneMapPruningReport(
        spark._jsparkSession, list(paths), column, float(lo), float(hi))
    return DataFrame(jdf, spark)


def zonemap_pruning_summary(spark, paths, column: str, lo: float,
                            hi: float) -> DataFrame:
    """One-row rollup of zonemap_pruning_report incl. skip_fraction."""
    jdf = _bridge(spark).zoneMapPruningSummary(
        spark._jsparkSession, list(paths), column, float(lo), float(hi))
    return DataFrame(jdf, spark)
