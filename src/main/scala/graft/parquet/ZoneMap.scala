package graft.parquet

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Zone-map (row-group min/max) pruning analysis: for a range predicate
 * `lo <= column <= hi`, which row groups of a parquet layout could a
 * min/max-pruning scan SKIP?
 *
 * This is the measurement half of the clustering story: `zorderBy` /
 * sorted writes exist to make these footer ranges narrow, and this report
 * turns "the layout should prune well" into a number — the fraction of
 * groups (and of values) a scan of the given predicate never reads. Run it
 * before and after re-clustering 100 TB to decide whether the rewrite pays
 * for itself; the same numbers are what Spark's own parquet filter pushdown
 * and DuckDB/Trino zone-map skipping act on, engine-independently, because
 * they come from the file footers, not from any engine's planner.
 *
 * A group is skippable iff `max < lo` or `min > hi`; groups without
 * statistics (encrypted columns, ancient writers) are conservatively NOT
 * skippable — exactly the decision a scanner makes. Built on
 * [[ParquetMeta.parquetBlockColumns]], so footers are read distributed
 * (never through the driver) and a 100k-file lake audits in parallel.
 */
object ZoneMap {

  /** Per-row-group skip decision: `(filename, block, n_values, skippable)`.
    * `column` must be a numeric leaf column (stats compare as doubles). */
  def pruningReport(spark: SparkSession, paths: Seq[String], column: String,
                    lo: Double, hi: Double): DataFrame =
    ParquetMeta.parquetBlockColumns(spark, None, paths)
      .filter(col("column") === column)
      .select(col("filename"), col("block"), col("values").as("n_values"),
        coalesce(
          col("maxValue").cast("double") < lit(lo) ||
            col("minValue").cast("double") > lit(hi),
          lit(false)).as("skippable"))

  /** One-row rollup: `(n_blocks, n_skippable, values_total,
    * values_skippable, skip_fraction)` — the before/after re-clustering
    * comparison number. */
  def pruningSummary(spark: SparkSession, paths: Seq[String], column: String,
                     lo: Double, hi: Double): DataFrame =
    pruningReport(spark, paths, column, lo, hi)
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("skippable"), 1L).otherwise(0L)).as("n_skippable"),
        sum(col("n_values")).as("values_total"),
        sum(when(col("skippable"), col("n_values")).otherwise(0L))
          .as("values_skippable"))
      .select(col("n_blocks"), col("n_skippable"), col("values_total"),
        col("values_skippable"),
        (col("values_skippable").cast("double") /
          col("values_total").cast("double")).as("skip_fraction"))
}
