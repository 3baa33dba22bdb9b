package graft.agg

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * One-pass column profiling and sketch-based distinct counting — the "what
 * is in this 100 TB table" primitives that precede every curation decision.
 *
 * [[profileColumns]] computes per-column row/null/distinct/min/max in a
 * single aggregation over one scan. With `exactDistinct` the plan uses
 * Spark's multi-distinct rewrite (an Expand node replicates each row once
 * per profiled column before the aggregate — k× the shuffled rows for k
 * columns); with `exactDistinct = false` it switches to
 * `approx_count_distinct` (HyperLogLog++), which needs no Expand and keeps
 * the pass strictly one-read-one-tiny-shuffle — the right default at
 * 100 TB, where a ±2% distinct count answers the real question.
 *
 * [[distinctCountGate]] pairs the exact distinct count with a DataSketches
 * HLL estimate (`hll_sketch_agg`, mergeable across partitions) and emits a
 * boolean "estimate within tolerance" per group. Sketches are the only way
 * distinct counts stay cheap AND composable (union across days/sources
 * without re-scanning); the gate pattern keeps them honest against the
 * exact answer at test scale.
 */
object Profile {

  /**
   * Profile `columns` of `df` in one aggregation pass. Output: one row per
   * column — `column`, `n_rows`, `n_nulls`, `n_distinct`, `min_value`,
   * `max_value` (min/max rendered as strings; cast value columns upfront if
   * a specific text form is needed).
   */
  def profileColumns(
      df: DataFrame,
      columns: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "profileColumns needs at least one column")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(", ")}")

    val aggs: Seq[Column] = count(lit(1)).as("_n_rows") +: columns.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"_nulls_$c"),
        (if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"_dist_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = columns.map { c =>
      struct(
        lit(c).as("column"),
        col("_n_rows").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"),
        col(s"_dist_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /**
   * Per-group distinct count of `itemCol`, exact, plus a boolean verdict on
   * whether the mergeable HLL sketch estimate lands within `tolerance`
   * (relative). Output: group column, `exact_distinct`, `hll_ok`.
   */
  def distinctCountGate(
      df: DataFrame,
      groupCol: Column,
      itemCol: Column,
      tolerance: Double = 0.05): DataFrame = {
    require(tolerance > 0.0, s"tolerance must be positive: $tolerance")
    df.groupBy(groupCol)
      .agg(
        countDistinct(itemCol).as("exact_distinct"),
        hll_sketch_estimate(hll_sketch_agg(itemCol)).as("_est"))
      .select(
        groupCol,
        col("exact_distinct"),
        when(col("exact_distinct") === 0, col("_est") === 0)
          .otherwise(
            abs(col("_est") - col("exact_distinct")).cast("double") /
              col("exact_distinct").cast("double") <= lit(tolerance))
          .as("hll_ok"))
  }
}
