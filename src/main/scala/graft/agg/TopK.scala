package graft.agg

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Per-group top-k without sorting whole groups.
 *
 * The naive plan — `row_number().over(partitionBy(keys).orderBy(...))` then
 * `filter(rn <= k)` — shuffles and sorts EVERY row of every group before the
 * filter drops all but k of them. At 100 TB that is the dominant cost: a
 * group with 10M rows pays a 10M-row sort to keep 3.
 *
 * Declaring exactly that plan is still the right move on Spark >= 3.5:
 * Catalyst's `InferWindowGroupLimit` rewrites a rank-predicate filter over a
 * window into a `WindowGroupLimit` node, executed in two phases like a
 * partial aggregate — a map-side pass keeps at most k rows per group per
 * input partition (bounded priority-queue scan, no full sort), then the
 * post-shuffle pass re-applies the limit per group. The shuffle carries at
 * most k * inputPartitions rows per group instead of the whole group, and
 * skew in group size disappears before it can concentrate on one reducer.
 *
 * We pin that plan shape in tests (`WindowGroupLimit` Partial + Final around
 * the exchange) rather than hand-building the bounded heap with an
 * Aggregator: the optimizer's version is codegen-adjacent, AQE-aware, and
 * free of buffer-encoder overhead. Requires k below
 * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000) — enforced
 * here so a silent fallback to the full-sort plan cannot slip through.
 *
 * Ties: `row_number` with the caller's order columns decides deterministically
 * only if the ordering is total — pass tie-break columns (e.g. a key) as the
 * trailing order columns, exactly as you would for any deterministic top-k.
 */
object TopK {

  /**
   * Keep the top `k` rows of each group, ranked by `orderCols` (use
   * `col.desc` / `col.asc` on each). Emits the 1-based rank as
   * `rankColumn`. The ordering should be total (add tie-break columns) for
   * deterministic output.
   */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCols: Seq[Column],
      k: Int,
      rankColumn: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(orderCols.nonEmpty, "topKPerGroup needs at least one order column")
    val threshold =
      df.sparkSession.conf.get("spark.sql.optimizer.windowGroupLimitThreshold", "1000").toInt
    // A negative threshold disables InferWindowGroupLimit entirely — exactly
    // the configuration where the silent full-sort fallback happens.
    require(threshold >= 0,
      s"spark.sql.optimizer.windowGroupLimitThreshold=$threshold disables " +
        "InferWindowGroupLimit; every group would pay a full sort — set a " +
        "non-negative threshold >= k")
    require(k <= threshold,
      s"k=$k exceeds spark.sql.optimizer.windowGroupLimitThreshold=$threshold; " +
        "the plan would fall back to a full per-group sort — raise the threshold " +
        "or lower k")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankColumn, row_number().over(w))
      .filter(col(rankColumn) <= k)
  }
}
