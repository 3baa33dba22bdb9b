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

  /**
   * Keep the top `fraction` of each group's rows, ranked by `orderCols` —
   * the adaptive quality cut: "drop the worst 70% of every domain" adapts
   * the score threshold to each domain instead of imposing one global bar
   * that would empty low-scoring domains and keep the bulk of high-scoring
   * ones. A row stays when `rank <= ceil(fraction * group_count)`, so every
   * non-empty group keeps at least one row and exactly the ceiling of its
   * share; both sides of the comparison are IEEE doubles computed the same
   * way in any engine, so the cut is hash-verifiable.
   *
   * Unlike [[topKPerGroup]], the keep-limit is data-dependent, so Catalyst
   * cannot rewrite the window into `WindowGroupLimit` — every group pays
   * its sort. That is inherent to the exact semantics (the rank threshold
   * is unknown until the group is counted), and the shuffle is ONE exchange
   * on the group key: the group count rides the same partitioning as an
   * unordered window aggregate, so no second exchange and no join
   * materializes. For corpora where groups are huge and an approximate cut is
   * acceptable, compute a per-group score threshold from
   * `approx_percentile` instead and filter narrowly; this exact variant is
   * the referee for that path.
   *
   * The ordering should be total (add tie-break columns) for deterministic
   * output.
   */
  def topFractionPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCols: Seq[Column],
      fraction: Double,
      rankColumn: String = "rank"): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1]: $fraction")
    require(groupCols.nonEmpty, "topFractionPerGroup needs at least one group column")
    require(orderCols.nonEmpty, "topFractionPerGroup needs at least one order column")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    val wGroup = Window.partitionBy(groupCols: _*)
    df.withColumn(rankColumn, row_number().over(w))
      .withColumn("__group_count", count(lit(1)).over(wGroup))
      .filter(col(rankColumn).cast("double") <=
        ceil(lit(fraction) * col("__group_count").cast("double")).cast("double"))
      .drop("__group_count")
  }

  /**
   * The 100 TB shape of [[topFractionPerGroup]]: instead of ranking every
   * group (one exchange + a per-group SORT of the whole corpus), compute
   * each group's score threshold from ONE mergeable `percentile_approx`
   * aggregate — a map-side-combined pass whose output is |groups| rows —
   * broadcast it back, and keep rows with `score >= threshold` as a NARROW
   * filter next to the scan. The corpus is never sorted and never rides a
   * window; only the tiny threshold table shuffles.
   *
   * Approximate exactly at the cut boundary: the kept fraction differs
   * from `fraction` by the sketch's rank error (tunable via `accuracy`,
   * default 10⁴ ≈ 0.01% rank error) plus ties at the threshold (kept
   * inclusively). Every non-empty group keeps >= 1 row (its max scores >=
   * any quantile). Rows with a NULL score are dropped (they have no
   * position under a score order; the exact variant instead sorts them
   * last under `desc` — give scores a sentinel first if they must
   * survive). [[topFractionPerGroup]] is the exact referee — the sbt
   * suite pins per-group kept counts within tolerance of exact, and the
   * gate asserts the same as an in-plan boolean.
   */
  def approxTopFractionPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      score: Column,
      fraction: Double,
      accuracy: Int = 10000): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1]: $fraction")
    require(groupCols.nonEmpty, "approxTopFractionPerGroup needs at least one group column")
    require(accuracy >= 100, s"accuracy must be >= 100: $accuracy")
    val p = graft.functions.distinctPrefixFor(df.columns.toSeq)
    val gcols = groupCols.zipWithIndex.map { case (_, i) => p + s"g$i" }
    val tcol = p + "threshold"
    val tagged = groupCols.zip(gcols).foldLeft(df) { case (d, (g, n)) => d.withColumn(n, g) }
    val thresholds = tagged
      .groupBy(gcols.map(col): _*)
      .agg(percentile_approx(score.cast("double"), lit(1.0 - fraction), lit(accuracy)).as(tcol))
    tagged
      .join(broadcast(thresholds), gcols)
      .filter(score.cast("double") >= col(tcol))
      .drop(tcol).drop(gcols: _*)
  }
}
