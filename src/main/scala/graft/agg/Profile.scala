package graft.agg

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * One-pass column profiling and sketch-based distinct counting — the "what
 * is in this 100 TB table" primitives that precede every curation decision.
 *
 * [[profileColumns]] computes per-column row/null/distinct/min/max. With
 * `exactDistinct = false` (the 100 TB default — a ±2% distinct count
 * answers the real question) the plan is ONE aggregation over one scan:
 * `approx_count_distinct` (HyperLogLog++) aggregates need no distinct
 * rewrite, so the whole profile is one read + one tiny shuffle.
 *
 * Exact mode deliberately does NOT use one aggregation: k exact
 * `count(distinct)`s in one agg make Catalyst plan an Expand that
 * replicates every row k times and drags all the min/max/null aggregates
 * through it (measured 2.7x slower at sf0.1 for 5 columns). Instead each
 * column gets its own single-distinct branch — no Expand — and the
 * branches union. On columnar sources the k branch scans each read ONLY
 * their column, so total I/O stays ~one full-width scan, and each
 * column's values are shuffled once either way.
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

    if (exactDistinct) {
      // one single-distinct branch per column (no Expand); union of k tiny rows
      columns.map { c =>
        df.select(col(c).as("_v"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(when(col("_v").isNull, lit(1))).as("n_nulls"),
            countDistinct(col("_v")).as("n_distinct"),
            min(col("_v")).cast("string").as("min_value"),
            max(col("_v")).cast("string").as("max_value"))
          .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_ union _)
    } else {
      val aggs: Seq[Column] = count(lit(1)).as("_n_rows") +: columns.flatMap { c =>
        Seq(
          count(when(col(c).isNull, lit(1))).as(s"_nulls_$c"),
          approx_count_distinct(col(c)).as(s"_dist_$c"),
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
    // Mixing count(DISTINCT item) with a non-distinct aggregate in one agg
    // makes Catalyst plan an Expand (2x every row). HLL sketches are
    // duplicate-insensitive, so both aggregates run over the deduplicated
    // (group, item) pairs instead: one shuffle to distinct the pairs, then
    // a plain count + sketch-agg — no Expand, identical results.
    val grpName = "__graft_dcg_group"
    val itemName = "__graft_dcg_item"
    df.select(groupCol.as(grpName), itemCol.as(itemName))
      .distinct()
      .groupBy(col(grpName))
      .agg(
        count(col(itemName)).as("exact_distinct"), // non-null distinct items
        hll_sketch_estimate(hll_sketch_agg(col(itemName))).as("_est"))
      .select(
        col(grpName).as(groupCol.toString),
        col("exact_distinct"),
        // All-null groups have a null sketch estimate; treat (exact=0,
        // est=null) as agreement so hll_ok is always a concrete boolean.
        when(col("exact_distinct") === 0, coalesce(col("_est") === 0, lit(true)))
          .otherwise(
            abs(col("_est") - col("exact_distinct")).cast("double") /
              col("exact_distinct").cast("double") <= lit(tolerance))
          .as("hll_ok"))
  }

  /**
   * Per-group HLL sketches as BINARY — the persistable half of distinct
   * counting at 100 TB: sketch each day/source/shard independently (one
   * small parquet table per run), then [[mergeHllSketches]] unions any
   * subset later without touching the raw data again. Output:
   * `(group, sketch)`.
   */
  def hllSketches(df: DataFrame, groupCol: Column, itemCol: Column,
                  lgConfigK: Int = 12): DataFrame = {
    val grpName = "__graft_hs_group"
    df.select(groupCol.as(grpName), itemCol.as("__graft_hs_item"))
      .groupBy(col(grpName))
      .agg(hll_sketch_agg(col("__graft_hs_item"), lit(lgConfigK)).as("sketch"))
      .select(col(grpName).as(groupCol.toString), col("sketch"))
  }

  /** Union previously persisted sketches per group and read the estimate:
    * `(group, distinct_estimate)`. Merging is exact over the sketch lattice
    * — merge(sketch(A), sketch(B)) == sketch(A ∪ B) — so incremental daily
    * sketches answer the cross-run question with no rescan. */
  def mergeHllSketches(sketches: DataFrame, groupCol: Column,
                       sketchCol: Column): DataFrame = {
    val grpName = "__graft_hm_group"
    sketches.select(groupCol.as(grpName), sketchCol.as("__graft_hm_sketch"))
      .groupBy(col(grpName))
      .agg(hll_sketch_estimate(hll_union_agg(col("__graft_hm_sketch")))
        .as("distinct_estimate"))
      .select(col(grpName).as(groupCol.toString), col("distinct_estimate"))
  }

  /**
   * Per-group quantile with a sketch-honesty verdict — the distribution
   * analogue of [[distinctCountGate]]. At 100 TB the usable quantile is
   * `approx_percentile` (a mergeable rank sketch: map-side partials, one
   * tiny merge, composable across days/sources); this gate keeps it honest
   * against the EXACT discrete quantile, defined explicitly so both engines
   * agree bit-for-bit: the value at ascending-sorted index
   * `floor(q * (n - 1)) + 1` (1-based). The exact path pays a per-group
   * sort — that cost asymmetry is exactly why the sketch is the production
   * default and the exact answer is the test-scale referee.
   *
   * Output: group column, `exact_q` (the value column's own type — cast it
   * upfront for engine-portable rendering), `q_ok` (sketch within
   * `tolerance` relative error, always a concrete boolean).
   */
  def quantileGate(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      q: Double,
      accuracy: Int = 10000,
      tolerance: Double = 0.01): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0, 1]: $q")
    require(accuracy >= 1, s"accuracy must be positive: $accuracy")
    require(tolerance > 0.0, s"tolerance must be positive: $tolerance")
    val grpName = "__graft_qg_group"
    val valName = "__graft_qg_value"
    val base = df.select(groupCol.as(grpName), valueCol.as(valName))
      .filter(col(valName).isNotNull)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(grpName))
    // One window pass for the exact side: the group sizes ride along in the
    // sketch aggregate (already a required pass) instead of a second
    // count(*) window over every row; the groups-sized join output then
    // selects the target index. Exactly one Window node in the plan.
    val ranked = base
      .withColumn("__rn", row_number().over(w.orderBy(col(valName))))
    val approx = base
      .groupBy(col(grpName))
      .agg(
        percentile_approx(col(valName).cast("double"), lit(q), lit(accuracy)).as("_approx"),
        count(lit(1)).as("__n"))
    ranked.join(approx, grpName)
      .filter(col("__rn") === (floor(lit(q) * (col("__n") - 1)) + 1))
      .select(col(grpName), col(valName).as("exact_q"), col("_approx"))
      .select(
        col(grpName).as(groupCol.toString),
        col("exact_q"),
        when(col("exact_q").cast("double") === 0.0, coalesce(col("_approx") === 0.0, lit(true)))
          .otherwise(
            abs(col("_approx") - col("exact_q").cast("double")) /
              abs(col("exact_q").cast("double")) <= lit(tolerance))
          .as("q_ok"))
  }
}
