package graft.events

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Funnel analysis — ordered step progression per user ("of everyone who
 * signed up, who then viewed, then clicked, then purchased?"), the
 * conversion question behind every product/ads event pipeline.
 *
 * Semantics, fully specified so any engine replays the same depths:
 * with steps `S1..Sk` over integer-microsecond event times,
 *
 *  - `t1(u)` = min ts of u's `S1` events;
 *  - `t_{i+1}(u)` = min ts of u's `S_{i+1}` events with `ts > t_i(u)`
 *    (STRICT — a same-microsecond event does not chain) and
 *    `ts − anchor(u, i) <= windowUs`, where `anchor` is `t1(u)` under
 *    [[Funnel.AnchorFirstStep]] (the whole funnel must fit the window —
 *    the classic cohort-conversion definition) or `t_i(u)` under
 *    [[Funnel.AnchorPreviousStep]] ("within W of the PREVIOUS step" —
 *    what most product-analytics tools compute). The subtraction form
 *    cannot overflow: the anchor never exceeds the candidate ts.
 *  - `depth(u)` = the largest i with `t_i` defined; users with no `S1`
 *    event are absent.
 *
 * Scale shape: ONE pass per step — a filtered map-side-combined
 * min-aggregate plus one hash equi-join on the user id, carrying the
 * whole `t_1..t_i` prefix as columns, so depth falls out of the final
 * row with no union and no recompute (an earlier shape unioned k
 * depth-prefixes, re-executing step i's join chain k−i more times).
 * k is the (small) funnel length, every exchange is keyed on `user_id`,
 * and consecutive groupBy/join on the same key reuse the partitioning.
 * No windows, no per-user sort, exact integer arithmetic throughout.
 */
object Funnel {

  /** Where the conversion window `windowUs` anchors. */
  sealed trait WindowAnchor
  /** `ts − t1 <= windowUs`: the whole funnel fits one window. */
  case object AnchorFirstStep extends WindowAnchor
  /** `ts − t_prev <= windowUs`: each step within W of the previous one. */
  case object AnchorPreviousStep extends WindowAnchor

  /** The shared single-pass chain: one row per funnel-entering user with
    * columns `user_id, t_1..t_k` (NULL past the reached depth). */
  private def funnelChain(events: DataFrame, user: Column, tsUs: Column,
                          etype: Column, steps: Seq[String], windowUs: Long,
                          anchor: WindowAnchor): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"repeated step types are ambiguous: ${steps.mkString(", ")}")
    require(windowUs >= 0, s"windowUs must be >= 0: $windowUs")
    val e = events
      .select(user.cast("long").as("user_id"), tsUs.cast("long").as("__t"),
        etype.as("__ty"))
      .filter(col("__t").isNotNull && col("user_id").isNotNull)
    // single pass: step i joins its events once and extends the carried
    // (t_1..t_{i-1}) row with t_i = min over candidates chaining off
    // t_{i-1}; a user who fell out earlier carries NULLs forward (the
    // chain condition is null, so min() stays null — no refilter needed)
    var cur = e.filter(col("__ty") === steps.head)
      .groupBy(col("user_id")).agg(min(col("__t")).as("t_1"))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val prev = col(s"t_$i")
      val anchorT = anchor match {
        case AnchorFirstStep    => col("t_1")
        case AnchorPreviousStep => prev
      }
      val si = e.filter(col("__ty") === s)
        .select(col("user_id"), col("__t").as("__tn"))
      // the carried prefix re-aggregates min(t_1..t_i) at every step, so
      // expression count grows O(k²) with funnel length — deliberate:
      // each min over an already-single-valued column is free at runtime,
      // real funnels have k <= 10, and the alternative (first() semantics
      // or an extra join) costs more than it saves
      val carried = (1 to i).map(j => min(col(s"t_$j")).as(s"t_$j"))
      val next = min(when(col("__tn") > prev &&
        col("__tn") - anchorT <= windowUs, col("__tn"))).as(s"t_${i + 1}")
      cur = cur.join(si, Seq("user_id"), "left_outer")
        .groupBy(col("user_id"))
        .agg(carried.head, (carried.tail :+ next): _*)
    }
    cur
  }

  /** Per-user funnel reach: `(user_id, depth, first_step_us,
    * last_step_us)` — `last_step_us` is the time the DEEPEST step was
    * reached. */
  def funnelTimes(events: DataFrame, user: Column, tsUs: Column, etype: Column,
                  steps: Seq[String], windowUs: Long = Long.MaxValue,
                  anchor: WindowAnchor = AnchorFirstStep): DataFrame = {
    val k = steps.size
    val cur = funnelChain(events, user, tsUs, etype, steps, windowUs, anchor)
    val depth = (1 to k).map(j =>
      when(col(s"t_$j").isNotNull, 1).otherwise(0)).reduce(_ + _)
    val last = coalesce((k to 1 by -1).map(j => col(s"t_$j")): _*)
    cur.select(col("user_id"), depth.as("depth"),
      col("t_1").as("first_step_us"), last.as("last_step_us"))
  }

  /** Per-user step times in LONG format: `(user_id, step_idx, step,
    * t_us)`, one row per REACHED step — the raw material for
    * time-to-convert analysis (and the long view of the carried-prefix
    * chain). Same plan as [[funnelTimes]] plus one narrow unpivot. */
  /** A step name as a Spark-SQL string literal: backslashes are escape
    * characters inside SQL literals (not just quotes), so both need
    * escaping or a name like `nav\home` silently corrupts its label. */
  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  def funnelStepTimes(events: DataFrame, user: Column, tsUs: Column,
                      etype: Column, steps: Seq[String],
                      windowUs: Long = Long.MaxValue,
                      anchor: WindowAnchor = AnchorFirstStep): DataFrame = {
    val cur = funnelChain(events, user, tsUs, etype, steps, windowUs, anchor)
    val stacked = steps.indices.map(i =>
      s"${i + 1}, ${sqlLit(steps(i))}, t_${i + 1}").mkString(", ")
    cur.select(col("user_id"),
        expr(s"stack(${steps.size}, $stacked)").as(Seq("step_idx", "step", "t_us")))
      .select(col("user_id"), col("step_idx"), col("step"), col("t_us"))
      .filter(col("t_us").isNotNull)
  }

  /**
   * Time-to-convert report: per step, how many users reached it and the
   * exact lag distribution bounds from the PREVIOUS step — `(step_idx,
   * step, users, min_lag_us, max_lag_us, sum_lag_us)`. The first step has
   * no previous step: its lag columns are 0 by definition. Exact BIGINT
   * end to end (mean = sum/users downstream); ONE aggregate pass over the
   * chain — no extra shuffle beyond [[funnelTimes]]'s.
   */
  def funnelLags(events: DataFrame, user: Column, tsUs: Column, etype: Column,
                 steps: Seq[String], windowUs: Long = Long.MaxValue,
                 anchor: WindowAnchor = AnchorFirstStep): DataFrame = {
    val k = steps.size
    val cur = funnelChain(events, user, tsUs, etype, steps, windowUs, anchor)
    val aggs = (1 to k).flatMap { i =>
      val lag = if (i == 1) lit(0L) else col(s"t_$i") - col(s"t_${i - 1}")
      Seq(count(col(s"t_$i")).as(s"u_$i"),
        coalesce(min(when(col(s"t_$i").isNotNull, lag)), lit(0L)).as(s"mn_$i"),
        coalesce(max(when(col(s"t_$i").isNotNull, lag)), lit(0L)).as(s"mx_$i"),
        coalesce(sum(when(col(s"t_$i").isNotNull, lag)), lit(0L)).as(s"sm_$i"))
    }
    val one = cur.agg(aggs.head, aggs.tail: _*)
    val stacked = (1 to k).map(i =>
      s"$i, ${sqlLit(steps(i - 1))}, u_$i, mn_$i, mx_$i, sm_$i")
      .mkString(", ")
    one.select(expr(s"stack($k, $stacked)")
        .as(Seq("step_idx", "step", "users", "min_lag_us", "max_lag_us", "sum_lag_us")))
      .select(col("step_idx"), col("step"), col("users"),
        col("min_lag_us"), col("max_lag_us"), col("sum_lag_us"))
  }

  /** Step-level conversion table: `(step_idx, step, users)` with `users` =
    * count of users whose depth reaches that step (exact BIGINT — rates
    * are a trivial downstream division, kept out so the table replays
    * bit-for-bit). */
  def funnelReport(events: DataFrame, user: Column, tsUs: Column, etype: Column,
                   steps: Seq[String], windowUs: Long = Long.MaxValue,
                   anchor: WindowAnchor = AnchorFirstStep): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val counts = funnelTimes(events, user, tsUs, etype, steps, windowUs, anchor)
      .select(explode(sequence(lit(1), col("depth"))).as("step_idx"))
      .groupBy(col("step_idx")).agg(count(lit(1)).as("users"))
    steps.zipWithIndex.map { case (s, i) => (i + 1, s) }
      .toDF("step_idx", "step")
      .join(counts, Seq("step_idx"), "left_outer")
      .select(col("step_idx"), col("step"),
        coalesce(col("users"), lit(0L)).as("users"))
  }

  /**
   * Retention cohorts — the activity triangle behind "do users who
   * arrived in week W still show up k weeks later?": cohort = the period
   * of a user's FIRST event (`period = tsUs DIV periodUs`, integer floor
   * division over non-negative micros), and each (cohort, offset) cell
   * counts DISTINCT users of that cohort active `offset` periods later.
   * Output: `(cohort_period, period_offset, users)`.
   *
   * One map-side-combined min per user + one hash join back on user_id +
   * one distinct-count aggregate — exact integers end to end.
   */
  def retentionCohorts(events: DataFrame, user: Column, tsUs: Column,
                       periodUs: Long): DataFrame =
    cohortCells(events, user, tsUs, periodUs)
      .agg(count_distinct(col("user_id")).as("users"))
      .select(col("cohort_period"), col("period_offset"), col("users"))

  /**
   * Approximate retention — the 100 TB tier of [[retentionCohorts]]:
   * exact `count_distinct` per (cohort, offset) cell plans a corpus-sized
   * two-phase distinct shuffle (every (user, cell) pair crosses the wire
   * twice); the HLL sketch aggregate is map-side combined in ONE pass —
   * each task ships one small sketch per cell, never user sets — and the
   * sketches stay mergeable across days/sources (the
   * [[graft.agg.Profile]] sketch discipline). Output: `(cohort_period,
   * period_offset, users_estimate)` — a ±~2% distinct count, which is the
   * answer a retention triangle actually needs. Keep it honest against
   * the exact tier at test scale with the recall-gate pattern (the
   * `retention_cohorts_approx` gate's in-plan tolerance boolean).
   */
  def retentionCohortsApprox(events: DataFrame, user: Column, tsUs: Column,
                             periodUs: Long, lgConfigK: Int = 12): DataFrame =
    cohortCells(events, user, tsUs, periodUs)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(lgConfigK)))
        .as("users_estimate"))
      .select(col("cohort_period"), col("period_offset"), col("users_estimate"))

  /** The shared cohort algebra: one map-side-combined min per user + one
    * hash join back on user_id, grouped by (cohort, offset) — the exact
    * and sketch tiers differ only in the final distinct aggregate. */
  private def cohortCells(events: DataFrame, user: Column, tsUs: Column,
                          periodUs: Long)
      : org.apache.spark.sql.RelationalGroupedDataset = {
    require(periodUs > 0, s"periodUs must be positive: $periodUs")
    val e = events
      .select(user.cast("long").as("user_id"), tsUs.cast("long").as("__t"))
      .filter(col("__t").isNotNull && col("user_id").isNotNull)
      // exact FLOOR division in integer algebra (pmod is non-negative for
      // any sign, and the pre-subtracted numerator divides exactly under
      // integer DIV), never IEEE '/': a double quotient loses exactness
      // past 2^53 us and rounds pre-epoch (negative) micros toward zero
      // where DuckDB's `//` floors them
      .select(col("user_id"),
        expr(s"(__t - pmod(__t, ${periodUs}L)) DIV ${periodUs}L").as("__p"))
    val first = e.groupBy(col("user_id"))
      .agg(min(col("__p")).as("cohort_period"))
    e.join(first, "user_id")
      .groupBy(col("cohort_period"),
        (col("__p") - col("cohort_period")).as("period_offset"))
  }

  /**
   * Event transition matrix — the Markov-chain estimation table over
   * per-user event sequences: order each user's events by `(tsUs,
   * eventId)` (the id tiebreak makes the order TOTAL, so the counts are
   * run-invariant even with same-microsecond events), pair each event
   * with its successor via `lead`, count `(from_type, to_type)` pairs
   * corpus-wide. A user's last event has no successor and contributes no
   * pair. Output: `(from_type, to_type, transitions)`.
   *
   * Scale shape: one user-keyed window (bounded per user — the sessionize
   * discipline) feeding a map-side-combined count over the
   * |types|²-bounded pair space.
   */
  def transitionMatrix(events: DataFrame, user: Column, tsUs: Column,
                       eventId: Column, etype: Column): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__t"), col("__eid"))
    events
      .select(user.cast("long").as("user_id"), tsUs.cast("long").as("__t"),
        eventId.cast("long").as("__eid"), etype.as("from_type"))
      // a null tiebreak id would break the TOTAL order (and Spark orders
      // nulls first where other engines order them last) — such rows are
      // excluded rather than counted nondeterministically
      .filter(col("__t").isNotNull && col("user_id").isNotNull &&
        col("__eid").isNotNull)
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("transitions"))
  }

  /**
   * Top user paths — the "what journeys actually happen" view behind
   * sankey/path-analysis dashboards, generalizing [[transitionMatrix]]'s
   * one-step pairs to whole ordered journeys: each user's first
   * `maxSteps` events (event-time order, eventId tiebreak — the same
   * total-order + null-exclusion contract as the matrix; a null event
   * type renders as `(null)` rather than silently shortening the path)
   * join into one `a > b > c` string; output counts users per path and
   * keeps the `k` most common (ties: path ascending — deterministic, so
   * the result set is engine-replayable).
   *
   * Scale shape: the per-user rank window is the one full-data exchange
   * (same as the matrix); everything after the `rank <= maxSteps` filter
   * carries at most `maxSteps` rows per user, the per-path count is
   * map-side combined, and the final top-k plans as
   * TakeOrderedAndProject — per-partition heaps, never a global sort.
   */
  def topPaths(events: DataFrame, user: Column, tsUs: Column,
               eventId: Column, etype: Column,
               maxSteps: Int = 5, k: Int = 20): DataFrame = {
    require(maxSteps > 0, s"maxSteps must be positive: $maxSteps")
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__t"), col("__eid"))
    events
      .select(user.cast("long").as("user_id"), tsUs.cast("long").as("__t"),
        eventId.cast("long").as("__eid"),
        coalesce(etype.cast("string"), lit("(null)")).as("__e"))
      .filter(col("__t").isNotNull && col("user_id").isNotNull &&
        col("__eid").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxSteps)
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col("__e")))),
        x => x.getField("__e")), " > ").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("users"))
      .orderBy(col("users").desc, col("path").asc)
      .limit(k)
  }

  /** The observability companion of [[transitionMatrix]]'s exclusion rule:
    * how many event rows were dropped for a null user/timestamp/tiebreak
    * id (and so contributed no transition). One map-side-combined count —
    * run it alongside the matrix so the exclusion is a number in the
    * report, not a silent contract. Output: `(excluded_rows, total_rows)`. */
  def transitionMatrixExcluded(events: DataFrame, user: Column, tsUs: Column,
                               eventId: Column): DataFrame =
    events
      .select(user.cast("long").as("__u"), tsUs.cast("long").as("__t"),
        eventId.cast("long").as("__eid"))
      .agg(
        count(when(col("__t").isNull || col("__u").isNull ||
          col("__eid").isNull, 1)).as("excluded_rows"),
        count(lit(1)).as("total_rows"))
}
