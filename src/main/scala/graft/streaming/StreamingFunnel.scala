package graft.streaming

import graft.events.Funnel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One funnel-step event heading into the stateful fold — `ts` carries the
  * watermarked event-time attribute through the projection (event-time
  * timeout requires it to survive into the grouped Dataset); `t_us` is the
  * same instant as exact integer micros (all chain arithmetic is integer). */
case class FunnelObs(user_id: Long, step_idx: Int, t_us: Long,
                     ts: java.sql.Timestamp)

/** Per-user chain state: the reached time prefix `t_1..t_k` in micros, −1
  * for not-yet-reached — exactly k longs per active user, the bound that
  * keeps a web-scale funnel's state store flat. */
case class FunnelChainState(times: Seq[Long])

/** An emitted depth transition: `user_id` reached funnel depth `depth`
  * (step name `step`) at event time `t_us`. Depth only ever grows and a
  * reached step's time is final on arrival, so transitions are append-safe
  * — no retraction, no update. */
case class FunnelStepHit(user_id: Long, depth: Int, step: String, t_us: Long)

/**
 * Streaming twin of [[graft.events.Funnel]] — live conversion funnels over
 * an unbounded event feed ("who signed up, then viewed, then purchased —
 * right now?"), the product-analytics question batch [[Funnel.funnelTimes]]
 * answers only after the fact.
 *
 * SEMANTICS — the greedy in-order chain: state per user is the time prefix
 * `t_1..t_k`; an arriving event of step `i+1` EXTENDS the chain iff
 * `t_i` is set, `t_{i+1}` is not, `ts > t_i` (strict — same-microsecond
 * events do not chain) and `ts − anchor <= windowUs` (anchor = `t_1` under
 * [[Funnel.AnchorFirstStep]], `t_i` under [[Funnel.AnchorPreviousStep]] —
 * the batch operator's exact rule). For a feed that is EVENT-TIME ORDERED
 * (each micro-batch's events no earlier than the previous batch's — the
 * regime a watermark-disciplined pipeline delivers), the greedy chain
 * equals the batch recomputation: in-order arrival makes every first
 * qualifying event the MINIMUM qualifying event, which is precisely the
 * batch `min`-aggregate definition. The `streaming_funnel` gate replays
 * exactly this equivalence against the DuckDB batch oracle. Events that
 * arrive out of order within the watermark are folded greedily (a
 * late-arriving earlier step-1 event cannot retroactively lower `t_1`) —
 * the documented divergence, and the price of k-longs state: exact
 * any-disorder semantics would require buffering every event until the
 * watermark.
 *
 * SCALE SHAPE: one shuffle keyed on `user_id`; state is EXACTLY k longs
 * per funnel-entering user. A chain — live, stuck, or completed — is
 * evicted once the watermark passes `anchor + windowUs`: by then no event
 * can extend it (anything qualifying would be dropped as late first), and
 * a completed chain's filled prefix is what suppresses a later step-1
 * event from re-chaining (the batch semantics: ONE min-anchored chain per
 * user). After eviction a new step-1 event starts a FRESH chain — the
 * re-conversion semantics product analytics wants on an endless feed; on
 * any feed where each user's funnel activity fits one window (the batch
 * regime, and every gate replay) output equals the batch prediction
 * exactly. An infinite window keeps state alive for every funnel-entering
 * user — pass a real window at 100 TB. Emission is transition-at-arrival
 * (append mode): depth only grows, so every emitted row is final — a live
 * dashboard aggregates depths with a plain downstream count.
 */
object StreamingFunnel {

  /**
   * Per-user funnel-depth transitions over a stream: one
   * [[FunnelStepHit]] row the moment a user reaches each successive step.
   * `steps` are matched against `etype` in order (distinct, non-empty);
   * rows whose type is not a funnel step never enter the shuffle.
   */
  def funnelProgress(stream: DataFrame, user: Column, eventTimeColumn: String,
                     etype: Column, steps: Seq[String], windowUs: Long,
                     anchor: Funnel.WindowAnchor = Funnel.AnchorFirstStep,
                     watermarkDelay: String = "0 seconds"): Dataset[FunnelStepHit] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"repeated step types are ambiguous: ${steps.mkString(", ")}")
    require(windowUs >= 0, s"windowUs must be >= 0: $windowUs")
    val spark = stream.sparkSession
    import spark.implicits._
    val k = steps.size
    val stepNames = steps.toArray
    // anchor + windowUs must not overflow: treat a window past 2^62 as
    // infinite (no event-time eviction — the documented unbounded case)
    val finiteWindow = windowUs < (Long.MaxValue >> 1)

    val idxExpr = steps.zipWithIndex
      .foldLeft(when(lit(false), lit(0))) { case (acc, (st, i)) =>
        acc.when(etype === st, lit(i + 1))
      }
    val obs = stream
      .withWatermark(eventTimeColumn, watermarkDelay)
      .select(user.cast("long").as("user_id"), idxExpr.as("step_idx"),
        unix_micros(col(eventTimeColumn)).as("t_us"),
        col(eventTimeColumn).as("ts"))
      .filter(col("user_id").isNotNull && col("step_idx").isNotNull &&
        col("t_us").isNotNull)
      .as[FunnelObs]

    obs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelChainState, FunnelStepHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (rows.isEmpty) {
            // event-time timeout: the watermark passed anchor + window —
            // any chain-extending event would now be dropped as late, so
            // the chain is final; transitions were already emitted
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val times = state.getOption.map(_.times.toArray)
              .getOrElse(Array.fill(k)(-1L))
            // fold the batch in event-time order (the group iterator has
            // no order guarantee; ties cannot chain off each other under
            // the strict ts > t_prev rule, so (t_us, step_idx) is total
            // enough for a deterministic result)
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelStepHit]
            rows.toArray.sortBy(r => (r.t_us, r.step_idx)).foreach { r =>
              val i = r.step_idx
              if (i == 1) {
                if (times(0) < 0L) {
                  times(0) = r.t_us
                  out += FunnelStepHit(uid, 1, stepNames(0), r.t_us)
                }
              } else if (times(i - 1) < 0L && times(i - 2) >= 0L) {
                val anchorT = anchor match {
                  case Funnel.AnchorFirstStep    => times(0)
                  case Funnel.AnchorPreviousStep => times(i - 2)
                }
                if (r.t_us > times(i - 2) &&
                    (!finiteWindow || r.t_us - anchorT <= windowUs)) {
                  times(i - 1) = r.t_us
                  out += FunnelStepHit(uid, i, stepNames(i - 1), r.t_us)
                }
              }
            }
            var depth = 0
            while (depth < k && times(depth) >= 0L) depth += 1
            if (depth == 0) { if (state.exists) state.remove() }
            else {
              // a COMPLETED chain stays in state too: its filled prefix is
              // what suppresses a later step-1 event from re-chaining (the
              // batch semantics — one min-anchored chain per user), at the
              // same k-longs cost as a live chain
              state.update(FunnelChainState(times.toSeq))
              if (finiteWindow) {
                val anchorT = anchor match {
                  case Funnel.AnchorFirstStep    => times(0)
                  case Funnel.AnchorPreviousStep => times(depth - 1)
                }
                // ceil to ms so the micro-precise bound is never evicted
                // early; the max keeps the required > watermark invariant
                val boundMs = (anchorT + windowUs) / 1000L + 1L
                state.setTimeoutTimestamp(
                  math.max(boundMs, state.getCurrentWatermarkMs() + 1L))
              }
            }
            out.iterator
          }
      }
  }
}
