package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One activity observation heading into the stateful fold — `period` is
  * the exact integer floor-division period of the event time; `ts` carries
  * the watermarked event-time attribute through the projection. */
case class RetentionObs(user_id: Long, period: Long, ts: java.sql.Timestamp)

/** Per-user retention state: the cohort period plus a bitmask of offsets
  * already emitted — `ceil(horizon/64)` longs per user, flat in event
  * volume. */
case class RetentionUserState(cohort: Long, seen: Seq[Long])

/** An emitted retention cell hit: `user_id`'s FIRST activity at
  * `period_offset` periods after its cohort. First-activity-per-cell is
  * final on arrival, so hits are append-safe; a live retention triangle is
  * one downstream `groupBy(cohort_period, period_offset).count()`. */
case class RetentionHit(user_id: Long, cohort_period: Long, period_offset: Long)

/**
 * Streaming twin of [[graft.events.Funnel.retentionCohorts]] — the live
 * activity triangle over an unbounded feed: cohort = the period of a
 * user's FIRST event, and each (cohort, offset) cell counts users active
 * `offset` periods later. The batch operator re-scans history; this one
 * holds a few longs per user and emits each user's first activity per
 * offset as it happens.
 *
 * SEMANTICS — greedy in-order, the [[StreamingFunnel]] discipline: the
 * first period seen IS the cohort (exact when the feed is event-time
 * ordered, which is what a watermark-disciplined pipeline delivers — the
 * gate replays exactly that equivalence against the batch oracle); an
 * out-of-order event from BEFORE the greedy cohort is ignored (emitting
 * it would retract already-final hits). Offsets at or beyond `horizon`
 * are ignored too — retention triangles are finite-horizon by definition
 * (52 weekly cells is the classic report), and the horizon is what makes
 * state provably flat.
 *
 * BEYOND-HORIZON RE-ACQUISITION (documented divergence, the
 * [[StreamingFunnel]] re-chaining discipline): while a user's state is
 * LIVE, an event at offset >= horizon is ignored; once the event-time
 * timeout evicts that state, the user's NEXT event starts a FRESH cohort
 * and emits new hits. A user re-appearing after its horizon therefore
 * contributes a second triangle row whose presence depends on whether the
 * timeout fired before the event arrived — i.e. on micro-batch pacing of
 * the replay, not on event times alone. The batch operator
 * ([[graft.events.Funnel.retentionCohorts]]) has no such second life (one
 * cohort per user, ever); pipelines comparing the two must either bound
 * activity to one horizon per user or treat post-horizon re-acquisition
 * as the streaming tier's documented extra.
 *
 * SCALE SHAPE: one shuffle keyed on `user_id`; state is the cohort long +
 * `ceil(horizon/64)` bitmask longs per user, evicted when the watermark
 * passes the end of the user's horizon (no event inside the horizon can
 * still arrive — it would be dropped as late first). Emission is
 * first-hit-per-cell (append mode), at most `horizon` rows per user ever.
 */
object StreamingRetention {

  /**
   * Per-user retention cell hits over a stream: one [[RetentionHit]] the
   * first time each user is active `offset` periods after its cohort
   * (offset 0 = the cohort period itself, emitted on first sight).
   * `periodUs` is the period length in micros (e.g. 604800000000 for
   * weeks); `horizon` caps tracked offsets (1..4096).
   */
  def retentionHits(stream: DataFrame, user: Column, eventTimeColumn: String,
                    periodUs: Long, horizon: Int = 64,
                    watermarkDelay: String = "0 seconds"): Dataset[RetentionHit] = {
    require(periodUs > 0, s"periodUs must be positive: $periodUs")
    require(horizon >= 1 && horizon <= 4096,
      s"horizon out of range [1, 4096]: $horizon")
    val spark = stream.sparkSession
    import spark.implicits._
    val words = (horizon + 63) / 64

    val obs = stream
      .withWatermark(eventTimeColumn, watermarkDelay)
      .select(user.cast("long").as("user_id"),
        expr(s"(unix_micros(`$eventTimeColumn`) - " +
          s"pmod(unix_micros(`$eventTimeColumn`), ${periodUs}L)) " +
          s"DIV ${periodUs}L").as("period"),
        col(eventTimeColumn).as("ts"))
      .filter(col("user_id").isNotNull && col("period").isNotNull)
      .as[RetentionObs]

    obs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionUserState, RetentionHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (rows.isEmpty) {
            // watermark passed the horizon end: every in-horizon cell is
            // final (a qualifying event would be dropped as late first)
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray.sortBy(_.period)
            var cohort = state.getOption.map(_.cohort)
              .getOrElse(batch.head.period)
            val seen = state.getOption.map(_.seen.toArray)
              .getOrElse(new Array[Long](words))
            val out = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
            batch.foreach { r =>
              val off = r.period - cohort
              // off < 0 only on an out-of-order event older than the
              // greedy cohort — ignored (see scaladoc); off >= horizon is
              // outside the tracked triangle
              if (off >= 0L && off < horizon) {
                val w = (off >> 6).toInt
                val bit = 1L << (off & 63L)
                if ((seen(w) & bit) == 0L) {
                  seen(w) |= bit
                  out += RetentionHit(uid, cohort, off)
                }
              }
            }
            state.update(RetentionUserState(cohort, seen.toSeq))
            // horizon end in ms, ceil — never evict a still-live triangle
            val endMs = ((cohort + horizon) * periodUs) / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(endMs, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }
}
