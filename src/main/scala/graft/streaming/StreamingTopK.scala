package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One (window, key) observation heading into the stateful fold — `ts`
  * carries the watermarked event-time attribute through the projection
  * (event-time timeout requires it to survive into the grouped Dataset). */
case class WindowKeyObs(wStart: java.sql.Timestamp, wEnd: java.sql.Timestamp,
                        key: String, ts: java.sql.Timestamp)

/** A Misra-Gries counter entry. */
case class MgEntry(key: String, cnt: Long)

/** Per-window summary state: bounded counters + the window end. */
case class MgWindowState(entries: Seq[MgEntry], wEndMs: Long)

/** An emitted heavy hitter: rank 1..k within its closed window. */
case class HeavyHitter(window_start: java.sql.Timestamp, rank: Int,
                       key: String, est_count: Long)

/**
 * Streaming windowed heavy hitters with BOUNDED state — the streaming twin
 * of [[graft.agg.FrequentItems]]' Misra-Gries top-k: "what are the top
 * domains/tokens/users per hour" over an unbounded feed, with state that
 * can never grow with key cardinality.
 *
 * Why not a plain windowed `groupBy(window, key).count()`: its state is one
 * row per DISTINCT key per open window — a web-scale token/domain stream
 * makes that unbounded. Here each open window holds exactly `capacity`
 * counters (the classic Misra-Gries summary), merged per micro-batch with
 * the MERGEABLE-summaries rule (Agarwal et al. 2012): exact counts within
 * the batch, elementwise sum into the state, then subtract the
 * (capacity+1)-th largest count and drop non-positives. Every step is a
 * pure function of MULTISETS — intra-batch row order can never change the
 * result, so a deterministic replay (the [[StreamHarness]] batching)
 * reproduces summaries bit-for-bit.
 *
 * Guarantees (sbt-pinned): estimates never exceed true counts; any key
 * with true frequency > total/(capacity+1) survives in the summary; and
 * with `capacity` at or above the window's distinct-key count the summary
 * IS the exact count table (the degenerate config the DuckDB gate replays
 * exactly — the bounded-capacity behavior is pinned in sbt where the MG
 * bounds, not hash equality, are the contract).
 *
 * Emission: a window's top `k` (count desc, key asc) rows emit ONCE, when
 * the watermark passes the window end (event-time timeout) — append-mode
 * discipline, state removed on emit.
 */
object StreamingTopK {

  def topKeysPerWindow(df: DataFrame, key: Column, eventTimeColumn: String,
                       windowDuration: String, watermarkDelay: String,
                       k: Int, capacity: Int): Dataset[HeavyHitter] = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    val spark = df.sparkSession
    import spark.implicits._

    val obs = df
      .withWatermark(eventTimeColumn, watermarkDelay)
      .select(window(col(eventTimeColumn), windowDuration).as("w"),
        key.cast("string").as("key"), col(eventTimeColumn).as("ts"))
      .select(col("w.start").as("wStart"), col("w.end").as("wEnd"),
        col("key"), col("ts"))
      .as[WindowKeyObs]

    obs
      .groupByKey(_.wStart)
      .flatMapGroupsWithState[MgWindowState, HeavyHitter](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (wStart, rows, state) =>
          if (rows.isEmpty) {
            // timeout: the watermark passed the window end — finalize
            if (state.hasTimedOut) {
              val out = state.getOption.map { s =>
                s.entries.sortBy(e => (-e.cnt, e.key)).take(k).zipWithIndex
                  .map { case (e, i) =>
                    HeavyHitter(wStart, i + 1, e.key, e.cnt) }
              }.getOrElse(Seq.empty)
              state.remove()
              out.iterator
            } else Iterator.empty
          } else {
            // exact counts WITHIN the batch (multiset-deterministic) ...
            val batch = new scala.collection.mutable.HashMap[String, Long]
            var wEndMs = 0L
            rows.foreach { r =>
              batch.update(r.key, batch.getOrElse(r.key, 0L) + 1L)
              wEndMs = r.wEnd.getTime
            }
            // ... merged into the summary by elementwise sum ...
            val prev = state.getOption.map(_.entries).getOrElse(Seq.empty)
            val merged = new scala.collection.mutable.HashMap[String, Long]
            prev.foreach(e => merged.update(e.key, e.cnt))
            batch.foreach { case (kk, c) =>
              merged.update(kk, merged.getOrElse(kk, 0L) + c) }
            // ... then the mergeable-MG cut: subtract the (capacity+1)-th
            // largest count, drop non-positives (a no-op while the summary
            // fits — the exact-count degenerate case)
            val entries =
              if (merged.size <= capacity)
                merged.iterator.map { case (kk, c) => MgEntry(kk, c) }.toSeq
              else {
                val sorted = merged.toArray.sortBy { case (kk, c) => (-c, kk) }
                val t = sorted(capacity)._2
                sorted.iterator.filter(_._2 > t)
                  .map { case (kk, c) => MgEntry(kk, c - t) }.toSeq
              }
            state.update(MgWindowState(entries, wEndMs))
            state.setTimeoutTimestamp(
              math.max(wEndMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
