package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Streaming lateness monitor — the LIVE twin of the batch watermark
 * planner ([[graft.events.Lateness]]): once a pipeline is running, "is
 * our configured watermark still right?" must be answered continuously,
 * because disorder drifts (a new upstream region, a flaky producer, a
 * backfill) and Structured Streaming drops late rows silently.
 *
 * Here lateness is measured against an explicit INGEST timestamp (the
 * Kafka/source append time every real stream carries) rather than the
 * engine's internal watermark: `lateness_us = max(0, ingest - event)` is
 * a per-row STATELESS expression in exact integer microseconds, so the
 * monitor composes as one narrow projection + one standard windowed
 * aggregation — append-mode legal, state bounded at |open windows| ×
 * |candidate delays| rows by construction, every count replayable
 * bit-for-bit by any engine. (The batch planner handles the no-ingest-
 * time case by reconstructing the watermark from arrival order; use it
 * on recorded logs, use this on the wire.)
 *
 * Output per (event-time window, candidate delay): `(window, delay_s,
 * events, dropped, max_lateness_us)` — `dropped` = events a delay-`d`
 * watermark would discard. Alert when `dropped` at the PRODUCTION delay
 * rises above its historical band.
 */
object StreamingLateness {

  /**
   * Windowed lateness report over a stream carrying both an event-time
   * and an ingest-time column. `delaysSeconds` are the candidate
   * watermark delays to score (include the production delay).
   */
  def latenessByWindow(
      stream: DataFrame, eventTimeColumn: String, ingestTime: Column,
      windowDuration: String, watermarkDelay: String,
      delaysSeconds: Seq[Long]): DataFrame = {
    require(delaysSeconds.nonEmpty, "need at least one candidate delay")
    require(delaysSeconds.forall(_ >= 0), s"delays must be >= 0: $delaysSeconds")
    stream
      .withWatermark(eventTimeColumn, watermarkDelay)
      .select(col(eventTimeColumn).as("__ts"),
        greatest(
          unix_micros(ingestTime) - unix_micros(col(eventTimeColumn)),
          lit(0L)).as("__late"))
      .select(col("__ts"), col("__late"),
        explode(lit(delaysSeconds.toArray)).as("delay_s"))
      .groupBy(window(col("__ts"), windowDuration), col("delay_s"))
      .agg(
        count(lit(1)).as("events"),
        sum(when(col("__late") > col("delay_s") * 1000000L, 1L).otherwise(0L))
          .as("dropped"),
        max(col("__late")).as("max_lateness_us"))
  }
}
