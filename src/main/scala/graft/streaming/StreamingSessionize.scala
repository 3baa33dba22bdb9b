package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Streaming counterpart of [[graft.events.Sessionize]]: per-entity
 * inactivity-gap sessions over an unbounded event feed, built on Spark's
 * native `session_window` aggregation (dynamic-gap windows merged by the
 * stateful operator).
 *
 * Scale design: state is one open session window per active key, pruned as
 * the watermark passes each session's close; late events within the
 * watermark merge into (or bridge!) existing sessions exactly as a batch
 * recomputation would. The aggregate carries only counters and extents —
 * events themselves are never buffered.
 */
object StreamingSessionize {

  /**
   * Per-session aggregate over a stream:
   * `(key..., session_start, session_end, n_events, first_event, last_event)`
   * where a session closes after `gapDuration` of inactivity (e.g. "30
   * minutes"). Rows emit in append mode once the watermark passes the
   * session end. `eventTimeColumn` must be a timestamp column.
   */
  def sessionBounds(
      stream: DataFrame, eventTimeColumn: String,
      gapDuration: String, watermarkDelay: String,
      keys: Column*): DataFrame = {
    val grouped = session_window(col(eventTimeColumn), gapDuration) +: keys
    stream
      .withWatermark(eventTimeColumn, watermarkDelay)
      .groupBy(grouped: _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(eventTimeColumn)).as("first_event"),
        max(col(eventTimeColumn)).as("last_event"))
      .select(
        keys ++ Seq(
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("first_event"), col("last_event")): _*)
  }
}
