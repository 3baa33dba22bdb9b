package graft.streaming

import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Streaming deduplication for document ingest pipelines (Structured
 * Streaming). The batch dedup operators in [[graft.dedup.Dedup]] assume a
 * bounded corpus; these work on an unbounded stream.
 *
 * Scale design: state lives in the streaming state store, keyed by the
 * 64-bit normalized-text fingerprint — 8-byte keys, not documents. With a
 * watermark the state is pruned (`dropDuplicatesWithinWatermark`), which is
 * the only sustainable mode for an unbounded 100 TB/day feed; the unbounded
 * variant exists for bounded replays.
 */
object StreamingDedup {

  /** Fingerprint column used for streaming dedup state. */
  def fingerprinted(df: DataFrame, textCol: Column, fingerprintName: String = "__fp"): DataFrame =
    df.withColumn(fingerprintName, TextFunctions.fingerprint64(textCol))

  /**
   * Keep the first document per normalized-text fingerprint, forever.
   * State grows with the number of distinct documents — use the watermarked
   * variant for unbounded feeds.
   */
  def dropDuplicateTexts(df: DataFrame, textCol: Column): DataFrame = {
    val fp = "__graft_fp"
    fingerprinted(df, textCol, fp).dropDuplicates(fp).drop(fp)
  }

  /**
   * Keep the first document per fingerprint within the watermark horizon:
   * duplicates arriving within `delayThreshold` of each other are dropped,
   * state older than the watermark is evicted. `eventTimeColumn` must be a
   * timestamp column on the stream.
   */
  def dropDuplicateTextsWithinWatermark(
      df: DataFrame, textCol: Column, eventTimeColumn: String,
      delayThreshold: String): DataFrame = {
    val fp = "__graft_fp"
    fingerprinted(df, textCol, fp)
      .withWatermark(eventTimeColumn, delayThreshold)
      .dropDuplicatesWithinWatermark(fp)
      .drop(fp)
  }
}
