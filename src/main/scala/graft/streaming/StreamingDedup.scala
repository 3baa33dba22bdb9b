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
   * Keep the first row per CANONICAL URL within the watermark horizon —
   * the streaming twin of [[graft.text.Urls.dedupByCanonicalUrl]]: a crawl
   * feed re-fetches the same page under scheme/www/tracking-param variants,
   * and URL-level dedup upstream of text processing is the cheapest drop in
   * the whole pipeline. State is keyed by xxhash64 of the canonical form
   * (8-byte keys, like the text variant) — NOT the normalized-text
   * fingerprint, whose lowercasing would merge case-distinct paths the
   * canonicalization deliberately preserves.
   */
  def dropDuplicateUrlsWithinWatermark(
      df: DataFrame, urlCol: Column, eventTimeColumn: String,
      delayThreshold: String): DataFrame = {
    val fp = "__graft_url_fp"
    df.withColumn(fp, xxhash64(graft.text.Urls.canonicalizeUrl(urlCol)))
      .withWatermark(eventTimeColumn, delayThreshold)
      .dropDuplicatesWithinWatermark(fp)
      .drop(fp)
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
