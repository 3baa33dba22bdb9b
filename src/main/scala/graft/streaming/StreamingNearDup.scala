package graft.streaming

import graft.functions.vectors
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One (band, bucket) membership row of a streaming document. */
private[streaming] case class BucketDoc(
    band: Int, bucket: Long, docId: Long, ts: java.sql.Timestamp)

/** First document ever seen in a bucket (the 16-byte state record). */
private[streaming] case class BucketState(firstDocId: Long, firstTsMs: Long)

/** A later document colliding with the bucket's first document. */
case class NearDupCandidate(
    band: Int, bucket: Long, docId: Long, firstDocId: Long, ts: java.sql.Timestamp)

/**
 * Streaming MinHash near-dup candidate detection — the unbounded-feed twin
 * of [[graft.dedup.Dedup.minHashCandidates]], using the same fused
 * signature+band kernel and the same (band, bucket) candidate definition,
 * so a pair flagged here is exactly a pair the batch operator would bucket
 * together.
 *
 * Design for an unbounded 100 TB/day feed:
 *  - State is keyed by (band, bucket) and holds ONE 16-byte record — the
 *    first document seen in that bucket — NOT the bucket's members. A
 *    degenerate hot bucket (boilerplate) costs one state row no matter how
 *    many documents hash into it.
 *  - `flatMapGroupsWithState` with event-time timeout: buckets idle past
 *    the watermark + `stateRetention` are evicted, bounding total state by
 *    the distinct buckets of the retention window.
 *  - Output is the CANDIDATE stream (later doc vs first doc per bucket) in
 *    append mode. Exact Jaccard verification joins document shingles per
 *    micro-batch (`foreachBatch`) — candidates are a tiny fraction of the
 *    feed, so the verify join is cheap; false candidates cost verification
 *    only, never correctness. A document emits one row per colliding band;
 *    `dropDuplicates` on (docId, firstDocId) downstream if one verdict per
 *    pair is wanted.
 *
 * Within a micro-batch, documents are processed in (ts, docId) order, so
 * "first" is deterministic under replays of the same batches.
 */
object StreamingNearDup {

  /**
   * Candidate collisions of a streaming document feed. `df` must be a
   * streaming DataFrame; `eventTimeColumn` a timestamp column used for the
   * watermark (`delayThreshold`, e.g. "10 minutes"); state for a bucket is
   * dropped once the watermark passes its last activity plus
   * `stateRetentionMs`.
   */
  def minHashCandidates(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      eventTimeColumn: String,
      delayThreshold: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 8,
      stateRetentionMs: Long = 3600L * 1000L): Dataset[NearDupCandidate] = {
    val spark = df.sparkSession
    import spark.implicits._

    val buckets = df
      .withWatermark(eventTimeColumn, delayThreshold)
      .select(
        idCol.cast("long").as("docId"),
        col(eventTimeColumn).as("ts"),
        posexplode(vectors.minhash_band_hashes(
          TextFunctions.hashedTextShingles(textCol, shingleSize), bands, rowsPerBand))
          .as(Seq("band", "bucket")))
      .as[BucketDoc]

    buckets
      .groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, bucket), docs, state) =>
          if (docs.isEmpty) { // timeout fired: retention expired, drop state
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val sorted = docs.toArray.sortBy(d => (d.ts.getTime, d.docId))
            val (first, later) = state.getOption match {
              case Some(s) => (s, sorted)
              case None =>
                val head = sorted.head
                (BucketState(head.docId, head.ts.getTime), sorted.tail)
            }
            state.update(first)
            // timeout must sit past the current watermark (late-but-in-window
            // batches could otherwise compute one behind it)
            val maxTs = sorted.last.ts.getTime
            state.setTimeoutTimestamp(
              math.max(maxTs + stateRetentionMs, state.getCurrentWatermarkMs() + 1))
            later.iterator.map(d =>
              NearDupCandidate(band, bucket, d.docId, first.firstDocId, d.ts))
          }
      }
  }
}
