package graft.streaming

import graft.functions.vectors
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One (band, bucket) membership row of a streaming document. */
private[streaming] case class BucketDoc(
    band: Int, bucket: Long, docId: Long, ts: java.sql.Timestamp)

/** First document ever seen in a bucket (the 16-byte state record).
  * `firstTsMs == CorpusSeedMs` marks a bucket seeded from a reference
  * corpus ([[StreamingNearDup.minHashCandidatesSeeded]]) — permanent state,
  * never evicted. */
private[streaming] case class BucketState(firstDocId: Long, firstTsMs: Long)

private[streaming] object BucketState {
  /** Sentinel timestamp of corpus-seeded state (no real event carries it). */
  val CorpusSeedMs: Long = Long.MinValue
}

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

  /**
   * Bucket-first table of an EXISTING batch corpus — the seed for
   * [[minHashCandidatesSeeded]]. Same kernel, same (band, bucket)
   * definition as the stream side; per bucket the smallest corpus id owns
   * (deterministic, order-independent min aggregate — map-side combined,
   * so the exchange carries one row per bucket per task). Output:
   * `(band, bucket, firstDocId)`. Write it to parquet once per corpus
   * snapshot; its row count is the corpus's distinct-bucket count, NOT its
   * document count.
   */
  def corpusBucketFirst(
      corpus: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, bands: Int = 16, rowsPerBand: Int = 8): DataFrame =
    corpus
      .select(
        idCol.cast("long").as("docId"),
        posexplode(vectors.minhash_band_hashes(
          TextFunctions.hashedTextShingles(textCol, shingleSize), bands, rowsPerBand))
          .as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(min(col("docId")).as("firstDocId"))

  /**
   * [[minHashCandidates]] bootstrapped from an existing corpus — THE
   * production shape for deduplicating an unbounded feed against a 100 TB
   * curated corpus: the corpus is never replayed through the stream.
   * Instead its bucket-first table ([[corpusBucketFirst]], computed batch-
   * side once per corpus snapshot) seeds the state store via the
   * `initialState` hook, so the first micro-batch already collides new
   * documents against every corpus bucket.
   *
   * State discipline: corpus-seeded buckets are PERMANENT (they represent
   * the reference corpus — bounded by its distinct-bucket count, a known
   * quantity); buckets first created by the stream get the usual
   * watermark + retention eviction. A seeded bucket's first-doc never
   * changes — stream docs colliding with it are flagged against the CORPUS
   * owner, exactly what dedup-against-reference means.
   *
   * `seed` must be the output of [[corpusBucketFirst]] (or a parquet
   * round-trip of it): columns `band`, `bucket`, `firstDocId`.
   */
  def minHashCandidatesSeeded(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      eventTimeColumn: String,
      delayThreshold: String,
      seed: DataFrame,
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

    val initial = seed
      .select(col("band").cast("int"), col("bucket").cast("long"),
        col("firstDocId").cast("long"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .mapValues(r => BucketState(r._3, BucketState.CorpusSeedMs))

    buckets
      .groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout, initial) {
        case ((band, bucket), docs, state) =>
          if (docs.isEmpty) {
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
            // corpus-seeded buckets never time out (no timeout set => the
            // EventTimeTimeout never fires for the key); stream-created
            // buckets evict past watermark + retention as usual
            if (first.firstTsMs != BucketState.CorpusSeedMs) {
              val maxTs = sorted.last.ts.getTime
              state.setTimeoutTimestamp(
                math.max(maxTs + stateRetentionMs, state.getCurrentWatermarkMs() + 1))
            }
            later.iterator.map(d =>
              NearDupCandidate(band, bucket, d.docId, first.firstDocId, d.ts))
          }
      }
  }
}
