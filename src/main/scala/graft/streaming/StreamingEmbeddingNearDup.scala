package graft.streaming

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One (band, bucket) membership row of a streaming embedding. */
private[streaming] case class VecBucketDoc(
    band: Int, bucket: Long, docId: Long, ts: java.sql.Timestamp, vec: Seq[Float])

/** First embedding ever seen in a bucket (state: 16 bytes + the vector). */
private[streaming] case class VecBucketState(
    firstDocId: Long, firstTsMs: Long, vec: Seq[Float])

/** A later embedding colliding with the bucket's first, with its EXACT
  * cosine — verification already done, no join needed downstream. */
case class EmbeddingNearDupCandidate(
    band: Int, bucket: Long, docId: Long, firstDocId: Long,
    cosine: Double, ts: java.sql.Timestamp)

/**
 * Streaming embedding near-dup detection — the unbounded-feed twin of
 * [[graft.dedup.Dedup.nearDupPairsEmbeddingLsh]], using the same seeded
 * hyperplane-LSH band buckets, so a pair flagged here is exactly a pair the
 * batch operator would bucket together.
 *
 * Unlike the MinHash streaming twin (whose exact-Jaccard verify needs the
 * shingle sets, hence a per-batch join), the verifier input here IS the
 * state: the bucket's first vector. The exact cosine is computed inside the
 * state function and thresholded before emission — candidates leave the
 * operator already verified.
 *
 * State shape for an unbounded feed: one record per (band, bucket) holding
 * the FIRST embedding (16 bytes + dim×4) — a degenerate hot bucket costs
 * one vector no matter how many documents hash into it; event-time timeout
 * evicts buckets idle past watermark + `stateRetentionMs`, bounding total
 * state by the distinct buckets of the retention window. At dim=1024
 * that is ~4 KB per live bucket — size `bits` so the bucket space keeps
 * the live-bucket count in check.
 */
object StreamingEmbeddingNearDup {

  def embeddingCandidates(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      eventTimeColumn: String,
      delayThreshold: String,
      dim: Int,
      threshold: Double,
      bands: Int = 16,
      bits: Int = 12,
      seed: Long = 42,
      stateRetentionMs: Long = 3600L * 1000L): Dataset[EmbeddingNearDupCandidate] = {
    val spark = df.sparkSession
    import spark.implicits._

    val planes = graft.ann.Ann.hyperplanes(bands, bits, dim, seed)
    val buckets = df
      .withWatermark(eventTimeColumn, delayThreshold)
      .select(
        idCol.cast("long").as("docId"),
        col(eventTimeColumn).as("ts"),
        vecCol.as("vec"),
        posexplode(vectors.lsh_band_buckets(vecCol, planes)).as(Seq("band", "bucket")))
      .as[VecBucketDoc]

    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }

    buckets
      .groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState[VecBucketState, EmbeddingNearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
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
                (VecBucketState(head.docId, head.ts.getTime, head.vec), sorted.tail)
            }
            state.update(first)
            val maxTs = sorted.last.ts.getTime
            state.setTimeoutTimestamp(
              math.max(maxTs + stateRetentionMs, state.getCurrentWatermarkMs() + 1))
            later.iterator.flatMap { d =>
              val c = cos(d.vec, first.vec)
              if (c >= threshold && d.docId != first.firstDocId)
                Some(EmbeddingNearDupCandidate(band, bucket, d.docId,
                  first.firstDocId, c, d.ts))
              else None
            }
          }
      }
  }
}
