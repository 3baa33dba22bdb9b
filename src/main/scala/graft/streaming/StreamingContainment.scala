package graft.streaming

import graft.functions.winnow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One (print, doc) membership row of a streaming document. */
private[streaming] case class PrintDoc(
    print: Long, docId: Long, ts: java.sql.Timestamp)

/** A later document colliding with a print's first owner. */
case class ContainmentCandidate(
    print: Long, docId: Long, firstDocId: Long, ts: java.sql.Timestamp)

/**
 * Streaming excerpt/containment candidate detection — the unbounded-feed
 * twin of [[graft.dedup.Containment.containmentPairs]], sharing its
 * winnowing selection ([[graft.functions.WinnowKernels]]): a feed document
 * that re-publishes an excerpt of an earlier document shares a selected
 * print with it (guaranteed for any shared run >= window + shingleSize - 1
 * tokens), so collision against the print's FIRST owner flags it within
 * one micro-batch of arrival.
 *
 * Same state discipline as [[StreamingNearDup]]: state is keyed by print
 * and holds ONE 16-byte record (first docId + timestamp) — a boilerplate
 * print shared by millions of feed docs costs one state row; event-time
 * timeout evicts prints idle past the watermark + retention. Output is the
 * CANDIDATE stream; exact containment verification joins full shingle sets
 * per micro-batch downstream (candidates are a small fraction of the feed,
 * so the verify join is cheap; a false candidate costs verification only,
 * never correctness).
 *
 * Like the batch operator, "first owner" is deterministic under ordered
 * replay: within a micro-batch, documents are processed in (ts, docId)
 * order.
 */
object StreamingContainment {

  def winnowCandidates(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      eventTimeColumn: String,
      delayThreshold: String,
      shingleSize: Int = 3,
      window: Int = 4,
      stateRetentionMs: Long = 3600L * 1000L): Dataset[ContainmentCandidate] = {
    val spark = df.sparkSession
    import spark.implicits._

    val prints = df
      .withWatermark(eventTimeColumn, delayThreshold)
      .select(
        idCol.cast("long").as("docId"),
        col(eventTimeColumn).as("ts"),
        explode(winnow.winnowed_shingles(textCol, shingleSize, window)).as("print"))
      .as[PrintDoc]

    prints
      .groupByKey(_.print)
      .flatMapGroupsWithState[BucketState, ContainmentCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (print, docs, state) =>
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
            val maxTs = sorted.last.ts.getTime
            state.setTimeoutTimestamp(
              math.max(maxTs + stateRetentionMs, state.getCurrentWatermarkMs() + 1))
            later.iterator.map(d =>
              ContainmentCandidate(print, d.docId, first.firstDocId, d.ts))
          }
      }
  }
}
