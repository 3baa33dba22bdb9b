package graft.streaming

import graft.text.Urls
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** One URL row of the capped stream. */
private[streaming] case class DomainUrl(
    domain: String, docId: Long, ts: java.sql.Timestamp)

/** Per-domain budget consumed so far (the 8-byte state record). */
private[streaming] case class DomainCount(n: Long)

/** A URL admitted under its domain's budget, with its admission rank. */
case class CappedUrl(domain: String, docId: Long, rank: Long,
                     ts: java.sql.Timestamp)

/**
 * Streaming per-domain admission cap — the unbounded-feed twin of
 * [[graft.text.Urls.capPerDomain]], for the crawl-frontier / live-ingest
 * side of the same mixture guard: one template-heavy site must not flood
 * the feed. The batch operator draws a deterministic md5-ranked sample
 * (order-free, repeatable); a stream has no "all rows" to rank over, so
 * the streaming contract is FIRST-ARRIVAL: each registrable domain admits
 * its first `maxPerDomain` documents (by event time, ties by id within a
 * micro-batch) and drops the rest.
 *
 * Scale: state is ONE 8-byte counter per domain — a domain sending a
 * billion URLs costs the same state row as one sending two. Event-time
 * timeout evicts domains idle past watermark + `stateRetentionMs`, which
 * also RESTARTS their budget — retention is the cap's window: pass a day
 * for "at most k/day per domain", or effectively-infinite retention for a
 * one-shot backfill. A counter, unlike a member list, never re-admits a
 * duplicate while the state lives, and the output carries each admitted
 * URL's rank so downstream can tighten the cap without replaying.
 */
object StreamingDomainCap {

  /**
   * Admitted URLs of a streaming feed, at most `maxPerDomain` per
   * registrable domain per retention window. `urlCol` is parsed with the
   * same kernel as the batch operator, so the two agree on what a domain
   * is. Output: `(domain, docId, rank, ts)`, rank in 1..maxPerDomain.
   */
  def capPerDomain(
      df: DataFrame,
      idCol: Column,
      urlCol: Column,
      maxPerDomain: Int,
      eventTimeColumn: String,
      delayThreshold: String,
      stateRetentionMs: Long = 24L * 3600L * 1000L): Dataset[CappedUrl] = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive, got $maxPerDomain")
    val spark = df.sparkSession
    import spark.implicits._

    val urls = df
      .withWatermark(eventTimeColumn, delayThreshold)
      .select(
        Urls.registrableDomain(urlCol).as("domain"),
        idCol.cast("long").as("docId"),
        col(eventTimeColumn).as("ts"))
      .as[DomainUrl]

    urls
      .groupByKey(_.domain)
      .flatMapGroupsWithState[DomainCount, CappedUrl](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (domain, rows, state) =>
          if (rows.isEmpty) { // retention expired: drop the counter
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.docId))
            val already = state.getOption.map(_.n).getOrElse(0L)
            val admitted = sorted.take(
              math.max(0L, maxPerDomain - already).min(Int.MaxValue).toInt)
            state.update(DomainCount(already + sorted.length))
            val maxTs = sorted.last.ts.getTime
            state.setTimeoutTimestamp(
              math.max(maxTs + stateRetentionMs, state.getCurrentWatermarkMs() + 1))
            admitted.iterator.zipWithIndex.map { case (r, i) =>
              CappedUrl(domain, r.docId, already + i + 1, r.ts)
            }
          }
      }
  }
}
