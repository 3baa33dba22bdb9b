package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Streaming counterpart of [[graft.pipeline.Curation]]: the curation pass an
 * unbounded ingest feed can legally run inside a Structured Streaming
 * micro-batch.
 *
 * Stage mapping vs the batch pass:
 *  - language id, quality rules, classifier, hash sampling — STATELESS
 *    narrow filters (identical kernels and semantics to the batch stages,
 *    so a document passes the stream iff it passes the batch pass);
 *  - decontamination — the broadcast-exact variant
 *    ([[StreamingDecontaminate]]): the blocklist is a bounded sorted long
 *    array shipped once per executor, the probe a codegen'd narrow filter;
 *  - exact dedup — the only STATEFUL stage: keep-first per normalized-text
 *    fingerprint with watermark-bounded 8-byte state
 *    (`dropDuplicatesWithinWatermark`), the only sustainable mode for an
 *    unbounded feed.
 *
 * MinHash near-dup keep-first is deliberately NOT in this composition: its
 * keep-first decision needs the whole duplicate set (a later doc can pair
 * with any earlier one), which no bounded-state stream can answer exactly —
 * use [[StreamingNearDup]] to flag candidates against watermark-bounded
 * bucket state, or run the batch pass over closed windows.
 *
 * Every per-document filter decision (langid, quality, decontamination,
 * sampling) is identical to the batch stage. The dedup differs in two
 * declared ways: its keep-first horizon is watermark-bounded (vs
 * corpus-global), and it runs LAST — after decontamination/sampling — so
 * only documents that will actually be emitted occupy state. Running dedup
 * last also means a duplicate whose earlier copy was filtered out still
 * flows through (the earlier copy never reached the state store), whereas
 * the batch pass dedups before decontaminating and so drops it; for an
 * ingest feed, keeping a clean copy when its duplicate was dirty is the
 * behavior you want.
 */
object StreamingCurate {

  def curateStream(
      stream: DataFrame, id: Column, text: Column,
      eventTimeColumn: String, delayThreshold: String,
      keepLangs: Set[String] = Set("en"),
      minTokens: Int = 50, maxTokens: Int = 100000,
      minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 10.0,
      minStopwordRatio: Double = 0.02, maxTopBigramFraction: Double = 0.18,
      classifierWeights: Option[Array[Int]] = None,
      classifierBias: Long = 0L, classifierThreshold: Long = 0L,
      blocklist: Option[(DataFrame, Column)] = None,
      blocklistShingleSize: Int = 5, minOverlap: Int = 1,
      sampleRate: Double = 1.0, sampleSalt: String = "graft"): DataFrame = {
    require(stream.isStreaming, "curateStream expects a streaming DataFrame; " +
      "use Curation.curate for batch frames (same stages plus near-dup dedup)")
    require(sampleRate > 0.0 && sampleRate <= 1.0, s"sampleRate must be in (0, 1]: $sampleRate")

    var cur = stream

    if (keepLangs.nonEmpty)
      cur = cur.filter(
        graft.text.TextFunctions.langId(text, graft.text.TextFunctions.AsciiTokenPattern)
          .isin(keepLangs.toSeq: _*))

    cur = graft.text.QualityFilters.gopherFilter(
      cur, text, minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
      minStopwordRatio, maxTopBigramFraction)

    // the model filter is one fused kernel pass — stateless, so the stream
    // decision is identical to the batch stage's
    classifierWeights.foreach { w =>
      cur = graft.text.Classifier.filterByScore(
        cur, text, w, classifierBias, classifierThreshold)
    }

    blocklist.foreach { case (bdf, btext) =>
      cur = StreamingDecontaminate.decontaminateStream(
        cur, text, bdf, btext, blocklistShingleSize, minOverlap)
    }

    if (sampleRate < 1.0)
      cur = graft.sample.Sampling.hashSample(cur, id, sampleRate, sampleSalt)

    // stateful stage last: every earlier filter shrinks what reaches the
    // state store
    StreamingDedup.dropDuplicateTextsWithinWatermark(
      cur, text, eventTimeColumn, delayThreshold)
  }
}
