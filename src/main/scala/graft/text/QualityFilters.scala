package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Composite document-quality filters for corpus curation — the
 * Gopher/C4-style rule stack assembled from the repo's codegen'd text
 * kernels, so users get the whole filter, not just the signals.
 *
 * Everything is a per-row predicate over two single-pass kernels
 * (`token_stats`, `top_ngram_stats`) — a narrow filter pushed next to the
 * scan; at 100 TB the cost is exactly one kernel pass per document.
 */
object QualityFilters {

  /**
   * Keep-predicate in the spirit of Gopher's quality rules: token count in
   * range, mean token length in range, enough stopword mass (a proxy for
   * natural language vs tables/code), and bounded top-bigram repetition.
   * All ratios are single int/int double divisions (engine-portable).
   */
  def gopherKeep(
      text: Column,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 10.0,
      minStopwordRatio: Double = 0.02, maxTopBigramFraction: Double = 0.18): Column = {
    val st = TextFunctions.tokenStatsAscii(text, TextFunctions.EnglishStopwords)
    val g2 = TextFunctions.topNgramStats(text, 2)
    val n = st(0)
    val avgLen = st(2).cast("double") / n.cast("double")
    val stopRatio = st(3).cast("double") / n.cast("double")
    val bigramFraction = when(g2(0) === 0, lit(0.0))
      .otherwise(g2(1).cast("double") / g2(0).cast("double"))
    n >= minTokens && n <= maxTokens &&
      avgLen >= minAvgTokenLen && avgLen <= maxAvgTokenLen &&
      stopRatio >= minStopwordRatio &&
      bigramFraction <= maxTopBigramFraction
  }

  /** Apply [[gopherKeep]] as a filter. */
  def gopherFilter(
      df: DataFrame, text: Column,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 10.0,
      minStopwordRatio: Double = 0.02, maxTopBigramFraction: Double = 0.18): DataFrame =
    df.filter(gopherKeep(text, minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
      minStopwordRatio, maxTopBigramFraction))
}
