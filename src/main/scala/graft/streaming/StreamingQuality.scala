package graft.streaming

import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Streaming corpus-quality monitoring for document ingest pipelines: the
 * batch `corpus_quality_report` semantics over an unbounded feed, windowed
 * on event time.
 *
 * Scale design: the per-document kernels (`token_stats`, `top_ngram_stats`)
 * run stateless in the micro-batch next to the source — only
 * (window, group, 4 longs) rows reach the stateful aggregation, and the
 * watermark bounds state to the open windows. Ratios are computed from exact
 * integer sums at read-out (ratio-of-sums, not mean-of-ratios), so a window's
 * report is identical whether it was fed by one batch or fifty.
 */
object StreamingQuality {

  /**
   * Windowed per-group quality report over a document stream:
   * `(window, groupCols..., n_docs, total_tokens, stopword_ratio,
   * rep_bigram_fraction)`. `eventTimeColumn` must be a timestamp column;
   * state is pruned past `watermarkDelay`.
   */
  def qualityByWindow(
      stream: DataFrame, text: Column, eventTimeColumn: String,
      windowDuration: String, watermarkDelay: String,
      groupCols: Column*): DataFrame = {
    val st = TextFunctions.tokenStatsAscii(text, TextFunctions.EnglishStopwords)
    val g2 = TextFunctions.topNgramStats(text, 2)
    val prepared = stream
      .withWatermark(eventTimeColumn, watermarkDelay)
      .withColumn("__st", st)
      .withColumn("__g2", g2)
    val keys = window(col(eventTimeColumn), windowDuration) +: groupCols
    prepared
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__st")(0)).as("total_tokens"),
        when(sum(col("__st")(0)) === 0, lit(0.0))
          .otherwise(sum(col("__st")(3)).cast("double") / sum(col("__st")(0)).cast("double"))
          .as("stopword_ratio"),
        when(sum(col("__g2")(0)) === 0, lit(0.0))
          .otherwise(sum(col("__g2")(1)).cast("double") / sum(col("__g2")(0)).cast("double"))
          .as("rep_bigram_fraction"))
  }
}
