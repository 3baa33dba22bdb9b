package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Per-group drift between two corpus snapshots — the monitoring report a
 * recurring ingestion pipeline diffs every run ("which source grew, which
 * shrank, did its token mix move"), re-expressed as exact arithmetic:
 *
 *  - each side is ONE aggregate pass with the fused token-stats kernel
 *    next to the scan (map-side combined — the shuffle carries one row
 *    per (map task, group), never documents);
 *  - the two |groups|-row aggregates meet in a full-outer join on the
 *    group key (a group present on one side only reads as 0 on the other);
 *  - counts/sums/deltas are exact BIGINTs; the per-side stopword ratios
 *    are the only doubles, each one ratio-of-sums division (the
 *    corpus-quality-report discipline), so results hash-match any engine.
 *
 * This is the diff operator's philosophy applied to corpus statistics:
 * compare snapshots without materializing either twice.
 */
object CorpusDrift {

  /**
   * Drift report, one row per group key present in either snapshot:
   * `(group, n_docs_before, n_docs_after, n_docs_delta, n_tokens_before,
   * n_tokens_after, n_tokens_delta, stopword_ratio_before,
   * stopword_ratio_after)`. `group` and `text` are unresolved column
   * expressions applied to both sides (the snapshots must share that shape).
   */
  def report(before: DataFrame, after: DataFrame,
             group: Column, text: Column,
             stopwords: Seq[String] = TextFunctions.EnglishStopwords): DataFrame = {
    def side(df: DataFrame, suffix: String): DataFrame =
      df.select(group.as("group"),
          TextFunctions.tokenStatsAscii(text, stopwords).as("__st"))
        .groupBy(col("group"))
        .agg(
          count(lit(1)).as(s"n_docs_$suffix"),
          coalesce(sum(col("__st")(0)), lit(0L)).as(s"n_tokens_$suffix"),
          coalesce(sum(col("__st")(3)), lit(0L)).as(s"__stop_$suffix"))
    val b = side(before, "before")
    val a = side(after, "after")
    def z(name: String): Column = coalesce(col(name), lit(0L))
    def ratio(stop: String, tokens: String): Column =
      when(z(tokens) === 0, lit(0.0))
        .otherwise(z(stop).cast("double") / z(tokens).cast("double"))
    b.join(a, Seq("group"), "full_outer")
      .select(
        col("group"),
        z("n_docs_before").as("n_docs_before"),
        z("n_docs_after").as("n_docs_after"),
        (z("n_docs_after") - z("n_docs_before")).as("n_docs_delta"),
        z("n_tokens_before").as("n_tokens_before"),
        z("n_tokens_after").as("n_tokens_after"),
        (z("n_tokens_after") - z("n_tokens_before")).as("n_tokens_delta"),
        ratio("__stop_before", "n_tokens_before").as("stopword_ratio_before"),
        ratio("__stop_after", "n_tokens_after").as("stopword_ratio_after"))
  }
}
