package graft.text

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Corpus-level frequency reports: the "what is my boilerplate" view that
 * drives line/shingle dedup thresholds and stopword lists.
 */
object CorpusStats {

  /**
   * The `k` word `n`-grams that appear in the most documents, with their
   * document frequencies: `(gram, doc_freq)`, highest first, ties broken by
   * gram text so the result is deterministic.
   *
   * Scale shape: per-document distinct shingles come from the single-pass
   * codegen'd string-shingle kernel (no interpreted HOFs); the count is one
   * hash aggregation on the gram — partial aggregation combines map-side, so
   * a boilerplate gram present in every document sends ONE row per map task
   * into the shuffle, never a row per document (heavy hitters are exactly the
   * grams this report exists to find, and exactly the ones partial
   * aggregation compresses best). The top-k is `orderBy().limit(k)`, which
   * Spark executes as TakeOrderedAndProject: per-partition bounded heaps and
   * a k-row driver merge — no global sort is ever materialized.
   *
   * When the gram TEXT is not needed (thresholding only), count
   * `hashed_word_shingles` instead: the shuffle then carries 8-byte longs.
   */
  def topNgrams(df: DataFrame, text: Column, n: Int, k: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    df.select(explode(vectors.word_shingles(text, n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram").asc)
      .limit(k)
  }
}
