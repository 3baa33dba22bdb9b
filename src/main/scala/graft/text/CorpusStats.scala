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

  /**
   * The `k` most DISTINCTIVE terms of each group (source/domain/language
   * slice): TF-IDF with every number exact, so the ranking is engine-portable
   * and hash-verifiable. Term frequency is the count of group documents
   * containing the term (set semantics, from the same distinct-shingle kernel
   * as [[topNgrams]]); the IDF weight is the integer `floor(log2(N / df))`
   * computed as `length(bin(N / df)) - 1` — BIGINT division then a
   * bit-length, no libm anywhere; `score = tf * idf_bits`. Terms present in
   * most documents score 0 and fall out, which is the point.
   *
   * Scale shape: two hash aggregations over exploded `(group, term)` /
   * `(term)` rows — both combine map-side, so boilerplate terms send one row
   * per map task into each exchange, not one per document. The df table
   * (vocabulary-sized) joins back on the term key as an ordinary shuffled
   * hash join, and the final per-group top-k is a rank filter that Catalyst
   * plans as `WindowGroupLimit` (map-side partial top-k — see
   * [[graft.agg.TopK.topKPerGroup]]). Ordering ties break on term text:
   * total order, deterministic output.
   */
  def tfidfTerms(
      df: DataFrame, group: Column, text: Column, k: Int,
      rankColumn: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val docTerms = df
      .select(group.as("group_key"), explode(vectors.word_shingles(text, 1)).as("term"))
    // corpus cardinality as a broadcast 1-row join: the plan stays lazy,
    // no driver round-trip at construction time
    val nDocs = df.agg(count(lit(1)).cast("long").as("n_docs"))
    val dfCounts = docTerms
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_bits",
        (length(bin(expr("n_docs div df_docs"))) - 1).cast("long"))
      .drop("n_docs")
    val tfCounts = docTerms
      .groupBy(col("group_key"), col("term"))
      .agg(count(lit(1)).as("tf_docs"))
    val scored = tfCounts.join(dfCounts, "term")
      .withColumn("score", col("tf_docs") * col("idf_bits"))
    graft.agg.TopK.topKPerGroup(
      scored.select(
        col("group_key"), col("term"), col("tf_docs"), col("df_docs"), col("score")),
      Seq(col("group_key")),
      Seq(col("score").desc, col("term").asc),
      k, rankColumn)
  }
}
