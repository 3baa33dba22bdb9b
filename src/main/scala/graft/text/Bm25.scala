package graft.text

import graft.functions.vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * BM25 sparse retrieval over a tokenized corpus — the standard lexical
 * search / decontamination-lookup scorer, with every arithmetic step exact
 * so the result is bit-identical across engines:
 *
 *  - `idf` is quantized to the integer bit-length difference
 *    `floor_log2`-style (`length(bin(N)) - length(bin(df))`) — the same
 *    libm-free trick as TF-IDF (CorpusStats) and the bigram LM.
 *  - the Robertson/Sparck-Jones saturation term
 *    `tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))` is evaluated at the
 *    classic parameters k1 = 1.2 = 6/5, b = 0.75 = 3/4 as one exact
 *    integer division: multiplying through by `20 * avgdl` gives
 *    `44 * tf * avgdl / (20 * tf * avgdl + 6 * avgdl + 18 * dl)`, scaled by
 *    `scale` and floored — BIGINT in, BIGINT out (`avgdl` itself is the
 *    floored integer `total_tokens div n_docs`).
 *  - per-(query, doc) scores are exact BIGINT sums of those contributions;
 *    the only floating-point op is the final single division by `scale`.
 *
 * Scale shape: the corpus-side posting explode is filtered against the
 * BROADCAST set of query terms BEFORE the tf shuffle, so the exchange
 * carries only query-term postings (|docs containing a query term| rows),
 * never the full token stream; df/idf and the global (N, total-token) stats
 * are tiny broadcast sides; the final per-query top-k is declared as a
 * rank-filter so Catalyst plans a map-side WindowGroupLimit.
 *
 * Overflow bound: contributions are `scale * 44 * tf * avgdl` before the
 * division — with the default `scale` = 10^6 that stays inside BIGINT while
 * `tf * avgdl < 2 * 10^11`, far past any real document.
 */
object Bm25 {

  val DefaultScale = 1000000L

  /** Exact integer division of two positive long Columns. */
  private def divFloor(num: Column, den: Column): Column =
    ((num - pmod(num, den)) / den).cast("long")

  /**
   * Top-k documents per query by BM25 (k1 = 1.2, b = 0.75, bit-length idf).
   * `queries` is `(queryId, queryTerms: array<string>)`; a term listed twice
   * in a query contributes twice (standard bag-of-words query semantics).
   * Output: `(query_id, rank, doc_id, score)` with `score` the fixed-point
   * BIGINT sum divided once by `scale`.
   */
  def topK(docs: DataFrame, docId: Column, text: Column,
           queries: DataFrame, queryId: Column, queryTerms: Column,
           k: Int, scale: Long = DefaultScale): DataFrame = {
    val toks = docs.select(docId.as("doc_id"), vectors.tokenize_ascii(text).as("toks"))
    val q = queries.select(queryId.as("query_id"), explode(queryTerms).as("term"))

    // one tiny global-stats row: corpus size and total token count
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).cast("long").as("total_tokens"))

    // postings restricted to query terms BEFORE the tf shuffle: the
    // broadcast semi-join keeps the exchange at |query-term postings| rows
    val postings = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(q.select(col("term")).distinct()), Seq("term"), "left_semi")

    // tf per (doc, term); dl rides in the group key (constant per doc)
    val tf = postings
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))

    // document frequency over matched terms only — a vocabulary-sized side
    val dfPerTerm = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val contrib = tf
      .join(broadcast(dfPerTerm), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", divFloor(col("total_tokens"), col("n_docs")))
      .withColumn("idf_bits",
        (length(bin(col("n_docs"))) - length(bin(col("df")))).cast("long"))
      .withColumn("contrib",
        col("idf_bits") * divFloor(
          lit(scale) * lit(44L) * col("tf") * col("avgdl"),
          lit(20L) * col("tf") * col("avgdl") + lit(6L) * col("avgdl") +
            lit(18L) * col("dl")))
      .select(col("term"), col("doc_id"), col("contrib"))

    val scores = broadcast(q).join(contrib, "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_scaled"))

    scores
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_scaled").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("score_scaled").cast("double") / scale).as("score"))
  }
}
