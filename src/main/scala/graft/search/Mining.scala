package graft.search

import graft.text.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Hard-negative mining — the training-data op behind every dense-retriever
 * / embedding-model recipe (DPR, Karpukhin et al. 2020; sentence-encoder
 * contrastive training): for each training query, the corpus documents a
 * LEXICAL ranker scores highest that are NOT known positives. Those are
 * the "hard" negatives — near the decision boundary, so gradients carry
 * signal random negatives lack.
 *
 * Plan shape: candidates come from [[graft.text.Bm25.topK]] at
 * `k * candidateFactor` (postings restricted to query terms BEFORE the tf
 * shuffle; WindowGroupLimit top-k), positives leave via a hash anti-join
 * on (query_id, doc_id), and survivors re-rank per query over the bounded
 * `k * candidateFactor` remainder — nothing here scales with corpus size
 * beyond the BM25 posting scan itself.
 *
 * Contract: if more than `(candidateFactor - 1) * k` of a query's top
 * candidates are positives, fewer than `k` negatives come back for that
 * query (mine wider with a larger `candidateFactor` rather than silently
 * reaching deeper than requested).
 */
object Mining {

  /**
   * Per-query hard negatives `(query_id, neg_rank, doc_id, score)`:
   * BM25 top `k * candidateFactor` minus `positives`, re-ranked 1..k.
   */
  def mineHardNegatives(corpus: DataFrame, docId: Column, text: Column,
                        queries: DataFrame, queryId: Column, queryTerms: Column,
                        positives: DataFrame, posQueryId: Column, posDocId: Column,
                        k: Int, candidateFactor: Int = 2): DataFrame = {
    require(k >= 1 && candidateFactor >= 1,
      s"need k >= 1 and candidateFactor >= 1: $k, $candidateFactor")
    val ranked = Bm25.topK(corpus, docId, text, queries, queryId, queryTerms,
      k * candidateFactor)
    val pos = positives.select(posQueryId.as("query_id"), posDocId.as("doc_id"))
    ranked
      .join(pos, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rank"))))
      .filter(col("neg_rank") <= k)
      .select(col("query_id"), col("neg_rank"), col("doc_id"), col("score"))
  }
}
