package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ranked-list fusion for hybrid retrieval — the standard way to combine a
 * lexical ranking ([[graft.text.Bm25]]) with a vector ranking
 * ([[graft.ann.Ann]] / [[graft.ann.Pq]]) without score calibration.
 *
 * Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009): each input
 * list contributes `1 / (k0 + rank)` per (query, document); documents are
 * re-ranked by the summed contribution. Scores from different systems never
 * mix — only ranks do — which is why RRF needs no normalization.
 *
 * Arithmetic is exact: each contribution is the floored integer
 * `scale / (k0 + rank)` and the fused score an exact BIGINT sum, so results
 * are bit-identical across engines (the fixed-point discipline of
 * [[graft.text.Bm25]] / TF-IDF / the bigram LM).
 *
 * Scale shape: the inputs are already per-query top-k lists —
 * |queries| * k * #lists rows, NOT corpus-sized — so the one fusion shuffle
 * (the groupBy on (query, doc)) is tiny by construction and map-side
 * combined; the final per-query top-k is declared as a rank filter so
 * Catalyst plans a map-side WindowGroupLimit.
 */
object Retrieval {

  /** The SIGIR-2009 default. */
  val DefaultRrfK0 = 60

  val DefaultRrfScale = 1000000L

  /** Exact integer division of two positive long Columns. */
  private def divFloor(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
    ((num - pmod(num, den)) / den).cast("long")

  /**
   * Fuse ranked lists by reciprocal-rank fusion. Every input must carry
   * `(query_id, doc_id, rank)` (rank 1-based; extra columns are ignored) —
   * rename upstream columns to this contract (e.g. the ANN family's
   * `neighbor_id` to `doc_id`). A document missing from a list simply gets
   * no contribution from it. Output: `(query_id, rank, doc_id, rrf_scaled)`
   * with `rrf_scaled` the exact BIGINT fixed-point score and ties broken by
   * doc id ascending.
   */
  def rrfFuse(lists: Seq[DataFrame], k: Int,
              k0: Int = DefaultRrfK0, scale: Long = DefaultRrfScale): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    require(scale > 0, s"scale must be positive, got $scale")
    val contributions = lists
      .map(_.select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .select(col("query_id"), col("doc_id"),
        divFloor(lit(scale), lit(k0.toLong) + col("rank")).as("__rrf"))
    contributions
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__rrf")).as("rrf_scaled"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_scaled").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_scaled"))
  }
}
