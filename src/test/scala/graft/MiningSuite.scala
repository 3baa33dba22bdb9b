package graft

import graft.search.Mining
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hard-negative mining: exclusion, renumbering, dense-positive contract. */
class MiningSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val docs = Seq(
    (1L, "hash table hash table hash"),
    (2L, "hash table scan"),
    (3L, "hash join"),
    (4L, "table of contents"),
    (5L, "unrelated words entirely")).toDF("doc_id", "text")

  private val queries = Seq((0L, Seq("hash", "table"))).toDF("query_id", "terms")

  test("positives vanish and survivors renumber densely from 1") {
    val base = graft.text.Bm25.topK(docs, col("doc_id"), col("text"),
      queries, col("query_id"), col("terms"), k = 4)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val top1 = base.head
    val positives = Seq((0L, top1)).toDF("query_id", "doc_id")
    val negs = Mining.mineHardNegatives(docs, col("doc_id"), col("text"),
      queries, col("query_id"), col("terms"),
      positives, col("query_id"), col("doc_id"), k = 2, candidateFactor = 2)
      .orderBy("neg_rank").collect()
    assert(!negs.map(_.getAs[Long]("doc_id")).contains(top1))
    assert(negs.map(_.getAs[Int]("neg_rank")).toSeq == Seq(1, 2))
    // survivors keep BM25 order: rank-2 doc becomes neg_rank 1
    assert(negs.head.getAs[Long]("doc_id") == base(1))
  }

  test("positives outside the candidate pool change nothing") {
    val none = Seq((0L, 999L)).toDF("query_id", "doc_id")
    val withPos = Mining.mineHardNegatives(docs, col("doc_id"), col("text"),
      queries, col("query_id"), col("terms"),
      none, col("query_id"), col("doc_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val empty = Seq.empty[(Long, Long)].toDF("query_id", "doc_id")
    val withoutPos = Mining.mineHardNegatives(docs, col("doc_id"), col("text"),
      queries, col("query_id"), col("terms"),
      empty, col("query_id"), col("doc_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(withPos == withoutPos && withPos.nonEmpty)
  }

  test("dense positives yield fewer than k, never deeper candidates") {
    // all 4 matching docs positive -> zero negatives at factor 1
    val allPos = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("query_id", "doc_id")
    val negs = Mining.mineHardNegatives(docs, col("doc_id"), col("text"),
      queries, col("query_id"), col("terms"),
      allPos, col("query_id"), col("doc_id"), k = 4, candidateFactor = 1)
    assert(negs.count() == 0)
  }
}
