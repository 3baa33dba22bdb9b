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

  // --- margin-based aligned-pair mining -------------------------------------

  // two 2-D corpora with two obvious directions: l0/r0 point along +x,
  // l1/r1 along +y; l2 sits between, slightly x-leaning
  private def leftVecs = Seq(
    (0L, Seq(1.0f, 0.1f)), (2L, Seq(0.8f, 0.6f)), (4L, Seq(0.1f, 1.0f))
  ).toDF("id", "vec")
  private def rightVecs = Seq(
    (1L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f))
  ).toDF("id", "vec")

  test("mineAlignedPairs pairs each direction and is mutual-best") {
    val got = Mining.mineAlignedPairs(
      leftVecs, col("id"), col("vec"), rightVecs, col("id"), col("vec"),
      k = 2, minMargin = 0.0)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    // l0 <-> r1 (both +x), l4 <-> r3 (both +y); l2 loses both mutual races
    assert(got === Set((0L, 1L), (4L, 3L)))
  }

  test("minMargin threshold drops pairs; margins are finite and > 0 here") {
    val all = Mining.mineAlignedPairs(
      leftVecs, col("id"), col("vec"), rightVecs, col("id"), col("vec"),
      k = 2, minMargin = 0.0).select("margin").as[Double].collect()
    assert(all.nonEmpty && all.forall(m => m > 0 && !m.isNaN))
    val none = Mining.mineAlignedPairs(
      leftVecs, col("id"), col("vec"), rightVecs, col("id"), col("vec"),
      k = 2, minMargin = all.max + 1.0)
    assert(none.count() == 0)
  }

  test("crossTopK has no self-exclusion across id spaces") {
    // same id on both sides must still pair (different corpora)
    val l = Seq((7L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val r = Seq((7L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val nn = Mining.crossTopK(l, col("id"), col("vec"),
      r, col("id"), col("vec"), k = 1).collect()
    assert(nn.length == 1 && nn.head.getLong(2) == 7L)
  }

  test("float path and int8 referee agree on pair selection (gate shape)") {
    // the mined_pairs gate runs the int8 tier; the float path must pick
    // the same mutual-best pairs on well-separated data
    def nn8(q: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      graft.ann.Ann.int8BruteForceTopK(q, c,
        col("id"), col("vec"), col("id"), col("vec"), k = 2)
        .withColumnRenamed("cosine_q8", "cosine")
    val viaInt8 = Mining.alignedPairsFromNeighbors(
      nn8(leftVecs, rightVecs), nn8(rightVecs, leftVecs), k = 2, minMargin = 0.0)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val viaFloat = Mining.mineAlignedPairs(
      leftVecs, col("id"), col("vec"), rightVecs, col("id"), col("vec"),
      k = 2, minMargin = 0.0)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(viaInt8 === viaFloat)
  }

  test("coverage contract: a neighbor without its own neighborhood fails fast") {
    val fwd = Seq((1L, 1, 10L, 0.9), (1L, 2, 11L, 0.8))
      .toDF("query_id", "rank", "neighbor_id", "cosine")
    val bwd = Seq((10L, 1, 1L, 0.9)) // 11 never appears as a backward query
      .toDF("query_id", "rank", "neighbor_id", "cosine")
    val e = intercept[IllegalArgumentException] {
      Mining.alignedPairsFromNeighbors(fwd, bwd, k = 2).collect()
    }
    assert(e.getMessage.contains("no backward neighborhood"))
  }

  test("queries with fewer than k neighbors use their true count, not k") {
    // one-neighbor-each corpora: margin must be cos/((cos+cos)/2) = 1.0
    // exactly; a fixed 2k divisor at k=4 would deflate it to 0.25
    val fwd = Seq((1L, 1, 10L, 0.5)).toDF("query_id", "rank", "neighbor_id", "cosine")
    val bwd = Seq((10L, 1, 1L, 0.5)).toDF("query_id", "rank", "neighbor_id", "cosine")
    val m = Mining.alignedPairsFromNeighbors(fwd, bwd, k = 4, minMargin = 0.0)
      .select("margin").as[Double].head()
    assert(m == 1.0, s"margin $m")
  }

  test("non-positive neighborhood mass yields null margin, ranked last") {
    // orthogonal-ish junk: one left vec whose only neighbors have cos <= 0
    val l = Seq((0L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val r = Seq((1L, Seq(-1.0f, 0.0f)), (3L, Seq(0.0f, -1.0f))).toDF("id", "vec")
    val pairs = Mining.mineAlignedPairs(
      l, col("id"), col("vec"), r, col("id"), col("vec"), k = 2, minMargin = 0.0)
    // margin is null for every candidate -> >= threshold never holds
    assert(pairs.count() == 0)
  }
}
