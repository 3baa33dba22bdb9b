package graft

import graft.agg.CountMin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch: guarantees, merge exactness, portable hashing. */
class CountMinSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def words = Seq.tabulate(500)(i => s"w${i % 37}") ++ Seq.fill(100)("hot")

  test("cms estimate is never below the true count (one-sided error)") {
    val df = words.toDF("k")
    val sketch = df.agg(CountMin.cmsSketch(col("k"), depth, width).as("sk"))
    val got = df.groupBy("k").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sketch))
      .select(col("k"), col("n"),
        CountMin.cmsEstimate(col("sk"), col("k"), depth, width).as("est"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"${r.getString(0)}: est < true")
    }
  }

  test("wide sketch with few keys is exact, including the heavy hitter") {
    val df = words.toDF("k")
    val sketch = df.agg(CountMin.cmsSketch(col("k"), depth, 4096).as("sk"))
    val got = df.groupBy("k").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sketch))
      .select(col("k"), col("n"),
        CountMin.cmsEstimate(col("sk"), col("k"), depth, 4096).as("est"))
      .collect()
    // 38 distinct keys into 4 x 4096 buckets: collisions in all 4 rows are
    // vanishingly unlikely and deterministically absent for this fixed set
    got.foreach { r => assert(r.getLong(2) == r.getLong(1)) }
    val hot = got.find(_.getString(0) == "hot").get
    assert(hot.getLong(1) == 100L)
  }

  test("sketch is partitioning-invariant (mergeable lattice)") {
    val one = words.toDF("k").coalesce(1)
      .agg(CountMin.cmsSketch(col("k"), depth, width)).head().getSeq[Long](0)
    val many = words.toDF("k").repartition(7)
      .agg(CountMin.cmsSketch(col("k"), depth, width)).head().getSeq[Long](0)
    assert(one == many)
  }

  test("bucket hashing replays through Spark's own md5 (engine-portable)") {
    val df = words.distinct.toDF("k")
    val d = 2
    val viaSql = df.select(col("k"),
      (conv(substring(md5(concat(lit(s"$d:"), col("k"))), 1, 4), 16, 10)
        .cast("long") % width).cast("int").as("b")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    df.collect().map(_.getString(0)).foreach { k =>
      val kernel = graft.agg.CountMinKernels.bucket(
        org.apache.spark.unsafe.types.UTF8String.fromString(k), d, width)
      assert(kernel == viaSql(k), s"bucket mismatch for $k")
    }
  }

  test("null keys are ignored, empty input gives an all-zero sketch") {
    val sk = Seq[Option[String]](None, None).toDF("k")
      .agg(CountMin.cmsSketch(col("k"), depth, width)).head().getSeq[Long](0)
    assert(sk.length == depth * width && sk.forall(_ == 0L))
  }
}
