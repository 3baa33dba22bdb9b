package graft

import graft.sample.Coreset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-center greedy on int8 codes: hand-traced selection, exhaustion,
  * null exclusion, and the non-increasing radius curve. */
class CoresetSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // unit-direction 2-D vectors: codes (127,0), (0,127), (127,127), (-127,0)
  private lazy val vecs = Seq(
    (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)),
    (4L, Seq(-1f, 0f)))
    .toDF("vec_id", "embedding")

  private def select(df: org.apache.spark.sql.DataFrame, k: Int) =
    Coreset.kCenterSelect(df, col("vec_id"), col("embedding"), k)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)

  test("hand-traced farthest-first: seed, argmax, min-fold, tie-free") {
    // seed 1 (127,0); farthest is 4 (-127,0): d = 2*16129 + 2*16129;
    // then 2 (0,127) at 32258 beats 3 (127,127) at 16129
    assert(select(vecs, 3) ==
      Seq((1, 1L, 0L), (2, 4L, 64516L), (3, 2L, 32258L)))
  }

  test("k past exhaustion stops at n rows; radius curve never increases") {
    val got = select(vecs, 10)
    assert(got.map(_._2).distinct.length == 4 && got.length == 4)
    val curve = got.drop(1).map(_._3)
    assert(curve == curve.sorted.reverse, s"radius curve increased: $curve")
  }

  test("null embeddings are excluded; empty input yields an empty selection") {
    val withNull = vecs.unionAll(
      Seq((0L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    // id 0 would otherwise be the seed — exclusion changes the whole run
    assert(select(withNull, 2).map(_._2) == Seq(1L, 4L))
    assert(select(vecs.filter($"vec_id" < 0), 3).isEmpty)
  }
}
