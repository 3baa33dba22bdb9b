package graft

import graft.sample.Curriculum
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curriculum ordering: exact band split, contiguous band order, shuffled
  * within-band, deterministic and salt-sensitive. */
class CurriculumSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def docs(n: Int) =
    spark.range(0, n).select(col("id"), (col("id") * 37 % 1000).as("score"))

  test("bands split by the exact integer formula, order_id is a permutation") {
    val out = Curriculum.curriculumOrder(docs(10).toDF(), col("id"),
      col("score"), bands = 4, salt = "s").collect()
    assert(out.map(_.getAs[Long]("order_id")).sorted.toSeq == (1L to 10L))
    val sizes = out.groupBy(_.getAs[Long]("band")).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 3, 1L -> 2, 2L -> 3, 3L -> 2))
  }

  test("order_id walks the bands contiguously, low band first") {
    val out = Curriculum.curriculumOrder(docs(100).toDF(), col("id"),
      col("score"), bands = 5, salt = "s")
      .orderBy("order_id").collect().map(_.getAs[Long]("band"))
    assert(out.toSeq == out.sorted.toSeq)
  }

  test("within a band the score order is shuffled, not monotone") {
    val out = Curriculum.curriculumOrder(docs(200).toDF(), col("id"),
      col("score"), bands = 2, salt = "s")
      .where(col("band") === 0).orderBy("order_id")
      .collect().map(_.getAs[Long]("score")).toSeq
    assert(out != out.sorted, "band 0 replayed the score order")
  }

  test("deterministic across runs; salt changes the within-band order") {
    def run(salt: String) = Curriculum.curriculumOrder(docs(50).toDF(),
      col("id"), col("score"), bands = 2, salt = salt)
      .orderBy("order_id").collect().map(_.getAs[Long]("id")).toSeq
    assert(run("a") == run("a"))
    assert(run("a") != run("b"))
  }

  test("existing band/order_id columns fail fast; custom names avoid it") {
    val withBand = docs(10).withColumn("band", lit(7))
    val e = intercept[IllegalArgumentException] {
      Curriculum.curriculumOrder(withBand.toDF(), col("id"), col("score"),
        bands = 2, salt = "s")
    }
    assert(e.getMessage.contains("already exist"))
    // caller-chosen output names leave the caller's own 'band' untouched
    val out = Curriculum.curriculumOrder(withBand.toDF(), col("id"),
      col("score"), bands = 2, salt = "s",
      bandCol = "cur_band", orderCol = "cur_order").collect()
    assert(out.forall(_.getAs[Int]("band") == 7))
    assert(out.map(_.getAs[Long]("cur_order")).sorted.toSeq == (1L to 10L))
    // and the permutation matches the default-named run exactly
    val dflt = Curriculum.curriculumOrder(docs(10).toDF(), col("id"),
      col("score"), bands = 2, salt = "s")
      .orderBy("order_id").collect().map(_.getAs[Long]("id")).toSeq
    val custom = out.sortBy(_.getAs[Long]("cur_order")).map(_.getAs[Long]("id")).toSeq
    assert(custom == dflt)
  }

  test("bands respect score rank: every band-0 score <= every band-1 score") {
    val out = Curriculum.curriculumOrder(docs(100).toDF(), col("id"),
      col("score"), bands = 2, salt = "s").collect()
    val b0max = out.filter(_.getAs[Long]("band") == 0L).map(_.getAs[Long]("score")).max
    val b1min = out.filter(_.getAs[Long]("band") == 1L).map(_.getAs[Long]("score")).min
    assert(b0max <= b1min)
  }
}
