package graft

import graft.functions.LayoutKernels
import graft.write.{Hilbert, ZOrder}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert-curve layout: curve properties and the write path. */
class HilbertSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def hIndex(coords: Seq[Long], bits: Int): Long =
    LayoutKernels.hilbertIndex(
      new GenericArrayData(coords.map(Long.box).toArray[Any]), bits)

  test("hilbert index is a bijection on the full 2D grid") {
    val bits = 3
    val side = 1 << bits
    val all = for (x <- 0L until side; y <- 0L until side)
      yield hIndex(Seq(x, y), bits)
    assert(all.distinct.size == side * side)
    assert(all.min == 0L && all.max == side * side - 1)
  }

  test("consecutive 2D hilbert indices are unit grid steps (the locality theorem)") {
    val bits = 3
    val side = 1 << bits
    val byIndex = (for (x <- 0L until side; y <- 0L until side)
      yield hIndex(Seq(x, y), bits) -> (x, y)).sortBy(_._1).map(_._2)
    byIndex.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      val d = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(d == 1, s"non-unit step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("consecutive 3D hilbert indices are unit grid steps") {
    val bits = 2
    val side = 1 << bits
    val byIndex = (for (x <- 0L until side; y <- 0L until side; z <- 0L until side)
      yield hIndex(Seq(x, y, z), bits) -> (x, y, z)).sortBy(_._1).map(_._2)
    assert(byIndex.size == side * side * side)
    byIndex.sliding(2).foreach { case Seq((x1, y1, z1), (x2, y2, z2)) =>
      val d = math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2)
      assert(d == 1, s"non-unit step in 3D")
    }
  }

  test("morton takes diagonal jumps where hilbert does not") {
    // the z-curve's defining defect: at index 3 -> 4 (bits=2, 2D) it jumps
    // from (1,1) to (2,0) — distance 2; Hilbert never exceeds 1 (above)
    val bits = 2
    val side = 1 << bits
    val mortonByIndex = (for (x <- 0L until side; y <- 0L until side) yield {
      var m = 0L
      for (b <- 0 until bits) {
        m |= ((x >> b) & 1L) << (2 * b)
        m |= ((y >> b) & 1L) << (2 * b + 1)
      }
      m -> (x, y)
    }).sortBy(_._1).map(_._2)
    val maxStep = mortonByIndex.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxStep > 1, "morton should have at least one non-unit step")
  }

  test("hilbertOrderBy preserves content exactly and drops the key") {
    val df = (0 until 500).map(i => (i, (i * 37) % 101, (i * 53) % 97)).toDF("id", "a", "b")
    val laid = Hilbert.hilbertOrderBy(df, Seq("a", "b"), partitions = 4)
    assert(laid.columns.toSeq == Seq("id", "a", "b"))
    assert(laid.count() == 500)
    assert(laid.except(df).count() == 0 && df.except(laid).count() == 0)
  }

  test("hilbert files carry tighter or equal average bounding boxes than unsorted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hil").toString
    val df = (0 until 4000).map { i =>
      val x = (i * 2654435761L % 1024).toInt
      val y = (i * 40503L % 1024).toInt
      (i, x, y)
    }.toDF("id", "a", "b")
    Hilbert.hilbertOrderBy(df, Seq("a", "b"), partitions = 8)
      .write.mode("overwrite").parquet(s"$dir/h")
    df.repartition(8).write.mode("overwrite").parquet(s"$dir/plain")
    def avgBox(path: String): Double = {
      val stats = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(((max("a") - min("a")) * (max("b") - min("b"))).as("area"))
        .agg(avg("area")).head().getDouble(0)
      stats
    }
    val h = avgBox(s"$dir/h")
    val plain = avgBox(s"$dir/plain")
    info(s"avg per-file bbox area: hilbert=$h unsorted=$plain")
    assert(h < plain, "hilbert layout should tighten per-file ranges")
  }

  test("hilbertValue rejects bad shapes like zValue does") {
    intercept[IllegalArgumentException] {
      Hilbert.hilbertValue(Seq(col("a")), Seq(0.0), Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      Hilbert.hilbertOrderBy(Seq((1, 2)).toDF("a", "b"), Seq("a", "nope"))
    }
  }
}
