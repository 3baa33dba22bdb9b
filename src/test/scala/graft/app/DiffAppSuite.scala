package graft.app

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class DiffAppSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  def writeCsv(rows: Seq[(Int, String)], dir: String): Unit =
    rows.toDF("id", "value").write.mode("overwrite").option("header", "true").csv(dir)

  test("parse handles the full option surface") {
    val c = DiffApp.parse(Seq(
      "--format", "csv", "--id", "id", "--ignore", "x",
      "--filter", "C", "--filter", "D",
      "--left-option", "header=true", "--save-mode", "overwrite",
      "--diff-column", "action", "--sparse", "--mode", "sidebyside",
      "left.csv", "right.csv", "out.csv"))
    assert(c.format === "csv" && c.ids === Seq("id") && c.ignore === Seq("x"))
    assert(c.filter === Seq("C", "D") && c.leftOptions === Map("header" -> "true"))
    assert(c.options.diffColumn === "action" && c.options.sparseMode)
    assert(c.options.diffMode === graft.diff.DiffMode.SideBySide)
    assert(c.left === "left.csv" && c.right === "right.csv" && c.output === "out.csv")
  }

  test("parse rejects unknown options and missing positionals") {
    intercept[IllegalArgumentException] { DiffApp.parse(Seq("--nope", "a", "b", "c")) }
    intercept[IllegalArgumentException] { DiffApp.parse(Seq("a", "b")) }
  }

  test("end-to-end csv diff with filter and statistics") {
    val base = Files.createTempDirectory("graft-app").toString
    writeCsv(Seq(1 -> "one", 2 -> "two", 3 -> "three"), s"$base/left")
    writeCsv(Seq(1 -> "one", 2 -> "TWO", 4 -> "four"), s"$base/right")

    val common = Seq("--format", "csv",
      "--left-option", "header=true", "--right-option", "header=true",
      "--left-option", "inferSchema=true", "--right-option", "inferSchema=true",
      "--output-option", "header=true",
      "--id", "id", "--save-mode", "overwrite")

    DiffApp.run(spark, DiffApp.parse(common ++ Seq(s"$base/left", s"$base/right", s"$base/out")))
    val out = spark.read.option("header", "true").csv(s"$base/out")
    assert(out.count() === 4)
    assert(out.columns.toSeq === Seq("diff", "id", "left_value", "right_value"))

    DiffApp.run(spark, DiffApp.parse(common ++ Seq("--filter", "C",
      s"$base/left", s"$base/right", s"$base/filtered")))
    val filtered = spark.read.option("header", "true").csv(s"$base/filtered")
    assert(filtered.count() === 1)

    DiffApp.run(spark, DiffApp.parse(common ++ Seq("--statistics",
      s"$base/left", s"$base/right", s"$base/stats")))
    val stats = spark.read.option("header", "true").csv(s"$base/stats")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats === Map("C" -> "1", "D" -> "1", "I" -> "1", "N" -> "1"))
  }
}
