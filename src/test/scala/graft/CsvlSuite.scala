package graft

import graft.sources.Csvl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Validated CSV ingest: clean/quarantine split and dialect options. */
class CsvlSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def parse(lines: String*) =
    Csvl.parseLines(lines.toDF("value"), col("value"), schema)

  test("clean lines parse; type mismatch flags the record") {
    val parsed = parse("1,a,1.5", "2,b,2.0", "x,c,3.0")
    val good = Csvl.good(parsed).orderBy("id").collect()
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val bad = Csvl.quarantine(parsed).collect().map(_.getString(0)).toSet
    assert(bad == Set("x,c,3.0"))
  }

  test("arity mismatch flags the record (CSV is positional)") {
    // unlike JSONL (absent keys are null and clean), a CSV line with
    // missing trailing fields IS malformed — pinned
    val parsed = parse("5,e")
    assert(Csvl.good(parsed).count() == 0)
    assert(Csvl.quarantine(parsed).collect().map(_.getString(0)).toSeq ==
      Seq("5,e"))
  }

  test("quoted separators respect the dialect options") {
    val parsed = Csvl.parseLines(
      Seq("7|\"x|y\"|0.5").toDF("value"), col("value"), schema,
      Map("sep" -> "|"))
    val g = Csvl.good(parsed).collect()
    assert(g.length == 1 && g(0).getString(1) == "x|y")
  }

  test("readValidated splits a file, plan stays narrow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvl").toString
    val f = new java.io.PrintWriter(s"$dir/d.csv")
    f.println("1,a,1.0"); f.println("oops,b,2.0"); f.close()
    val parsed = Csvl.readValidated(spark, s"$dir/d.csv", schema)
    assert(Csvl.good(parsed).count() == 1)
    assert(Csvl.quarantine(parsed).count() == 1)
    assert(!Csvl.good(parsed).queryExecution.executedPlan.toString
      .contains("Exchange"))
  }
}
