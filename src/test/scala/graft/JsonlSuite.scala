package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Validated JSONL ingest: clean/quarantine split, type-mismatch flagging,
  * schema-evolution semantics, narrow plan. */
class JsonlSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def parse(lines: String*) =
    Jsonl.parseLines(lines.toDF("value"), col("value"), schema)

  test("clean lines parse, malformed lines land verbatim in quarantine") {
    val parsed = parse(
      """{"id": 1, "name": "a", "score": 1.5}""",
      """{"id": 2, "name": "b"}""",
      """{"id": 3, "name": "c", "score": 2.0""", // truncated
      """not json at all""")
    val good = Jsonl.good(parsed).orderBy("id").collect()
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(good(1).isNullAt(2)) // missing field -> null, still clean
    val bad = Jsonl.quarantine(parsed).collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"id": 3, "name": "c", "score": 2.0""",
      "not json at all"))
  }

  test("a type-mismatched field flags the record (no silent null)") {
    val parsed = parse("""{"id": "notanumber", "name": "x", "score": 1.0}""")
    assert(Jsonl.good(parsed).count() == 0)
    assert(Jsonl.quarantine(parsed).count() == 1)
  }

  test("extra fields are ignored and stay clean") {
    val parsed = parse("""{"id": 9, "name": "y", "score": 0.5, "extra": [1]}""")
    assert(Jsonl.good(parsed).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("readValidated round-trips a file and the split is narrow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val f = new java.io.PrintWriter(s"$dir/data.jsonl")
    f.println("""{"id": 1, "name": "a", "score": 1.0}""")
    f.println("""broken {""")
    f.close()
    val parsed = Jsonl.readValidated(spark, s"$dir/data.jsonl", schema)
    assert(Jsonl.good(parsed).count() == 1)
    assert(Jsonl.quarantine(parsed).count() == 1)
    val plan = Jsonl.good(parsed).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("rejects a schema that already carries the corrupt column") {
    intercept[IllegalArgumentException] {
      Jsonl.parseLines(Seq("x").toDF("value"), col("value"),
        StructType(Seq(StructField("_corrupt_record", StringType))))
    }
  }
}
