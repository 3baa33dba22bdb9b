package graft.diff

import graft.SparkTest
import graft.diff.comparator.DiffComparator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import org.apache.spark.sql.{Column, Dataset, Encoders, Row}
import org.scalatest.funsuite.AnyFunSuite

case class Value(id: Int, value: Option[String])
case class Value2(id: Int, value: Option[String], extra: Option[Int])
case class DiffRow(diff: String, id: Int, left_value: Option[String], right_value: Option[String])
case class BadDiffRow(diff: String, nope: Int)

class DiffSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  lazy val left: Dataset[Value] = Seq(
    Value(1, Some("one")),
    Value(2, Some("two")),
    Value(3, Some("three"))
  ).toDS()

  lazy val right: Dataset[Value] = Seq(
    Value(1, Some("one")),
    Value(2, Some("Two")),
    Value(4, Some("four"))
  ).toDS()

  def rows(df: org.apache.spark.sql.DataFrame): Set[Row] = df.collect().toSet

  test("diff basic: N/C/D/I") {
    val result = left.diff(right, "id")
    assert(result.columns.toSeq === Seq("diff", "id", "left_value", "right_value"))
    assert(rows(result) === Set(
      Row("N", 1, "one", "one"),
      Row("C", 2, "two", "Two"),
      Row("D", 3, "three", null),
      Row("I", 4, null, "four")))
  }

  test("patchRight/patchLeft replay the diff into either snapshot exactly") {
    val d = left.diff(right, "id")
    assert(rows(Diff.patchRight(d)) === rows(right.toDF()))
    assert(rows(Diff.patchLeft(d)) === rows(left.toDF()))
    // custom prefixes and a change column round-trip too
    val opts = DiffOptions.default
      .withLeftColumnPrefix("a").withRightColumnPrefix("b")
      .withChangeColumn("changes")
    val d2 = left.diff(right, opts, "id")
    val differ = new Differ(opts)
    assert(rows(differ.patchRight(d2)) === rows(right.toDF()))
    assert(rows(differ.patchLeft(d2)) === rows(left.toDF()))
    // not a diff result -> clear error
    val e = intercept[IllegalArgumentException] {
      Diff.patchRight(left.toDF())
    }
    assert(e.getMessage.contains("diff"))
  }

  test("diff with no id columns treats all columns as id: only N/D/I") {
    val result = left.diff(right)
    assert(result.columns.toSeq === Seq("diff", "id", "value"))
    assert(rows(result) === Set(
      Row("N", 1, "one"),
      Row("D", 2, "two"),
      Row("I", 2, "Two"),
      Row("D", 3, "three"),
      Row("I", 4, "four")))
  }

  test("diff handles null values as equal") {
    val l = Seq(Value(1, None), Value(2, None)).toDS()
    val r = Seq(Value(1, None), Value(2, Some("x"))).toDS()
    assert(rows(l.diff(r, "id")) === Set(
      Row("N", 1, null, null),
      Row("C", 2, null, "x")))
  }

  test("diff with change column lists changed columns") {
    val l = Seq(Value2(1, Some("a"), Some(1)), Value2(2, Some("b"), Some(2))).toDS()
    val r = Seq(Value2(1, Some("a"), Some(9)), Value2(2, Some("B"), Some(9))).toDS()
    val options = DiffOptions.default.withChangeColumn("changes")
    val result = l.diff(r, options, "id")
    val got = result.select($"id", $"changes").as[(Int, Seq[String])].collect().toSet
    assert(got === Set((1, Seq("extra")), (2, Seq("value", "extra"))))
  }

  test("diff change column is null for I and D rows") {
    val options = DiffOptions.default.withChangeColumn("changes")
    val result = left.diff(right, options, "id")
    val byAction = result.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(byAction("D") === null)
    assert(byAction("I") === null)
  }

  test("diff side-by-side mode") {
    val options = DiffOptions.default.withDiffMode(DiffMode.SideBySide)
    val l = Seq(Value2(1, Some("a"), Some(1))).toDS()
    val r = Seq(Value2(1, Some("b"), Some(1))).toDS()
    val result = l.diff(r, options, "id")
    assert(result.columns.toSeq ===
      Seq("diff", "id", "left_value", "left_extra", "right_value", "right_extra"))
  }

  test("diff left-side and right-side modes") {
    val lOpts = DiffOptions.default.withDiffMode(DiffMode.LeftSide)
    val rOpts = DiffOptions.default.withDiffMode(DiffMode.RightSide)
    val lResult = left.diff(right, lOpts, "id")
    val rResult = left.diff(right, rOpts, "id")
    assert(lResult.columns.toSeq === Seq("diff", "id", "value"))
    assert(rows(lResult) === Set(
      Row("N", 1, "one"), Row("C", 2, "two"), Row("D", 3, "three"), Row("I", 4, null)))
    assert(rows(rResult) === Set(
      Row("N", 1, "one"), Row("C", 2, "Two"), Row("D", 3, null), Row("I", 4, "four")))
  }

  test("diff sparse mode nulls equal values") {
    val options = DiffOptions.default.withSparseMode(true)
    val result = left.diff(right, options, "id")
    assert(rows(result) === Set(
      Row("N", 1, null, null),
      Row("C", 2, "two", "Two"),
      Row("D", 3, "three", null),
      Row("I", 4, null, "four")))
  }

  test("diff with ignore columns: not compared but carried") {
    val l = Seq(Value2(1, Some("a"), Some(1)), Value2(2, Some("b"), Some(2))).toDS()
    val r = Seq(Value2(1, Some("a"), Some(99)), Value2(2, Some("x"), Some(2))).toDS()
    val result = l.diff(r, Seq("id"), Seq("extra"))
    assert(result.columns.toSeq ===
      Seq("diff", "id", "left_value", "right_value", "left_extra", "right_extra"))
    assert(rows(result) === Set(
      Row("N", 1, "a", "a", 1, 99),
      Row("C", 2, "b", "x", 2, 2)))
  }

  test("diff custom prefixes and diff values") {
    val options = DiffOptions.default
      .withDiffColumn("d").withLeftColumnPrefix("l").withRightColumnPrefix("r")
      .withInsertDiffValue("ins").withDeleteDiffValue("del")
      .withChangeDiffValue("chg").withNochangeDiffValue("eq")
    val result = left.diff(right, options, "id")
    assert(result.columns.toSeq === Seq("d", "id", "l_value", "r_value"))
    assert(result.select($"d").as[String].collect().toSet === Set("eq", "chg", "del", "ins"))
  }

  test("diffAs typed result") {
    val result: Dataset[DiffRow] = left.diffAs[DiffRow](right, "id")
    assert(result.collect().toSet === Set(
      DiffRow("N", 1, Some("one"), Some("one")),
      DiffRow("C", 2, Some("two"), Some("Two")),
      DiffRow("D", 3, Some("three"), None),
      DiffRow("I", 4, None, Some("four"))))
  }

  test("diffAs rejects unexpected encoder columns") {
    val e = intercept[IllegalArgumentException] { left.diffAs[BadDiffRow](right, "id") }
    assert(e.getMessage.contains("nope"))
  }

  test("diffWith typed tuples: null side for I/D") {
    val result = left.diffWith(right, "id").collect().toSet
    assert(result === Set(
      ("N", Value(1, Some("one")), Value(1, Some("one"))),
      ("C", Value(2, Some("two")), Value(2, Some("Two"))),
      ("D", Value(3, Some("three")), null),
      ("I", null, Value(4, Some("four")))))
  }

  test("diff fails on schema mismatch") {
    val other = Seq((1, "one", 1.0)).toDF("id", "value", "extra")
    val e = intercept[IllegalArgumentException] { left.toDF().diff(other, "id") }
    assert(e.getMessage.contains("schema"))
  }

  test("diff fails on missing id column") {
    val e = intercept[IllegalArgumentException] { left.diff(right, "nope") }
    assert(e.getMessage.contains("nope"))
  }

  test("diff fails on duplicate columns") {
    val dup = left.toDF().select($"id", $"value", $"value")
    val e = intercept[IllegalArgumentException] { dup.diff(dup, "id") }
    assert(e.getMessage.contains("duplicate"))
  }

  test("diff epsilon comparator treats close doubles as equal") {
    val l = Seq((1, 1.00), (2, 2.0), (3, 10.0)).toDF("id", "v")
    val r = Seq((1, 1.009), (2, 2.5), (3, 10.05)).toDF("id", "v")
    val options = DiffOptions.default
      .withComparator(DiffComparators.epsilon(0.01).asRelative().asInclusive(), DoubleType)
    val result = l.diff(r, options, "id")
    val actions = result.select($"id", $"diff").as[(Int, String)].collect().toMap
    assert(actions === Map(1 -> "N", 2 -> "C", 3 -> "N"))
  }

  test("diff whitespace-agnostic string comparator") {
    val l = Seq((1, "a  b"), (2, "x")).toDF("id", "v")
    val r = Seq((1, " a b "), (2, "y")).toDF("id", "v")
    val options = DiffOptions.default.withComparator(DiffComparators.string(), "v")
    val actions = l.diff(r, options, "id")
      .select($"id", $"diff").as[(Int, String)].collect().toMap
    assert(actions === Map(1 -> "N", 2 -> "C"))
  }

  test("diff duration comparator tolerates timestamp skew") {
    import java.sql.Timestamp
    val l = Seq((1, Timestamp.valueOf("2020-01-01 10:00:00")),
                (2, Timestamp.valueOf("2020-01-01 10:00:00"))).toDF("id", "t")
    val r = Seq((1, Timestamp.valueOf("2020-01-01 10:00:59")),
                (2, Timestamp.valueOf("2020-01-01 11:00:00"))).toDF("id", "t")
    val options = DiffOptions.default
      .withComparator(DiffComparators.duration(java.time.Duration.ofMinutes(1)), "t")
    val actions = l.diff(r, options, "id")
      .select($"id", $"diff").as[(Int, String)].collect().toMap
    assert(actions === Map(1 -> "N", 2 -> "C"))
  }

  test("diff map comparator") {
    val l = Seq((1, Map("a" -> 1, "b" -> 2)), (2, Map("a" -> 1))).toDF("id", "m")
    val r = Seq((1, Map("b" -> 2, "a" -> 1)), (2, Map("a" -> 2))).toDF("id", "m")
    val options = DiffOptions.default.withComparator(DiffComparators.map(), "m")
    val actions = l.diff(r, options, "id")
      .select($"id", $"diff").as[(Int, String)].collect().toMap
    assert(actions === Map(1 -> "N", 2 -> "C"))
  }

  test("diff custom equiv comparator (codegen'd Catalyst expression)") {
    // integers equivalent modulo 10
    val mod10 = new math.Equiv[Any] with Serializable {
      override def equiv(x: Any, y: Any): Boolean =
        x.asInstanceOf[Int] % 10 == y.asInstanceOf[Int] % 10
    }
    val l = Seq((1, 15), (2, 3)).toDF("id", "v")
    val r = Seq((1, 25), (2, 4)).toDF("id", "v")
    val options = DiffOptions.default
      .withComparator(DiffComparators.equiv[Any](mod10, IntegerType), "v")
    val actions = l.diff(r, options, "id")
      .select($"id", $"diff").as[(Int, String)].collect().toMap
    assert(actions === Map(1 -> "N", 2 -> "C"))
  }

  test("diff options invariants") {
    intercept[IllegalArgumentException] { DiffOptions.default.withLeftColumnPrefix("") }
    intercept[IllegalArgumentException] { DiffOptions.default.withRightColumnPrefix("left").withLeftColumnPrefix("left") }
    intercept[IllegalArgumentException] { DiffOptions.default.withInsertDiffValue("C") }
    intercept[IllegalArgumentException] { DiffOptions.default.withChangeColumn("diff") }
    intercept[IllegalArgumentException] {
      DiffOptions.default
        .withComparator(DiffComparators.epsilon(0.1), DoubleType)
        .withComparator(DiffComparators.epsilon(0.2), DoubleType)
    }
  }

  test("diff of datasets sharing lineage (self-diff variant)") {
    val base = spark.range(5).select($"id", ($"id" * 2).as("v"))
    val l = base.filter($"id" < 4)
    val r = base.filter($"id" > 0).withColumn("v", when($"id" === 2, lit(-1L)).otherwise($"v"))
    val result = l.diff(r, "id")
    val actions = result.select($"id", $"diff").as[(Long, String)].collect().toMap
    assert(actions === Map(0L -> "D", 1L -> "N", 2L -> "C", 3L -> "N", 4L -> "I"))
  }
}
