package graft.diff

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.scalatest.funsuite.AnyFunSuite

case class KV(k: Option[String], v: Option[String])
case class Wide(id: Int, a: Option[String], b: Option[Int], ign: Option[String])
case class DiffIdOnly(diff: String, id: Int)
// "similar" datasets: same compared columns, each side its own ignored column
// (reference DiffSuite Value8/Value9 fixtures)
case class MetaV(id: Int, seq: Option[Int], value: Option[String], meta: Option[String])
case class InfoV(id: Int, seq: Option[Int], value: Option[String], info: Option[String])

/**
 * Diff edge-case matrix: name collisions, case sensitivity, ignore columns ×
 * mode × sparse, null ids, empty sides, typed variants, option invariants,
 * comparator resolution. Mirrors the reference's DiffSuite matrix coverage
 * (ref src/test/scala/.../diff/DiffSuite.scala:708-2018), clean-room.
 */
class DiffMatrixSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def rows(df: DataFrame): Set[Row] = df.collect().toSet

  private lazy val wideLeft: Dataset[Wide] = Seq(
    Wide(1, Some("a1"), Some(10), Some("x")),
    Wide(2, Some("a2"), Some(20), Some("x")),
    Wide(3, Some("a3"), Some(30), Some("x"))).toDS()

  private lazy val wideRight: Dataset[Wide] = Seq(
    Wide(1, Some("a1"), Some(10), Some("y")),
    Wide(2, Some("a2!"), Some(20), Some("y")),
    Wide(4, Some("a4"), Some(40), Some("y"))).toDS()

  private def withCaseSensitive[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.caseSensitive")
    spark.conf.set("spark.sql.caseSensitive", on.toString)
    try f finally spark.conf.set("spark.sql.caseSensitive", prev)
  }

  // --------------------------------------------------------------------------
  // empty / degenerate inputs
  // --------------------------------------------------------------------------

  test("empty left: everything is an insert") {
    val l = spark.emptyDataset[KV]
    val r = Seq(KV(Some("1"), Some("x"))).toDS()
    assert(rows(l.diff(r, "k")) === Set(Row("I", "1", null, "x")))
  }

  test("empty right: everything is a delete") {
    val l = Seq(KV(Some("1"), Some("x"))).toDS()
    val r = spark.emptyDataset[KV]
    assert(rows(l.diff(r, "k")) === Set(Row("D", "1", "x", null)))
  }

  test("both empty: empty result with full diff schema") {
    val l = spark.emptyDataset[KV]
    val result = l.diff(l, "k")
    assert(result.count() === 0)
    assert(result.columns.toSeq === Seq("diff", "k", "left_v", "right_v"))
  }

  test("null id values match null-safely") {
    val l = Seq(KV(None, Some("x")), KV(Some("1"), Some("y"))).toDS()
    val r = Seq(KV(None, Some("x2")), KV(Some("1"), Some("y"))).toDS()
    assert(rows(l.diff(r, "k")) === Set(
      Row("C", null, "x", "x2"),
      Row("N", "1", "y", "y")))
  }

  test("identical datasets diff to all N") {
    val result = wideLeft.diff(wideLeft, "id")
    assert(result.select("diff").as[String].collect().forall(_ == "N"))
  }

  test("multiple id columns") {
    val l = Seq((1, "a", "v1"), (1, "b", "v2"), (2, "a", "v3")).toDF("k1", "k2", "v")
    val r = Seq((1, "a", "v1"), (1, "b", "vX"), (3, "a", "v4")).toDF("k1", "k2", "v")
    assert(rows(l.diff(r, "k1", "k2")) === Set(
      Row("N", 1, "a", "v1", "v1"),
      Row("C", 1, "b", "v2", "vX"),
      Row("D", 2, "a", "v3", null),
      Row("I", 3, "a", null, "v4")))
  }

  // --------------------------------------------------------------------------
  // output column order per mode
  // --------------------------------------------------------------------------

  test("ColumnByColumn column order interleaves left/right per value column") {
    val result = wideLeft.drop("ign").diff(wideRight.drop("ign"), "id")
    assert(result.columns.toSeq ===
      Seq("diff", "id", "left_a", "right_a", "left_b", "right_b"))
  }

  test("SideBySide column order groups all left then all right") {
    val result = wideLeft.drop("ign").diff(wideRight.drop("ign"),
      DiffOptions.default.withDiffMode(DiffMode.SideBySide), "id")
    assert(result.columns.toSeq ===
      Seq("diff", "id", "left_a", "left_b", "right_a", "right_b"))
  }

  test("LeftSide/RightSide keep unprefixed one-sided projection") {
    val lresult = wideLeft.drop("ign").diff(wideRight.drop("ign"),
      DiffOptions.default.withDiffMode(DiffMode.LeftSide), "id")
    assert(lresult.columns.toSeq === Seq("diff", "id", "a", "b"))
    val rresult = wideLeft.drop("ign").diff(wideRight.drop("ign"),
      DiffOptions.default.withDiffMode(DiffMode.RightSide), "id")
    assert(rresult.columns.toSeq === Seq("diff", "id", "a", "b"))
    // RightSide carries right values: inserted row has its values, deleted null
    assert(rows(rresult).contains(Row("I", 4, "a4", 40)))
    assert(rows(rresult).contains(Row("D", 3, null, null)))
  }

  test("change column position is right after the diff column") {
    val result = wideLeft.drop("ign").diff(wideRight.drop("ign"),
      DiffOptions.default.withChangeColumn("changes"), "id")
    assert(result.columns.toSeq ===
      Seq("diff", "changes", "id", "left_a", "right_a", "left_b", "right_b"))
  }

  // --------------------------------------------------------------------------
  // ignore columns × mode × sparse
  // --------------------------------------------------------------------------

  private def ignoreDiff(options: DiffOptions): DataFrame =
    new Differ(options).diff(wideLeft, wideRight, Seq("id"), Seq("ign"))

  test("ignore columns: ColumnByColumn carries both prefixed ignored sides") {
    val result = ignoreDiff(DiffOptions.default)
    assert(result.columns.toSeq ===
      Seq("diff", "id", "left_a", "right_a", "left_b", "right_b", "left_ign", "right_ign"))
    // ign differs everywhere but must not trigger C
    assert(rows(result.select(col("diff"), col("id"))) ===
      Set(Row("N", 1), Row("C", 2), Row("D", 3), Row("I", 4)))
  }

  test("ignore columns: SideBySide groups ignored with its side") {
    val result = ignoreDiff(DiffOptions.default.withDiffMode(DiffMode.SideBySide))
    assert(result.columns.toSeq ===
      Seq("diff", "id", "left_a", "left_b", "left_ign", "right_a", "right_b", "right_ign"))
  }

  test("ignore columns: LeftSide carries only the left ignored column, unprefixed") {
    val result = ignoreDiff(DiffOptions.default.withDiffMode(DiffMode.LeftSide))
    assert(result.columns.toSeq === Seq("diff", "id", "a", "b", "ign"))
    assert(rows(result).contains(Row("N", 1, "a1", 10, "x")))
  }

  test("ignore columns: RightSide carries only the right ignored column") {
    val result = ignoreDiff(DiffOptions.default.withDiffMode(DiffMode.RightSide))
    assert(result.columns.toSeq === Seq("diff", "id", "a", "b", "ign"))
    assert(rows(result).contains(Row("N", 1, "a1", 10, "y")))
  }

  test("sparse mode nulls equal values but keeps differing ignored values") {
    val result = ignoreDiff(DiffOptions.default.withSparseMode(true))
    // row 1: a,b equal -> nulled; ign differs (x vs y) -> kept on both sides
    assert(rows(result).contains(Row("N", 1, null, null, null, null, "x", "y")))
    // row 2: a differs -> kept; b equal -> nulled
    assert(rows(result).contains(Row("C", 2, "a2", "a2!", null, null, "x", "y")))
  }

  test("sparse mode with equal ignored values nulls them too") {
    val r2 = wideRight.withColumn("ign", lit("x")).as[Wide]
    val result = new Differ(DiffOptions.default.withSparseMode(true))
      .diff(wideLeft, r2, Seq("id"), Seq("ign"))
    assert(rows(result).contains(Row("N", 1, null, null, null, null, null, null)))
  }

  test("sparse × change column") {
    val result = new Differ(DiffOptions.default.withSparseMode(true).withChangeColumn("ch"))
      .diff(wideLeft.drop("ign"), wideRight.drop("ign"), Seq("id"), Seq.empty)
    val byId = result.collect().map(r => r.getInt(2) -> r).toMap
    assert(byId(2).getSeq[String](1) === Seq("a"))
    assert(byId(1).getSeq[String](1) === Seq.empty)
    assert(byId(4).isNullAt(1))
  }

  test("ignore columns may exist on one side only") {
    val l = Seq((1, "v", "extraL")).toDF("id", "v", "only_left")
    val r = Seq((1, "v")).toDF("id", "v")
    val result = Diff.of(l, r, Seq("id"), Seq("only_left"))
    assert(result.columns.toSeq === Seq("diff", "id", "left_v", "right_v", "left_only_left"))
    assert(rows(result) === Set(Row("N", 1, "v", "v", "extraL")))
  }

  test("all columns as id plus ignore still works") {
    val l = Seq((1, "x", "m1")).toDF("id", "v", "meta")
    val r = Seq((1, "x", "m2")).toDF("id", "v", "meta")
    val result = Diff.of(l, r, Seq.empty, Seq("meta"))
    assert(result.select("diff").as[String].collect().toSeq === Seq("N"))
  }

  // --------------------------------------------------------------------------
  // golden rows: every mode × sparse on the canonical N/C/D/I fixture
  // (reference DiffSuite:1245-1464 equivalent)
  // --------------------------------------------------------------------------

  private lazy val goldLeft =
    Seq((1, "one", 10), (2, "two", 20), (3, "three", 30)).toDF("id", "s", "n")
  private lazy val goldRight =
    Seq((1, "one", 10), (2, "two!", 20), (4, "four", 40)).toDF("id", "s", "n")

  private def gold(mode: DiffMode.DiffMode, sparse: Boolean): Set[Row] =
    rows(goldLeft.diff(goldRight,
      DiffOptions.default.withDiffMode(mode).withSparseMode(sparse), "id"))

  test("golden ColumnByColumn dense") {
    assert(gold(DiffMode.ColumnByColumn, sparse = false) === Set(
      Row("N", 1, "one", "one", 10, 10),
      Row("C", 2, "two", "two!", 20, 20),
      Row("D", 3, "three", null, 30, null),
      Row("I", 4, null, "four", null, 40)))
  }

  test("golden ColumnByColumn sparse") {
    assert(gold(DiffMode.ColumnByColumn, sparse = true) === Set(
      Row("N", 1, null, null, null, null),
      Row("C", 2, "two", "two!", null, null),
      Row("D", 3, "three", null, 30, null),
      Row("I", 4, null, "four", null, 40)))
  }

  test("golden SideBySide dense") {
    assert(gold(DiffMode.SideBySide, sparse = false) === Set(
      Row("N", 1, "one", 10, "one", 10),
      Row("C", 2, "two", 20, "two!", 20),
      Row("D", 3, "three", 30, null, null),
      Row("I", 4, null, null, "four", 40)))
  }

  test("golden SideBySide sparse") {
    assert(gold(DiffMode.SideBySide, sparse = true) === Set(
      Row("N", 1, null, null, null, null),
      Row("C", 2, "two", null, "two!", null),
      Row("D", 3, "three", 30, null, null),
      Row("I", 4, null, null, "four", 40)))
  }

  test("golden LeftSide dense") {
    assert(gold(DiffMode.LeftSide, sparse = false) === Set(
      Row("N", 1, "one", 10),
      Row("C", 2, "two", 20),
      Row("D", 3, "three", 30),
      Row("I", 4, null, null)))
  }

  test("golden LeftSide sparse nulls values equal on both sides") {
    assert(gold(DiffMode.LeftSide, sparse = true) === Set(
      Row("N", 1, null, null),
      Row("C", 2, "two", null),
      Row("D", 3, "three", 30),
      Row("I", 4, null, null)))
  }

  test("golden RightSide dense") {
    assert(gold(DiffMode.RightSide, sparse = false) === Set(
      Row("N", 1, "one", 10),
      Row("C", 2, "two!", 20),
      Row("D", 3, null, null),
      Row("I", 4, "four", 40)))
  }

  test("golden RightSide sparse nulls values equal on both sides") {
    assert(gold(DiffMode.RightSide, sparse = true) === Set(
      Row("N", 1, null, null),
      Row("C", 2, "two!", null),
      Row("D", 3, null, null),
      Row("I", 4, "four", 40)))
  }

  // --------------------------------------------------------------------------
  // name collisions
  // --------------------------------------------------------------------------

  test("diff column colliding with an id column fails") {
    val e = intercept[IllegalArgumentException] {
      wideLeft.diff(wideRight, DiffOptions.default.withDiffColumn("id"), "id")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("diff column colliding with a prefixed value column fails") {
    val e = intercept[IllegalArgumentException] {
      wideLeft.diff(wideRight, DiffOptions.default.withDiffColumn("left_a"), "id")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("change column colliding with an id column fails") {
    val e = intercept[IllegalArgumentException] {
      wideLeft.diff(wideRight, DiffOptions.default.withChangeColumn("id"), "id")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("id column colliding with a prefixed value column fails in ColumnByColumn") {
    // id "left_a" stays unprefixed; value column "a" becomes "left_a" -> clash
    val l = Seq((1, "x")).toDF("left_a", "a")
    val e = intercept[IllegalArgumentException] {
      Diff.of(l, l, Seq("left_a"), Seq.empty)
    }
    assert(e.getMessage.contains("collide"))
  }

  test("LeftSide mode tolerates names that would collide only when prefixed") {
    val l = Seq((1, "x")).toDF("left_a", "a")
    val result = Diff.of(l, l, DiffOptions.default.withDiffMode(DiffMode.LeftSide), "left_a")
    assert(result.columns.toSeq === Seq("diff", "left_a", "a"))
  }

  test("custom prefixes avoid a collision") {
    val l = Seq((1, "x")).toDF("left_a", "a")
    val opts = DiffOptions.default.withLeftColumnPrefix("lhs").withRightColumnPrefix("rhs")
    val result = Diff.of(l, l, opts, "left_a")
    assert(result.columns.toSeq === Seq("diff", "left_a", "lhs_a", "rhs_a"))
  }

  // --------------------------------------------------------------------------
  // case sensitivity
  // --------------------------------------------------------------------------

  test("case-insensitive: id columns match regardless of case") {
    withCaseSensitive(false) {
      val result = wideLeft.diff(wideRight, "ID")
      assert(result.count() === 4)
    }
  }

  test("case-sensitive: id columns must match exactly") {
    withCaseSensitive(true) {
      val e = intercept[IllegalArgumentException] {
        wideLeft.diff(wideRight, "ID")
      }
      assert(e.getMessage.contains("do not exist"))
    }
  }

  test("case-insensitive: schemas differing only by case are equal") {
    withCaseSensitive(false) {
      val l = Seq((1, "x")).toDF("id", "V")
      val r = Seq((1, "x")).toDF("id", "v")
      assert(l.diff(r, "id").count() === 1)
    }
  }

  test("case-sensitive: schemas differing only by case are NOT equal") {
    withCaseSensitive(true) {
      val l = Seq((1, "x")).toDF("id", "V")
      val r = Seq((1, "x")).toDF("id", "v")
      val e = intercept[IllegalArgumentException] { l.diff(r, "id") }
      assert(e.getMessage.contains("same schema"))
    }
  }

  test("case-insensitive: diff-column collision detected across case") {
    withCaseSensitive(false) {
      val e = intercept[IllegalArgumentException] {
        wideLeft.diff(wideRight, DiffOptions.default.withDiffColumn("ID"), "id")
      }
      assert(e.getMessage.contains("collide"))
    }
  }

  // --------------------------------------------------------------------------
  // schema errors
  // --------------------------------------------------------------------------

  test("schema mismatch lists the extra columns of both sides") {
    val l = Seq((1, "x", 1.0)).toDF("id", "v", "only_l")
    val r = Seq((1, "x", true)).toDF("id", "v", "only_r")
    val e = intercept[IllegalArgumentException] { l.diff(r, "id") }
    assert(e.getMessage.contains("only_l") && e.getMessage.contains("only_r"))
  }

  test("type mismatch on shared column fails") {
    val l = Seq((1, 1)).toDF("id", "v")
    val r = Seq((1, "1")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] { l.diff(r, "id") }
    assert(e.getMessage.contains("same schema"))
  }

  test("nullability difference does not fail the schema check") {
    val l = Seq((1, "x")).toDF("id", "v") // non-null v
    val r = Seq(KV(Some("x"), None)).toDS().toDF("id", "v")
      .withColumn("id", lit(1)).select(col("id"), col("v")) // nullable v
    assert(l.diff(r, "id").count() >= 1)
  }

  test("duplicate columns on one side fail") {
    val l = Seq((1, "x")).toDF("id", "v").select(col("id"), col("v"), col("v"))
    val e = intercept[IllegalArgumentException] { Diff.of(l, l, Seq("id"), Seq.empty) }
    assert(e.getMessage.contains("duplicate"))
  }

  test("empty schema after ignoring everything fails") {
    val l = Seq(Tuple1("x")).toDF("v")
    val e = intercept[IllegalArgumentException] { Diff.of(l, l, Seq.empty, Seq("v")) }
    assert(e.getMessage.contains("empty"))
  }

  // --------------------------------------------------------------------------
  // typed variants
  // --------------------------------------------------------------------------

  test("diffWith: id columns named like tuple fields still work") {
    val l = Seq((1, "x")).toDF("_1", "_2").as[(Int, String)]
    val r = Seq((1, "y")).toDF("_1", "_2").as[(Int, String)]
    val result = Diff.ofWith(l, r, Seq("_1"))
    val row = result.collect().head
    assert(row._1 === "C" && row._2 === ((1, "x")) && row._3 === ((1, "y")))
  }

  test("diffWith ignores ignored columns in comparison but keeps them in structs") {
    val result = Diff.ofWith(wideLeft, wideRight, Seq("id"), Seq("ign"))
      .collect().sortBy(_._1.toString)
    val n = result.filter(_._1 == "N").head
    assert(n._2.ign.contains("x") && n._3.ign.contains("y"))
  }

  test("diffAs with a subset encoder over untyped inputs") {
    val result = Diff.ofAs[Row, Row, DiffIdOnly](
      wideLeft.drop("ign").toDF(), wideRight.drop("ign").toDF(),
      Seq("id"))(Encoders.product[DiffIdOnly])
    assert(result.collect().map(r => r.id -> r.diff).toMap ===
      Map(1 -> "N", 2 -> "C", 3 -> "D", 4 -> "I"))
  }

  // --------------------------------------------------------------------------
  // options & diff values
  // --------------------------------------------------------------------------

  test("custom diff action values flow through") {
    val opts = DiffOptions.default
      .withInsertDiffValue("ins").withChangeDiffValue("chg")
      .withDeleteDiffValue("del").withNochangeDiffValue("same")
    val result = wideLeft.drop("ign").diff(wideRight.drop("ign"), opts, "id")
    assert(result.select("diff").as[String].collect().toSet === Set("ins", "chg", "del", "same"))
  }

  test("duplicate diff values rejected") {
    val e = intercept[IllegalArgumentException] {
      DiffOptions.default.withInsertDiffValue("X").withDeleteDiffValue("X")
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("equal left/right prefixes rejected") {
    val e = intercept[IllegalArgumentException] {
      DiffOptions.default.withLeftColumnPrefix("p").withRightColumnPrefix("p")
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("change column equal to diff column rejected") {
    val e = intercept[IllegalArgumentException] {
      DiffOptions.default.withChangeColumn("diff")
    }
    assert(e.getMessage.contains("different"))
  }

  test("comparator re-registration for the same data type rejected") {
    val e = intercept[IllegalArgumentException] {
      DiffOptions.default
        .withComparator(DiffComparators.epsilon(0.1), IntegerType)
        .withComparator(DiffComparators.epsilon(0.2), IntegerType)
    }
    assert(e.getMessage.contains("exists already"))
  }

  test("comparator resolution: column name beats data type beats default") {
    val l = Seq((1, "a ", "b ")).toDF("id", "x", "y")
    val r = Seq((1, "a", "b")).toDF("id", "x", "y")
    // type-level comparator: strict -> both x and y differ
    val strictTypes = DiffOptions.default
      .withComparator(DiffComparators.string(whitespaceAgnostic = false), StringType)
    assert(Diff.of(l.toDF(), r.toDF(), strictTypes, "id")
      .select("diff").as[String].head() === "C")
    // column-name comparator on x only: ws-agnostic beats the strict type comparator
    val mixed = strictTypes.withComparator(DiffComparators.string(), "x")
    val withChange = mixed.withChangeColumn("ch")
    val row = Diff.of(l.toDF(), r.toDF(), withChange, "id").collect().head
    assert(row.getString(0) === "C")
    assert(row.getSeq[String](1) === Seq("y"), "only y should differ")
  }

  test("column-name comparator matches across case when session is case-insensitive") {
    val l = Seq((1, "a ")).toDF("id", "V")
    val r = Seq((1, "a")).toDF("id", "V")
    val opts = DiffOptions.default.withComparator(DiffComparators.string(), "v")
    withCaseSensitive(false) {
      assert(Diff.of(l, r, opts, "id").select("diff").as[String].head() === "N")
    }
    withCaseSensitive(true) {
      // registered name "v" does not match column "V": default strict compare
      assert(Diff.of(l, r, opts, "id").select("diff").as[String].head() === "C")
    }
  }

  test("epsilon comparator absolute + exclusive") {
    val l = Seq((1, 10.0), (2, 10.0)).toDF("id", "v")
    val r = Seq((1, 10.5), (2, 11.0)).toDF("id", "v")
    val opts = DiffOptions.default.withComparator(
      DiffComparators.epsilon(1.0).asAbsolute().asExclusive(), "v")
    val byId = Diff.of(l, r, opts, "id").collect().map(x => x.getInt(1) -> x.getString(0)).toMap
    assert(byId(1) === "N") // |10-10.5| = 0.5 < 1.0
    assert(byId(2) === "C") // |10-11| = 1.0 not < 1.0
  }

  test("map comparator key-order sensitivity") {
    val l = Seq((1, Map("a" -> 1, "b" -> 2))).toDF("id", "m")
    val r = Seq((1, Map("b" -> 2, "a" -> 1))).toDF("id", "m")
    val insensitive = DiffOptions.default.withComparator(DiffComparators.map[String, Int](), "m")
    assert(Diff.of(l, r, insensitive, "id").select("diff").as[String].head() === "N")
    // same entries, different key order: a change under the sensitive comparator
    val sensitive = DiffOptions.default
      .withComparator(DiffComparators.map[String, Int](keyOrderSensitive = true), "m")
    assert(Diff.of(l, r, sensitive, "id").select("diff").as[String].head() === "C")
    // and same order stays N
    val same = Seq((1, Map("a" -> 1, "b" -> 2))).toDF("id", "m")
    assert(Diff.of(l, same, sensitive, "id").select("diff").as[String].head() === "N")
  }

  test("map comparator codegen path: value diffs, missing keys, null values, null maps") {
    val l = Seq(
      (1, Map("a" -> Some(1), "b" -> Some(2))), // equal (modulo order)
      (2, Map("a" -> Some(1))),                 // value differs
      (3, Map("a" -> Some(1))),                 // key set differs
      (4, Map("a" -> None)),                    // null value both sides
      (5, Map("a" -> None))                     // null vs non-null value
    ).toDF("id", "m")
    val r = Seq(
      (1, Map("b" -> Some(2), "a" -> Some(1))),
      (2, Map("a" -> Some(2))),
      (3, Map("b" -> Some(1))),
      (4, Map("a" -> None)),
      (5, Map("a" -> Some(7)))
    ).toDF("id", "m")
    val opts = DiffOptions.default.withComparator(DiffComparators.map[String, Int](), "m")
    val byId = Diff.of(l, r, opts, "id").collect()
      .map(x => x.getInt(1) -> x.getString(0)).toMap
    assert(byId === Map(1 -> "N", 2 -> "C", 3 -> "C", 4 -> "N", 5 -> "C"))
    // the diff must resolve the comparator onto the codegen'd equiv path
    val field = l.schema.fields.find(_.name == "m").get
    val resolved = opts.comparatorFor(field)
    assert(resolved.asInstanceOf[graft.diff.comparator.MapDiffComparator].keyType.isDefined)
  }

  test("map comparator binary keys/values compare by content, not identity") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // binary KEYS: fresh Array[Byte] instances on each side — JVM equals would
    // never match; content equality must
    val l = Seq(
      (1, Map(bytes(1, 2) -> 10, bytes(3) -> 20)), // equal content
      (2, Map(bytes(1, 2) -> 10)),                 // key bytes differ
      (3, Map(bytes(1, 2) -> 10))                  // value differs
    ).toDF("id", "m")
    val r = Seq(
      (1, Map(bytes(3) -> 20, bytes(1, 2) -> 10)),
      (2, Map(bytes(1, 3) -> 10)),
      (3, Map(bytes(1, 2) -> 11))
    ).toDF("id", "m")
    val opts = DiffOptions.default.withComparator(DiffComparators.map[Array[Byte], Int](), "m")
    val byId = Diff.of(l, r, opts, "id").collect()
      .map(x => x.getInt(1) -> x.getString(0)).toMap
    assert(byId === Map(1 -> "N", 2 -> "C", 3 -> "C"))
    // order-sensitive loop takes the Arrays.equals path, not reference equality
    val sensOpts = DiffOptions.default
      .withComparator(DiffComparators.map[Array[Byte], Int](keyOrderSensitive = true), "m")
    val lOrd = Seq((1, Map(bytes(1) -> 1, bytes(2) -> 2))).toDF("id", "m")
    val rOrd = Seq((1, Map(bytes(1) -> 1, bytes(2) -> 2))).toDF("id", "m")
    assert(Diff.of(lOrd, rOrd, sensOpts, "id").select("diff").as[String].head() === "N")
    // binary VALUES: content equality as before the key fix
    val lv = Seq((1, Map("a" -> bytes(9, 9)))).toDF("id", "m")
    val rv = Seq((1, Map("a" -> bytes(9, 9)))).toDF("id", "m")
    val vOpts = DiffOptions.default.withComparator(DiffComparators.map[String, Array[Byte]](), "m")
    assert(Diff.of(lv, rv, vOpts, "id").select("diff").as[String].head() === "N")
  }

  test("map comparator signed zeros and NaN follow SQL comparison semantics") {
    // -0.0 == 0.0 and NaN == NaN under Spark's nan-safe comparison; the boxed
    // JVM equals disagrees on both zeros (false) — normalize must reconcile
    val l = Seq(
      (1, Map(-0.0 -> 1.0)),          // -0.0 key vs 0.0 key
      (2, Map(1.0 -> -0.0)),          // -0.0 value vs 0.0 value
      (3, Map(1.0 -> Double.NaN)),    // NaN value both sides
      (4, Map(Double.NaN -> 1.0)),    // NaN key both sides
      (5, Map(1.0 -> Double.NaN))     // NaN value vs real value
    ).toDF("id", "m")
    val r = Seq(
      (1, Map(0.0 -> 1.0)),
      (2, Map(1.0 -> 0.0)),
      (3, Map(1.0 -> Double.NaN)),
      (4, Map(Double.NaN -> 1.0)),
      (5, Map(1.0 -> 2.0))
    ).toDF("id", "m")
    val opts = DiffOptions.default.withComparator(DiffComparators.map[Double, Double](), "m")
    val byId = Diff.of(l, r, opts, "id").collect()
      .map(x => x.getInt(1) -> x.getString(0)).toMap
    assert(byId === Map(1 -> "N", 2 -> "N", 3 -> "N", 4 -> "N", 5 -> "C"))
  }

  // --------------------------------------------------------------------------
  // prefix-produced name collisions × case sensitivity
  // (reference DiffSuite:708-970 equivalents)
  // --------------------------------------------------------------------------

  private lazy val pcLeft = Seq((1, "x")).toDF("id", "value")
  private lazy val pcRight = Seq((1, "y")).toDF("id", "value")

  test("prefix + value column producing the diff column name fails") {
    val opts = DiffOptions.default
      .withDiffColumn("a_value").withLeftColumnPrefix("a").withRightColumnPrefix("b")
    val e = intercept[IllegalArgumentException] { pcLeft.diff(pcRight, opts, "id") }
    assert(e.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException] {
      pcLeft.diff(pcRight, opts.withDiffColumn("b_value"), "id")
    }
    assert(e2.getMessage.contains("collide"))
  }

  test("LeftSide/RightSide modes tolerate a diff column only prefixing would produce") {
    val opts = DiffOptions.default
      .withDiffColumn("a_value").withLeftColumnPrefix("a").withRightColumnPrefix("b")
    assert(pcLeft.diff(pcRight, opts.withDiffMode(DiffMode.LeftSide), "id")
      .columns.toSeq === Seq("a_value", "id", "value"))
    assert(pcLeft.diff(pcRight,
      opts.withDiffColumn("b_value").withDiffMode(DiffMode.RightSide), "id")
      .columns.toSeq === Seq("b_value", "id", "value"))
  }

  test("case-insensitive: prefix-produced diff column collision detected across case") {
    withCaseSensitive(false) {
      val opts = DiffOptions.default
        .withDiffColumn("a_value").withLeftColumnPrefix("A").withRightColumnPrefix("B")
      val e = intercept[IllegalArgumentException] { pcLeft.diff(pcRight, opts, "id") }
      assert(e.getMessage.contains("collide"))
      // one-sided modes never produce the prefixed name: still fine
      assert(pcLeft.diff(pcRight, opts.withDiffMode(DiffMode.LeftSide), "id")
        .columns.toSeq === Seq("a_value", "id", "value"))
      assert(pcLeft.diff(pcRight, opts.withDiffMode(DiffMode.RightSide), "id")
        .columns.toSeq === Seq("a_value", "id", "value"))
    }
  }

  test("case-sensitive: prefix-produced diff column name differing by case does not collide") {
    withCaseSensitive(true) {
      val opts = DiffOptions.default
        .withDiffColumn("a_value").withLeftColumnPrefix("A").withRightColumnPrefix("B")
      val result = pcLeft.diff(pcRight, opts, "id")
      assert(result.columns.toSeq === Seq("a_value", "id", "A_value", "B_value"))
      assert(rows(result) === Set(Row("C", 1, "x", "y")))
    }
  }

  test("prefix + value column producing the change column name fails") {
    val opts = DiffOptions.default
      .withChangeColumn("a_value").withLeftColumnPrefix("a").withRightColumnPrefix("b")
    val e = intercept[IllegalArgumentException] { pcLeft.diff(pcRight, opts, "id") }
    assert(e.getMessage.contains("collide"))
    withCaseSensitive(false) {
      val optsCase = DiffOptions.default
        .withChangeColumn("a_value").withLeftColumnPrefix("A").withRightColumnPrefix("B")
      val e2 = intercept[IllegalArgumentException] { pcLeft.diff(pcRight, optsCase, "id") }
      assert(e2.getMessage.contains("collide"))
    }
  }

  test("case-sensitive: prefix-produced change column name differing by case does not collide") {
    withCaseSensitive(true) {
      val opts = DiffOptions.default
        .withChangeColumn("a_value").withLeftColumnPrefix("A").withRightColumnPrefix("B")
      val result = pcLeft.diff(pcRight, opts, "id")
      assert(result.columns.toSeq === Seq("diff", "a_value", "id", "A_value", "B_value"))
      assert(rows(result) === Set(Row("C", Seq("value"), 1, "x", "y")))
    }
  }

  test("prefix + value column producing an id column name fails") {
    val l = Seq((1, "v")).toDF("first_id", "id")
    val r = Seq((1, "w")).toDF("first_id", "id")
    val opts = DiffOptions.default
      .withLeftColumnPrefix("first").withRightColumnPrefix("second")
    val e = intercept[IllegalArgumentException] { l.diff(r, opts, "first_id") }
    assert(e.getMessage.contains("collide"))
    withCaseSensitive(false) {
      val optsCase = DiffOptions.default
        .withLeftColumnPrefix("FIRST").withRightColumnPrefix("SECOND")
      val e2 = intercept[IllegalArgumentException] { l.diff(r, optsCase, "first_id") }
      assert(e2.getMessage.contains("collide"))
    }
  }

  test("case-sensitive: prefix-produced id column name differing by case does not collide") {
    withCaseSensitive(true) {
      val l = Seq((1, "v")).toDF("first_id", "id")
      val r = Seq((1, "w")).toDF("first_id", "id")
      val opts = DiffOptions.default
        .withLeftColumnPrefix("FIRST").withRightColumnPrefix("SECOND")
      val result = l.diff(r, opts, "first_id")
      assert(result.columns.toSeq === Seq("diff", "first_id", "FIRST_id", "SECOND_id"))
      assert(rows(result) === Set(Row("C", 1, "v", "w")))
    }
  }

  test("change column named like an id column fails; different case passes when case-sensitive") {
    val l = Seq((1, "a")).toDF("id", "change")
    val r = Seq((1, "b")).toDF("id", "change")
    val opts = DiffOptions.default.withChangeColumn("change")
    // ids include the change-named column
    val e = intercept[IllegalArgumentException] { l.diff(r, opts, "change", "id") }
    assert(e.getMessage.contains("collide"))
    // no ids: every column is an id, including "change"
    val e2 = intercept[IllegalArgumentException] { l.diff(r, opts) }
    assert(e2.getMessage.contains("collide"))
    val lUp = l.withColumnRenamed("change", "Change")
    val rUp = r.withColumnRenamed("change", "Change")
    withCaseSensitive(false) {
      val e3 = intercept[IllegalArgumentException] { lUp.diff(rUp, opts, "Change", "id") }
      assert(e3.getMessage.contains("collide"))
    }
    withCaseSensitive(true) {
      val result = lUp.diff(rUp, opts, "Change", "id")
      assert(result.columns.toSeq === Seq("diff", "change", "Change", "id"))
    }
  }

  test("non-id column named like the change column is prefixed, not a collision") {
    val l = Seq((1, "a")).toDF("id", "change")
    val r = Seq((1, "b")).toDF("id", "change")
    val result = l.diff(r, DiffOptions.default.withChangeColumn("change"), "id")
    assert(result.columns.toSeq === Seq("diff", "change", "id", "left_change", "right_change"))
    assert(rows(result) === Set(Row("C", Seq("change"), 1, "a", "b")))
  }

  test("one-sided modes: diff or change column named like an unprefixed value column fails") {
    for (mode <- Seq(DiffMode.LeftSide, DiffMode.RightSide)) {
      val e = intercept[IllegalArgumentException] {
        pcLeft.diff(pcRight, DiffOptions.default.withDiffColumn("value").withDiffMode(mode), "id")
      }
      assert(e.getMessage.contains("collide"))
      val e2 = intercept[IllegalArgumentException] {
        pcLeft.diff(pcRight, DiffOptions.default.withChangeColumn("value").withDiffMode(mode), "id")
      }
      assert(e2.getMessage.contains("collide"))
    }
  }

  // --------------------------------------------------------------------------
  // dots in column names and prefixes (backtick handling)
  // (reference DiffSuite:1337-1416 equivalents)
  // --------------------------------------------------------------------------

  test("dots in the diff column name") {
    val result = pcLeft.diff(pcRight, DiffOptions.default.withDiffColumn("the.diff"), "id")
    assert(result.columns.toSeq === Seq("the.diff", "id", "left_value", "right_value"))
    assert(rows(result) === Set(Row("C", 1, "x", "y")))
  }

  test("dots in the change column name") {
    val result = pcLeft.diff(pcRight, DiffOptions.default.withChangeColumn("the.changes"), "id")
    assert(result.columns.toSeq === Seq("diff", "the.changes", "id", "left_value", "right_value"))
    assert(rows(result) === Set(Row("C", Seq("value"), 1, "x", "y")))
  }

  test("dots in the column prefixes") {
    val opts = DiffOptions.default
      .withLeftColumnPrefix("left.prefix").withRightColumnPrefix("right.prefix")
    val result = pcLeft.diff(pcRight, opts, "id")
    assert(result.columns.toSeq ===
      Seq("diff", "id", "left.prefix_value", "right.prefix_value"))
    assert(rows(result) === Set(Row("C", 1, "x", "y")))
  }

  test("dot in an id column name") {
    val l = pcLeft.withColumnRenamed("id", "the.id")
    val r = pcRight.withColumnRenamed("id", "the.id")
    val result = l.diff(r, "the.id")
    assert(result.columns.toSeq === Seq("diff", "the.id", "left_value", "right_value"))
    assert(rows(result) === Set(Row("C", 1, "x", "y")))
  }

  test("dot in a value column name across modes") {
    val l = pcLeft.withColumnRenamed("value", "the.value")
    val r = pcRight.withColumnRenamed("value", "the.value")
    val cbc = l.diff(r, "id")
    assert(cbc.columns.toSeq === Seq("diff", "id", "left_the.value", "right_the.value"))
    assert(rows(cbc) === Set(Row("C", 1, "x", "y")))
    val ls = l.diff(r, DiffOptions.default.withDiffMode(DiffMode.LeftSide), "id")
    assert(ls.columns.toSeq === Seq("diff", "id", "the.value"))
    assert(rows(ls) === Set(Row("C", 1, "x")))
    val rs = l.diff(r, DiffOptions.default.withDiffMode(DiffMode.RightSide), "id")
    assert(rs.columns.toSeq === Seq("diff", "id", "the.value"))
    assert(rows(rs) === Set(Row("C", 1, "y")))
  }

  // --------------------------------------------------------------------------
  // ignored columns: change column, similar schemas, case sensitivity
  // (reference DiffSuite:1532-1546, 1676-2018 equivalents)
  // --------------------------------------------------------------------------

  test("ignored columns never appear in the change column") {
    val result = new Differ(DiffOptions.default.withChangeColumn("changed"))
      .diff(wideLeft, wideRight, Seq("id"), Seq("ign"))
    assert(result.columns.toSeq === Seq("diff", "changed", "id",
      "left_a", "right_a", "left_b", "right_b", "left_ign", "right_ign"))
    val byId = result.collect().map(r => r.getInt(2) -> r).toMap
    // row 1: only ign differs -> N with empty change list, not listing "ign"
    assert(byId(1).getString(0) === "N" && byId(1).getSeq[String](1) === Seq.empty)
    assert(byId(2).getSeq[String](1) === Seq("a"))
    assert(byId(3).isNullAt(1) && byId(4).isNullAt(1))
  }

  private lazy val metaLeft: Dataset[MetaV] = Seq(
    MetaV(1, Some(1), Some("one"), Some("L1")),
    MetaV(2, Some(2), Some("two"), Some("L2")),
    MetaV(3, Some(3), Some("three"), Some("L3"))).toDS()
  private lazy val infoRight: Dataset[InfoV] = Seq(
    InfoV(1, Some(1), Some("one"), Some("R1")),
    InfoV(2, Some(2), Some("Two"), Some("R2")),
    InfoV(4, Some(4), Some("four"), Some("R4"))).toDS()

  test("similar datasets: each side's own ignored column is carried") {
    val result = Diff.of(metaLeft.toDF(), infoRight.toDF(), Seq("id", "seq"), Seq("meta", "info"))
    assert(result.columns.toSeq ===
      Seq("diff", "id", "seq", "left_value", "right_value", "left_meta", "right_info"))
    assert(rows(result) === Set(
      Row("N", 1, 1, "one", "one", "L1", "R1"),
      Row("C", 2, 2, "two", "Two", "L2", "R2"),
      Row("D", 3, 3, "three", null, "L3", null),
      Row("I", 4, 4, null, "four", null, "R4")))
  }

  test("similar datasets: diffWith keeps each side's own schema in the structs") {
    val result = Diff.default.diffWith(metaLeft, infoRight, Seq("id", "seq"), Seq("meta", "info"))
    val byAction = result.collect().groupBy(_._1)
    val n = byAction("N").head
    assert(n._2 === MetaV(1, Some(1), Some("one"), Some("L1")))
    assert(n._3 === InfoV(1, Some(1), Some("one"), Some("R1")))
    assert(byAction("I").head._2 === null.asInstanceOf[MetaV])
    assert(byAction("D").head._3 === null.asInstanceOf[InfoV])
  }

  test("ignored columns may have different types on each side") {
    val l = Seq((1, "v", 10)).toDF("id", "v", "meta")
    val r = Seq((1, "v", "ten")).toDF("id", "v", "meta")
    val result = Diff.of(l, r, Seq("id"), Seq("meta"))
    assert(rows(result) === Set(Row("N", 1, "v", "v", 10, "ten")))
  }

  test("case-insensitive: ignored diff preserves each side's column case") {
    withCaseSensitive(false) {
      val l = metaLeft.toDF().drop("info")
      val r = infoRight.toDF("ID", "SEQ", "VALUE", "INFO")
      val result = Diff.of(l, r, Seq("iD", "sEq"), Seq("MeTa", "InFo"))
      // id columns take the case given in the id argument; value columns keep
      // each side's own case
      assert(result.columns.toSeq ===
        Seq("diff", "iD", "sEq", "left_value", "right_VALUE", "left_meta", "right_INFO"))
      assert(rows(result.select(col("diff"), col("iD"))) ===
        Set(Row("N", 1), Row("C", 2), Row("D", 3), Row("I", 4)))
    }
  }

  test("case-sensitive: mixed-case schemas, ids and ignores all fail with clear messages") {
    withCaseSensitive(true) {
      val l = metaLeft.toDF().drop("info")
      val rUp = l.toDF("ID", "SEQ", "VALUE", "META")
      val e = intercept[IllegalArgumentException] { Diff.of(l, rUp, Seq("Id", "SeQ"), Seq("MeTa")) }
      assert(e.getMessage.contains("same schema"))
      val e2 = intercept[IllegalArgumentException] { l.diff(l, "Id", "SeQ") }
      assert(e2.getMessage.contains("id columns do not exist"))
      val e3 = intercept[IllegalArgumentException] { Diff.of(l, l, Seq("id", "seq"), Seq("MeTa")) }
      assert(e3.getMessage.contains("ignore columns do not exist"))
    }
  }

  test("ignore column existing on neither side fails") {
    val l = Seq((1, "v")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] { Diff.of(l, l, Seq("id"), Seq("ghost")) }
    assert(e.getMessage.contains("ignore columns do not exist"))
  }

  // golden values for the remaining ignore × mode × sparse combinations
  // (CbC dense/sparse asserted above; reference DiffSuite:1548-1675)

  test("golden ignore × SideBySide dense and sparse") {
    val dense = ignoreDiff(DiffOptions.default.withDiffMode(DiffMode.SideBySide))
    assert(rows(dense) === Set(
      Row("N", 1, "a1", 10, "x", "a1", 10, "y"),
      Row("C", 2, "a2", 20, "x", "a2!", 20, "y"),
      Row("D", 3, "a3", 30, "x", null, null, null),
      Row("I", 4, null, null, null, "a4", 40, "y")))
    val sparse = ignoreDiff(
      DiffOptions.default.withDiffMode(DiffMode.SideBySide).withSparseMode(true))
    assert(rows(sparse) === Set(
      Row("N", 1, null, null, "x", null, null, "y"),
      Row("C", 2, "a2", null, "x", "a2!", null, "y"),
      Row("D", 3, "a3", 30, "x", null, null, null),
      Row("I", 4, null, null, null, "a4", 40, "y")))
  }

  test("golden ignore × LeftSide/RightSide sparse") {
    val ls = ignoreDiff(
      DiffOptions.default.withDiffMode(DiffMode.LeftSide).withSparseMode(true))
    assert(rows(ls) === Set(
      Row("N", 1, null, null, "x"),
      Row("C", 2, "a2", null, "x"),
      Row("D", 3, "a3", 30, "x"),
      Row("I", 4, null, null, null)))
    val rs = ignoreDiff(
      DiffOptions.default.withDiffMode(DiffMode.RightSide).withSparseMode(true))
    assert(rows(rs) === Set(
      Row("N", 1, null, null, "y"),
      Row("C", 2, "a2!", null, "y"),
      Row("D", 3, null, null, null),
      Row("I", 4, "a4", 40, "y")))
  }

  test("diff action filterable and aggregatable downstream") {
    // ign differs on every matched row (x vs y), so row 1 counts as C too
    val result = wideLeft.diff(wideRight, "id")
    val counts = result.groupBy("diff").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("C" -> 2L, "D" -> 1L, "I" -> 1L))
  }
}
