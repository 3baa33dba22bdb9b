package graft

import graft.privacy.Anonymity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity / l-diversity: exact partition of kept vs rare, null-as-value
  * grouping, report flags, and the one-exchange suppression plan. */
class AnonymitySuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // zip-like quasi pairs: ("10001","F") x4, ("10001","M") x2, ("94xxx","F") x1
  private def people = Seq(
    (1L, "10001", "F", "flu"), (2L, "10001", "F", "flu"),
    (3L, "10001", "F", "cold"), (4L, "10001", "F", "flu"),
    (5L, "10001", "M", "cold"), (6L, "10001", "M", "asthma"),
    (7L, "94xxx", "F", "rare-disease")
  ).toDF("id", "zip", "sex", "dx")

  test("kAnonymityReport counts combos and flags the threshold") {
    val rep = Anonymity.kAnonymityReport(people, Seq("zip", "sex"), k = 3)
      .orderBy("zip", "sex").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rep.toSeq == Seq(
      ("10001", "F", 4L, true), ("10001", "M", 2L, false),
      ("94xxx", "F", 1L, false)))
  }

  test("suppress/rare partition the input exactly; schema unchanged") {
    val kept = Anonymity.suppressRareRows(people, Seq("zip", "sex"), k = 3)
    val rare = Anonymity.rareRows(people, Seq("zip", "sex"), k = 3)
    assert(kept.columns.toSeq == people.columns.toSeq)
    assert(kept.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rare.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 6L, 7L))
    // the two channels are a partition of the input
    assert(kept.count() + rare.count() == people.count())
  }

  test("null quasi values group as values (standard GROUP BY semantics)") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, None))
      .toDF("id", "q")
    val kept = Anonymity.suppressRareRows(df, Seq("q"), k = 2)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 3L)) // the two nulls form a size-2 combo
  }

  test("lDiversityReport: distinct sensitive values per combo") {
    val rep = Anonymity.lDiversityReport(people, Seq("zip", "sex"),
      col("dx"), l = 2)
      .orderBy("zip", "sex").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rep.toSeq == Seq(
      ("10001", "F", 4L, 2L, true),   // flu, cold
      ("10001", "M", 2L, 2L, true),   // cold, asthma
      ("94xxx", "F", 1L, 1L, false))) // rare-disease only
  }

  test("suppression plans ONE exchange (window count, no join, no rescan)") {
    val plan = Anonymity.suppressRareRows(people, Seq("zip", "sex"), k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    val exchanges =
      plan.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"expected <= 1 exchange:\n$plan")
  }

  test("guards: empty quasi set and k < 1 fail fast") {
    intercept[IllegalArgumentException] {
      Anonymity.suppressRareRows(people, Seq.empty, k = 2)
    }
    intercept[IllegalArgumentException] {
      Anonymity.kAnonymityReport(people, Seq("zip"), k = 0)
    }
  }
}
