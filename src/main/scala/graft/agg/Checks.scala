package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality expectations — declarative checks over a table, evaluated in
 * bulk (the Deequ-style contract gate a pipeline runs before publishing a
 * snapshot). Every scalar rule compiles to aggregate columns in ONE shared
 * pass over the data (no per-rule scan); each [[Check.Unique]] rule adds one
 * distinct-count aggregate of its own column (a single-distinct aggregate —
 * no Expand, and never more than one distinct per aggregate node).
 *
 * Output: one row per rule `(rule, column, metric, threshold, pass)` —
 * `metric` is the observed value (null fraction, match fraction, min/max
 * violation count, row count, duplicate count), `pass` a concrete boolean.
 * All fractions are one IEEE division from exact BIGINT counts, so the
 * verdict is bit-identical across engines and partitionings.
 */
object Checks {

  sealed trait Check { def column: String }
  object Check {
    /** Null fraction of `column` must be <= `maxNullFraction`. */
    case class NotNull(column: String, maxNullFraction: Double = 0.0) extends Check
    /** All non-null values in [`min`, `max`]; metric = violation count. */
    case class InRange(column: String, min: Double, max: Double) extends Check
    /** Fraction of non-null values matching `pattern` (RE2-safe Java regex)
      * must be >= `minMatchFraction`. */
    case class MatchesRegex(column: String, pattern: String,
                            minMatchFraction: Double = 1.0) extends Check
    /** Table must have >= `minRows` rows. `column` is cosmetic (""). */
    case class MinRows(minRows: Long) extends Check { val column = "" }
    /** No duplicate non-null values; metric = duplicate count (rows minus
      * distinct). */
    case class Unique(column: String) extends Check
  }

  /** Evaluate all checks; see object docs for the output contract. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val spark = df.sparkSession
    import Check._

    // the shared scalar pass: count(*) + per-rule conditional sums
    val scalarAggs = count(lit(1)).as("__n") +: checks.zipWithIndex.flatMap {
      case (NotNull(c, _), i) =>
        Seq(count(when(col(c).isNull, lit(1))).as(s"__a$i"))
      case (InRange(c, lo, hi), i) =>
        Seq(count(when(col(c).isNotNull &&
          (col(c).cast("double") < lo || col(c).cast("double") > hi), lit(1))).as(s"__a$i"))
      case (MatchesRegex(c, p, _), i) =>
        Seq(count(when(col(c).isNotNull, lit(1))).as(s"__a${i}n"),
          count(when(col(c).isNotNull && col(c).rlike(p), lit(1))).as(s"__a$i"))
      case (_: MinRows, _) => Seq.empty
      case (_: Unique, _) => Seq.empty
    }
    val head = df.agg(scalarAggs.head, scalarAggs.tail: _*).head()
    val n = head.getAs[Long]("__n")

    // one distinct-count pass per Unique rule (single-distinct: no Expand)
    val uniqueCounts: Map[Int, (Long, Long)] = checks.zipWithIndex.collect {
      case (Unique(c), i) =>
        val r = df.agg(
          count(col(c)).as("__cnt"),
          count_distinct(col(c)).as("__dist")).head()
        i -> ((r.getAs[Long]("__cnt"), r.getAs[Long]("__dist")))
    }.toMap

    val rows = checks.zipWithIndex.map {
      case (NotNull(c, maxFrac), i) =>
        val nulls = head.getAs[Long](s"__a$i")
        val frac = if (n == 0) 0.0 else nulls.toDouble / n.toDouble
        ("not_null", c, frac, maxFrac, frac <= maxFrac)
      case (InRange(c, lo, hi), i) =>
        val bad = head.getAs[Long](s"__a$i")
        ("in_range", c, bad.toDouble, 0.0, bad == 0L)
      case (MatchesRegex(c, _, minFrac), i) =>
        val nn = head.getAs[Long](s"__a${i}n")
        val ok = head.getAs[Long](s"__a$i")
        val frac = if (nn == 0) 1.0 else ok.toDouble / nn.toDouble
        ("matches_regex", c, frac, minFrac, frac >= minFrac)
      case (MinRows(minRows), _) =>
        ("min_rows", "", n.toDouble, minRows.toDouble, n >= minRows)
      case (Unique(c), i) =>
        val (cnt, dist) = uniqueCounts(i)
        ("unique", c, (cnt - dist).toDouble, 0.0, cnt == dist)
    }
    import spark.implicits._
    rows.toDF("rule", "column", "metric", "threshold", "pass")
  }
}
