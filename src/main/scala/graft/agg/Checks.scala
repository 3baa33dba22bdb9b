package graft.agg

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

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
    /** Referential integrity: every non-null `column` value must exist in
      * `ref`'s `refColumn` (the dimension/parent table); metric = orphan
      * ROW count. One column-pruned anti join per rule — the reference is
      * never collected, so a corpus-sized parent table is fine; Spark
      * broadcasts it only when its own stats say so. */
    case class ForeignKey(column: String, ref: DataFrame, refColumn: String) extends Check
  }

  /** Resolve a rule column's type through analysis, not StructType.apply —
    * nested field paths ("a.b") resolve like any column reference would. */
  private def columnType(df: DataFrame, c: String): DataType =
    df.select(col(c)).schema.head.dataType

  /** InRange violation predicate in the column's exact type family. A
    * BIGINT compared through a double cast silently rounds values beyond
    * 2^53 (9007199254740993 would "pass" a [0, 2^53] range), so integral
    * and decimal columns compare against DECIMAL literals — Spark's
    * comparison coercion widens both sides to an exact common decimal, no
    * lossy cast. Float/double columns (and anything else) keep the double
    * path: they ARE doubles, nothing to lose. */
  private def rangeViolation(dt: DataType, c: Column, lo: Double, hi: Double): Column =
    dt match {
      case ByteType | ShortType | IntegerType | LongType | _: DecimalType =>
        exactBoundViolation(c, lo, isLower = true) ||
          exactBoundViolation(c, hi, isLower = false)
      case _ =>
        c.cast("double") < lo || c.cast("double") > hi
    }

  /** One side of the exact-type range check. Finite bounds become DECIMAL
    * literals; non-finite bounds have no decimal literal, so they take the
    * value the IEEE comparison would: integral/decimal values are all
    * finite, so an infinite bound excludes everything or nothing, and a NaN
    * bound compares false (never a violation). */
  private def exactBoundViolation(c: Column, b: Double, isLower: Boolean): Column =
    if (java.lang.Double.isFinite(b)) {
      val boundLit = lit(java.math.BigDecimal.valueOf(b))
      if (isLower) c < boundLit else c > boundLit
    } else if (b.isNaN) lit(false)
    else lit((b == Double.PositiveInfinity) == isLower)

  /**
   * Streaming contract monitoring: attach the SCALAR rules (everything but
   * [[Check.Unique]], which needs cross-batch distinctness) to a streaming
   * DataFrame as `Dataset.observe` metrics — zero extra passes, the counts
   * ride the existing micro-batch execution. Each rule `i` contributes
   * `rule_i_metric` and `rule_i_pass` to the observation named `name`;
   * read them from a `StreamingQueryListener` / `lastProgress` and alert on
   * `pass == false`. The per-batch metric definitions are EXACTLY
   * [[run]]'s, so a batch replay of the same rows reports the same
   * numbers.
   */
  def observeChecks(stream: DataFrame, name: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    import Check._
    require(!checks.exists(_.isInstanceOf[Unique]),
      "Unique needs cross-batch distinctness - not expressible as a per-batch observe metric")
    require(!checks.exists(_.isInstanceOf[ForeignKey]),
      "ForeignKey needs a join against the reference - not expressible as an observe metric")
    val n = count(lit(1))
    val cols = checks.zipWithIndex.flatMap { case (c, i) =>
      val (metric, pass) = c match {
        case NotNull(col0, maxFrac) =>
          val nulls = count(when(col(col0).isNull, lit(1)))
          val frac = when(n === 0, lit(0.0)).otherwise(nulls.cast("double") / n.cast("double"))
          (frac, frac <= maxFrac)
        case InRange(col0, lo, hi) =>
          val bad = count(when(col(col0).isNotNull &&
            rangeViolation(columnType(stream, col0), col(col0), lo, hi), lit(1)))
          (bad.cast("double"), bad === 0L)
        case MatchesRegex(col0, p, minFrac) =>
          val nn = count(when(col(col0).isNotNull, lit(1)))
          val ok = count(when(col(col0).isNotNull && col(col0).rlike(p), lit(1)))
          val frac = when(nn === 0, lit(1.0)).otherwise(ok.cast("double") / nn.cast("double"))
          (frac, frac >= minFrac)
        case MinRows(minRows) => (n.cast("double"), n >= minRows)
        case u: Unique => throw new IllegalStateException(s"unreachable: $u")
        case f: ForeignKey => throw new IllegalStateException(s"unreachable: $f")
      }
      Seq(metric.as(s"rule_${i}_metric"), pass.as(s"rule_${i}_pass"))
    }
    stream.observe(name, cols.head, cols.tail: _*)
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
          rangeViolation(columnType(df, c), col(c), lo, hi), lit(1))).as(s"__a$i"))
      case (MatchesRegex(c, p, _), i) =>
        Seq(count(when(col(c).isNotNull, lit(1))).as(s"__a${i}n"),
          count(when(col(c).isNotNull && col(c).rlike(p), lit(1))).as(s"__a$i"))
      case (_: MinRows, _) => Seq.empty
      case (_: Unique, _) => Seq.empty
      case (_: ForeignKey, _) => Seq.empty
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

    // one column-pruned anti join per ForeignKey rule: rows of df whose key
    // has no partner in the reference. Null keys are NOT orphans (SQL FK
    // semantics); the reference is filtered the same way so a null there
    // never "matches" anything either.
    val fkOrphans: Map[Int, Long] = checks.zipWithIndex.collect {
      case (ForeignKey(c, ref, rc), i) =>
        i -> df.select(col(c)).filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)).filter(col(c).isNotNull), Seq(c), "left_anti")
          .count()
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
      case (ForeignKey(c, _, _), i) =>
        val orphans = fkOrphans(i)
        ("foreign_key", c, orphans.toDouble, 0.0, orphans == 0L)
    }
    import spark.implicits._
    rows.toDF("rule", "column", "metric", "threshold", "pass")
  }
}
