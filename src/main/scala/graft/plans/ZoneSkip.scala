package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types._

import graft.parquet.ParquetMeta

/**
 * Transparent zone-map file skipping for RANGE predicates — the
 * footer-driven sibling of [[BloomSkipRule]] (equality/IN): with the rule
 * enabled, a plain `spark.read.parquet(dir).filter($"ts" >= a && $"ts" <
 * b)` scans only the files whose footer min/max intersects the range. No
 * sidecar and therefore NO staleness question: the statistics come from
 * the parquet footers themselves — they ARE the data's own metadata, the
 * exact numbers any lakehouse zone-map (Delta file stats, Iceberg
 * manifests) would have recorded at write time.
 *
 * OPT-IN (`spark.graft.zoneSkip.enabled=true`, default off): unlike the
 * Bloom rule — where writing the sidecar was the opt-in — footer stats
 * exist for every parquet directory, so an always-on rule would pay a
 * footer-listing pass for every range-filtered scan. Enable it for the
 * cold point/range-lookup sessions where that trade is the whole point.
 *
 * Correctness envelope: the guard Filter stays on top; a file is skipped
 * only when EVERY row group's [min, max] lies strictly outside the
 * predicate range (missing/null stats keep the file); fires only on
 * integral/float range conjuncts (footer stats compare as doubles —
 * integral columns are exact to 2^53, and the comparison uses the
 * CONSERVATIVE direction: skip requires max < lo or min > hi) over an
 * unpartitioned single-root relation; idempotent via
 * [[ZonePrunedFileIndex]].
 */
class ZonePrunedFileIndex(spark: SparkSession, paths: Seq[Path],
                          schema: Option[StructType])
  extends org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
    spark, paths, Map.empty[String, String], schema)

object ZoneSkipRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.zoneSkip.enabled"

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType => true
    case _ => false
  }

  private def litD(l: Literal): Option[Double] = l.value match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  /** Per-column [lo, hi] bounds implied by the range/equality conjuncts
    * (strict bounds relaxed to inclusive — conservative for skipping). */
  private def rangeConjuncts(cond: Expression): Map[String, (Double, Double)] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val bounds = scala.collection.mutable.HashMap
      .empty[String, (Double, Double)]
    def add(name: String, lo: Double, hi: Double): Unit = {
      val (l0, h0) = bounds.getOrElse(name,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      bounds.update(name, (math.max(l0, lo), math.min(h0, hi)))
    }
    split(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, v, Double.PositiveInfinity))
      case GreaterThan(a: AttributeReference, l: Literal) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, v, Double.PositiveInfinity))
      case LessThanOrEqual(a: AttributeReference, l: Literal) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, Double.NegativeInfinity, v))
      case LessThan(a: AttributeReference, l: Literal) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, Double.NegativeInfinity, v))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, Double.NegativeInfinity, v))
      case GreaterThan(l: Literal, a: AttributeReference) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, Double.NegativeInfinity, v))
      case LessThanOrEqual(l: Literal, a: AttributeReference) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, v, Double.PositiveInfinity))
      case LessThan(l: Literal, a: AttributeReference) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, v, Double.PositiveInfinity))
      case EqualTo(a: AttributeReference, l: Literal) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, v, v))
      case EqualTo(l: Literal, a: AttributeReference) if supported(a.dataType) =>
        litD(l).foreach(v => add(a.name, v, v))
      case _ => ()
    }
    bounds.toMap.filter { case (_, (lo, hi)) =>
      lo != Double.NegativeInfinity || hi != Double.PositiveInfinity }
  }

  /** Per-file keep decision from the footers: keep unless EVERY row group
    * of the file is provably outside [lo, hi] on `column` (null stats on
    * any block keep the file). */
  private def keptFiles(spark: SparkSession, files: Seq[Path], column: String,
                        lo: Double, hi: Double): Seq[Path] = {
    // ParquetMeta reports BASE file names (one directory's files here, so
    // base names are unique — parquet part files carry a UUID)
    val stats = ParquetMeta
      .parquetBlockColumns(spark, None, files.map(_.toString))
      .filter(col("column") === column)
      .select(col("filename"),
        col("minValue").cast("double").as("mn"),
        col("maxValue").cast("double").as("mx"))
      .groupBy(col("filename"))
      .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.when(
            col("mn").isNull || col("mx").isNull, 1)).as("nulls"))
      .collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3)))
      .toMap
    files.filter { f =>
      stats.get(f.getName) match {
        case Some((Some(mn), Some(mx), 0L)) => !(mx < lo || mn > hi)
        case _ => true // missing/partial stats: always keep
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    if (spark.conf.get(EnabledKey, "false") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        rel.relation match {
          case fs: HadoopFsRelation
              if fs.partitionSchema.isEmpty &&
                fs.location.rootPaths.size == 1 &&
                !fs.location.isInstanceOf[ZonePrunedFileIndex] &&
                !fs.location.isInstanceOf[BloomPrunedFileIndex] =>
            val ranges = rangeConjuncts(cond).filter { case (name, _) =>
              fs.dataSchema.fieldNames.contains(name) &&
                supported(fs.dataSchema(name).dataType)
            }
            if (ranges.isEmpty) f
            else {
              val allFiles = fs.location.inputFiles.map(new Path(_)).toSeq
              val kept = ranges.foldLeft(allFiles) {
                case (files, (name, (lo, hi))) =>
                  if (files.isEmpty) files
                  else keptFiles(spark, files, name, lo, hi)
              }
              if (kept.size == allFiles.size) f
              else if (kept.isEmpty) LocalRelation(rel.output, Nil)
              else {
                val pruned = fs.copy(location = new ZonePrunedFileIndex(
                  spark, kept, Some(fs.dataSchema)))(spark)
                Filter(cond, rel.copy(relation = pruned))
              }
            }
          case _ => f
        }
    }
  }
}
