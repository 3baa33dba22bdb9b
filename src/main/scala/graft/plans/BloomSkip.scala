package graft.plans

import java.nio.ByteBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.types._

import graft.parquet.{BloomBits, BloomIndex}

/**
 * Transparent Bloom-sidecar data skipping — the optimizer-rule tier of
 * [[BloomIndex]]: with the rule injected (config
 * `spark.sql.extensions=graft.GraftExtensions`, or
 * `GraftExtensions.registerAll(spark)` on a live session), a PLAIN
 *
 *   spark.read.parquet(dir).filter($"key" === v)
 *
 * against a directory carrying a `_bloom_key` sidecar scans only the files
 * whose Bloom filter might contain `v` — no API opt-in at the query site,
 * the same way Delta/Iceberg apply their file-skipping indexes. This is
 * the repo's `Rule[LogicalPlan]` extension point (the expression kernels
 * are tier (b); this is tier (c) of the Catalyst ladder).
 *
 * Correctness envelope (the reasons this can never change results):
 *  - the ORIGINAL Filter stays on top — Bloom false positives cost IO only;
 *  - false negatives cannot happen (build and probe share Spark's stable
 *    `xxhash64`, Kirsch-Mitzenmacher double hashing — [[BloomBits]]);
 *  - STALENESS safety: a data file NOT listed in the sidecar (appended
 *    after the index was built) is always kept — only files the index
 *    explicitly clears are skipped;
 *  - the rewrite fires only for conjuncts `col = literal` / `col IN
 *    (literals)` on integral/string columns of an UNPARTITIONED single-root
 *    parquet relation (the shapes whose probe-value typing is exact), and
 *    only when the sidecar directory exists;
 *  - idempotent: the pruned relation is tagged with
 *    [[BloomPrunedFileIndex]], which the matcher skips.
 *
 * Cost: one driver-side sidecar read (one row per data file — the bounded
 * footer-listing discipline) per matching query. That is the point: a
 * point lookup trades a KB-scale sidecar scan for not reading a 100 TB
 * directory.
 */
class BloomPrunedFileIndex(spark: SparkSession, paths: Seq[Path],
                           schema: Option[StructType])
  extends InMemoryFileIndex(spark, paths, Map.empty[String, String], schema)

object BloomSkipRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.bloomSkip.enabled"

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Conjuncts of `cond` that are equality/IN on a supported-type column:
    * column name -> probe literals. */
  private def eqConjuncts(cond: Expression): Map[String, Seq[Literal]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal)
          if supported(a.dataType) && l.value != null => Some(a.name -> Seq(l))
      case EqualTo(l: Literal, a: AttributeReference)
          if supported(a.dataType) && l.value != null => Some(a.name -> Seq(l))
      case In(a: AttributeReference, vs)
          if supported(a.dataType) && vs.nonEmpty &&
            vs.forall { case Literal(v, _) => v != null; case _ => false } =>
        Some(a.name -> vs.map(_.asInstanceOf[Literal]))
      case _ => None
    }.toMap
  }

  /** Scheme-insensitive path key (input_file_name renders `file:///...`,
    * file listings may render `file:/...`). */
  private def pathKey(s: String): String = new Path(s).toUri.getPath

  /** Surviving data files per the sidecar, with the staleness guard:
    * files absent from the sidecar are always kept. */
  private def keptFiles(spark: SparkSession, root: String, column: String,
                        dataType: DataType, values: Seq[Literal],
                        allFiles: Seq[Path]): Option[Seq[Path]] = {
    val hashes = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(
          values.map(v => org.apache.spark.sql.Row(v.value.toString))).asJava,
        StructType(Seq(StructField("v", StringType))))
      .select(xxhash64(col("v").cast(dataType)).as("h"))
      .collect().map(_.getLong(0))
    val sidecar = spark.read
      .parquet(BloomIndex.sidecarPath(root, column))
      .select(col("file"), col("log_bits"), col("k"), col("bloom"))
      .collect()
      .map { r =>
        val bytes = r.getAs[Array[Byte]]("bloom")
        val bits = new Array[Long](bytes.length / 8)
        ByteBuffer.wrap(bytes).asLongBuffer().get(bits)
        pathKey(r.getString(0)) ->
          hashes.exists(h => BloomBits.mightContain(bits, h, r.getInt(1), r.getInt(2)))
      }.toMap
    val kept = allFiles.filter(f => sidecar.getOrElse(pathKey(f.toString), true))
    if (kept.size < allFiles.size) Some(kept) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    if (spark.conf.get(EnabledKey, "true") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        rel.relation match {
          case fs: HadoopFsRelation
              if fs.partitionSchema.isEmpty &&
                fs.location.rootPaths.size == 1 &&
                !fs.location.isInstanceOf[BloomPrunedFileIndex] =>
            val root = fs.location.rootPaths.head
            val candidates = eqConjuncts(cond).filter { case (name, _) =>
              fs.dataSchema.fieldNames.contains(name) && {
                val p = new Path(BloomIndex.sidecarPath(root.toString, name))
                p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
              }
            }
            if (candidates.isEmpty) f
            else {
              val allFiles = fs.location.inputFiles.map(new Path(_)).toSeq
              // intersect across indexed conjuncts: a file must survive
              // EVERY indexed predicate to be read
              val keptOpt = candidates.foldLeft(Option(allFiles)) {
                case (None, _) => None
                case (Some(files), (name, lits)) =>
                  keptFiles(spark, root.toString, name,
                    fs.dataSchema(name).dataType, lits, files)
                    .orElse(Some(files))
              }
              keptOpt match {
                case Some(kept) if kept.size < allFiles.size =>
                  if (kept.isEmpty) LocalRelation(rel.output, Nil)
                  else {
                    val pruned = fs.copy(location = new BloomPrunedFileIndex(
                      spark, kept, Some(fs.dataSchema)))(spark)
                    Filter(cond, rel.copy(relation = pruned))
                  }
                case _ => f
              }
            }
          case _ => f
        }
    }
  }
}
