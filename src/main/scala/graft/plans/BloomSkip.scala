package graft.plans

import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.parquet.{BloomBits, BloomIndex}

/**
 * Transparent Bloom-sidecar data skipping — the optimizer-rule tier of
 * [[BloomIndex]]: with the rule injected (config
 * `spark.sql.extensions=graft.GraftExtensions`, or
 * `GraftExtensions.registerAll(spark)` on a live session) AND enabled
 * (`spark.graft.bloomSkip.enabled=true` — OPT-IN, like its zone-map
 * sibling [[ZoneSkipRule]]), a PLAIN
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
 *    [[BloomPrunedFileIndex]], which the matcher skips;
 *  - FAIL-OPEN: any sidecar IO/parse problem falls back to no pruning
 *    (the plan the rule never touched), so a slow or corrupted sidecar
 *    can degrade only the skip, never query planning.
 *
 * Cost discipline (this rule runs inside the optimizer, potentially once
 * per AQE re-optimization):
 *  - the rule is OPT-IN (default off) — sessions that merely load the
 *    extensions pay zero per-query metadata latency;
 *  - probe hashes are computed by evaluating the `XxHash64` expression
 *    driver-side on the predicate literals — no Spark job;
 *  - parsed sidecar contents are CACHED per sidecar directory, keyed by a
 *    per-file freshness signature (sorted name:length:mtime — one driver
 *    `listStatus`) — a rebuilt/extended sidecar
 *    invalidates the entry, a re-optimization of the same query hits the
 *    cache. The only uncached per-query driver IO is that single list call
 *    per indexed column.
 */
class BloomPrunedFileIndex(spark: SparkSession, paths: Seq[Path],
                           schema: Option[StructType])
  extends InMemoryFileIndex(spark, paths, Map.empty[String, String], schema)

object BloomSkipRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.bloomSkip.enabled"

  /** Parsed sidecar rows (path key -> (bits, logBits, k)) plus the
    * directory signature they were read under. */
  private case class CachedSidecar(signature: String,
                                   blooms: Map[String, (Array[Long], Int, Int)])

  /** Keyed by sidecar directory path; bounded by the number of distinct
    * (indexed directory, column) pairs a driver queries — KB-scale each. */
  private val sidecarCache = new ConcurrentHashMap[String, CachedSidecar]()

  /** Test hook / manual invalidation. */
  def clearCache(): Unit = sidecarCache.clear()

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

  /** Sidecar contents for (root, column), through the cache; None when the
    * sidecar directory does not exist. The parquet read (a tiny Spark job,
    * one row per data file) runs only on a signature miss. */
  private def loadSidecar(spark: SparkSession, root: String,
                          column: String): Option[Map[String, (Array[Long], Int, Int)]] = {
    val scPath = new Path(BloomIndex.sidecarPath(root, column))
    val fsys = scPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fsys.exists(scPath)) return None
    // per-file name:len:mtime signature (SidecarFiles.signature): part-file
    // names are unique per write, so a same-millisecond equal-size rebuild
    // still invalidates — count/bytes/max-mtime alone would not
    val sig = graft.parquet.SidecarFiles.signature(spark, scPath.toString)
    val key = scPath.toString
    val cached = sidecarCache.get(key)
    if (cached != null && cached.signature == sig) return Some(cached.blooms)
    val blooms = graft.parquet.SidecarFiles.read(spark, scPath.toString)
      .select(col("file"), col("log_bits"), col("k"), col("bloom"))
      .collect()
      .map { r =>
        val bytes = r.getAs[Array[Byte]]("bloom")
        val bits = new Array[Long](bytes.length / 8)
        ByteBuffer.wrap(bytes).asLongBuffer().get(bits)
        pathKey(r.getString(0)) -> ((bits, r.getInt(1), r.getInt(2)))
      }.toMap
    sidecarCache.put(key, CachedSidecar(sig, blooms))
    Some(blooms)
  }

  /** Surviving data files per the sidecar, with the staleness guard:
    * files absent from the sidecar are always kept. Probe hashes come from
    * evaluating XxHash64 on the predicate literals driver-side — the
    * literal's type equals the column's (the matcher binds bare
    * attributes), so this is exactly the hash the index was built with. */
  private def keptFiles(blooms: Map[String, (Array[Long], Int, Int)],
                        values: Seq[Literal],
                        allFiles: Seq[Path]): Option[Seq[Path]] = {
    val hashes = values.map(v =>
      new XxHash64(Seq(v)).eval(null).asInstanceOf[Long])
    val kept = allFiles.filter { f =>
      blooms.get(pathKey(f.toString)) match {
        case Some((bits, logBits, k)) =>
          hashes.exists(h => BloomBits.mightContain(bits, h, logBits, k))
        case None => true
      }
    }
    if (kept.size < allFiles.size) Some(kept) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    // opt-in: sessions that merely inject the extensions pay nothing
    if (spark.conf.get(EnabledKey, "false") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        rel.relation match {
          case fs: HadoopFsRelation
              if fs.partitionSchema.isEmpty &&
                fs.location.rootPaths.size == 1 &&
                !fs.location.isInstanceOf[BloomPrunedFileIndex] =>
            try pruneFilter(spark, f, cond, rel, fs)
            catch {
              case NonFatal(e) =>
                // fail open: a sidecar problem must never break planning
                logWarning(s"bloom-skip: sidecar probe failed for " +
                  s"${fs.location.rootPaths.head}, keeping full scan", e)
                f
            }
          case _ => f
        }
    }
  }

  private def pruneFilter(spark: SparkSession, f: Filter, cond: Expression,
                          rel: LogicalRelation,
                          fs: HadoopFsRelation): LogicalPlan = {
    val root = fs.location.rootPaths.head
    val candidates = eqConjuncts(cond).flatMap { case (name, lits) =>
      if (!fs.dataSchema.fieldNames.contains(name)) None
      else loadSidecar(spark, root.toString, name).map(b => (b, lits))
    }
    if (candidates.isEmpty) f
    else {
      val allFiles = fs.location.inputFiles.map(new Path(_)).toSeq
      // intersect across indexed conjuncts: a file must survive EVERY
      // indexed predicate to be read
      val keptOpt = candidates.foldLeft(Option(allFiles)) {
        case (None, _) => None
        case (Some(files), (blooms, lits)) =>
          keptFiles(blooms, lits, files).orElse(Some(files))
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
  }
}
