package graft

import graft.parquet.BloomIndex
import graft.plans.{BloomPrunedFileIndex, BloomSkipRule}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transparent Bloom-sidecar file skipping: result equality, actual file
  * pruning, staleness safety, and the non-matching shapes left untouched. */
class BloomSkipRuleSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Seq.empty
      }
    }.flatten

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ BloomSkipRule
    spark.conf.set("spark.graft.bloomSkip.enabled", "true")
    try f finally {
      spark.conf.unset("spark.graft.bloomSkip.enabled")
      spark.experimental.extraOptimizations = before
    }
  }

  private def makeIndexed(): (String, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bsr").toString + "/d"
    val df = spark.range(0, 8000).select(col("id").as("key"),
      (col("id") % 97).as("v"))
    df.repartitionByRange(16, col("key")).write.parquet(dir)
    BloomIndex.writeBloomIndex(spark, dir, "key", logBits = 18, k = 5)
    (dir, 4321L)
  }

  test("plain filter reads fewer files with identical results") {
    val (dir, key) = makeIndexed()
    val q = spark.read.parquet(dir).filter(col("key") === key)
    val plainRows = q.collect().toSeq
    withRule {
      val q2 = spark.read.parquet(dir).filter(col("key") === key)
      assert(q2.collect().toSeq == plainRows)
      val files = scannedFiles(q2)
      assert(files.nonEmpty && files.size < 16,
        s"expected pruning below 16 files, scanned ${files.size}")
      // the guard filter must survive the rewrite (false positives cost IO,
      // never correctness)
      assert(q2.queryExecution.optimizedPlan.toString.contains("Filter"))
    }
  }

  test("IN-list prunes to the union of surviving files") {
    val (dir, _) = makeIndexed()
    withRule {
      val q = spark.read.parquet(dir)
        .filter(col("key").isin(10L, 7995L))
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 7995L))
      val n = scannedFiles(q).size
      assert(n >= 1 && n < 16, s"scanned $n")
    }
  }

  test("a file appended after the index build is never skipped (staleness)") {
    val (dir, _) = makeIndexed()
    // append a row whose key no indexed file contains — NOT in the sidecar
    Seq((999999L, 0L)).toDF("key", "v").write.mode("append").parquet(dir)
    withRule {
      val q = spark.read.parquet(dir).filter(col("key") === 999999L)
      assert(q.count() == 1L)
    }
  }

  test("no sidecar, non-equality, and disabled-flag shapes stay untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bsr2").toString + "/d"
    spark.range(0, 100).select(col("id").as("key")).write.parquet(dir)
    withRule {
      // no sidecar: full listing
      val q1 = spark.read.parquet(dir).filter(col("key") === 5L)
      assert(q1.count() == 1L)
      assert(!q1.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation }.exists {
        case fs: HadoopFsRelation => fs.location.isInstanceOf[BloomPrunedFileIndex]
        case _ => false })
    }
    val (dir2, key) = makeIndexed()
    withRule {
      // range predicate: not an equality shape -> untouched
      val q2 = spark.read.parquet(dir2).filter(col("key") > 7990L)
      assert(q2.count() == 9L)
      assert(scannedFiles(q2).size == 16)
      // explicit kill switch wins even inside withRule
      spark.conf.set("spark.graft.bloomSkip.enabled", "false")
      try {
        val q3 = spark.read.parquet(dir2).filter(col("key") === key)
        assert(scannedFiles(q3).size == 16)
      } finally spark.conf.set("spark.graft.bloomSkip.enabled", "true")
    }
    // OPT-IN default: rule injected but conf unset -> no pruning, no
    // sidecar IO on unrelated sessions' queries
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ BloomSkipRule
    try {
      val q4 = spark.read.parquet(dir2).filter(col("key") === key)
      assert(scannedFiles(q4).size == 16)
    } finally spark.experimental.extraOptimizations = before
  }

  test("sidecar cache invalidates when the index is rebuilt") {
    val (dir, _) = makeIndexed()
    withRule {
      // warm the cache with the full index
      val q1 = spark.read.parquet(dir).filter(col("key") === 4321L)
      assert(scannedFiles(q1).size < 16)
      // rebuild the sidecar over a disjoint fake column domain is not
      // possible here; instead rebuild with far fewer bits so the file
      // set survives but the cached entry must be re-read (signature
      // changes: bytes + mtime). Pruning still holds and results match.
      BloomIndex.writeBloomIndex(spark, dir, "key", logBits = 14, k = 3)
      val q2 = spark.read.parquet(dir).filter(col("key") === 4321L)
      assert(q2.collect().map(_.getLong(0)).toSeq == Seq(4321L))
      assert(scannedFiles(q2).size < 16)
    }
  }

  test("registerAll wires the rule into a live session exactly once") {
    val before = spark.experimental.extraOptimizations
    try {
      GraftExtensions.registerAll(spark)
      GraftExtensions.registerAll(spark)
      assert(spark.experimental.extraOptimizations.count(_ == BloomSkipRule) == 1)
    } finally spark.experimental.extraOptimizations = before
  }
}
