package graft

import graft.plans.{ZonePrunedFileIndex, ZoneSkipRule}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Footer-driven zone-map file skipping: result equality, pruning on
  * range-clustered data, conservative keeps, opt-in default-off. */
class ZoneSkipRuleSuite extends AnyFunSuite with SparkTest {

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.length
        case _ => 0
      }
    }.sum

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ ZoneSkipRule
    spark.conf.set("spark.graft.zoneSkip.enabled", "true")
    try f finally {
      spark.conf.unset("spark.graft.zoneSkip.enabled")
      spark.experimental.extraOptimizations = before
    }
  }

  private def clustered(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_zsr").toString + "/d"
    spark.range(0, 8000).select(col("id").as("key"), (col("id") % 13).as("v"))
      .repartitionByRange(16, col("key")).write.parquet(dir)
    dir
  }

  test("range filter on clustered data scans a file slice, results equal") {
    val dir = clustered()
    val plain = spark.read.parquet(dir)
      .filter(col("key") >= 1000L && col("key") < 1500L)
      .collect().map(_.getLong(0)).sorted.toSeq
    withRule {
      val q = spark.read.parquet(dir)
        .filter(col("key") >= 1000L && col("key") < 1500L)
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == plain)
      val n = scannedFiles(q)
      assert(n >= 1 && n <= 4, s"expected a narrow slice of 16 files, got $n")
      assert(q.queryExecution.optimizedPlan.toString.contains("Filter"))
    }
  }

  test("point equality prunes through the zone path too") {
    val dir = clustered()
    withRule {
      val q = spark.read.parquet(dir).filter(col("key") === 4242L)
      assert(q.count() == 1L)
      assert(scannedFiles(q) <= 2)
    }
  }

  test("an out-of-range predicate collapses to an empty relation") {
    val dir = clustered()
    withRule {
      val q = spark.read.parquet(dir).filter(col("key") > 1000000L)
      assert(q.count() == 0L)
    }
  }

  test("default-off: without the conf the plan is untouched") {
    val dir = clustered()
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ ZoneSkipRule
    try {
      val q = spark.read.parquet(dir).filter(col("key") === 1L)
      assert(scannedFiles(q) == 16)
      assert(!q.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation }.exists {
        case fs: HadoopFsRelation => fs.location.isInstanceOf[ZonePrunedFileIndex]
        case _ => false })
    } finally spark.experimental.extraOptimizations = before
  }

  test("unclustered data keeps every file (conservative, never wrong)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zsr2").toString + "/d"
    // random layout: every file's [min, max] straddles the probe range
    spark.range(0, 8000).select((col("id") * 2654435761L % 8000).as("key"))
      .repartition(8).write.parquet(dir)
    withRule {
      val q = spark.read.parquet(dir)
        .filter(col("key") >= 4000L && col("key") < 4100L)
      val expect = spark.read.parquet(dir)
        .where(col("key") >= 4000L && col("key") < 4100L).count()
      assert(q.count() == expect)
      assert(scannedFiles(q) == 8)
    }
  }
}
