package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR and
 * prints one JSON line. Timing forces execution via queryExecution.toRdd.count()
 * so Catalyst cannot prune the measured projection down to a count(*) scan.
 * Failures are reported per query in an "errors" object instead of being
 * silently folded into the timings.
 */
object Bench {
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Fixed CPU-bound reference workload (FNV-mix loop, no allocation). */
  private def burn(iters: Long): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0L
    while (i < iters) { h ^= i; h *= 0x100000001b3L; i += 1 }
    h
  }

  /**
   * Machine-state calibration: the same total work single-threaded and
   * split over `n` threads. On a healthy `n`-core box the parallel time is
   * ~calib_1t/n; host oversubscription shows up as a higher ratio. Emitted
   * in the JSON so query times can be normalized across rounds measured on
   * different machine states (observed: identical plans 3-4x slower when
   * the host delivers ~11 of 32 advertised cores).
   */
  private def calibrate(n: Int): (Double, Double) = {
    val iters = 400000000L
    burn(iters / 4) // JIT warm
    var t0 = System.nanoTime()
    burn(iters)
    val t1t = (System.nanoTime() - t0) / 1e9
    val threads = (0 until n).map(_ => new Thread(() => { burn(iters / n); () }))
    t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val tnt = (System.nanoTime() - t0) / 1e9
    (t1t, tnt)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS): read as long, session-wide and
      // order-independent (no per-query conf mutation)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up JVM/codegen/scheduler so the first measured query isn't inflated
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // Two full passes over the query set: pass 1 warms JIT, the codegen class
    // cache, and the OS page cache for the scanned parquet; pass 2 is what we
    // report. BASELINE.md was measured warm the same way, so the 2x gate
    // compares like with like — a cold single pass mostly measures JVM
    // startup effects, not the plans (observed ~2x inflation, BENCH_r03).
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (_ <- 1 to passes) {
      timings.clear(); errors.clear()
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          timings(name) = (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errors(name) = e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").take(200)
        }
        // release per-query persisted intermediates (dedup shingle sets etc.)
        // so caches never accumulate across queries or passes
        spark.catalog.clearCache()
      }
    }

    val qs = timings.map { case (k, v) => "\"" + jsonEscape(k) + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + jsonEscape(k) + "\":\"" + jsonEscape(v) + "\"" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val (c1, cn) = calibrate(cpus.toInt)
    val calib = s""""calib":{"threads":${cpus.toInt},"t_1thread":$c1,"t_nthreads":$cn,""" +
      s""""effective_cores":${if (cn > 0) c1 / cn else 0.0}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,$calib,"sf":"${jsonEscape(sfDir)}"}""")
    spark.stop()
  }
}
