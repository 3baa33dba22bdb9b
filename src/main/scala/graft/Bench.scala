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
    // WindowExec warns "No Partition Defined for Window operation" on every
    // deliberately-global window: the #partitions-row offset windows of
    // RowNumbers/PrefixSum (three-phase design — the global window only ever
    // sees one tiny row per partition) and Skew's k-survivor ranking. Those
    // are bounded by construction, so the warning is noise here — silence
    // that one logger rather than let it trail the metric line.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    // warm up JVM/codegen/scheduler so the first measured query isn't inflated
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // Two full passes over the query set; each query reports its BEST time
    // across passes. Pass 1 still warms JIT, the codegen class cache, and the
    // OS page cache (BASELINE.md was measured warm the same way), but
    // best-of-N additionally makes the numbers collapse-resistant: a host
    // stall during one pass (round 4 lost 5 queries to a minutes-long
    // oversubscription window, 40x spread between identical-plan siblings)
    // poisons a query only if it hits the SAME query in EVERY pass. A calib
    // probe runs before, between, and after the passes so the JSON records
    // whether the host state drifted mid-run.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    // local profiling aid: restrict the measured set to a comma-separated
    // list of query names (full set when unset — the driver's mode)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val probes = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    probes += calibrate(cpus.toInt)
    for (pass <- 1 to passes) {
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          if (!best.get(name).exists(_ <= sec)) best(name) = sec
          errors.remove(name) // a later success clears an earlier failure
        } catch {
          case e: Throwable =>
            if (!best.contains(name))
              errors(name) = e.getClass.getSimpleName + ": " +
                Option(e.getMessage).getOrElse("").take(200)
        }
        // release per-query persisted intermediates (dedup shingle sets etc.)
        // so caches never accumulate across queries or passes
        spark.catalog.clearCache()
      }
      probes += calibrate(cpus.toInt)
    }

    // The driver captures only the LAST ~2000 characters of stdout and
    // json-parses the metric line from that tail (rounds 1-5 all came back
    // `parsed: null` because the full-precision line was ~3.5 KB and its
    // head — `{"metric":...` — fell off the window). So stdout gets ONE
    // compact line — 1-decimal seconds with trailing zeros trimmed, errors
    // omitted when empty, calib collapsed to max/min effective cores, sf as
    // basename — that fits the window with sbt's trailing "[success]" line
    // included (~1.8 KB at the current 80-query set, re-check if it grows
    // past ~90). Full-precision timings, probe detail, and untruncated
    // errors go to target/bench_full.json for local analysis.
    // Locale.ROOT: f"$v%.1f" uses the JVM default locale, and a
    // comma-decimal locale (de_DE etc.) would render "56,2" — invalid JSON,
    // silently reintroducing the parsed:null failure this line exists to fix
    def num(v: Double, coarse: Boolean): String = {
      val s = String.format(java.util.Locale.ROOT,
        if (coarse && v >= 1.0) "%.0f" else "%.1f", Double.box(v))
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
    val total = best.values.sum
    val cores = probes.map { case (c1, cn) => if (cn > 0) c1 / cn else 0.0 }
    // Rendering contract: "value" is always 1-decimal from full precision,
    // while per-query times may be rounded to whole seconds under coarse
    // rendering — so sum(queries) can drift from "value" by up to ~0.5 s per
    // query. Consumers reconciling totals against parts should read
    // target/bench_full.json, which carries full precision for both.
    // "errors" is always present (possibly {}) so the line's shape is stable
    // across clean and failing runs. When even the coarse rendering overflows
    // the tail window (the query set outgrew it — 82 queries rendered 1,969
    // of the 1,975 budget in round 6), the "queries" map keeps only the MOST
    // EXPENSIVE `keep` entries (the ones plan audits and baseline ratios
    // need) and reports the rest as "q_omitted" — a partial map parses; an
    // overflowing full map does not.
    def compactLine(coarse: Boolean, errChars: Int, keep: Int = Int.MaxValue): String = {
      val kept =
        if (best.size <= keep) best.toSeq
        else best.toSeq.sortBy(-_._2).take(keep)
      val qs = kept.map { case (k, v) => "\"" + jsonEscape(k) + "\":" + num(v, coarse) }
        .mkString("{", ",", "}")
      val omitted =
        if (best.size <= keep) "" else s""""q_omitted":${best.size - keep},"""
      val errs = errors
        .map { case (k, v) => "\"" + jsonEscape(k) + "\":\"" + jsonEscape(v.take(errChars)) + "\"" }
        .mkString("\"errors\":{", ",", "},")
      val calib = s""""cores":${num(cores.max, coarse = false)},"min":${num(cores.min, coarse = false)}"""
      val sfName = new java.io.File(sfDir).getName
      s"""{"metric":"total","value":${num(total, coarse = false)},"unit":"sec","queries":$qs,$omitted$errs$calib,"sf":"${jsonEscape(sfName)}"}"""
    }

    val fullQs = best.map { case (k, v) => "\"" + jsonEscape(k) + "\":" + v }
      .mkString("{", ",", "}")
    val fullErrs = errors.map { case (k, v) => "\"" + jsonEscape(k) + "\":\"" + jsonEscape(v) + "\"" }
      .mkString("{", ",", "}")
    val probesJson = probes.zip(cores).map { case ((c1, cn), e) =>
      s"""{"t_1thread":$c1,"t_nthreads":$cn,"effective_cores":$e}"""
    }.mkString("[", ",", "]")
    val fullCalib = s""""calib":{"threads":${cpus.toInt},"probes":$probesJson,""" +
      s""""effective_cores":${cores.max},"effective_cores_min":${cores.min}}"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"errors":$fullErrs,$fullCalib,"sf":"${jsonEscape(sfDir)}"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench_full.json"), full)
    catch { case _: Throwable => () }

    // stop BEFORE printing so no shutdown logging can land after the metric
    // line; then pick the richest rendering whose line still fits the
    // 2000-char tail window (the metric line is the LAST stdout line —
    // showSuccess is off — so only its own newline shares the window).
    // Degradation order matters most when queries ERRORED — that is when the
    // line must stay parseable: 1-decimal everywhere, then whole seconds for
    // values >= 1, then progressively shorter error messages (full text is
    // in target/bench_full.json either way).
    spark.stop()
    val candidates = Seq(
      compactLine(coarse = false, errChars = 60),
      compactLine(coarse = true, errChars = 60),
      compactLine(coarse = true, errChars = 30),
      compactLine(coarse = true, errChars = 0)) ++
      // progressive per-query truncation: most-expensive entries survive
      Seq(80, 75, 70, 65, 60, 50, 40, 30, 20, 10).map(k =>
        compactLine(coarse = true, errChars = 0, keep = k))
    val chosen = candidates.find(_.length <= 1975).getOrElse(candidates.last)
    if (chosen.length > 1975)
      // stderr, so the warning cannot enter the driver's stdout tail window;
      // at this point even 10 query names overflow it — shrink the query
      // set or raise the window before trusting the parsed line
      System.err.println(s"WARNING: bench metric line is ${chosen.length} chars, " +
        "exceeding the ~1975-char stdout tail window even fully degraded; " +
        "the driver may record parsed:null. Full data: target/bench_full.json")
    println(chosen)
  }
}
