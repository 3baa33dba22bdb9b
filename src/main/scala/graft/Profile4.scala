package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch A/B main for optimization round 16: OLD vs NEW curation shapes
  * alternating inside ONE JVM/session so host drift cannot masquerade as a
  * delta (the r15 lesson). OLD = r15 code shape inlined verbatim; NEW = the
  * library after this round's edits. Not part of the driver contract.
  * Usage: runMain graft.Profile4 [reps] */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val isNew = expr("CAST(substring(source, 4) AS INT) >= 10")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    // ---- OLD curation_increment gate shape (r15 library, inlined) ----
    def oldIncrement(): Unit = {
      val idx = graft.createTemporaryDir("p4-old-idx")
      // old saveDedupIndex: sequential writes, first write materializes
      val oldShingled = docs.filter(!isNew).select(col("doc_id").as("id"),
        graft.text.TextFunctions.hashedTextShingles(col("text"), 3).as("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        oldShingled.write.mode("overwrite").parquet(s"$idx/shingles")
        val exploded = oldShingled.select(col("id"),
          posexplode(graft.functions.vectors.minhash_band_hashes(col("shingles"), 16, 8))
            .as(Seq("band", "bucket")))
        val inRange = exploded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bucket_count"))
          .filter(col("__bucket_count") <= 1000)
          .select(col("band"), col("bucket"))
        exploded.join(inRange, Seq("band", "bucket"), "left_semi")
          .repartition(col("band"), col("bucket"))
          .write.mode("overwrite").parquet(s"$idx/buckets")
        graft.parquet.LocalParquet.write(spark, s"$idx/params",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("shingle_size", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("bands", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("rows_per_band", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("max_bucket_size", org.apache.spark.sql.types.IntegerType))),
          Seq(org.apache.spark.sql.Row(3, 16, 8, 1000)))
      } finally oldShingled.unpersist()
      // old curateIncrement: dedicated leading agg + sequential append
      val batch = docs.filter(isNew)
      val lk = graft.text.TextFunctions.langId(col("text"),
        graft.text.TextFunctions.AsciiTokenPattern).isin("en")
      val qk = graft.text.QualityFilters.gopherKeep(col("text"), 30, 90, 3.0, 6.0, 0.02, 0.2)
      batch.agg(count(lit(1)),
        coalesce(sum(when(lk, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(lk && qk, 1L).otherwise(0L)), lit(0L))).head()
      var cur = batch.filter(lk && qk)
      val s3 = graft.dedup.Dedup.dropExactTextDuplicates(cur, col("text"), col("doc_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      s3.count()
      val mh = graft.UnpersistHandle()
      val s4 = graft.dedup.Dedup.deduplicateMinHash(s3, col("doc_id"), col("text"),
        3, 16, 8, 0.8, unpersistHandle = mh).persist(StorageLevel.MEMORY_AND_DISK)
      s4.count(); mh.unpersist(); s3.unpersist(false)
      val ih = graft.UnpersistHandle()
      val s5 = graft.dedup.DedupIndex.deduplicateAgainstIndex(
        s4, col("doc_id"), col("text"), idx, 0.8, 1000,
        StorageLevel.MEMORY_AND_DISK, ih).persist(StorageLevel.MEMORY_AND_DISK)
      s5.count(); ih.unpersist()
      val pinned = s5.localCheckpoint(true)
      s4.unpersist(false); s5.unpersist(false)
      // old appendToDedupIndex: sequential, first write materializes
      val p = graft.dedup.DedupIndex.readIndexParams(spark, idx)
      val aSh = pinned.select(col("doc_id").as("id"),
        graft.text.TextFunctions.hashedTextShingles(col("text"), p.shingleSize).as("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        aSh.write.mode("append").parquet(s"$idx/shingles")
        val ex = aSh.select(col("id"),
          posexplode(graft.functions.vectors.minhash_band_hashes(col("shingles"), p.bands, p.rowsPerBand))
            .as(Seq("band", "bucket")))
        val ir = ex.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bucket_count"))
          .filter(col("__bucket_count") <= p.maxBucketSize)
          .select(col("band"), col("bucket"))
        ex.join(ir, Seq("band", "bucket"), "left_semi")
          .repartition(col("band"), col("bucket"))
          .write.mode("append").parquet(s"$idx/buckets")
      } finally aSh.unpersist()
    }

    // ---- NEW curation_increment gate shape (the library as edited) ----
    def newIncrement(): Unit = {
      val idx = graft.createTemporaryDir("p4-new-idx")
      graft.dedup.DedupIndex.saveDedupIndex(
        docs.filter(!isNew), col("doc_id"), col("text"), idx)
      val handle = UnpersistHandle()
      val (_, report) = graft.pipeline.Curation.curateIncrement(
        docs.filter(isNew), col("doc_id"), col("text"), idx,
        keepLangs = Set("en"), minTokens = 30, maxTokens = 90,
        minAvgTokenLen = 3.0, maxAvgTokenLen = 6.0,
        minStopwordRatio = 0.02, maxTopBigramFraction = 0.2,
        unpersistHandle = handle)
      report.queryExecution.toRdd.count()
      handle.unpersist()
    }

    // ---- OLD curate (curation_report shape): dedicated leading agg ----
    def oldReport(): Unit = {
      val lk = graft.text.TextFunctions.langId(col("text"),
        graft.text.TextFunctions.AsciiTokenPattern).isin("en")
      val qk = graft.text.QualityFilters.gopherKeep(col("text"), 30, 90, 3.0, 6.0, 0.02, 0.2)
      val ck = graft.text.Classifier.logit(col("text"),
        SparkEntry.classifierGateWeights, 0L) >= 0L
      docs.agg(count(lit(1)),
        coalesce(sum(when(lk, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(lk && qk, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(lk && qk && ck, 1L).otherwise(0L)), lit(0L))).head()
      var cur = docs.filter(lk && qk && ck)
      val s3 = graft.dedup.Dedup.dropExactTextDuplicates(cur, col("text"), col("doc_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      s3.count()
      val mh = graft.UnpersistHandle()
      val s4 = graft.dedup.Dedup.deduplicateMinHash(s3, col("doc_id"), col("text"),
        3, 16, 8, 0.8, unpersistHandle = mh).persist(StorageLevel.MEMORY_AND_DISK)
      s4.count(); mh.unpersist(); s3.unpersist(false)
      val bl = docs.filter(col("doc_id") % 97 === 0)
      val s5 = graft.dedup.Dedup.decontaminate(s4, col("doc_id"), col("text"),
        bl, col("text"), 5, 1).persist(StorageLevel.MEMORY_AND_DISK)
      s5.count(); s4.unpersist(false)
      val s6 = graft.sample.Sampling.hashSample(s5, col("doc_id"), 0.25, "graft")
        .persist(StorageLevel.MEMORY_AND_DISK)
      s6.count(); s5.unpersist(false)
      s6.unpersist(false)
    }

    // ---- NEW curate via the library ----
    def newReport(): Unit = {
      val handle = UnpersistHandle()
      val (_, report) = graft.pipeline.Curation.curate(
        docs, col("doc_id"), col("text"),
        keepLangs = Set("en"), minTokens = 30, maxTokens = 90,
        minAvgTokenLen = 3.0, maxAvgTokenLen = 6.0,
        minStopwordRatio = 0.02, maxTopBigramFraction = 0.2,
        classifierWeights = Some(SparkEntry.classifierGateWeights),
        blocklist = Some((docs.filter(col("doc_id") % 97 === 0), col("text"))),
        sampleRate = 0.25, unpersistHandle = handle)
      report.queryExecution.toRdd.count()
      handle.unpersist()
    }

    // JIT/codegen warm both shapes once, unmeasured
    oldIncrement(); spark.catalog.clearCache()
    newIncrement(); spark.catalog.clearCache()
    oldReport(); spark.catalog.clearCache()
    newReport(); spark.catalog.clearCache()

    val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to reps) {
      res("inc_old") ::= timed(oldIncrement())
      res("inc_new") ::= timed(newIncrement())
      res("rep_old") ::= timed(oldReport())
      res("rep_new") ::= timed(newReport())
      println(s"rep $r done")
    }
    res.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      println(f"PROF $k%-10s min ${vs.min}%6.3f  med ${vs.sorted.apply(vs.size / 2)}%6.3f  all ${vs.reverse.map(v => f"$v%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
