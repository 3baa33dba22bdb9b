package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch profiling main for optimization round 16: per-step attribution
  * of the curation family (curation_increment is the costliest gate in the
  * r15 driver bench). Not part of the driver contract.
  * Usage: runMain graft.Profile3 [sfDir] */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println("docs rows: " + docs.count())
    val isNew = expr("CAST(substring(source, 4) AS INT) >= 10")

    for (round <- 1 to 2) {
      println(s"=== curation_increment pass $round ===")
      val idx = graft.createTemporaryDir(s"prof3-idx$round")
      val old = docs.filter(!isNew)
      // --- saveDedupIndex split ---
      val shingled = old.select(col("doc_id").as("id"),
        graft.text.TextFunctions.hashedTextShingles(col("text"), 3).as("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("  save: shingles write (materializes cache)") {
        shingled.write.mode("overwrite").parquet(s"$idx/shingles")
      }
      time("  save: buckets explode+prune+repart+write") {
        val exploded = shingled.select(col("id"),
          posexplode(graft.functions.vectors.minhash_band_hashes(col("shingles"), 16, 8))
            .as(Seq("band", "bucket")))
        val inRange = exploded
          .groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bucket_count"))
          .filter(col("__bucket_count") <= 1000)
          .select(col("band"), col("bucket"))
        exploded.join(inRange, Seq("band", "bucket"), "left_semi")
          .repartition(col("band"), col("bucket"))
          .write.mode("overwrite").parquet(s"$idx/buckets")
      }
      time("  save: params write (local)") {
        graft.parquet.LocalParquet.write(spark, s"$idx/params",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("shingle_size", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("bands", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("rows_per_band", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("max_bucket_size", org.apache.spark.sql.types.IntegerType))),
          Seq(org.apache.spark.sql.Row(3, 16, 8, 1000)))
      }
      shingled.unpersist()

      // --- curateIncrement split ---
      val batch = docs.filter(isNew)
      val p = graft.dedup.DedupIndex.readIndexParams(spark, idx)
      val (langKeep, qualKeep) = {
        val lk = graft.text.TextFunctions.langId(col("text"),
          graft.text.TextFunctions.AsciiTokenPattern).isin("en")
        val qk = graft.text.QualityFilters.gopherKeep(
          col("text"), 30, 90, 3.0, 6.0, 0.02, 0.2)
        (lk, qk)
      }
      time("  inc: leading fused agg") {
        batch.agg(count(lit(1)),
          coalesce(sum(when(langKeep, 1L).otherwise(0L)), lit(0L)),
          coalesce(sum(when(langKeep && qualKeep, 1L).otherwise(0L)), lit(0L))).head()
      }
      var cur = batch.filter(langKeep && qualKeep)
      cur = time("  inc: 3_exact persist+count") {
        val s3 = graft.dedup.Dedup.dropExactTextDuplicates(cur, col("text"), col("doc_id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        s3.count(); s3
      }
      val mhHandle = graft.UnpersistHandle()
      val prev4 = cur
      cur = time("  inc: 4_neardup_batch persist+count") {
        val s4 = graft.dedup.Dedup.deduplicateMinHash(
          cur, col("doc_id"), col("text"), p.shingleSize, p.bands, p.rowsPerBand,
          0.8, unpersistHandle = mhHandle).persist(StorageLevel.MEMORY_AND_DISK)
        s4.count(); s4
      }
      mhHandle.unpersist(); prev4.unpersist(false)
      val idxHandle = graft.UnpersistHandle()
      val prev5 = cur
      cur = time("  inc: 5_neardup_index persist+count") {
        val s5 = graft.dedup.DedupIndex.deduplicateAgainstIndex(
          cur, col("doc_id"), col("text"), idx, 0.8, p.maxBucketSize,
          StorageLevel.MEMORY_AND_DISK, idxHandle).persist(StorageLevel.MEMORY_AND_DISK)
        s5.count(); s5
      }
      idxHandle.unpersist()
      val pinned = time("  inc: localCheckpoint(survivors)") {
        cur.localCheckpoint(true)
      }
      prev5.unpersist(false)
      time("  inc: appendToDedupIndex") {
        graft.dedup.DedupIndex.appendToDedupIndex(pinned, col("doc_id"), col("text"), idx)
      }
      println()
    }
    spark.stop()
  }
}
