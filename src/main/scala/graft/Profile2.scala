package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for optimization round 16: per-step attribution
  * of the shard artifact save/append/verify paths (the three costliest
  * gates) so each micro-write and scan can be weighed before changing it.
  * Not part of the driver contract. Usage: runMain graft.Profile2 [sfDir] */
object Profile2 {
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
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println("docs rows: " + docs.count())

    // --- floor: what does ONE tiny coalesce(1) parquet write cost? ---
    for (i <- 1 to 4) {
      val d = graft.createTemporaryDir(s"prof2-tiny$i")
      time(s"tiny coalesce(1) parquet write #$i") {
        spark.range(1).select(lit(1).as("a"), lit("x").as("b"))
          .coalesce(1).write.mode("overwrite").parquet(s"$d/t")
      }
    }
    // floor: a driver-collected tiny toDF write (manifest-shaped)
    for (i <- 1 to 2) {
      val d = graft.createTemporaryDir(s"prof2-mani$i")
      time(s"tiny 3-col toDF write #$i") {
        Seq(("f1", 10L, 123L), ("f2", 11L, 456L)).toDF("file", "rows", "fingerprint")
          .coalesce(1).write.mode("overwrite").parquet(s"$d/m")
      }
    }

    // --- tokenizer artifact save: 4 writes today ---
    val model = graft.text.ByteBpe.train(docs, col("text"), numMerges = 80)
    val tok = graft.text.TokenizerArtifact.Tokenizer(model, Seq("<|endoftext|>"))
    val sep = graft.text.ByteBpe.vocabSize(model)
    for (i <- 1 to 3) {
      val d = graft.createTemporaryDir(s"prof2-tok$i")
      time(s"TokenizerArtifact.save #$i") {
        graft.text.TokenizerArtifact.save(spark, tok, s"$d/tokenizer")
      }
      if (i == 3) time("TokenizerArtifact.load") {
        graft.text.TokenizerArtifact.load(spark, s"$d/tokenizer")
      }
    }

    // --- saveShards step breakdown (default target: no resize fire) ---
    val encDocs = docs.select(col("doc_id"),
      graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model)
        .as("__ids")).localCheckpoint(true)
    for (i <- 1 to 2) {
      val d = graft.createTemporaryDir(s"prof2-shards$i")
      val dir = s"$d/shards"
      val handle = new graft.SilentUnpersistHandle()
      time(s"  [save $i] pack+write data") {
        try graft.text.Packing.packTokenIds(encDocs, col("__ids"),
            Seq(col("doc_id")), 512, sep,
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK, handle)
          .write.mode("overwrite").parquet(s"$dir/data")
        finally handle.unpersist()
      }
      time(s"  [save $i] certification scan+collect") {
        spark.read.parquet(s"$dir/data")
          .select(input_file_name().as("file"),
            xxhash64(to_json(struct(col("*")))).as("h"),
            size(col("ids")).cast("long").as("__n"))
          .groupBy("file")
          .agg(count(lit(1)).as("rows"), bit_xor(col("h")).as("fingerprint"),
            sum(col("__n")).as("__ids"))
          .collect()
      }
      time(s"  [save $i] manifest coalesce(1) write") {
        Seq(("f", 1L, 2L)).toDF("file", "rows", "fingerprint")
          .coalesce(1).write.mode("overwrite")
          .parquet(graft.write.Manifest.manifestPath(s"$dir/data"))
      }
      time(s"  [save $i] tokenizer save (4 writes)") {
        graft.text.TokenizerArtifact.save(spark, tok, s"$dir/tokenizer")
      }
      time(s"  [save $i] params coalesce(1) write") {
        spark.range(1).select(lit(512).as("capacity"), lit(sep).as("sep_id"),
          lit(0L).as("n_sequences"), lit(0L).as("total_ids"),
          lit(true).as("has_tokenizer"),
          lit(128L * 1024 * 1024).as("target_file_bytes"),
          lit(-1L).as("last_batch_id"))
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
      }
    }

    // --- appendShards step breakdown ---
    {
      val d = graft.createTemporaryDir("prof2-app")
      val dir = s"$d/shards"
      graft.text.Shards.saveShards(encDocs.filter(col("doc_id") < 250),
        col("__ids"), Seq(col("doc_id")), 512, sep, dir, Some(tok))
      val newDocs = encDocs.filter(col("doc_id") >= 250)
      val prev = time("  [app] params read") {
        spark.read.parquet(s"$dir/params").head()
      }
      val exCapacity = prev.getAs[Int]("capacity")
      val exSepId = prev.getAs[Int]("sep_id")
      val exNSequences = prev.getAs[Long]("n_sequences")
      val exTotalIds = prev.getAs[Long]("total_ids")
      val handle = new graft.SilentUnpersistHandle()
      val newPacked = time("  [app] pack build+persist+stats") {
        val p = graft.text.Packing.packTokenIds(newDocs, col("__ids"),
          Seq(col("doc_id")), exCapacity, exSepId,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK, handle,
          startOffset = exTotalIds)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.agg(count(lit(1)), coalesce(sum(size(col("ids")).cast("long")), lit(0L)),
          coalesce(max(col("seq_id")), lit(-1L))).head()
        p
      }
      val lastSeqId = exNSequences - 1
      val tailFiles = time("  [app] tail probe scan") {
        spark.read.parquet(s"$dir/data")
          .filter(col("seq_id") === lastSeqId)
          .select(input_file_name()).distinct().collect().map(_.getString(0))
      }
      println("    tail files: " + tailFiles.length)
      val tmpRows = time("  [app] merged plan build") {
        val tailFileDf = spark.read.parquet(tailFiles.head)
        val keptFromFile = tailFileDf.filter(col("seq_id") =!= lastSeqId)
          .select(col("seq_id"), col("ids"), col("n_docs"))
        val oldTail = tailFileDf.filter(col("seq_id") === lastSeqId)
          .select(col("seq_id"), col("ids").as("__old_ids"),
            col("n_docs").as("__old_docs"))
        keptFromFile.unionAll(newPacked
          .join(broadcast(oldTail), Seq("seq_id"), "left_outer")
          .select(col("seq_id"),
            when(col("__old_ids").isNotNull,
              concat(col("__old_ids"), col("ids"))).otherwise(col("ids")).as("ids"),
            (col("n_docs") + coalesce(col("__old_docs"), lit(0L))).as("n_docs")))
      }
      val dirPath = new org.apache.hadoop.fs.Path(s"$dir/data")
      val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
      val uuid = java.util.UUID.randomUUID().toString
      val tmp = new org.apache.hadoop.fs.Path(dirPath, s"_append_tmp_$uuid")
      time("  [app] tmp batch write") { tmpRows.write.parquet(tmp.toString) }
      val published = time("  [app] publish swap") {
        graft.write.SwapFiles.publishAndDelete(fs, dirPath, tmp, "append",
          uuid, Seq(new org.apache.hadoop.fs.Path(tailFiles.head)))
      }
      time("  [app] manifest incremental update") {
        graft.write.Manifest.updateManifestFor(spark, s"$dir/data", published,
          Seq(tailFiles.head))
      }
      time("  [app] params write") {
        spark.range(1).select(lit(exCapacity).as("capacity"),
          lit(exSepId).as("sep_id"), lit(99L).as("n_sequences"),
          lit(99L).as("total_ids"), lit(true).as("has_tokenizer"),
          lit(prev.getAs[Long]("target_file_bytes")).as("target_file_bytes"),
          lit(-1L).as("last_batch_id"))
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
      }
      newPacked.unpersist(); handle.unpersist()
    }

    // --- verifyShards breakdown: manifest verify vs structure scan ---
    {
      val d = graft.createTemporaryDir("prof2-ver")
      val dir = s"$d/shards"
      graft.text.Shards.saveShards(encDocs, col("__ids"),
        Seq(col("doc_id")), 512, sep, dir, Some(tok))
      val loaded = time("  [ver] loadShards") {
        graft.text.Shards.loadShards(spark, dir)
      }
      for (i <- 1 to 2) {
        time(s"  [ver] manifest verifySummary #$i") {
          graft.write.Manifest.verifySummary(spark, s"$dir/data").collect()
        }
        time(s"  [ver] structure aggregate #$i") {
          loaded.data.agg(count(lit(1)),
            coalesce(min(col("seq_id")), lit(-1L)),
            coalesce(max(col("seq_id")), lit(-1L)),
            countDistinct(col("seq_id")),
            sum(when(size(col("ids")) =!= 512, 1L).otherwise(0L)),
            max(when(size(col("ids")) =!= 512, col("seq_id"))),
            (coalesce(min(array_min(col("ids"))), lit(0)) >= 0 &&
              coalesce(max(array_max(col("ids"))), lit(-1)) < tok.vocabSize))
            .collect()
        }
        time(s"  [ver] full verifyShards #$i") {
          graft.text.Shards.verifyShards(spark, dir, loaded).collect()
        }
      }
    }
    spark.stop()
  }
}
