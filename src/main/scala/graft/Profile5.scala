package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for optimization round 16: phase attribution of
  * streaming_shard_append (the costliest gate in the r15 driver bench) and
  * shards_append_readback. Not part of the driver contract.
  * Usage: runMain graft.Profile5 [sfDir] */
object Profile5 {
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
    docs.count()
    val hazards = SparkEntry.byteBpeHazards.toDF("doc_id", "text")

    for (round <- 1 to 2) {
      println(s"=== streaming_shard_append pass $round ===")
      val corpus = docs.unionAll(hazards)
      val model = time("  bpe train") {
        graft.text.ByteBpe.train(corpus, col("text"), numMerges = 80)
      }
      val tok = graft.text.TokenizerArtifact.Tokenizer(model, Seq("<|endoftext|>"))
      val sep = graft.text.ByteBpe.vocabSize(model)
      val ids = graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model)
      val shardDir = graft.createTemporaryDir(s"prof5-shards$round")
      val root = java.nio.file.Files.createTempDirectory("prof5_stream").toString
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val span = maxId / 3 + 1
      val schema = time("  writeOrderedBatches") {
        graft.streaming.StreamHarness.writeOrderedBatches(
          docs, least(expr(s"doc_id DIV ${span}L"), lit(2L)).cast("int"),
          numBatches = 3, s"$root/in")
      }
      val stream = graft.streaming.StreamHarness.readOrderedBatches(
        spark, s"$root/in", schema)
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        time("  stream 3 batches (save + 2 appends)") {
          val q = graft.streaming.StreamingShards.appendStream(
            stream, ids, Seq(col("doc_id")), capacity = 512, sepId = sep,
            dir = shardDir, tokenizer = Some(tok), checkpointDir = s"$root/ck")
          try { q.processAllAvailable() } finally q.stop()
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      val loaded = time("  loadShards") { graft.text.Shards.loadShards(spark, shardDir) }
      val verify = graft.text.Shards.verifyShards(spark, shardDir, loaded)
      def contentHash(df: org.apache.spark.sql.DataFrame) =
        df.agg(bit_xor(xxhash64(col("seq_id"), col("ids"), col("n_docs"))).as("h"))
      val oneShot = graft.text.Packing.packTokenIds(docs, ids,
        Seq(col("doc_id")), capacity = 512, sepId = sep)
      val hEq = contentHash(loaded.data)
        .crossJoin(contentHash(oneShot).withColumnRenamed("h", "h2"))
        .select((col("h") <=> col("h2")).as("stream_equals_oneshot"))
      val unpacked = graft.text.Shards.unpackShards(loaded, 1L << 22)
      val mapping = graft.RowNumbers.withRowNumbers(
        docs.select(col("doc_id")), rowNumberColumnName = "__rn",
        order = Seq(col("doc_id")))
        .select(col("doc_id"), (col("__rn") - 1).as("doc_idx"))
      val fin = mapping.join(unpacked, Seq("doc_idx"), "left_outer")
        .select(col("doc_id"),
          loaded.tokenizer.get.decodeIds(
            coalesce(col("ids"), array().cast("array<int>"))).as("decoded"))
        .crossJoin(broadcast(verify.select(col("all_ok"))))
        .crossJoin(broadcast(hEq))
      time("  final verify+roundtrip query") {
        fin.queryExecution.toRdd.count()
      }
      spark.catalog.clearCache()
      println()
    }

    // split the streaming sink's work: save vs append, at shuffle.partitions=4
    println("=== appendShards split (shuffle.partitions=4, bench regime) ===")
    locally {
      val corpus = docs.unionAll(hazards)
      val model = graft.text.ByteBpe.train(corpus, col("text"), numMerges = 80)
      val tok = graft.text.TokenizerArtifact.Tokenizer(model, Seq("<|endoftext|>"))
      val sep = graft.text.ByteBpe.vocabSize(model)
      val encDocs = docs.select(col("doc_id"),
        graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model)
          .as("__ids")).localCheckpoint(true)
      // per-job tracing: print every Spark job's wall time during appends
      val listener = new org.apache.spark.scheduler.SparkListener {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, System.nanoTime())
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(je.jobId)
          if (t0 != 0L) println(f"    JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        for (i <- 1 to 2) {
          val d = graft.createTemporaryDir(s"prof5-app$i")
          val dir = s"$d/shards"
          time(s"  [#$i] saveShards(first third)") {
            graft.text.Shards.saveShards(encDocs.filter(col("doc_id") < 1666),
              col("__ids"), Seq(col("doc_id")), 512, sep, dir, Some(tok))
          }
          time(s"  [#$i] appendShards(second third)") {
            graft.text.Shards.appendShards(
              encDocs.filter(col("doc_id") >= 1666 && col("doc_id") < 3333),
              col("__ids"), Seq(col("doc_id")), dir)
          }
          time(s"  [#$i] appendShards(last third)") {
            graft.text.Shards.appendShards(
              encDocs.filter(col("doc_id") >= 3333),
              col("__ids"), Seq(col("doc_id")), dir)
          }
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.stop()
  }
}
