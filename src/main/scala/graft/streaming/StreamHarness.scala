package graft.streaming

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Deterministic replay harness for the streaming operators: turn a bounded
 * batch table into an ordered sequence of file-source micro-batches, run a
 * streaming transform to exhaustion into a parquet sink, and read the sink
 * back. This is how the streaming operators get the same DuckDB-oracle
 * treatment as the batch ones (and how a production incident gets replayed
 * from a parquet snapshot through the exact streaming plan).
 *
 * Batch-order control is the whole point: Structured Streaming's
 * keep-first operators (`dropDuplicatesWithinWatermark`, the bucket-state
 * near-dup detectors) pick the first row they SEE, so a replay is only
 * deterministic if every micro-batch holds at most one row per state key
 * and batches arrive in a chosen order. [[writeOrderedBatches]] gives
 * exactly that: batch `b` = the rows with `batchCol == b`, written as one
 * parquet file each with strictly increasing modification times, so a
 * `maxFilesPerTrigger=1` file stream replays them in `batchCol` order.
 */
object StreamHarness {

  /** Write `df` as one parquet file per `batchCol` value (0-based, dense)
    * into `dir`, in ascending batch order with strictly increasing file
    * modification times. Returns the written schema (minus `batchCol`) for
    * `readStream.schema(...)`. Gate/replay scale: one parallel write job,
    * up to one task per batch (hash collisions may co-locate a few batch
    * values on one task; each batch directory still gets exactly one part
    * file). Contract note: every batch
    * value in `[0, numBatches)` must be non-empty (dense) — an empty batch
    * fails loudly rather than silently merging micro-batch boundaries. */
  def writeOrderedBatches(df: DataFrame, batchCol: Column, numBatches: Int,
                          dir: String): StructType = {
    require(numBatches >= 1, s"numBatches must be >= 1: $numBatches")
    // ONE pass over the staged data: a partitionBy("__batch") write splits
    // the batches in a single job (the per-batch loop this replaces
    // re-computed the whole staged plan once per batch — for an
    // expensively-derived stage that tripled the setup cost). Hash-
    // repartitioning ON the batch value keeps the write parallel (up to
    // one task per batch — colliding batch values share a task — instead
    // of one global task) while still guaranteeing each batch directory
    // holds exactly one part file: all rows of a batch land in one task,
    // and a task writes one file per directory it touches.
    val staging = dir + "__staging"
    df.withColumn("__batch", batchCol)
      .filter(org.apache.spark.sql.functions.col("__batch")
        .between(0, numBatches - 1))
      .repartition(numBatches, org.apache.spark.sql.functions.col("__batch"))
      .write.partitionBy("__batch").parquet(staging)
    // promote each batch's part file to dir/batch-<b>-<name> with strictly
    // increasing modification times (the file source orders by mtime), in
    // batch order, robust to a coarse-granularity filesystem clock
    val root = new java.io.File(dir)
    root.mkdirs()
    var lastMod = 0L
    (0 until numBatches).foreach { b =>
      val sub = new java.io.File(staging, s"__batch=$b")
      val parts = Option(sub.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.endsWith(".parquet"))
      // the contract is one file per DENSE batch value: a batch with no
      // rows writes no partition directory, and silently skipping it would
      // merge the replay's micro-batch boundaries — fail loudly instead
      require(parts.nonEmpty,
        s"batch $b of $numBatches has no rows — ordered replay batches must be dense")
      parts.foreach { f =>
        val dest = new java.io.File(root, s"batch-$b-${f.getName}")
        require(f.renameTo(dest), s"could not stage $f -> $dest")
        if (dest.lastModified() <= lastMod) dest.setLastModified(lastMod + 1)
        lastMod = math.max(lastMod, dest.lastModified())
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
    df.schema
  }

  /** Open `dir` (written by [[writeOrderedBatches]]) as a file-source
    * stream replaying one file per micro-batch, oldest first. */
  def readOrderedBatches(spark: SparkSession, dir: String,
                         schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /**
   * Run a streaming DataFrame to exhaustion into an append-mode parquet
   * sink and return the sink read back as a batch DataFrame.
   *
   * `awaitNoDataBatch = true` additionally waits for a zero-input-row
   * micro-batch to commit after the data is drained — required for
   * watermark-finalized output (append-mode windowed aggregation emits a
   * window only in a batch AFTER the watermark passes its end, which for a
   * finite replay is the trailing no-data batch the engine runs when the
   * last data batch advanced the watermark).
   */
  def drainToParquet(stream: DataFrame, sinkDir: String, checkpointDir: String,
                     awaitNoDataBatch: Boolean = false): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      if (awaitNoDataBatch) {
        // only a zero-input batch AFTER the last data batch finalizes the
        // watermark — a zero-input trigger that fired before the first file
        // was discovered (or between replayed files) proves nothing, so key
        // the wait on batchId, not on any zero-input entry existing. The
        // wait itself is a listener latch (event-driven, deterministic), not
        // a poll; 30 s stays as the safety bound only.
        val lastDataBatch =
          q.recentProgress.filter(_.numInputRows > 0).map(_.batchId)
            .foldLeft(-1L)(math.max)
        def sawNoDataBatch: Boolean =
          q.recentProgress.exists(p => p.numInputRows == 0 && p.batchId > lastDataBatch)
        val latch = new java.util.concurrent.CountDownLatch(1)
        val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
            if (e.progress.runId == q.runId && e.progress.numInputRows == 0 &&
                e.progress.batchId > lastDataBatch) latch.countDown()
          override def onQueryTerminated(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
            if (e.runId == q.runId) latch.countDown()
        }
        spark.streams.addListener(listener)
        try {
          // the qualifying batch may have committed between
          // processAllAvailable and listener registration — check the
          // progress history once before blocking on the latch
          if (!sawNoDataBatch)
            latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
        } finally spark.streams.removeListener(listener)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.read.parquet(sinkDir)
  }
}
