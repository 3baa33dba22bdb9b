package graft.write

import graft.parquet.ParquetMeta
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Small-file compaction for parquet directories — the table-maintenance
 * pass every long-running ingest needs (thousands of tiny files from
 * per-micro-batch or per-task writes degrade scan planning, open-file cost,
 * and footer reads at 100 TB).
 *
 * The target file count comes from the directory's OWN footer metadata
 * (the [[ParquetMeta.parquetMetadata]] scan — a driver file listing plus a
 * distributed footer read, never a data read):
 * `ceil(sum(compressedBytes) / targetFileBytes)`, so output files land
 * near the requested size regardless of the input's skew.
 *
 * Plan: one round-robin repartition of the data to that count, then a
 * single write — the standard OPTIMIZE shape. `shuffle = false` downgrades
 * to `coalesce` (no exchange; right when the input is merely
 * over-partitioned and per-file size balance doesn't matter — but coalesce
 * cannot split large partitions, so balance is input-dependent).
 *
 * Rows are moved, never changed: the output reads back row-identical to
 * the input (the gate hash-verifies this), and the file count lands at the
 * computed target (sbt-pinned via our own parquetMetadata scan).
 */
object Compaction {

  /** Compute the target file count for a directory at `targetFileBytes`. */
  def targetFileCount(spark: SparkSession, dir: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val total = ParquetMeta.parquetMetadata(spark, None, Seq(dir))
      .agg(coalesce(sum(col("compressedBytes")), lit(0L))).head().getLong(0)
    math.max(1, ((total + targetFileBytes - 1) / targetFileBytes).toInt)
  }

  /**
   * Compact the parquet directory `inputDir` into `outputDir` with files of
   * roughly `targetFileBytes` compressed bytes. Returns the number of files
   * written. Partitioned layouts: compact each partition directory (the
   * listing is cheap), or re-layout with [[PartitionedWrite]] /
   * [[ZOrderWrite]] when the partitioning itself should change.
   */
  def compactParquet(spark: SparkSession, inputDir: String, outputDir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024,
                     shuffle: Boolean = true): Int = {
    val n = targetFileCount(spark, inputDir, targetFileBytes)
    val df = spark.read.parquet(inputDir)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outputDir)
    n
  }
}
