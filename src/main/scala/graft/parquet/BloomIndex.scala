package graft.parquet

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Bloom-filter sidecar index for parquet file skipping on EQUALITY
 * predicates — the companion of [[ZoneMap]] (min/max, range predicates).
 *
 * Zone maps answer `BETWEEN`; they are useless for a point lookup on a
 * high-cardinality unclustered column (every file's [min, max] straddles
 * every key). A per-file Bloom filter answers `= v` / `IN (...)` with no
 * false negatives: a probe that misses PROVES the file cannot contain the
 * key. This is what Delta/Iceberg/Hudi ship as bloom-filter indexes;
 * rebuilt here on plain parquet as an underscore-prefixed sidecar directory
 * (`_bloom_<column>/` — Spark's file index ignores underscore paths, so the
 * sidecar never pollutes reads of the data directory).
 *
 * Scale shape: building is one scan with a per-file groupBy whose state is
 * a fixed `2^logBits`-bit buffer (1 MB at logBits=23) — map-side combined,
 * OR-merged, one row per file in the exchange. Probing is driver-side
 * against the sidecar (one row per file — the same bounded footer-listing
 * discipline as [[ParquetMeta]]), then a scan of ONLY the surviving files
 * with the real predicate re-applied (the bloom is an index, never an
 * answer). At 100 TB with 10k files, a point lookup reads the handful of
 * files that might contain the key instead of all of them.
 *
 * Hashing is deterministic double hashing over `xxhash64(value)` (the
 * column value hashed by Spark's own stable xxhash64, so build and probe
 * agree by construction): probe i sets bit `(h1 + i * h2) mod 2^logBits`
 * with `h2` odd — the standard Kirsch-Mitzenmacher scheme.
 */
object BloomBits extends Serializable {

  /** Set the k probe bits of hash `h1` in `bits` (2^logBits bits). */
  def insert(bits: Array[Long], h1: Long, logBits: Int, k: Int): Unit = {
    val mask = (1L << logBits) - 1
    val h2 = (h1 >>> 32) | 1L // odd -> full-period probe stride
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & mask).toInt
      bits(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** True if all k probe bits of `h1` are set (no false negatives). */
  def mightContain(bits: Array[Long], h1: Long, logBits: Int, k: Int): Boolean = {
    val mask = (1L << logBits) - 1
    val h2 = (h1 >>> 32) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & mask).toInt
      if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** bloom_bits(h): fixed-size Bloom bit array over 64-bit hashes — mergeable
  * (bitwise OR), map-side combined; one buffer per task regardless of rows. */
case class BloomBitsAgg(
    child: Expression,
    logBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(logBits >= 6 && logBits <= 30, s"bloom_bits logBits in 6..30: $logBits")
  require(k >= 1 && k <= 16, s"bloom_bits k in 1..16: $k")

  private val words = 1 << (logBits - 6)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits expects a 64-bit hash column (bigint), got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.insert(buffer, v.asInstanceOf[Long], logBits, k)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storageFormat.length / 8)
    ByteBuffer.wrap(storageFormat).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomIndex {

  /** Sidecar directory for `column` under `dir` — underscore-prefixed so
    * Spark's file listing ignores it when reading the data itself. */
  def sidecarPath(dir: String, column: String): String =
    s"$dir/_bloom_$column"

  def bloomBits(hash: Column, logBits: Int, k: Int): Column =
    BloomBitsAgg(hash.asExpression, logBits, k).toAggregateExpression().asColumn

  /**
   * Build the sidecar: one scan of `dir`, one fixed-size Bloom buffer per
   * file (grouped on `input_file_name`), written as
   * `(file, log_bits, k, bloom)` rows next to the data.
   */
  def writeBloomIndex(spark: SparkSession, dir: String, column: String,
                      logBits: Int = 20, k: Int = 5): Unit = {
    val df = spark.read.parquet(dir)
    require(df.columns.contains(column), s"column not in schema: $column")
    df.select(input_file_name().as("file"), xxhash64(col(column)).as("h"))
      .groupBy("file")
      .agg(bloomBits(col("h"), logBits, k).as("bloom"))
      .withColumn("log_bits", lit(logBits))
      .withColumn("k", lit(k))
      .write.mode("overwrite").parquet(sidecarPath(dir, column))
  }

  /** Hash probe values EXACTLY as the build side did: through Spark's own
    * xxhash64 over a literal column cast to the data column's type. */
  private def hashValues(spark: SparkSession, dir: String, column: String,
                         values: Seq[Any]): Array[Long] = {
    import scala.jdk.CollectionConverters._
    val dt = spark.read.parquet(dir).schema(column).dataType
    val rows = values.map(v => org.apache.spark.sql.Row(v.toString)).asJava
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows, schema)
      .select(xxhash64(col("v").cast(dt)).as("h"))
      .collect().map(_.getLong(0))
  }

  /**
   * Per-file pruning decision for an IN-list: `(file, keep)` — keep iff ANY
   * probe value might be in the file. One sidecar row per file; driver-side
   * probes (values x files, both small).
   */
  def pruningReport(spark: SparkSession, dir: String, column: String,
                    values: Seq[Any]): Seq[(String, Boolean)] = {
    require(values.nonEmpty, "need at least one probe value")
    val hashes = hashValues(spark, dir, column, values)
    // concrete file paths (SidecarFiles): underscore dirs and globs both
    // trip noisy reader checks; explicit existing files stay quiet
    SidecarFiles.read(spark, sidecarPath(dir, column))
      .select(col("file"), col("log_bits"), col("k"), col("bloom"))
      .collect()
      .map { r =>
        val bytes = r.getAs[Array[Byte]]("bloom")
        val bits = new Array[Long](bytes.length / 8)
        ByteBuffer.wrap(bytes).asLongBuffer().get(bits)
        val lb = r.getInt(1)
        val kk = r.getInt(2)
        r.getString(0) -> hashes.exists(h => BloomBits.mightContain(bits, h, lb, kk))
      }.toSeq.sortBy(_._1)
  }

  /**
   * Point/IN-list read through the index: scan ONLY the files whose bloom
   * says the key might be present, then re-apply the real predicate (the
   * index prunes, the filter answers — false positives cost IO, never
   * correctness; false negatives cannot happen).
   */
  def prunedParquet(spark: SparkSession, dir: String, column: String,
                    values: Seq[Any]): DataFrame = {
    val report = pruningReport(spark, dir, column, values)
    val kept = report.collect { case (f, true) => f }
    val schema = spark.read.parquet(dir).schema
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(kept: _*)
    // the same stringify-then-cast interpretation the hash probe used, so
    // filter and index agree on value typing (incl. string-typed callers)
    val dt = schema(column).dataType
    base.filter(values.map(v => col(column) === lit(v.toString).cast(dt)).reduce(_ || _))
  }
}
