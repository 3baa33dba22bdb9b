package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Content-defined chunking (CDC) for opaque binary payloads — the
 * storage-dedup primitive for a multimodal corpus: re-encoded or
 * partially-edited copies of a media file share most of their BYTES even
 * when no two whole payloads are equal, so whole-payload dedup
 * ([[Multimodal.dropExactPayloadDuplicates]]) sees nothing while
 * chunk-level dedup recovers the shared mass. Content-defined boundaries
 * (a rolling Gear hash hitting a mask, not fixed offsets) make the chunk
 * stream insertion-stable: bytes inserted in one place shift only the
 * chunks around the edit, and every chunk after the next boundary
 * realigns — the property fixed-size blocking fundamentally lacks.
 *
 * Determinism/portability: the Gear table is derived from splitmix64 on
 * the byte value (a published, exactly-specified mixer), the boundary
 * rule is pure 64-bit integer arithmetic, and chunk ids are FNV-1a 64 —
 * every step replicable bit-for-bit in any language (the oracle fixture
 * is an independent Python replication; tools/make_golden.py).
 *
 * Scale shape: the kernel is a narrow single pass fused with the scan;
 * payload bytes never enter an exchange — only (8-byte hash, 4-byte
 * size) pairs ship to the dedup aggregate, which partial-aggregates
 * map-side. At 100 TB the chunk exchange is ~12 bytes per ~avg-chunk of
 * payload, i.e. ~0.3% of the corpus at the 4 KiB default.
 */
object CdcKernels extends Serializable {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Gear table: one fixed 64-bit word per byte value, splitmix64(1..256). */
  private val Gear: Array[Long] = Array.tabulate(256)(i => splitmix64(i + 1L))

  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xFFL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /**
   * One pass over the payload: rolling Gear hash `h = (h << 1) + G[b]`,
   * cut AFTER a byte once the chunk has `minSize` bytes and
   * `(h & mask) == 0` (mask = 2^avgBits - 1 → expected chunk ≈ minSize +
   * 2^avgBits), or unconditionally at `maxSize`; the hash resets per
   * chunk; the final partial chunk is emitted. Returns the struct row
   * (hashes array<long>, sizes array<int>); empty payload → empty arrays.
   */
  def chunkRow(bytes: Array[Byte], avgBits: Int, minSize: Int, maxSize: Int): InternalRow = {
    val mask = (1L << avgBits) - 1L
    val hashes = new java.util.ArrayList[Any]()
    val sizes = new java.util.ArrayList[Any]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len == maxSize) {
        hashes.add(fnv1a(bytes, start, i + 1))
        sizes.add(len)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) {
      hashes.add(fnv1a(bytes, start, bytes.length))
      sizes.add(bytes.length - start)
    }
    InternalRow(
      new GenericArrayData(hashes.toArray),
      new GenericArrayData(sizes.toArray))
  }
}

/** cdc_chunks(payload, avgBits, minSize, maxSize) ->
  * struct<hashes: array<long>, sizes: array<int>> — content-defined chunk
  * ids + lengths (see [[CdcKernels.chunkRow]] for the exact rules). */
case class CdcChunks(child: Expression, avgBits: Int, minSize: Int, maxSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("hashes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sizes", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if avgBits >= 1 && avgBits <= 30 && minSize >= 1 && minSize <= maxSize =>
      TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs 1<=avgBits<=30 and 1<=minSize<=maxSize: ($avgBits, $minSize, $maxSize)")
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks expects binary, got ${t.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    CdcKernels.chunkRow(bytes.asInstanceOf[Array[Byte]], avgBits, minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.multimodal.CdcKernels.chunkRow($b, $avgBits, $minSize, $maxSize)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Cdc {
  import org.apache.spark.sql.graftext._

  /** Default parameters: ~4 KiB expected chunks (min 2 KiB, max 16 KiB) —
    * the common backup/dedup-store sweet spot. */
  val DefaultAvgBits = 12
  val DefaultMinSize = 2048
  val DefaultMaxSize = 16384

  def cdcChunks(payload: Column,
                avgBits: Int = DefaultAvgBits,
                minSize: Int = DefaultMinSize,
                maxSize: Int = DefaultMaxSize): Column =
    CdcChunks(payload.asExpression, avgBits, minSize, maxSize).asColumn

  /**
   * Corpus-level chunk-dedup report, one row: how much of the payload
   * byte mass is redundant at chunk granularity — the go/no-go number for
   * a content-addressed store. `distinct_bytes` counts each distinct
   * chunk hash once (its size is content-determined, so min == max per
   * hash); `dedup_ratio = 1 - distinct_bytes/total_bytes` is the fraction
   * of the corpus a chunk store would NOT write.
   *
   * Plan: narrow kernel scan → explode to (hash, size) pairs (payload
   * bytes never shuffle) → map-side-combining groupBy(hash) → one scalar
   * aggregate.
   */
  /**
   * Payload near-dup pairs from shared chunk mass: (idA, idB,
   * shared_bytes, containment) for every pair whose DISTINCT shared-chunk
   * bytes reach `minSharedBytes` and whose containment
   * (`shared / min(totalA, totalB)`) reaches `minContainment` — the
   * media-file twin of text near-dup: a re-encoded header or an appended
   * watermark leaves most chunks equal while whole-payload hashes differ.
   *
   * Chunk multiplicity is ignored (each payload contributes its distinct
   * chunk set) — repeated zero-blocks inside one file must not inflate
   * similarity. Chunks shared by more than `maxChunkCopies` payloads are
   * dropped BEFORE the join — the boilerplate-chunk guard (container
   * magic, padding blocks) that keeps the candidate stream
   * output-bounded; the same role as the MinHash hot-bucket cap, and the
   * gate exercises it: the fixture's 167-payload shared block is capped
   * away while genuine pairwise near-dups survive.
   *
   * Scale shape: only (id, hash, size) rows enter the exchanges; the
   * pair aggregate is a map-side-combining groupBy on (idA, idB), and the
   * join degree per chunk hash is ≤ maxChunkCopies by construction, so
   * candidate count ≤ chunks · maxChunkCopies² at worst and — for real
   * corpora — ≈ the true near-dup pair mass.
   */
  def payloadNearDupPairs(df: DataFrame, id: Column, payload: Column,
                          minSharedBytes: Long = 1L,
                          minContainment: Double = 0.5,
                          maxChunkCopies: Int = 1000,
                          avgBits: Int = DefaultAvgBits,
                          minSize: Int = DefaultMinSize,
                          maxSize: Int = DefaultMaxSize): DataFrame = {
    require(minSharedBytes >= 1L, s"minSharedBytes must be >= 1: $minSharedBytes")
    require(minContainment >= 0.0 && minContainment <= 1.0,
      s"minContainment must be in [0, 1]: $minContainment")
    require(maxChunkCopies >= 2, s"maxChunkCopies must be >= 2: $maxChunkCopies")
    val chunks = df.select(id.as("__id"),
      cdcChunks(payload, avgBits, minSize, maxSize).as("c"))
      .select(col("__id"), explode(arrays_zip(col("c.hashes"), col("c.sizes"))).as("z"))
      .groupBy(col("__id"), col("z.hashes").as("hash"))
      .agg(min(col("z.sizes")).as("size")) // distinct chunk set per payload
    val kept = chunks.join(
      chunks.groupBy(col("hash")).agg(count(lit(1)).as("__copies"))
        .filter(col("__copies") <= maxChunkCopies)
        .select(col("hash")),
      Seq("hash"), "left_semi")
    val totals = chunks.groupBy(col("__id"))
      .agg(sum(col("size")).as("__total"))
    val a = kept.select(col("__id").as("idA"), col("hash"), col("size"))
    val b = kept.select(col("__id").as("idB"), col("hash"))
    val pairs = a.join(b, Seq("hash"))
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB"))
      .agg(sum(col("size")).as("shared_bytes"))
    pairs
      .join(totals.select(col("__id").as("idA"), col("__total").as("__ta")), Seq("idA"))
      .join(totals.select(col("__id").as("idB"), col("__total").as("__tb")), Seq("idB"))
      .withColumn("containment",
        col("shared_bytes").cast("double") / least(col("__ta"), col("__tb")).cast("double"))
      .filter(col("shared_bytes") >= minSharedBytes &&
        col("containment") >= minContainment)
      .select(col("idA"), col("idB"), col("shared_bytes"), col("containment"))
  }

  def chunkDedupReport(df: DataFrame, payload: Column,
                       avgBits: Int = DefaultAvgBits,
                       minSize: Int = DefaultMinSize,
                       maxSize: Int = DefaultMaxSize): DataFrame = {
    val chunks = df.select(
      cdcChunks(payload, avgBits, minSize, maxSize).as("c"))
      .select(explode(arrays_zip(col("c.hashes"), col("c.sizes"))).as("z"))
      .select(col("z.hashes").as("hash"), col("z.sizes").as("size"))
    val perHash = chunks.groupBy(col("hash"))
      .agg(count(lit(1)).as("copies"), min(col("size")).as("size"))
    perHash.agg(
      sum(col("copies")).as("total_chunks"),
      count(lit(1)).as("distinct_chunks"),
      sum(col("copies") * col("size")).as("total_bytes"),
      sum(col("size")).as("distinct_bytes"))
      .withColumn("dedup_ratio",
        lit(1.0) - col("distinct_bytes").cast("double") / col("total_bytes").cast("double"))
  }
}
