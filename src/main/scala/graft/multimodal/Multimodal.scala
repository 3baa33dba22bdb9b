package graft.multimodal

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}

/**
 * Multimodal column handling: image/audio/video payloads are opaque `binary`
 * columns with a typed metadata struct travelling alongside. The Spark-side
 * plumbing — schema, partitioning, batch iteration, byte-level feature
 * kernels — is real and tested; the actual media decoding is STUBBED with a
 * deterministic fake (no image/audio libraries in this environment), marked
 * below. Swap [[decodeImageStub]] for a real decoder behind the same
 * signature.
 */
object MultimodalKernels extends Serializable {

  /** Shannon entropy (bits/byte) of a byte payload; 0.0 for empty. */
  def entropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    val n = bytes.length.toDouble
    var b = 0
    while (b < 256) {
      if (counts(b) > 0) { val p = counts(b) / n; h -= p * (math.log(p) / math.log(2.0)) }
      b += 1
    }
    h
  }

  /** 16-bin histogram over the high nibble of each byte. */
  def nibbleHistogram(bytes: Array[Byte]): Array[Long] = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) >>> 4) += 1; i += 1 }
    counts
  }
}

/** byte_entropy(binary) -> double; codegen'd, kernel runs on the raw array. */
case class ByteEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_entropy expects binary, got ${t.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    MultimodalKernels.entropy(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.multimodal.MultimodalKernels.entropy($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** byte_nibble_histogram(binary) -> array<long> (16 bins). */
case class ByteNibbleHistogram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_nibble_histogram expects binary, got ${t.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MultimodalKernels.nibbleHistogram(bytes.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.multimodal.MultimodalKernels.nibbleHistogram($b))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decoded-media feature row produced by the batched (stubbed) decoder. */
case class MediaFeatures(id: Long, n_bytes: Long, entropy: Double, fake_width: Int, fake_height: Int)

object Multimodal {

  /** The canonical multimodal schema: payload + typed metadata struct. */
  val mediaMetadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("source", StringType)))

  def byte_entropy(c: Column): Column = ByteEntropy(c.asExpression).asColumn

  def byte_nibble_histogram(c: Column): Column = ByteNibbleHistogram(c.asExpression).asColumn

  /** Attach a metadata struct next to a binary payload column. */
  def withMediaMetadata(df: DataFrame, bin: Column, format: String, source: Column): DataFrame =
    df.withColumn("media_meta",
      struct(lit(format).as("format"), length(bin).cast("long").as("n_bytes"), source.as("source")))

  /**
   * Fixed-size frame sampling from a binary payload: frames of `frameSize`
   * bytes every `stride` bytes (video frame-sample / audio windowing shape).
   * Pure Column algebra: array of substrings.
   */
  def binaryFrames(bin: Column, frameSize: Int, stride: Int): Column = {
    val nFrames = floor((length(bin) - frameSize).cast("double") / stride).cast("int") + 1
    when(length(bin) < frameSize, array().cast(ArrayType(BinaryType)))
      .otherwise(transform(sequence(lit(0), nFrames - 1),
        i => bin.substr(i * stride + 1, lit(frameSize))))
  }

  /**
   * ======================== STUB — deterministic fake ========================
   * Real implementation would decode image bytes (JPEG/PNG) and return true
   * dimensions/channels. No media libraries exist in this environment, so the
   * stub derives plausible, deterministic values from the payload itself.
   * The signature and the batched execution shape are the real contract.
   */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int) = {
    val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    (64 + (h % 512).toInt.abs, 64 + ((h >> 16) % 512).toInt.abs)
  }

  /**
   * Batched media feature extraction: iterates binary payloads partition by
   * partition (the `mapInPandas`-equivalent batch shape in Scala), calling the
   * (stubbed) decoder per element. Partitioning is preserved; no driver
   * round-trip; at scale each executor decodes its own split.
   */
  def extractMediaFeatures(df: DataFrame, id: Column, bin: Column): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    df.select(id.cast("long").as("id"), bin.as("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val (w, h) = decodeImageStub(bytes)
          MediaFeatures(r.getLong(0), bytes.length.toLong,
            MultimodalKernels.entropy(bytes), w, h)
        }
      }
  }
}
