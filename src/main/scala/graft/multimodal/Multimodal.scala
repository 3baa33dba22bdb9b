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
 * kernels — is real and tested; image metadata extraction is a real pure-JVM
 * container-header parse ([[ImageHeaders]]: PNG/JPEG/GIF/BMP dimensions, no
 * pixel decode — the right cost model for metadata over 100 TB of media).
 * Full pixel decoding (resize, feature nets) would slot behind the same
 * batched [[Multimodal.extractMediaFeatures]] shape.
 */
object MultimodalKernels extends Serializable {

  /** [[ImageHeaders.imageDimensions]] as an InternalRow (format, width,
    * height) for the codegen'd [[ImageDimsExpr]]; null if not an image. */
  def imageDimsRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    ImageHeaders.imageDimensions(bytes) match {
      case Some(d) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(d.format),
            d.width, d.height))
      case None => null
    }

  /** [[AudioHeaders.wavInfo]] as an InternalRow (channels, sample_rate,
    * bits_per_sample, n_frames) for [[WavInfoExpr]]; null if not WAV. */
  def wavInfoRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    AudioHeaders.wavInfo(bytes) match {
      case Some(w) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](w.channels, w.sampleRate, w.bitsPerSample,
            if (w.nFrames >= 0) w.nFrames else null))
      case None => null
    }

  /** [[VideoHeaders.videoInfo]] as an InternalRow (format, width, height,
    * duration_ms, n_frames) for [[VideoInfoExpr]]; null if not a video. */
  def videoInfoRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    VideoHeaders.videoInfo(bytes) match {
      case Some(v) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(v.format),
            v.width, v.height, v.durationMs,
            if (v.nFrames >= 0) v.nFrames else null))
      case None => null
    }

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

/** image_dims(binary) -> struct(format, width, height), null for non-images.
  * The header parse runs inside codegen — usable straight in SQL/select. */
case class ImageDimsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_dims expects binary, got ${t.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    MultimodalKernels.imageDimsRow(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.multimodal.MultimodalKernels.imageDimsRow($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** wav_info(binary) -> struct(channels, sample_rate, bits_per_sample,
  * n_frames), null for non-WAV payloads. */
case class WavInfoExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = true)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"wav_info expects binary, got ${t.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    MultimodalKernels.wavInfoRow(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.multimodal.MultimodalKernels.wavInfoRow($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** video_info(binary) -> struct(format, width, height, duration_ms,
  * n_frames), null for non-video payloads (n_frames null when the container
  * does not state it — ISO-BMFF). */
case class VideoInfoExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = true)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"video_info expects binary, got ${t.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    MultimodalKernels.videoInfoRow(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.multimodal.MultimodalKernels.videoInfoRow($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decoded-media feature row produced by the batched header decoder: format
  * and dimensions are None when the payload is not a recognized image. */
case class MediaFeatures(id: Long, n_bytes: Long, entropy: Double,
                         format: Option[String], width: Option[Int], height: Option[Int])

/** Decoded-audio feature row: PCM facts are None for non-WAV payloads. */
case class AudioFeatures(id: Long, n_bytes: Long, channels: Option[Int],
                         sample_rate: Option[Int], bits_per_sample: Option[Int],
                         n_frames: Option[Long])

/** Decoded-video feature row: container facts are None for unrecognized
  * payloads; n_frames also None when the container does not state it. */
case class VideoFeatures(id: Long, n_bytes: Long, format: Option[String],
                         width: Option[Int], height: Option[Int],
                         duration_ms: Option[Long], n_frames: Option[Long])

object Multimodal {

  /** The canonical multimodal schema: payload + typed metadata struct. */
  val mediaMetadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("source", StringType)))

  def byte_entropy(c: Column): Column = ByteEntropy(c.asExpression).asColumn

  def byte_nibble_histogram(c: Column): Column = ByteNibbleHistogram(c.asExpression).asColumn

  /** struct(format, width, height) of an image payload; null for non-images. */
  def image_dims(c: Column): Column = ImageDimsExpr(c.asExpression).asColumn

  /** struct(channels, sample_rate, bits_per_sample, n_frames) of a WAV
    * payload; null for non-WAV. */
  def wav_info(c: Column): Column = WavInfoExpr(c.asExpression).asColumn

  /** struct(format, width, height, duration_ms, n_frames) of an MP4/AVI
    * payload; null for non-video. */
  def video_info(c: Column): Column = VideoInfoExpr(c.asExpression).asColumn

  /**
   * Keep-ids of an exact media-payload dedup: the smallest id per
   * byte-identical payload. The DECISION sub-plan is what must scale — it
   * shuffles only `(md5, id)` rows (~24 B each, map-side-combined `min`),
   * never the payloads themselves; a degenerate hot payload (the blank
   * thumbnail repeated a billion times) costs one row per map task in the
   * exchange. The returned frame is the keep manifest — downstream can
   * anti-join a delete list, or semi-join the media table (exchange-free
   * when that table is bucketed by id, `writeBucketedBy`).
   */
  def payloadDuplicateKeepIds(df: DataFrame, id: Column, payload: Column): DataFrame = {
    val keyed = df.select(md5(payload).as("__mm_h"), id.as("__mm_id"))
    // a null payload is "no payload", not a duplicate of every other null
    // payload — null-hash rows all survive instead of collapsing to one
    val winners = keyed.filter(col("__mm_h").isNotNull)
      .groupBy(col("__mm_h"))
      .agg(min(col("__mm_id")).as("keep_id"))
      .select(col("keep_id"))
    winners.unionByName(
      keyed.filter(col("__mm_h").isNull).select(col("__mm_id").as("keep_id")))
  }

  /** Exact payload dedup applied: rows whose id wins [[payloadDuplicateKeepIds]].
    * The semi-join is the one place payload rows move — co-locate by
    * bucketing the media table on the id to make it exchange-free. */
  def dropExactPayloadDuplicates(df: DataFrame, id: Column, payload: Column): DataFrame =
    df.join(payloadDuplicateKeepIds(df, id, payload),
      id === col("keep_id"), "left_semi")

  /**
   * Uniform frame-sampling plan per video: `k` frame indices spaced evenly
   * across the container-declared frame count — `idx_i = (i * n_frames) div
   * k` for i in 0..k-1, deduplicated when a clip has fewer than `k` frames —
   * each with its timestamp `ts_ms = (idx * duration_ms) div n_frames`.
   * Output: (id, frame_idx, ts_ms), one row per frame to fetch.
   *
   * This is the Spark-side plumbing of a frame-extraction stage: the plan
   * rows are exact, engine-portable integer arithmetic from the real
   * container header; the pixel grab itself belongs to a decoder runtime
   * this container does not ship and would map each emitted row to its
   * decoded frame. Videos whose container does not state a frame count (or
   * state zero) produce no rows.
   *
   * Narrow plan: one codegen'd header parse per payload, a k-element
   * sequence explode, integer projection — no shuffle.
   */
  def sampleFrames(df: DataFrame, id: Column, bin: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    df.select(id.cast("long").as("id"), video_info(bin).as("__vi"))
      .filter(col("__vi").isNotNull && col("__vi.n_frames").isNotNull &&
        col("__vi.n_frames") > 0)
      .select(col("id"), col("__vi.n_frames").as("__nf"),
        col("__vi.duration_ms").as("__dur"))
      // dedup INSIDE the per-video array (n_frames < k collapses repeated
      // indices) so the plan never needs a distinct shuffle
      .select(col("id"), col("__nf"), col("__dur"),
        explode(expr(
          s"array_distinct(transform(sequence(0L, ${k - 1}L), i -> i * __nf DIV $k))"))
          .as("frame_idx"))
      .select(col("id"), col("frame_idx"),
        expr("frame_idx * __dur DIV __nf").as("ts_ms"))
  }

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
   * Media feature extraction as a relational plan: each payload's container
   * header parses inside the codegen'd [[ImageDimsExpr]] kernel
   * (PNG/JPEG/GIF/BMP format + pixel dimensions, no pixel decode) alongside
   * the byte-entropy kernel — one narrow projection next to the scan, no
   * object deserialization, no shuffle; at scale each executor decodes its
   * own split. Unrecognized payloads keep their byte features with null
   * format/width/height. The typed Dataset view costs nothing until a
   * typed action consumes it.
   */
  def extractMediaFeatures(df: DataFrame, id: Column, bin: Column): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    // pure Column plan over the codegen'd header kernels — no
    // DeserializeToObject, the whole extraction stays inside one
    // WholeStageCodegen span next to the scan (sbt plan-pinned)
    df.select(id.cast("long").as("id"), bin.as("__p"))
      .select(col("id"), length(col("__p")).cast("long").as("n_bytes"),
        byte_entropy(col("__p")).as("entropy"), image_dims(col("__p")).as("__d"))
      .select(col("id"), col("n_bytes"), col("entropy"),
        col("__d.format").as("format"), col("__d.width").as("width"),
        col("__d.height").as("height"))
      .as[MediaFeatures]
  }

  /** Audio twin of [[extractMediaFeatures]]: RIFF/WAVE header facts via the
    * codegen'd [[WavInfoExpr]] kernel — same relational, object-free plan. */
  def extractAudioFeatures(df: DataFrame, id: Column, bin: Column): Dataset[AudioFeatures] = {
    implicit val enc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]
    df.select(id.cast("long").as("id"), bin.as("__p"))
      .select(col("id"), length(col("__p")).cast("long").as("n_bytes"),
        wav_info(col("__p")).as("__w"))
      .select(col("id"), col("n_bytes"), col("__w.channels").as("channels"),
        col("__w.sample_rate").as("sample_rate"),
        col("__w.bits_per_sample").as("bits_per_sample"),
        col("__w.n_frames").as("n_frames"))
      .as[AudioFeatures]
  }

  /** Video twin of [[extractMediaFeatures]]: MP4/AVI container facts via the
    * codegen'd [[VideoInfoExpr]] kernel — same relational, object-free plan. */
  def extractVideoFeatures(df: DataFrame, id: Column, bin: Column): Dataset[VideoFeatures] = {
    implicit val enc: Encoder[VideoFeatures] = Encoders.product[VideoFeatures]
    df.select(id.cast("long").as("id"), bin.as("__p"))
      .select(col("id"), length(col("__p")).cast("long").as("n_bytes"),
        video_info(col("__p")).as("__v"))
      .select(col("id"), col("n_bytes"), col("__v.format").as("format"),
        col("__v.width").as("width"), col("__v.height").as("height"),
        col("__v.duration_ms").as("duration_ms"),
        col("__v.n_frames").as("n_frames"))
      .as[VideoFeatures]
  }
}
