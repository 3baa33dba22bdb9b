package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/**
 * WARC / WET ingest — the de-facto wire format of web-crawl corpora
 * (Common Crawl ships WARC captures and WET text extractions; ISO 28500).
 * A 100 TB LLM text pipeline usually STARTS here, before any of the
 * dedup/quality operators can run.
 *
 * Spark-first shape:
 *  - files load through the built-in `binaryFile` source (one task per
 *    shard — WARC is not line-splittable, and real WET shards are
 *    100–200 MB gz members, sized for exactly this per-file parallelism);
 *  - record extraction is ONE codegen kernel pass ([[WarcRecordsExpr]]):
 *    binary shard → array of (type, uri, date, length, payload) structs,
 *    gzip members decompressed in-kernel (multi-member streams handled —
 *    the Common Crawl layout concatenates one gz member per record);
 *  - downstream is an ordinary `explode` — payloads flow straight into
 *    the tokenize/dedup/quality kernels with no shuffle in between.
 *
 * Parsing contract (tolerant, fully specified):
 *  - a record = a `WARC/` version line, `Name: value` header lines to the
 *    first empty line, then exactly `Content-Length` payload octets
 *    (mandatory per ISO 28500), then the `\r\n\r\n` record separator;
 *  - header names match case-insensitively; values are trimmed;
 *  - a record with a missing/unparseable Content-Length aborts the scan
 *    of THAT shard at that offset (returning the records parsed so far) —
 *    a truncated tail never produces a phantom record;
 *  - payloads decode as UTF-8 with U+FFFD replacement (WET payloads are
 *    declared UTF-8; raw WARC captures may carry anything — the
 *    replacement rule is deterministic either way).
 */
object Warc {

  val RecordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Decompressed-size ceiling per shard (default 1 GiB = 4x the ~256 MB
    * upper end of real WET gz shards). Untrusted crawl data can carry a
    * gzip bomb — an unbounded inflate OOMs the executor, and anything past
    * ~2 GB hits the JVM byte-array limit with an opaque error. At the cap
    * the inflate STOPS and parsing sees a truncated shard: the same
    * records-parsed-so-far tail behavior [[parseRecords]] already specifies
    * for a cut-off record. */
  val DefaultMaxDecompressedBytes: Long = 1L << 30

  /** Column: binary WARC/WET shard bytes (gz or plain) -> array of record
    * structs ([[RecordSchema]]). */
  def warcRecords(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    warcRecords(bytes, DefaultMaxDecompressedBytes)

  /** As [[warcRecords]] with an explicit per-shard decompressed-size cap. */
  def warcRecords(bytes: org.apache.spark.sql.Column, maxDecompressedBytes: Long): org.apache.spark.sql.Column =
    WarcRecordsExpr(bytes.asExpression, maxDecompressedBytes).asColumn

  /**
   * Read WARC/WET shards under `path` (glob ok): one row per record with
   * `(file, record_idx, warc_type, target_uri, warc_date, content_length,
   * payload)`. Shards decompress+parse in executor tasks; the driver only
   * lists files.
   */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("file"),
        posexplode(warcRecords(col("content"))).as(Seq("record_idx", "r")))
      .select(col("file"), col("record_idx"),
        col("r.warc_type").as("warc_type"),
        col("r.target_uri").as("target_uri"),
        col("r.warc_date").as("warc_date"),
        col("r.content_length").as("content_length"),
        col("r.payload").as("payload"))

  // ------------------------------------------------------------------ kernel

  private[graft] def gunzipIfNeeded(
      bytes: Array[Byte],
      maxBytes: Long = DefaultMaxDecompressedBytes): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte)
      return bytes
    // clamp to just under the JVM byte-array ceiling even if a caller asks
    // for more — a larger single shard is unrepresentable anyway
    val cap = math.min(maxBytes, (Integer.MAX_VALUE - 16).toLong)
    require(cap > 0, s"maxDecompressedBytes must be positive, got $maxBytes")
    // GZIPInputStream reads across concatenated members
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, cap).toInt.max(1 << 16))
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    // stop AT the cap (truncated-tail semantics, not an executor OOM):
    // write only up to cap bytes, then abandon the rest of the stream
    while (n >= 0 && out.size().toLong < cap) {
      val room = cap - out.size()
      if (n > 0) out.write(buf, 0, math.min(n.toLong, room).toInt)
      n = if (out.size().toLong < cap) in.read(buf) else -1
    }
    in.close()
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val Marker = "WARC/".getBytes(StandardCharsets.US_ASCII)
  private val HeaderEnd = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Parse every record of a (possibly gzipped) shard. */
  private[graft] def parseRecords(
      raw: Array[Byte],
      maxBytes: Long = DefaultMaxDecompressedBytes): Seq[(String, String, String, Long, String)] = {
    val bytes = gunzipIfNeeded(raw, maxBytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long, String)]
    var pos = indexOf(bytes, Marker, 0)
    while (pos >= 0) {
      val hdrEnd = indexOf(bytes, HeaderEnd, pos)
      if (hdrEnd < 0) return out.toSeq
      val header = new String(bytes, pos, hdrEnd - pos, StandardCharsets.UTF_8)
      var wType: String = null
      var uri: String = null
      var date: String = null
      var len = -1L
      header.split("\r\n").iterator.drop(1).foreach { line =>
        val c = line.indexOf(':')
        if (c > 0) {
          val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          name match {
            case "warc-type" => wType = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-length" =>
              len = try value.toLong catch { case _: NumberFormatException => -1L }
            case _ =>
          }
        }
      }
      val payloadStart = hdrEnd + HeaderEnd.length
      if (len < 0 || payloadStart + len > bytes.length) return out.toSeq
      val payload = new String(bytes, payloadStart, len.toInt, StandardCharsets.UTF_8)
      out += ((wType, uri, date, len, payload))
      pos = indexOf(bytes, Marker, payloadStart + len.toInt)
    }
    out.toSeq
  }

  // PUBLIC on purpose: codegen'd expressions call this through the class's
  // STATIC FORWARDER, which scalac does not emit for private[graft] members
  // — a restricted modifier made every generated call site fail to compile
  // and silently fall back to interpreted eval (found via the probe log's
  // CompileException; WarcSuite now pins CODEGEN_ONLY evaluation).
  def parseToArrayData(raw: Array[Byte], maxBytes: Long): GenericArrayData =
    new GenericArrayData(parseRecords(raw, maxBytes).map { case (t, u, d, l, p) =>
      InternalRow(
        if (t == null) null else UTF8String.fromString(t),
        if (u == null) null else UTF8String.fromString(u),
        if (d == null) null else UTF8String.fromString(d),
        l, UTF8String.fromString(p))
    }.toArray[Any])
}

/** warc_records(binary): WARC/WET shard bytes -> array of record structs;
  * one narrow kernel pass, gz handled in-kernel with a decompressed-size
  * cap (gzip-bomb guard — see [[Warc.DefaultMaxDecompressedBytes]]). */
case class WarcRecordsExpr(
    child: Expression,
    maxDecompressedBytes: Long = Warc.DefaultMaxDecompressedBytes)
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(Warc.RecordSchema, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"warc_records expects binary, got ${t.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    Warc.parseToArrayData(bytes.asInstanceOf[Array[Byte]], maxDecompressedBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.sources.Warc.parseToArrayData($b, ${maxDecompressedBytes}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
