package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.zip.Deflater

/**
 * Compression-ratio quality signal.
 *
 * How well a document DEFLATE-compresses is one of the strongest cheap
 * boilerplate/repetition detectors in corpus curation: machine-generated or
 * template text compresses far below natural prose, random/binary junk far
 * above it. Pipelines filter on the ratio `octet_length(text) /
 * deflate_length(text)` (high = repetitive, ~1 = incompressible).
 *
 * The kernel emits the compressed LENGTH (an exact integer), not a ratio —
 * callers build whatever ratio they want in Column algebra, and integer
 * output keeps results engine-portable wherever a zlib is available.
 * Determinism: DEFLATE output for a fixed input, level, and strategy is a
 * pure function in zlib's implementation; the JVM bundles zlib, so repeated
 * runs (and every executor of a cluster on the same JVM base image) agree.
 */
object CompressionKernels {
  // One Deflater per task thread, reset per row: Deflater.init/end churn
  // native memory; reuse makes the per-row cost the deflate itself.
  private val local: ThreadLocal[Deflater] = new ThreadLocal[Deflater]
  private val levelLocal: ThreadLocal[Integer] = new ThreadLocal[Integer]

  def deflateLength(bytes: Array[Byte], level: Int): Int = {
    var d = local.get()
    if (d == null || levelLocal.get() != level) {
      if (d != null) d.end()
      d = new Deflater(level, /*nowrap=*/ true)
      local.set(d)
      levelLocal.set(level)
    }
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflateLengthString(text: UTF8String, level: Int): Int =
    deflateLength(text.getBytes, level)
}

/** deflate_length(col, level): DEFLATE(raw, no zlib header) byte length of a
  * string's UTF-8 bytes or a binary column -> int. */
case class DeflateLength(child: Expression, level: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType if level >= 0 && level <= 9 => TypeCheckResult.TypeCheckSuccess
    case StringType | BinaryType =>
      TypeCheckResult.TypeCheckFailure(s"deflate_length level must be 0..9, got $level")
    case t =>
      TypeCheckResult.TypeCheckFailure(s"deflate_length expects string or binary, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => CompressionKernels.deflateLengthString(v.asInstanceOf[UTF8String], level)
    case BinaryType => CompressionKernels.deflateLength(v.asInstanceOf[Array[Byte]], level)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev,
          c => s"graft.functions.CompressionKernels.deflateLengthString($c, $level)")
      case BinaryType =>
        defineCodeGen(ctx, ev,
          c => s"graft.functions.CompressionKernels.deflateLength($c, $level)")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object compression {
  /** Compressed byte length of a string/binary column (DEFLATE raw, level 6). */
  def deflate_length(c: Column, level: Int = 6): Column =
    DeflateLength(c.asExpression, level).asColumn
}
