package graft.agg

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-min sketch ("An improved data stream summary: the count-min sketch
 * and its applications", Cormode & Muthukrishnan, J. Algorithms 2005):
 * approximate frequencies for EVERY key in one bounded mergeable buffer.
 *
 * [[graft.agg.FrequentItems]] (Misra-Gries) answers "which keys are the
 * top-k heavy hitters"; the CMS answers the complementary point query —
 * "how often does THIS key occur" for arbitrary keys after the fact — with
 * the one-sided guarantee `true <= estimate <= true + eps * N` (eps = e /
 * width, probability 1 - e^-depth). At 100 TB that is the shape for n-gram
 * / URL / domain frequency services: `depth * width` longs per task
 * (4 x 1024 = 32 KB), map-side combined, element-wise-added across
 * partitions — corpus-size-independent communication, then any number of
 * point queries against the one-row sketch.
 *
 * Hashing is engine-portable: row `d` of the sketch buckets `key` by the
 * first 16 bits of `md5("<d>:<key>")` mod `width` — any engine's md5 of
 * the same UTF-8 bytes agrees, so a DuckDB oracle replays the ENTIRE
 * sketch (counters and point queries) exactly, collisions included.
 */
object CountMinKernels extends Serializable {

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bucket of `key` in sketch row `d`: first 16 md5 bits of "<d>:<key>"
    * mod width. */
  def bucket(key: UTF8String, d: Int, width: Int): Int = {
    val dig = md5Digest.get()
    dig.reset()
    dig.update(java.lang.Integer.toString(d).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    dig.update(':'.toByte)
    dig.update(key.getBytes)
    val h = dig.digest()
    (((h(0) & 0xFF) << 8) | (h(1) & 0xFF)) % width
  }

  /** Point query: min over rows of the key's counter. */
  def cmsQuery(sketch: ArrayData, key: UTF8String, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch.getLong(d * width + bucket(key, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }
}

/** cms_sketch(key): the flattened `depth * width` counter array. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cms_sketch depth in 1..16: $depth")
  require(width >= 2 && width <= 65536, s"cms_sketch width in 2..65536: $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects string, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        buffer(d * width + CountMinKernels.bucket(key, d, width)) += 1L
        d += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = new Array[Any](buffer.length)
    var i = 0
    while (i < buffer.length) { out(i) = buffer(i); i += 1 }
    new GenericArrayData(out)
  }

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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** cms_estimate(sketch, key): the point query, codegen'd — joinable against
  * any key stream once the one-row sketch is broadcast. */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (array<bigint>, string), got (${a.sql}, ${b.sql})")
  }

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CountMinKernels.cmsQuery(sketch.asInstanceOf[ArrayData],
      key.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.agg.CountMinKernels.cmsQuery($a, $b, $depth, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountMin {

  /** Aggregate column: the flattened count-min counters. */
  def cmsSketch(key: Column, depth: Int, width: Int): Column =
    CmsSketchAgg(key.asExpression, depth, width).toAggregateExpression().asColumn

  /** Point-query column over a sketch column (broadcast the one-row sketch
    * onto the key stream first). */
  def cmsEstimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    CmsEstimate(sketch.asExpression, key.asExpression, depth, width).asColumn
}
