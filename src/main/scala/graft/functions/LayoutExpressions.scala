package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Data-layout kernels: the Hilbert-curve index for multi-dimensional file
 * clustering ([[graft.write.Hilbert]]).
 *
 * Why a kernel and not Column algebra: the Morton key interleaves bits
 * independently, so [[graft.write.ZOrder.zValue]] can be pure
 * shift/mask/or expressions. The Hilbert transform is a SEQUENTIAL bit
 * recurrence (each bit plane conditions on the planes above it), which
 * would explode into thousands of nested CASE expressions — one tight
 * codegen'd loop is both faster and readable.
 */
object LayoutKernels extends Serializable {

  /**
   * Hilbert index of `lanes` (k coordinates, each already quantized into
   * `bits`-bit non-negative lanes): Skilling's transform ("Programming the
   * Hilbert curve", AIP Conf. Proc. 707, 2004) — inverse-undo + Gray
   * decode over the bit planes, then bit interleave (lane 0 most
   * significant within each plane). Total key width `k * bits <= 63`.
   *
   * Consecutive Hilbert indices differ by ONE unit step in ONE coordinate —
   * the locality property Morton lacks (Morton takes long diagonal jumps
   * at power-of-two boundaries), which is what tightens per-file min/max
   * ranges when files cut the sorted order into equal runs.
   */
  def hilbertIndex(lanes: ArrayData, bits: Int): Long = {
    val n = lanes.numElements()
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = lanes.getLong(i); i += 1 }
    if (n == 1) return x(0)

    val m = 1L << (bits - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray decode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }

    // interleave the transposed form: bit plane b-1 first, lane 0 most
    // significant inside each plane
    var h = 0L
    var plane = bits - 1
    while (plane >= 0) {
      i = 0
      while (i < n) {
        h = (h << 1) | ((x(i) >>> plane) & 1L)
        i += 1
      }
      plane -= 1
    }
    h
  }
}

/** hilbert_index(lanes): the Hilbert key of pre-quantized coordinate lanes
  * -> long. Narrow, codegen'd, constant `bits`. */
case class HilbertIndex(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects array<bigint> and bits in 1..63, got ${t.sql} / $bits")
  }

  override def nullSafeEval(lanes: Any): Any =
    LayoutKernels.hilbertIndex(lanes.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.LayoutKernels.hilbertIndex($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object layout {
  def hilbert_index(lanes: Column, bits: Int): Column =
    HilbertIndex(lanes.asExpression, bits).asColumn
}
