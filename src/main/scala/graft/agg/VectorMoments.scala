package graft.agg

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * One-pass second-moment sketch of an embedding column: count, per-dimension
 * sums, and the upper triangle of the Gram matrix sum(x xT) — everything a
 * PCA/whitening rotation needs, in ONE bounded mergeable buffer.
 *
 * This is the 100 TB shape for covariance: the naive plan (posexplode to
 * (i, x_i) pairs, self-join on row id, groupBy (i, j)) shuffles dim^2 rows
 * PER VECTOR — at dim=1024 that is a million-row exchange per embedding.
 * Here each task folds its vectors into one `1 + dim + dim*(dim+1)/2`
 * double buffer (dim=1024 -> ~4 MB; dim=64 -> 17 KB), partial aggregation
 * combines map-side, and exactly one buffer per task crosses the exchange.
 * Merge is element-wise addition, so partial/final aggregation is exact up
 * to float addition order (the same contract as Spark's own sum/avg).
 *
 * Output: array<double> laid out [n, sum_0..sum_{dim-1}, upper-tri
 * products row-major]. [[VectorMoments.secondMoment]] and
 * [[VectorMoments.covariance]] unpack it driver-side.
 */
case class VecMomentsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0 && dim <= 4096, s"vec_moments needs dim in 1..4096: $dim")

  private val triLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + triLen

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_moments"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_moments expects array<float>, got ${t.sql}")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vec_moments(dim=$dim) got a ${arr.numElements()}-element vector")
      buffer(0) += 1.0
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        val xi = arr.getFloat(i).toDouble
        buffer(1 + i) += xi
        var j = i
        while (j < dim) {
          buffer(t) += xi * arr.getFloat(j).toDouble
          t += 1
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = {
    val out = new Array[Any](bufLen)
    var i = 0
    while (i < bufLen) { out(i) = buffer(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Double] = {
    val out = new Array[Double](storageFormat.length / 8)
    ByteBuffer.wrap(storageFormat).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/**
 * One-pass per-dimension sum/count of an embedding column — the k-means /
 * PQ "M step" in ONE bounded mergeable buffer (`2 * dim` doubles) instead
 * of a per-dimension explode: each task folds its vectors into
 * `[count_0..count_{dim-1}, sum_0..sum_{dim-1}]`, partials combine
 * map-side, exactly one buffer per (group, task) crosses the exchange.
 * Accumulation is `sum += (double) x_i` in row order — the same
 * double-precision contract as Spark's Average over the exploded
 * per-dimension values, so `sum_i / count_i` reproduces `avg(x_i)`
 * bit-for-bit under the same partitioning. Vectors shorter than `dim`
 * contribute only their present dimensions (per-dimension counts, exactly
 * like the absent explode rows); dimensions beyond `dim` are ignored.
 */
case class VecSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0 && dim <= 65536, s"vec_sum needs dim in 1..65536: $dim")

  private val bufLen = 2 * dim

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sum"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum expects array<float>, got ${t.sql}")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      var i = 0
      while (i < n) {
        buffer(i) += 1.0
        buffer(dim + i) += arr.getFloat(i).toDouble
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = {
    val out = new Array[Any](bufLen)
    var i = 0
    while (i < bufLen) { out(i) = buffer(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Double] = {
    val out = new Array[Double](storageFormat.length / 8)
    ByteBuffer.wrap(storageFormat).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorMoments {

  /** Aggregate column: the flattened moments sketch (see [[VecMomentsAgg]]). */
  def vecMoments(vec: Column, dim: Int): Column =
    VecMomentsAgg(vec.asExpression, dim).toAggregateExpression().asColumn

  /** Aggregate column: per-dimension counts + sums (see [[VecSumAgg]]) —
    * layout `[c_0..c_{dim-1}, s_0..s_{dim-1}]`; mean_i = s_i / c_i. */
  def vecSum(vec: Column, dim: Int): Column =
    VecSumAgg(vec.asExpression, dim).toAggregateExpression().asColumn

  /** Unpack the sketch into (n, mean, M) where M is the full symmetric
    * second-moment matrix E[x xT] (uncentered). */
  def secondMoment(flat: Array[Double], dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val n = flat(0)
    require(n > 0, "vec_moments sketch is empty")
    val mean = Array.tabulate(dim)(i => flat(1 + i) / n)
    val m = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = flat(t) / n
        m(i)(j) = v
        m(j)(i) = v
        t += 1
        j += 1
      }
      i += 1
    }
    (n.toLong, mean, m)
  }

  /** Centered covariance E[x xT] - mean meanT, from the same sketch. */
  def covariance(flat: Array[Double], dim: Int): Array[Array[Double]] = {
    val (_, mean, m) = secondMoment(flat, dim)
    Array.tabulate(dim, dim)((i, j) => m(i)(j) - mean(i) * mean(j))
  }
}
