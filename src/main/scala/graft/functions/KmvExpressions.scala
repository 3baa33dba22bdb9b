package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * KMV (k-minimum-values) sketch aggregate: the `k` SMALLEST DISTINCT string
 * values of the child expression, as an ascending array.
 *
 * This is the mergeable-sketch shape that makes corpus-vs-corpus overlap
 * estimation a no-join, no-shuffle-of-the-corpus operation at 100 TB: fed
 * a uniform hash (md5 hex of a document fingerprint), the bottom-k distinct
 * hashes are a uniform coordinated sample of the corpus's distinct set
 * ("On Synopses for Distinct-Value Estimation Under Multiset Operations",
 * Beyer et al., SIGMOD 2007). Two corpora sketch independently (one
 * bounded pass each, partial aggregation combines map-side so each task
 * ships at most `k` strings); Jaccard/overlap then computes on the two
 * k-element arrays alone. Because "bottom-k distinct" is a lattice merge
 * (union then trim), partial/final aggregation is exact — the result is
 * bit-identical to a global sort-distinct-limit, which is what the DuckDB
 * oracle replays.
 *
 * Buffer is a bounded TreeSet (≤ k entries); serialization is
 * length-prefixed UTF-8, so a sketch also persists losslessly through
 * shuffle exchanges.
 */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]] {

  require(k > 0, s"kmv_bottom_k needs k > 0: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_bottom_k"

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  private def insert(buffer: java.util.TreeSet[UTF8String], v: UTF8String,
                     copy: Boolean): Unit = {
    // only values that can enter the bottom-k are ever copied/stored
    if (buffer.size < k || v.compareTo(buffer.last()) < 0) {
      buffer.add(if (copy) v.clone() else v)
      if (buffer.size > k) buffer.pollLast()
    }
  }

  override def update(buffer: java.util.TreeSet[UTF8String],
                      input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    // input UTF8String may point into a reused row buffer -> clone on keep
    if (v != null) insert(buffer, v.asInstanceOf[UTF8String], copy = true)
    buffer
  }

  override def merge(buffer: java.util.TreeSet[UTF8String],
                     other: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next(), copy = false)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[UTF8String]): Any = {
    val arr = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending
  }

  override def serialize(buffer: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buffer = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buffer.add(UTF8String.fromBytes(b))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
