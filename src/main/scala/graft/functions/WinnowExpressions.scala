package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, "Winnowing:
 * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
 * algorithm).
 *
 * From the document's FULL n-gram hash sequence (every occurrence, in
 * order — NOT the distinct set), each sliding window of `w` consecutive
 * hashes contributes its minimum; the distinct selected hashes are the
 * document's fingerprint. The winnowing guarantee: any shared token run of
 * at least `w + n - 1` tokens between two documents shares at least one
 * SELECTED fingerprint — so an index over selected prints (~2/(w+1) of all
 * positions) finds every contiguous overlap of that length, which is what
 * makes excerpt/containment detection affordable at corpus scale.
 *
 * Token and hash identity are exactly [[VectorKernels.hashedWordShingles]]
 * (same byte-level tokenizer, same per-window FNV+avalanche), so a selected
 * print IS a member of the document's shingle-hash set and candidate pairs
 * verify directly against those sets. Ties select the RIGHTMOST minimal
 * hash per window (robust winnowing): runs of equal hashes contribute one
 * print, and the choice is deterministic.
 */
object WinnowKernels extends Serializable {

  /** Selected winnowing fingerprints of `text` (distinct, selection order).
    * Fewer than `n` tokens -> empty; fewer than `w` windows -> the global
    * minimum alone (short docs still fingerprint). */
  def winnowedShingles(text: UTF8String, n: Int, w: Int): Array[Long] = {
    val raw = text.getBytes
    val bytes =
      if (VectorKernels.hasSpecialLowerToAscii(raw)) VectorKernels.renormalizeSpecial(raw)
      else raw
    // token boundaries — identical scheme to hashedWordShingles
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTokens = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isAl = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
      if (isAl) {
        if (nTokens == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTokens * 2)
          ends = java.util.Arrays.copyOf(ends, nTokens * 2)
        }
        starts(nTokens) = i
        while (i < bytes.length && {
          val c = bytes(i)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')
        }) i += 1
        ends(nTokens) = i
        nTokens += 1
      } else i += 1
    }
    if (nTokens < n) return Array.emptyLongArray
    // every n-gram hash IN ORDER (with multiplicity) — FNV over lowercased
    // bytes with 0x20 joints, then the same avalanche as hashedWordShingles
    val m = nTokens - n + 1
    val hs = new Array[Long](m)
    var p0 = 0
    while (p0 < m) {
      var h = 0xcbf29ce484222325L
      var t = p0
      while (t < p0 + n) {
        if (t > p0) { h ^= 0x20L; h *= 0x100000001b3L }
        var p = starts(t)
        val e = ends(t)
        while (p < e) {
          var c = bytes(p)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          h ^= (c & 0xffL)
          h *= 0x100000001b3L
          p += 1
        }
        t += 1
      }
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
      h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
      h ^= (h >>> 33)
      hs(p0) = h
      p0 += 1
    }
    // sliding-window minimum via a monotonic index deque; <= pops keep the
    // RIGHTMOST minimal index (robust winnowing tie rule)
    val out = new Array[Long](math.min(m, math.max(1, m - w + 1)))
    var outLen = 0
    var cap = Integer.highestOneBit(math.max(4, out.length * 2) - 1) << 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    def emit(h: Long): Unit = {
      var slot = (h.toInt & (cap - 1)).abs
      var seen = false
      while (used(slot) && !seen) {
        if (table(slot) == h) seen = true else slot = (slot + 1) & (cap - 1)
      }
      if (!seen) { used(slot) = true; table(slot) = h; out(outLen) = h; outLen += 1 }
    }
    if (m < w) {
      // degenerate: one window = the whole (short) sequence
      var mn = hs(0); var j = 1
      while (j < m) { if (hs(j) <= mn) mn = hs(j); j += 1 }
      emit(mn)
    } else {
      val dq = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      var j = 0
      while (j < m) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1) emit(hs(dq(head)))
        j += 1
      }
    }
    java.util.Arrays.copyOf(out, outLen)
  }
}

/** winnowed_shingles(text, n, w): selected winnowing fingerprints ->
  * array<long>. Single-pass kernel, codegen'd; streaming-legal (narrow). */
case class WinnowedShingles(child: Expression, n: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnowed_shingles expects string and n>0, w>0, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new GenericArrayData(
      WinnowKernels.winnowedShingles(text.asInstanceOf[UTF8String], n, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WinnowKernels.winnowedShingles($a, $n, $w))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object winnow {
  def winnowed_shingles(text: Column, n: Int, w: Int): Column =
    WinnowedShingles(text.asExpression, n, w).asColumn
}
