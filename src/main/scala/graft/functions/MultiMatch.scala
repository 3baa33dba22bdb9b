package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern substring search: which of N fixed phrases
 * occur verbatim anywhere in the text, found in ONE pass over the bytes
 * regardless of N — the curation shape for bad-phrase / boilerplate-marker /
 * URL-fragment blocklists where N regex passes (or N `contains` calls)
 * would each rescan the document.
 *
 * Matching is over UTF-8 bytes. That is exactly substring-of-characters
 * semantics for valid UTF-8: the encoding is self-synchronizing (lead and
 * continuation bytes are disjoint ranges), so a pattern's byte sequence can
 * only align at codepoint boundaries — byte-level hits never straddle a
 * character. Case-sensitive; lowercase both sides first for
 * case-insensitive lists.
 *
 * The automaton builds once per expression instance on the driver and
 * ships to executors as a broadcast-like reference object (standard
 * codegen `addReferenceObj`), so per-row work is just the byte walk.
 */
final class AcAutomaton(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "AcAutomaton needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern would match every row")

  private val patternBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  val size: Int = patternBytes.length

  // Trie as parallel growable arrays; children dense per node over the
  // 256 byte values would be memory-heavy for large lists — use a single
  // open hash from (node << 8 | byte) to child instead.
  private val children = new java.util.HashMap[Integer, Integer]()
  private var nodeCount = 1
  private var outputs: Array[Array[Int]] = _ // per node: pattern ids ending here
  private var fail: Array[Int] = _

  locally {
    val outBuild = scala.collection.mutable.Map.empty[Int, List[Int]]
    var p = 0
    while (p < patternBytes.length) {
      var node = 0
      val bytes = patternBytes(p)
      var i = 0
      while (i < bytes.length) {
        val key = Integer.valueOf((node << 8) | (bytes(i) & 0xFF))
        val next = children.get(key)
        if (next == null) {
          children.put(key, Integer.valueOf(nodeCount))
          node = nodeCount
          nodeCount += 1
        } else node = next.intValue()
        i += 1
      }
      outBuild(node) = p :: outBuild.getOrElse(node, Nil)
      p += 1
    }
    // BFS fail links; merge fail-target outputs so a hit at a node reports
    // every pattern that ends at ANY suffix of the current position
    fail = new Array[Int](nodeCount)
    val outArr = Array.fill(nodeCount)(List.empty[Int])
    outBuild.foreach { case (n, ids) => outArr(n) = ids }
    val queue = new java.util.ArrayDeque[Int]()
    var b = 0
    while (b < 256) {
      val c = children.get(Integer.valueOf(b))
      if (c != null) { fail(c.intValue()) = 0; queue.add(c.intValue()) }
      b += 1
    }
    // need child enumeration per node: build it once from the hash
    val childList = Array.fill(nodeCount)(List.empty[(Int, Int)])
    children.forEach { (k, v) =>
      childList(k.intValue() >>> 8) = ((k.intValue() & 0xFF, v.intValue())) :: childList(k.intValue() >>> 8)
    }
    while (!queue.isEmpty) {
      val node = queue.poll()
      childList(node).foreach { case (byte, child) =>
        var f = fail(node)
        while (f != 0 && children.get(Integer.valueOf((f << 8) | byte)) == null) f = fail(f)
        val fc = children.get(Integer.valueOf((f << 8) | byte))
        fail(child) = if (fc != null && fc.intValue() != child) fc.intValue() else 0
        outArr(child) = outArr(child) ++ outArr(fail(child))
        queue.add(child)
      }
    }
    outputs = outArr.map(_.toArray)
  }

  private val patLen: Array[Int] = patternBytes.map(_.length)

  /**
   * Replace every LEFTMOST-LONGEST non-overlapping pattern occurrence with
   * `mask` — the removal twin of [[matches]] (scrub the bad phrase, keep
   * the document). Selection rule, fully specified so an independent
   * replication agrees byte-for-byte: collect every occurrence of every
   * pattern (one automaton walk), order by (start ascending, length
   * descending), then greedily keep each occurrence whose start is at or
   * past the previous kept occurrence's end (same-span duplicates mask
   * identically, so no further tiebreak affects the output). UTF-8
   * self-synchronization makes byte spans codepoint-aligned, so splicing
   * never corrupts a character.
   */
  def maskAll(text: UTF8String, mask: Array[Byte]): UTF8String = {
    val bytes = text.getBytes
    // occurrences packed as (start << 32 | (MaxInt - len)) — one ascending
    // long sort IS the (start asc, length desc) selection order; equal
    // (start, len) duplicates mask identically, so no further tiebreak
    // affects the output
    var occ = new Array[Long](8)
    var nOcc = 0
    var node = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      var n = node
      var c = children.get(Integer.valueOf((n << 8) | b))
      while (n != 0 && c == null) { n = fail(n); c = children.get(Integer.valueOf((n << 8) | b)) }
      node = if (c == null) 0 else c.intValue()
      val out = outputs(node)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        val start = i - patLen(p) + 1
        if (nOcc == occ.length) occ = java.util.Arrays.copyOf(occ, occ.length * 2)
        occ(nOcc) = (start.toLong << 32) | ((Integer.MAX_VALUE - patLen(p)).toLong & 0xFFFFFFFFL)
        nOcc += 1
        j += 1
      }
      i += 1
    }
    if (nOcc == 0) return text
    java.util.Arrays.sort(occ, 0, nOcc)
    val outBuf = new java.io.ByteArrayOutputStream(bytes.length)
    var cur = 0
    var k = 0
    while (k < nOcc) {
      val start = (occ(k) >>> 32).toInt
      val len = Integer.MAX_VALUE - (occ(k) & 0xFFFFFFFFL).toInt
      if (start >= cur) {
        outBuf.write(bytes, cur, start - cur)
        outBuf.write(mask, 0, mask.length)
        cur = start + len
      }
      k += 1
    }
    outBuf.write(bytes, cur, bytes.length - cur)
    UTF8String.fromBytes(outBuf.toByteArray)
  }

  /**
   * LEFTMOST-LONGEST non-overlapping occurrences WITH pattern identity:
   * flattened `(start, end, patternId)` triples in start order — the exact
   * selection rule of [[maskAll]] (start asc, length desc, greedy
   * non-overlap). Distinct patterns are distinct byte strings, so a
   * selected `(start, len)` span determines its pattern uniquely; ids ride
   * in the packed sort key (16 bits each for length and id — enforced).
   * This is the splitter the special-token tokenizer path needs: segments
   * between spans encode normally, spans become reserved ids.
   */
  def selectedSpans(bytes: Array[Byte]): Array[Int] = {
    require(size <= 0xFFFF, s"selectedSpans supports <= 65535 patterns: $size")
    var occ = new Array[Long](8)
    var nOcc = 0
    var node = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      var n = node
      var c = children.get(Integer.valueOf((n << 8) | b))
      while (n != 0 && c == null) { n = fail(n); c = children.get(Integer.valueOf((n << 8) | b)) }
      node = if (c == null) 0 else c.intValue()
      val out = outputs(node)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        require(patLen(p) <= 0xFFFF,
          s"selectedSpans supports patterns <= 65535 bytes: ${patLen(p)}")
        val start = i - patLen(p) + 1
        if (nOcc == occ.length) occ = java.util.Arrays.copyOf(occ, occ.length * 2)
        occ(nOcc) = (start.toLong << 32) |
          (((0xFFFF - patLen(p)).toLong & 0xFFFFL) << 16) | (p.toLong & 0xFFFFL)
        nOcc += 1
        j += 1
      }
      i += 1
    }
    if (nOcc == 0) return Array.emptyIntArray
    java.util.Arrays.sort(occ, 0, nOcc)
    val outBuf = new scala.collection.mutable.ArrayBuilder.ofInt
    var cur = 0
    var k = 0
    while (k < nOcc) {
      val start = (occ(k) >>> 32).toInt
      val len = 0xFFFF - ((occ(k) >>> 16) & 0xFFFFL).toInt
      val pid = (occ(k) & 0xFFFFL).toInt
      if (start >= cur) {
        outBuf += start
        outBuf += start + len
        outBuf += pid
        cur = start + len
      }
      k += 1
    }
    outBuf.result()
  }

  /** Distinct matched pattern ids, ascending. */
  def matches(text: UTF8String): Array[Int] = {
    val bytes = text.getBytes
    val hit = new Array[Boolean](size)
    var hits = 0
    var node = 0
    var i = 0
    while (i < bytes.length && hits < size) {
      val b = bytes(i) & 0xFF
      var n = node
      var c = children.get(Integer.valueOf((n << 8) | b))
      while (n != 0 && c == null) { n = fail(n); c = children.get(Integer.valueOf((n << 8) | b)) }
      node = if (c == null) 0 else c.intValue()
      val out = outputs(node)
      var j = 0
      while (j < out.length) {
        if (!hit(out(j))) { hit(out(j)) = true; hits += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](hits)
    var k = 0; var p = 0
    while (p < size) { if (hit(p)) { res(k) = p; k += 1 }; p += 1 }
    res
  }
}

/** matched_patterns(text) -> array<int>: distinct ids (ascending) of the
  * fixed patterns occurring verbatim in the text; one Aho–Corasick pass. */
case class MatchedPatterns(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val automaton = new AcAutomaton(patterns)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if patterns.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("matched_patterns needs >= 1 pattern")
    case t => TypeCheckResult.TypeCheckFailure(s"matched_patterns expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      automaton.matches(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData($acRef.matches($a))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** mask_patterns(text) -> string: every leftmost-longest non-overlapping
  * occurrence of the fixed patterns replaced by `mask` — in-place blocklist
  * scrubbing (keep the document, drop the phrase) in one Aho–Corasick pass. */
case class MaskPatterns(child: Expression, patterns: Seq[String], mask: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val automaton = new AcAutomaton(patterns)
  private val maskBytes: Array[Byte] =
    mask.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if patterns.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("mask_patterns needs >= 1 pattern")
    case t => TypeCheckResult.TypeCheckFailure(s"mask_patterns expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    automaton.maskAll(text.asInstanceOf[UTF8String], maskBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
    val maskRef = ctx.addReferenceObj("maskBytes", maskBytes, "byte[]")
    defineCodeGen(ctx, ev, a => s"$acRef.maskAll($a, $maskRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
