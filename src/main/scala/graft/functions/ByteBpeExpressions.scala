package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level BPE kernels (the GPT-2/tiktoken lineage): the tokenizer
 * operates on UTF-8 BYTES, so every string is representable with zero
 * out-of-vocabulary risk, and token counts line up with what production
 * models charge against context windows — the unit the token-budget
 * operators (P45/P86/P113) should really count in.
 *
 * The pre-tokenizer is a fully-specified byte-level scanner modeled on
 * GPT-2's alternation ORDER (contractions first, the `\s+(?!\S)`
 * backtrack, single-space attachment), implemented WITHOUT a regex
 * engine so any runtime replays it byte-for-byte (Java and Python regex
 * classes disagree on `\s`/`\p{L}` subtleties; a hand scanner cannot).
 * DOCUMENTED DIVERGENCE from GPT-2/tiktoken: character classes are
 * byte-level approximations — every byte >= 0x80 classifies as LETTER,
 * so multi-byte codepoints (non-Latin letters, but also symbols, emoji
 * and non-ASCII digits/punctuation) merge into letter runs where
 * `\p{L}`/`\p{N}` would split them. Token COUNTS on heavily non-ASCII
 * text therefore differ from tiktoken's; zero-OOV byte coverage and
 * exact replayability are unaffected:
 *
 *  byte classes — WS = {0x09..0x0D, 0x20}; LETTER = ASCII A-Z/a-z or any
 *  byte >= 0x80 (multi-byte UTF-8 sequences group with letters); DIGIT =
 *  0-9; OTHER = the rest. Scanning left to right:
 *   1. lowercase contractions `'s 't 're 've 'm 'll 'd` match first;
 *   2. a whitespace RUN at end-of-text is one token; a longer run before
 *      a non-space yields run-minus-last-byte as one token (the regex
 *      `\s+(?!\S)` backtrack), the final whitespace byte rescanned alone;
 *   3. a single 0x20 before a non-space attaches to the following class
 *      run (the ` ?` prefix); any other single whitespace byte is its own
 *      token;
 *   4. otherwise: a maximal run of the current byte's class.
 *
 * Merges never cross pre-token boundaries. Symbols travel inside the JVM
 * as latin-1 strings (char k = byte k — comparisons are byte order);
 * OUTPUT tokens are mapped through the standard printable byte↔unicode
 * table (0x20 → 'Ġ' etc. — the GPT-2 vocab display alphabet) so joined
 * token streams are unambiguous and parquet/oracle-safe.
 */
object ByteBpeKernels extends Serializable {

  /** GPT-2 bytes_to_unicode: printable latin bytes map to themselves,
    * the 68 remaining bytes map to U+0100.. in ascending byte order. */
  val byteToChar: Array[Char] = {
    val printable = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++
      (0xAE to 0xFF)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable.contains(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Latin-1 symbol -> display alphabet. */
  def display(sym: String): String = {
    val sb = new java.lang.StringBuilder(sym.length)
    var i = 0
    while (i < sym.length) { sb.append(byteToChar(sym.charAt(i).toInt)); i += 1 }
    sb.toString
  }

  /** Display alphabet -> latin-1 symbol (inverse of [[display]]). */
  def fromDisplay(disp: String): String = {
    val inv = charToByte
    val sb = new java.lang.StringBuilder(disp.length)
    var i = 0
    while (i < disp.length) {
      val b = inv.get(disp.charAt(i))
      require(b != null, s"not a byte-display char: ${disp.charAt(i).toInt}")
      sb.append(b.charValue())
      i += 1
    }
    sb.toString
  }

  @transient private lazy val charToByte: java.util.HashMap[Character, Character] = {
    val m = new java.util.HashMap[Character, Character](512)
    var b = 0
    while (b < 256) { m.put(byteToChar(b), b.toChar); b += 1 }
    m
  }

  /**
   * EXACT-inverse detokenizer: concatenate display-alphabet tokens, map
   * each display char back to its byte, read the bytes as UTF-8. Merges
   * only ever concatenate byte symbols and the display map is a bijection
   * on bytes, so `decode(encode(x)) == x` for EVERY input string — no
   * model needed (the merge list is irrelevant to the inverse). Null
   * array elements are skipped (the encode kernel never emits them).
   * Hand-cut token streams that split a multi-byte codepoint decode to
   * whatever the raw bytes spell — garbage in, garbage out, by design.
   */
  def decode(tokens: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val inv = charToByte
    val n = tokens.numElements()
    val bos = new java.io.ByteArrayOutputStream(math.max(16, n * 4))
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val disp = tokens.getUTF8String(i).toString
        var j = 0
        while (j < disp.length) {
          val b = inv.get(disp.charAt(j))
          require(b != null,
            s"not a byte-display char: U+${disp.charAt(j).toInt.toHexString}")
          bos.write(b.charValue().toInt)
          j += 1
        }
      }
      i += 1
    }
    UTF8String.fromBytes(bos.toByteArray)
  }

  private def isWs(b: Int): Boolean = (b >= 0x09 && b <= 0x0D) || b == 0x20
  private def isLetter(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || b >= 0x80
  private def isDigit(b: Int): Boolean = b >= '0' && b <= '9'
  // 0 = WS, 1 = LETTER, 2 = DIGIT, 3 = OTHER
  private def cls(b: Int): Int =
    if (isWs(b)) 0 else if (isLetter(b)) 1 else if (isDigit(b)) 2 else 3

  /** Contraction length at position i (2 or 3), or 0. */
  private def contractionLen(bytes: Array[Byte], i: Int): Int = {
    val n = bytes.length
    if (bytes(i) != '\'') return 0
    if (i + 1 < n) {
      val c1 = bytes(i + 1).toInt
      if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') return 2
      if (i + 2 < n) {
        val c2 = bytes(i + 2).toInt
        if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
            (c1 == 'l' && c2 == 'l')) return 3
      }
    }
    0
  }

  /** Pre-tokenize UTF-8 bytes into latin-1 symbol strings. */
  def preTokenize(bytes: Array[Byte]): Array[String] = {
    val n = bytes.length
    val out = Array.newBuilder[String]
    def latin1(from: Int, until: Int): String = {
      val sb = new java.lang.StringBuilder(until - from)
      var k = from
      while (k < until) { sb.append((bytes(k) & 0xFF).toChar); k += 1 }
      sb.toString
    }
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      val cl = contractionLen(bytes, i)
      if (cl > 0) {
        out += latin1(i, i + cl)
        i += cl
      } else if (isWs(b)) {
        var j = i + 1
        while (j < n && isWs(bytes(j) & 0xFF)) j += 1
        if (j == n) { out += latin1(i, j); i = j }
        else if (j - i > 1) { out += latin1(i, j - 1); i = j - 1 }
        else if (b == 0x20) {
          // single space attaches to the following class run
          val c = cls(bytes(i + 1) & 0xFF)
          var k = i + 2
          while (k < n && cls(bytes(k) & 0xFF) == c) k += 1
          out += latin1(i, k)
          i = k
        } else { out += latin1(i, i + 1); i += 1 }
      } else {
        val c = cls(b)
        var k = i + 1
        while (k < n && cls(bytes(k) & 0xFF) == c) k += 1
        out += latin1(i, k)
        i = k
      }
    }
    out.result()
  }
}

/**
 * Serializable byte-level BPE encoder shipped inside the plan (the
 * BpeCoder pattern): pre-tokenize, then per pre-token apply merges
 * lowest-rank-first with a per-thread memo. `merges` are latin-1 symbol
 * pairs; output tokens are display-mapped. An EMPTY merge list is legal
 * and yields the raw pre-token stream (the training word-count pass).
 */
class ByteBpeCoder(merges: Array[Array[String]]) extends Serializable {
  // rank keys are LENGTH-PREFIXED, never separator-joined: byte-level
  // symbols can contain ANY byte (the word-level BpeCoder's separator
  // key would collide distinct pairs like ("  ","   ") vs ("   ","  ")
  // and silently drop a rank, diverging encode from the merge list)
  private def rankKey(l: String, r: String): String =
    l.length.toString + ":" + l + r

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.putIfAbsent(rankKey(merges(i)(0), merges(i)(1)), Int.box(i))
      i += 1
    }
    m
  }

  @transient private lazy val memo =
    new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean =
            size() > 65536
        }
    }

  /** Greedy lowest-rank merge loop over one latin-1 pre-token; returns
    * DISPLAY-mapped subword strings. */
  private def encodePretoken(w: String): Array[String] = {
    val cached = memo.get.get(w)
    if (cached != null) return cached
    // no merges = the training word-count pass: the pre-token itself IS
    // the token (splitting to bytes would erase the pre-token boundary
    // the frequency table is counting)
    if (merges.isEmpty) {
      val whole = Array(ByteBpeKernels.display(w))
      memo.get.put(w, whole)
      return whole
    }
    var syms: Array[String] = new Array[String](w.length)
    var s = 0
    while (s < w.length) { syms(s) = String.valueOf(w.charAt(s)); s += 1 }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(rankKey(syms(i), syms(i + 1)))
        if (r != null && r.intValue < bestRank) {
          bestRank = r.intValue; bl = syms(i); br = syms(i + 1)
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bl && syms(j + 1) == br) {
            out += bl + br; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    val res = syms.map(ByteBpeKernels.display)
    memo.get.put(w, res)
    res
  }

  def encode(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val pretoks = ByteBpeKernels.preTokenize(text.getBytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < pretoks.length) {
      val subs = encodePretoken(pretoks(i))
      var j = 0
      while (j < subs.length) { out += UTF8String.fromString(subs(j)); j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** byte_bpe_encode(text): byte-level-BPE token stream (display alphabet)
  * — one narrow codegen'd kernel pass, no shuffle. An empty merge list
  * emits raw pre-tokens (the corpus word-count pass uses exactly this).
  * Merges are an IndexedSeq so case-class equality is element-wise and
  * CSE collapses twin encode columns (see UnigramEncode's note). */
case class ByteBpeEncode(child: Expression, merges: IndexedSeq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_encode expects string, got ${t.sql}")
  }

  @transient private lazy val coder =
    new ByteBpeCoder(merges.map(p => Array(p._1, p._2)).toArray)

  override def nullSafeEval(text: Any): Any =
    coder.encode(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeCoder", coder, "graft.functions.ByteBpeCoder")
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Token-ID vocabulary for a byte-BPE merge list — GPT-2's exact
 * construction: ids 0..255 are the 256 single-byte tokens (in byte order),
 * id 256+i is the result of merge i. A merge result that duplicates an
 * earlier token (possible when two merge paths build the same string)
 * keeps its FIRST id; encode emits that id, decode accepts both. Symbols
 * here are LATIN-1 (the coder's internal alphabet); display mapping is a
 * separate concern.
 */
class ByteBpeVocab(merges: Array[Array[String]]) extends Serializable {
  /** id -> latin-1 symbol. */
  val symbols: Array[String] = {
    val out = new Array[String](256 + merges.length)
    var b = 0
    while (b < 256) { out(b) = String.valueOf(b.toChar); b += 1 }
    var i = 0
    while (i < merges.length) {
      out(256 + i) = merges(i)(0) + merges(i)(1)
      i += 1
    }
    out
  }

  /** latin-1 symbol -> first id. */
  @transient lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](symbols.length * 2)
    var i = 0
    while (i < symbols.length) { m.putIfAbsent(symbols(i), Int.box(i)); i += 1 }
    m
  }

  /** DISPLAY-alphabet token -> first id — keyed the way the encode kernel
    * emits tokens, so the id lookup needs no display→latin-1 inversion in
    * the per-row hot path. */
  @transient lazy val displayIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](symbols.length * 2)
    var i = 0
    while (i < symbols.length) {
      m.putIfAbsent(ByteBpeKernels.display(symbols(i)), Int.box(i))
      i += 1
    }
    m
  }

  def size: Int = symbols.length
}

/** byte-BPE token-ID codec: the coder's subword stream mapped through a
  * [[ByteBpeVocab]] — what a pipeline actually ships to a trainer
  * (`array<int>` ids + a persisted vocab), not display strings. */
class ByteBpeIdCoder(merges: Array[Array[String]]) extends Serializable {
  private val coder = new ByteBpeCoder(merges)
  private val vocab = new ByteBpeVocab(merges)

  /** text -> ids. Every subword the coder emits is a single byte or a
    * merge result, so the vocab lookup cannot miss (zero OOV — the
    * byte-level guarantee carried into id space). */
  def encodeIds(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = coder.encode(text)
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val disp = toks.getUTF8String(i).toString
      val id = vocab.displayIds.get(disp)
      if (id == null) throw new IllegalStateException(
        s"byte-BPE subword missing from its own vocab (bug): $disp")
      out(i) = id.intValue()
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ids -> text (exact inverse of [[encodeIds]] composed with encode:
    * symbols concatenate to the original bytes). Null elements are
    * skipped; an out-of-range id fails loudly. */
  def decodeIds(ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = ids.numElements()
    val bos = new java.io.ByteArrayOutputStream(math.max(16, n * 4))
    var i = 0
    while (i < n) {
      if (!ids.isNullAt(i)) {
        val id = ids.getInt(i)
        require(id >= 0 && id < vocab.symbols.length,
          s"token id out of range [0, ${vocab.symbols.length}): $id")
        val sym = vocab.symbols(id)
        var j = 0
        while (j < sym.length) { bos.write(sym.charAt(j).toInt); j += 1 }
      }
      i += 1
    }
    UTF8String.fromBytes(bos.toByteArray)
  }
}

/**
 * Special-token-aware byte-BPE id codec — the tiktoken `allowed_special`
 * discipline: special literals (e.g. `<|endoftext|>`) are found FIRST
 * (Aho–Corasick leftmost-longest non-overlapping — [[AcAutomaton
 * .selectedSpans]]), each becomes its reserved id `vocabSize + i`, and the
 * text BETWEEN specials encodes normally (pre-token context never crosses
 * a special boundary, exactly as tiktoken splits before encoding). Decode
 * maps reserved ids back to the special's literal bytes, so the id
 * round-trip stays exact even with specials embedded mid-document.
 *
 * Specials must be ASCII-only (require-enforced). The match runs at the
 * BYTE level; a special carrying multi-byte UTF-8 could match mid-codepoint
 * and slice the surrounding segments into invalid UTF-8 — still a byte-exact
 * round-trip, but a segmentation tiktoken (which splits on character
 * boundaries) would never produce. Every practical control token
 * (`<|endoftext|>`, `<|im_start|>`, …) is ASCII, and with ASCII specials
 * a byte match IS a character-boundary match, so the tiktoken-equivalent
 * split claim holds unconditionally.
 */
class ByteBpeSpecialCoder(merges: Array[Array[String]],
                          specials: Array[String]) extends Serializable {
  require(specials.forall(_.nonEmpty), "empty special token")
  require(specials.distinct.length == specials.length,
    s"duplicate special tokens: ${specials.mkString(", ")}")
  require(specials.forall(_.forall(_ < 0x80)),
    "special tokens must be ASCII-only (byte-level match would otherwise " +
      "cut multi-byte codepoints): " +
      specials.filter(!_.forall(_ < 0x80)).mkString(", "))
  private val idCoder = new ByteBpeIdCoder(merges)
  private val vocab = new ByteBpeVocab(merges)
  private val base = 256 + merges.length
  private val specialBytes =
    specials.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  @transient private lazy val ac =
    if (specials.isEmpty) null else new AcAutomaton(specials.toSeq)

  def encodeIds(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (specials.isEmpty) return idCoder.encodeIds(text)
    val bytes = text.getBytes
    val spans = ac.selectedSpans(bytes)
    if (spans.length == 0) return idCoder.encodeIds(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def encodeSegment(from: Int, until: Int): Unit =
      if (until > from) {
        val seg = idCoder.encodeIds(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, from, until)))
        var i = 0
        while (i < seg.numElements()) { out += seg.getInt(i); i += 1 }
      }
    var cur = 0
    var s = 0
    while (s < spans.length) {
      encodeSegment(cur, spans(s))
      out += base + spans(s + 2)
      cur = spans(s + 1)
      s += 3
    }
    encodeSegment(cur, bytes.length)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def decodeIds(ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = ids.numElements()
    val bos = new java.io.ByteArrayOutputStream(math.max(16, n * 4))
    var i = 0
    while (i < n) {
      if (!ids.isNullAt(i)) {
        val id = ids.getInt(i)
        if (id >= base) {
          require(id - base < specialBytes.length,
            s"token id out of range [0, ${base + specialBytes.length}): $id")
          bos.write(specialBytes(id - base), 0, specialBytes(id - base).length)
        } else {
          require(id >= 0, s"token id out of range: $id")
          val sym = vocab.symbols(id)
          var j = 0
          while (j < sym.length) { bos.write(sym.charAt(j).toInt); j += 1 }
        }
      }
      i += 1
    }
    UTF8String.fromBytes(bos.toByteArray)
  }
}

/** byte_bpe_encode_ids(text): the token-ID stream (`array<int>`) under the
  * GPT-2 vocab construction — one narrow codegen'd pass, zero OOV. */
case class ByteBpeEncodeIds(child: Expression, merges: IndexedSeq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_encode_ids expects string, got ${t.sql}")
  }

  @transient private lazy val coder =
    new ByteBpeIdCoder(merges.map(p => Array(p._1, p._2)).toArray)

  override def nullSafeEval(text: Any): Any =
    coder.encodeIds(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeIdCoder", coder,
      "graft.functions.ByteBpeIdCoder")
    defineCodeGen(ctx, ev, a => s"$ref.encodeIds($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** byte_bpe_decode_ids(ids): ids -> bytes -> UTF-8 text — the exact
  * inverse of [[ByteBpeEncodeIds]] under the same merge list. */
case class ByteBpeDecodeIds(child: Expression, merges: IndexedSeq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_decode_ids expects array<int>, got ${t.sql}")
  }

  @transient private lazy val coder =
    new ByteBpeIdCoder(merges.map(p => Array(p._1, p._2)).toArray)

  override def nullSafeEval(ids: Any): Any =
    coder.decodeIds(ids.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeIdCoder", coder,
      "graft.functions.ByteBpeIdCoder")
    defineCodeGen(ctx, ev, a => s"$ref.decodeIds($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** byte_bpe_encode_ids with special tokens: specials (ids vocabSize+i)
  * are matched leftmost-longest FIRST; segments between them encode
  * normally (the tiktoken allowed_special discipline). */
case class ByteBpeEncodeIdsSpecial(child: Expression,
                                   merges: IndexedSeq[(String, String)],
                                   specials: IndexedSeq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_encode_ids_special expects string, got ${t.sql}")
  }

  @transient private lazy val coder = new ByteBpeSpecialCoder(
    merges.map(p => Array(p._1, p._2)).toArray, specials.toArray)

  override def nullSafeEval(text: Any): Any =
    coder.encodeIds(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeSpecialCoder", coder,
      "graft.functions.ByteBpeSpecialCoder")
    defineCodeGen(ctx, ev, a => s"$ref.encodeIds($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** byte_bpe_decode_ids with special tokens: reserved ids decode to the
  * special's literal bytes — the exact inverse of
  * [[ByteBpeEncodeIdsSpecial]]. */
case class ByteBpeDecodeIdsSpecial(child: Expression,
                                   merges: IndexedSeq[(String, String)],
                                   specials: IndexedSeq[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_decode_ids_special expects array<int>, got ${t.sql}")
  }

  @transient private lazy val coder = new ByteBpeSpecialCoder(
    merges.map(p => Array(p._1, p._2)).toArray, specials.toArray)

  override def nullSafeEval(ids: Any): Any =
    coder.decodeIds(ids.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeSpecialCoder", coder,
      "graft.functions.ByteBpeSpecialCoder")
    defineCodeGen(ctx, ev, a => s"$ref.decodeIds($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Single-pass SFT loss-mask kernel over a special-token-aware id stream
 * (the [[ByteBpeSpecialCoder]] output a chat trainer consumes): walk the
 * ids once, tracking whether the cursor is inside a TRAINABLE turn.
 *
 *  - a turn-opening reserved id (any role/invalid marker) masks 0 itself
 *    and switches the state: trainable iff it is one of `trainOpenIds`;
 *  - the end-marker reserved id masks 1 exactly when it CLOSES a
 *    trainable turn and `trainEnd` is set (the standard discipline —
 *    the model must learn to EMIT the stop token), then closes the turn;
 *  - any other reserved id (BOS/EOS, foreign specials) masks 0 and
 *    closes the turn — control scaffolding is never trainable and never
 *    leaks trainability past itself;
 *  - a normal content id (< `base`) masks the current state.
 *
 * State starts OUTSIDE a trainable turn, so prompt prefixes (BOS, system
 * and user turns) mask 0 without any special-casing.
 */
class SftMaskKernel(base: Int, turnOpenIds: Array[Int],
                    trainOpenIds: Array[Int], endId: Int,
                    trainEnd: Boolean) extends Serializable {
  require(base >= 0, s"base must be >= 0: $base")
  require(trainOpenIds.forall(turnOpenIds.contains),
    "every trainable opener must be a turn opener: " +
      trainOpenIds.filterNot(turnOpenIds.contains).mkString(", "))
  require((turnOpenIds :+ endId).forall(_ >= base),
    "turn markers must be reserved ids (>= base)")
  require(!turnOpenIds.contains(endId),
    s"end marker id $endId cannot also open a turn")
  private val opens = turnOpenIds.toSet
  private val trains = trainOpenIds.toSet

  def mask(ids: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = ids.numElements()
    val out = new Array[Any](n)
    var inTrain = false
    var i = 0
    while (i < n) {
      var m = 0
      if (!ids.isNullAt(i)) {
        val id = ids.getInt(i)
        if (id >= base) {
          if (opens.contains(id)) { inTrain = trains.contains(id) }
          else if (id == endId) { if (inTrain && trainEnd) m = 1; inTrain = false }
          else inTrain = false
        } else if (inTrain) m = 1
      }
      out(i) = m
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** sft_loss_mask(ids): 0/1 per token — 1 exactly on the positions a chat
  * trainer computes loss over (trainable-turn contents + their closing
  * end marker when `trainEnd`). Same length as the input by construction;
  * one narrow codegen'd pass, no shuffle, streaming-legal. */
case class SftLossMask(child: Expression, base: Int,
                       turnOpenIds: IndexedSeq[Int],
                       trainOpenIds: IndexedSeq[Int],
                       endId: Int, trainEnd: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sft_loss_mask expects array<int>, got ${t.sql}")
  }

  @transient private lazy val kernel = new SftMaskKernel(
    base, turnOpenIds.toArray, trainOpenIds.toArray, endId, trainEnd)

  override def nullSafeEval(ids: Any): Any =
    kernel.mask(ids.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sftMaskKernel", kernel,
      "graft.functions.SftMaskKernel")
    defineCodeGen(ctx, ev, a => s"$ref.mask($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** byte_bpe_decode(tokens): the EXACT inverse of [[ByteBpeEncode]] —
  * display tokens → bytes → UTF-8 text, model-free (see
  * [[ByteBpeKernels.decode]]). One narrow codegen'd pass, no shuffle;
  * `decode(encode(x)) == x` for every string, which makes detok QA on
  * shipped token streams (P37 packing, P113 batches, P124e trims)
  * self-verifying. */
case class ByteBpeDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_decode expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(tokens: Any): Any =
    ByteBpeKernels.decode(
      tokens.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ByteBpeKernels.decode($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
