package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the similarity/dedup kernels — these sit in
 * the innermost loop of ANN search and near-dup detection, so they are
 * implemented directly over ArrayData (no per-element boxing, no UDF
 * serialization) with hand-written codegen that calls a static kernel.
 *
 * At 100 TB scale these run billions of times; a Scala UDF over
 * Seq[Float] would deserialize every array. Design follows the preference
 * order in SURVEY.md §7 ((b) custom Expression over UDF).
 */
object VectorKernels extends Serializable {

  /** Cosine similarity over two float vectors (0 when either norm is 0). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Dot product over two float vectors. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** 64-bit SimHash over an array of string tokens (xxhash64-style mixing). */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Deterministic 64-bit string hash (FNV-1a over UTF8 bytes + avalanche). */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // xxhash-style avalanche so low bits are well mixed for banding
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }

  /** Seeded variant for MinHash's k hash functions. */
  def hash64(s: UTF8String, seed: Long): Long = {
    var h = hash64(s) ^ (seed * 0x9e3779b97f4a7c15L)
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33)
    h
  }

  /** Remix a 64-bit base hash under seed j then fold it into the signature. */
  @inline private def foldSeeds(base: Long, sig: Array[Long], k: Int): Unit = {
    var j = 0
    while (j < k) {
      var h = base ^ (j.toLong * 0x9e3779b97f4a7c15L)
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
      h ^= (h >>> 33)
      if (h < sig(j)) sig(j) = h
      j += 1
    }
  }

  /** MinHash signature: for each of k seeded hash functions, the min over
    * tokens. The base string hash is computed once per token and remixed per
    * seed (equivalent to `hash64(s, seed)` but O(bytes + k) per token instead
    * of O(bytes * k) — this loop runs billions of times per corpus scan). */
  def minhash(tokens: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        foldSeeds(hash64(tokens.getUTF8String(i)), sig, k)
      }
      i += 1
    }
    sig
  }

  /** MinHash over pre-hashed features (array<long>, e.g. hashed shingles) —
    * skips all string work; the preferred 100 TB path. */
  def minhashLongs(hashes: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) foldSeeds(hashes.getLong(i), sig, k)
      i += 1
    }
    sig
  }

  /** Hash each band (contiguous rowsPerBand slice) of a MinHash signature. */
  def bandHashes(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var j = 0
      while (j < rowsPerBand) {
        h ^= sig(b * rowsPerBand + j)
        h *= 0x100000001b3L
        j += 1
      }
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      out(b) = h
      b += 1
    }
    out
  }

  /** Fused tokens -> signature -> per-band bucket hashes (single pass; avoids
    * recomputing the signature once per band in a HOF lambda). */
  def minhashBands(tokens: ArrayData, bands: Int, rowsPerBand: Int): Array[Long] =
    bandHashes(minhash(tokens, bands * rowsPerBand), bands, rowsPerBand)

  def minhashBandsLongs(hashes: ArrayData, bands: Int, rowsPerBand: Int): Array[Long] =
    bandHashes(minhashLongs(hashes, bands * rowsPerBand), bands, rowsPerBand)

  /**
   * The only two Unicode codepoints whose `lower()` maps into ASCII:
   * U+212A KELVIN SIGN (E2 84 AA) -> 'k', and U+0130 LATIN CAPITAL I WITH DOT
   * (C4 B0) -> 'i' + U+0307 (the combining dot then acts as a separator under
   * `[^a-z0-9]+`). Without handling these, a byte-level tokenizer would treat
   * the multi-byte original as a separator while `split(lower(text), ...)`
   * merges/splits differently. Docs containing them (detected here) take a
   * renormalizing slow path; everything else stays on the zero-copy fast path.
   */
  private[functions] def hasSpecialLowerToAscii(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0xC4.toByte) {
        if (i + 1 < bytes.length && bytes(i + 1) == 0xB0.toByte) return true
      } else if (b == 0xE2.toByte) {
        if (i + 2 < bytes.length && bytes(i + 1) == 0x84.toByte && bytes(i + 2) == 0xAA.toByte)
          return true
      }
      i += 1
    }
    false
  }

  /** Rare path: re-render the document as its lowercase ASCII tokens joined by
    * single spaces, applying the two Unicode->ASCII lowercase mappings
    * (U+212A continues the current token as 'k'; U+0130 contributes 'i' and
    * then terminates the token, mirroring the combining-dot separator). The
    * result contains only [a-z0-9 ] bytes, so the fast kernels run on it
    * unchanged with token identity equal to `split(lower(text), '[^a-z0-9]+')`. */
  private[functions] def renormalizeSpecial(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var wroteAny = false
    var inTok = false
    def startTok(): Unit =
      if (!inTok) {
        if (wroteAny) out.write(' ')
        wroteAny = true
        inTok = true
      }
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        startTok(); out.write(b); i += 1
      } else if (b >= 'A' && b <= 'Z') {
        startTok(); out.write(b + 32); i += 1
      } else if (b == 0xE2.toByte && i + 2 < bytes.length &&
          bytes(i + 1) == 0x84.toByte && bytes(i + 2) == 0xAA.toByte) {
        startTok(); out.write('k'); i += 3
      } else if (b == 0xC4.toByte && i + 1 < bytes.length && bytes(i + 1) == 0xB0.toByte) {
        startTok(); out.write('i'); inTok = false; i += 2
      } else {
        inTok = false; i += 1
      }
    }
    out.toByteArray
  }

  /**
   * Tokenize + shingle + hash + dedup in ONE pass over the raw UTF8 bytes.
   *
   * Tokens are maximal runs of [a-z0-9] after lowercasing — identical token/
   * shingle identity to `split(lower(text), '[^a-z0-9]+')` + word n-grams
   * joined by single spaces, so set arithmetic (Jaccard) over the output
   * matches the string-shingle definition modulo 2^-64 hash collisions.
   * Multi-byte UTF8 separates, except the two codepoints whose lowercase maps
   * into ASCII (see [[hasSpecialLowerToAscii]]), which are renormalized first.
   *
   * Exists because Spark higher-order functions (transform/filter lambdas)
   * are interpreted, not codegen'd — a Column-algebra shingle pipeline costs
   * microseconds per element; this kernel streams the document bytes once.
   */
  def hashedWordShingles(text: UTF8String, n: Int): Array[Long] = {
    val raw = text.getBytes
    val bytes = if (hasSpecialLowerToAscii(raw)) renormalizeSpecial(raw) else raw
    // 1. token boundaries (start inclusive, end exclusive)
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
    // 2. hash each n-token window (FNV over lowercased bytes, 0x20 between
    //    tokens, then avalanche), collecting distinct values in order
    val out = new Array[Long](nTokens - n + 1)
    var outLen = 0
    // open-addressing set for distinctness
    var cap = Integer.highestOneBit(math.max(4, (nTokens - n + 1) * 2) - 1) << 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var w = 0
    while (w <= nTokens - n) {
      var h = 0xcbf29ce484222325L
      var t = w
      while (t < w + n) {
        if (t > w) { h ^= 0x20L; h *= 0x100000001b3L }
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
      // insert if new
      var slot = (h.toInt & (cap - 1)).abs
      var seen = false
      while (used(slot) && !seen) {
        if (table(slot) == h) seen = true else slot = (slot + 1) & (cap - 1)
      }
      if (!seen) {
        used(slot) = true
        table(slot) = h
        out(outLen) = h
        outLen += 1
      }
      w += 1
    }
    if (outLen == out.length) out else java.util.Arrays.copyOf(out, outLen)
  }

  /**
   * Distinct word n-grams as strings, single pass — the string twin of
   * [[hashedWordShingles]] (same token identity, same first-occurrence
   * order), for the cases that need the gram TEXT (corpus boilerplate
   * reports, debugging a dedup decision) rather than its 64-bit hash.
   * HOF-free for the same reason as the hashed kernel: Spark evaluates
   * transform/filter lambdas interpreted, per element.
   */
  def wordShingleStrings(text: UTF8String, n: Int): Array[UTF8String] = {
    val raw = text.getBytes
    val bytes = if (hasSpecialLowerToAscii(raw)) renormalizeSpecial(raw) else raw
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
    if (nTokens < n) return new Array[UTF8String](0)
    val set = new java.util.LinkedHashSet[UTF8String]((nTokens - n + 1) * 2)
    var w = 0
    while (w <= nTokens - n) {
      var len = n - 1 // single-space joints
      var t = w
      while (t < w + n) { len += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](len)
      var o = 0
      t = w
      while (t < w + n) {
        if (t > w) { buf(o) = ' '; o += 1 }
        var p = starts(t)
        val e = ends(t)
        while (p < e) {
          var c = bytes(p)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          buf(o) = c; o += 1; p += 1
        }
        t += 1
      }
      set.add(UTF8String.fromBytes(buf))
      w += 1
    }
    set.toArray(new Array[UTF8String](set.size))
  }

  /**
   * ALL word n-gram occurrences as strings (with multiplicity, in document
   * order) — the counting twin of [[wordShingleStrings]] (which dedups for
   * set arithmetic). Language-model training/scoring needs every occurrence:
   * the corpus count of a gram is its total number of positions, not its
   * document frequency.
   */
  def wordShingleStringsAll(text: UTF8String, n: Int): Array[UTF8String] = {
    val raw = text.getBytes
    val bytes = if (hasSpecialLowerToAscii(raw)) renormalizeSpecial(raw) else raw
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
    if (nTokens < n) return new Array[UTF8String](0)
    val out = new Array[UTF8String](nTokens - n + 1)
    var w = 0
    while (w <= nTokens - n) {
      var len = n - 1 // single-space joints
      var t = w
      while (t < w + n) { len += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](len)
      var o = 0
      t = w
      while (t < w + n) {
        if (t > w) { buf(o) = ' '; o += 1 }
        var p = starts(t)
        val e = ends(t)
        while (p < e) {
          var c = bytes(p)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          buf(o) = c; o += 1; p += 1
        }
        t += 1
      }
      out(w) = UTF8String.fromBytes(buf)
      w += 1
    }
    out
  }

  /**
   * Distinct single-character-deletion variants of a string, plus the
   * string itself — the FastSS blocking signatures for edit-distance-1
   * joins. Operates on Unicode codepoints (UTF8String substring), so a
   * multi-byte character deletes as one unit. Distinctness matters: a char
   * run of length r yields one variant, not r.
   */
  def deletionVariants(s: UTF8String): Array[UTF8String] = {
    val n = s.numChars()
    val set = new java.util.LinkedHashSet[UTF8String](n + 2)
    set.add(s)
    var i = 0
    while (i < n) {
      set.add(UTF8String.concat(s.substringSQL(1, i), s.substringSQL(i + 2, n - i - 1)))
      i += 1
    }
    set.toArray(new Array[UTF8String](set.size))
  }

  /**
   * Unicode text normalization, one pass after NFC: compose to NFC
   * (skipped when already normalized — the common ASCII fast path), strip
   * control characters (C0 except \t \n \f \r, plus DEL), collapse
   * whitespace runs ([\t\n\f\r ]) to a single space, trim. The semantics
   * are exactly `nfc_normalize` + the two regexp passes the DuckDB oracle
   * runs, so normalized text is byte-identical across engines.
   */
  /** Decode HTML numeric character references (`&#65;` / `&#x1F600;`) to
    * their code points — the step a portable regex chain cannot express
    * (regex replacement can't compute a character from digits). Rules:
    * malformed references (no digits, no terminating `;`) stay literal;
    * valid references decode to the code point, EXCEPT whitespace-class
    * (incl. U+00A0), C0/C1 controls, NUL, surrogates, and out-of-range
    * values, which all become one space — the same collapse-friendly
    * normalization the named-entity step applies to `&nbsp;`. */
  def decodeNumericEntities(text: UTF8String): UTF8String = {
    val s = text.toString
    var i = s.indexOf("&#")
    if (i < 0) return text
    val sb = new java.lang.StringBuilder(s.length)
    var from = 0
    while (i >= 0) {
      sb.append(s, from, i)
      var j = i + 2
      var hex = false
      if (j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      val digits0 = j
      val maxDigits = if (hex) 6 else 8
      var cp = 0L
      var ok = true
      while (ok && j < s.length && j - digits0 < maxDigits && {
        val c = s.charAt(j)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d >= 0) { cp = cp * (if (hex) 16 else 10) + d; true } else false
      }) j += 1
      ok = j > digits0 && j < s.length && s.charAt(j) == ';'
      if (ok) {
        appendEntityCodePoint(sb, cp)
        from = j + 1
      } else {
        sb.append("&#") // malformed: keep literal, resume after the marker
        from = i + 2
      }
      i = s.indexOf("&#", from)
    }
    sb.append(s, from, s.length)
    UTF8String.fromString(sb.toString)
  }

  /** Append a decoded character reference: valid code points append as-is,
    * EXCEPT whitespace-class (incl. U+00A0), C0/C1 controls, NUL,
    * surrogates and out-of-range values, which all become one space — the
    * collapse-friendly normalization the named-entity step applies to
    * `&nbsp;`. (Shared by the numeric and the full-entity kernels.) */
  private def appendEntityCodePoint(sb: java.lang.StringBuilder, cp: Long): Unit = {
    val v = cp.toInt
    val invalid = cp > 0x10FFFFL || v == 0 || (v >= 0xD800 && v <= 0xDFFF)
    val spaceLike = !invalid && (v == 0xA0 || v < 0x20 ||
      (v >= 0x7F && v <= 0x9F) || Character.isWhitespace(v))
    if (invalid || spaceLike) sb.append(' ') else sb.appendCodePoint(v)
  }

  /**
   * Decode HTML character references — named AND numeric — in ONE
   * left-to-right pass. Named references require the terminating `;` (the
   * legacy semicolon-less forms stay literal) and come from the FULL
   * WHATWG HTML5 table ([[Html5Entities]] — 2,125 names incl. the 93
   * multi-codepoint math forms); unknown names stay literal; numeric
   * references follow [[decodeNumericEntities]]'s exact rules. A single
   * pass never
   * rescans its own output, so double-escaped references (`&amp;eacute;`,
   * `&amp;#65;`) decode exactly one level — the behavior of a real HTML
   * tokenizer, with no ordering tricks needed for `&amp;`.
   */
  def decodeHtmlEntities(text: UTF8String): UTF8String = {
    val s = text.toString
    var i = s.indexOf('&')
    if (i < 0) return text
    val sb = new java.lang.StringBuilder(s.length)
    var from = 0
    while (i >= 0) {
      sb.append(s, from, i)
      if (i + 1 < s.length && s.charAt(i + 1) == '#') {
        var j = i + 2
        var hex = false
        if (j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
        val digits0 = j
        val maxDigits = if (hex) 6 else 8
        var cp = 0L
        while (j < s.length && j - digits0 < maxDigits && {
          val c = s.charAt(j)
          val d =
            if (c >= '0' && c <= '9') c - '0'
            else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
            else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
            else -1
          if (d >= 0) { cp = cp * (if (hex) 16 else 10) + d; true } else false
        }) j += 1
        if (j > digits0 && j < s.length && s.charAt(j) == ';') {
          appendEntityCodePoint(sb, cp)
          from = j + 1
        } else {
          sb.append("&#") // malformed: keep literal, resume after the marker
          from = i + 2
        }
      } else {
        var j = i + 1
        while (j < s.length && j - i - 1 < 32 && {
          val c = s.charAt(j)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
        }) j += 1
        val value =
          if (j > i + 1 && j < s.length && s.charAt(j) == ';')
            Html5Entities.table.get(s.substring(i + 1, j))
          else null
        if (value != null) {
          // append codepoint-by-codepoint so multi-codepoint references
          // (the HTML5 math forms) share the numeric path's space-like /
          // control normalization
          var vi = 0
          while (vi < value.length) {
            val vcp = value.codePointAt(vi)
            appendEntityCodePoint(sb, vcp.toLong)
            vi += Character.charCount(vcp)
          }
          from = j + 1
        } else {
          sb.append('&') // unknown/unterminated name: literal
          from = i + 1
        }
      }
      i = s.indexOf('&', from)
    }
    sb.append(s, from, s.length)
    UTF8String.fromString(sb.toString)
  }

  /**
   * Repair classic mojibake: UTF-8 bytes that were mis-decoded as
   * Windows-1252 somewhere upstream ("Ã©" for "é", "â€™" for "’" — the
   * single most common encoding corruption in web crawls). The repair is
   * the exact inverse of the corruption: map every char back to its
   * cp1252 byte; if EVERY char maps and the byte string is STRICTLY valid
   * UTF-8 (overlongs, lone surrogates, >U+10FFFF all rejected), the UTF-8
   * decode is the original text. Repeated to a fixpoint (≤ 4 passes) so
   * doubly-corrupted text ("ÃƒÂ©") also repairs.
   *
   * Deliberately whole-string and conservative: text mixing genuine "é"
   * with mojibake "Ã©" maps to a byte string that is NOT valid UTF-8, so
   * it returns unchanged (no partial/segment rewriting — a curation
   * kernel must never corrupt clean text; the false-negative is the safe
   * side). ASCII never changes (it decodes to itself). The cp1252 inverse
   * table is written out EXPLICITLY (the five undefined bytes 0x81 0x8D
   * 0x8F 0x90 0x9D do not map) so the oracle's Python replication can
   * mirror it literally instead of trusting two charset libraries to
   * agree.
   */
  def fixMojibake(text: UTF8String): UTF8String = {
    var s = text.toString
    var pass = 0
    var changed = false
    while (pass < 4 && {
      val next = fixMojibakeOnce(s)
      if (next == null || next == s) false else { s = next; changed = true; true }
    }) pass += 1
    if (changed) UTF8String.fromString(s) else text
  }

  /** One repair pass: null when any char has no cp1252 byte or the byte
    * string is not strictly valid UTF-8. */
  private def fixMojibakeOnce(s: String): String = {
    val n = s.length
    // fast path: mojibake needs a char whose cp1252 byte is >= 0x80
    var has = false
    var i = 0
    while (i < n && !has) { if (s.charAt(i) >= 0x80) has = true; i += 1 }
    if (!has) return null
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val b = cp1252Byte(s.charAt(i))
      if (b < 0) return null
      bytes(i) = b.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** The explicit cp1252 inverse map: byte for a char, -1 when the char is
    * not cp1252-encodable (incl. the five undefined bytes). 0x00-0x7F and
    * 0xA0-0xFF are identity; 0x80-0x9F hold the 27 cp1252 specials. */
  private def cp1252Byte(c: Char): Int =
    if (c < 0x80) c
    else if (c >= 0xA0 && c <= 0xFF) c
    else (c: Int) match {
      case 0x20AC => 0x80; case 0x201A => 0x82; case 0x0192 => 0x83
      case 0x201E => 0x84; case 0x2026 => 0x85; case 0x2020 => 0x86
      case 0x2021 => 0x87; case 0x02C6 => 0x88; case 0x2030 => 0x89
      case 0x0160 => 0x8A; case 0x2039 => 0x8B; case 0x0152 => 0x8C
      case 0x017D => 0x8E; case 0x2018 => 0x91; case 0x2019 => 0x92
      case 0x201C => 0x93; case 0x201D => 0x94; case 0x2022 => 0x95
      case 0x2013 => 0x96; case 0x2014 => 0x97; case 0x02DC => 0x98
      case 0x2122 => 0x99; case 0x0161 => 0x9A; case 0x203A => 0x9B
      case 0x0153 => 0x9C; case 0x017E => 0x9E; case 0x0178 => 0x9F
      case _ => -1
    }


  /** Query-param names dropped by URL canonicalization: click/campaign
    * trackers that vary per visit without changing the resource. Names
    * starting with `utm_` are dropped too. */
  private val TrackingParams: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("gclid", "fbclid", "ref", "mc_cid", "mc_eid", "igshid", "msclkid",
      "dclid", "wbraid", "gbraid").foreach(s.add)
    s
  }

  private def isTrackingParam(name: String): Boolean =
    name.startsWith("utm_") || TrackingParams.contains(name)

  /**
   * Deterministic URL canonicalization for web-corpus dedup — the fixed
   * rule set (replicated verbatim by the python fixture builder):
   *  1. trim; no "://" -> returned trimmed, unchanged (not a URL);
   *  2. scheme and host lowercase; a leading `www.` label drops;
   *  3. the default port drops (`:80` for http, `:443` for https; other
   *     ports stay); a bare trailing colon drops;
   *  4. the fragment drops;
   *  5. a trailing `/` on a non-empty path drops (`/` alone -> empty);
   *  6. tracking query params drop (utm_*, gclid, fbclid, ref, ... — name
   *     compared lowercased); survivors sort lexicographically (raw
   *     `k=v` strings, code-unit order) and rejoin with `&`;
   *  7. everything else (path case, percent-encoding) is preserved —
   *     canonicalization must never merge genuinely different resources.
   */
  def canonicalizeUrl(url: UTF8String): UTF8String = {
    val s = url.toString.trim
    val si = s.indexOf("://")
    if (si <= 0) return UTF8String.fromString(s)
    val scheme = s.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(si + 3)
    var he = rest.length
    var i = 0
    while (i < rest.length && he == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') he = i
      i += 1
    }
    val hostPort = rest.substring(0, he).toLowerCase(java.util.Locale.ROOT)
    val ci = hostPort.lastIndexOf(':')
    var host = hostPort
    var port = ""
    if (ci >= 0) {
      val p = hostPort.substring(ci + 1)
      if (p.forall(c => c >= '0' && c <= '9')) { // "" (bare colon) qualifies
        host = hostPort.substring(0, ci)
        port = p
      }
    }
    if (host.startsWith("www.") && host.length > 4) host = host.substring(4)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val after = rest.substring(he)
    val fi = after.indexOf('#')
    val noFrag = if (fi >= 0) after.substring(0, fi) else after
    val qi = noFrag.indexOf('?')
    var path = if (qi >= 0) noFrag.substring(0, qi) else noFrag
    val query = if (qi >= 0) noFrag.substring(qi + 1) else ""
    if (path == "/") path = ""
    else if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    val params = query.split("&", -1).filter(_.nonEmpty).filterNot { p =>
      val eq = p.indexOf('=')
      val name = if (eq >= 0) p.substring(0, eq) else p
      isTrackingParam(name.toLowerCase(java.util.Locale.ROOT))
    }
    java.util.Arrays.sort(params, java.util.Comparator.naturalOrder[String]())
    val q2 = if (params.isEmpty) "" else "?" + params.mkString("&")
    UTF8String.fromString(
      scheme + "://" + host + (if (keepPort) ":" + port else "") + path + q2)
  }

  /** The canonical host of a URL ("" when unparsable) — the group key for
    * per-site aggregation. */
  def urlHost(url: UTF8String): UTF8String = {
    val canon = canonicalizeUrl(url).toString
    val si = canon.indexOf("://")
    if (si <= 0) return UTF8String.EMPTY_UTF8
    val rest = canon.substring(si + 3)
    var he = rest.length
    var i = 0
    while (i < rest.length && he == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == ':') he = i
      i += 1
    }
    UTF8String.fromString(rest.substring(0, he))
  }

  /** Common multi-part public suffixes (the heuristic slice of the public
    * suffix list — registrable domains under these keep three labels). */
  private val MultiPartTlds: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "co.jp", "ne.jp",
      "or.jp", "ac.jp", "go.jp", "com.au", "net.au", "org.au", "edu.au",
      "gov.au", "co.nz", "org.nz", "net.nz", "com.br", "org.br", "com.mx",
      "co.in", "net.in", "org.in", "co.za", "com.sg", "com.cn", "org.cn",
      "net.cn", "com.tw", "com.hk", "co.kr", "com.ar", "com.tr",
      "com.pl").foreach(s.add)
    s
  }

  /** Registrable-domain heuristic: last two host labels, or three when the
    * last two are a known multi-part public suffix; IPv4 hosts (and hosts
    * with < 3 labels) pass through whole. A documented approximation of
    * the full public suffix list — right for per-domain corpus stats,
    * not for cookie-scope security decisions. */
  def registrableDomain(url: UTF8String): UTF8String = {
    val host = urlHost(url).toString
    if (host.isEmpty) return UTF8String.EMPTY_UTF8
    val labels = host.split('.')
    if (labels.length <= 2) return UTF8String.fromString(host)
    if (labels.forall(l => l.nonEmpty && l.forall(c => c >= '0' && c <= '9')))
      return UTF8String.fromString(host) // IPv4
    val last2 = labels(labels.length - 2) + "." + labels(labels.length - 1)
    val keep = if (MultiPartTlds.contains(last2)) 3 else 2
    UTF8String.fromString(labels.takeRight(keep).mkString("."))
  }

  def canonicalizeText(text: UTF8String): UTF8String = {
    val s = text.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      val isStrip =
        (c < 0x20 && c != '\t' && c != '\n' && c != '\f' && c != '\r') || c == 0x7f
      if (!isStrip) {
        val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
        if (isWs) {
          if (started) pendingSpace = true
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
          started = true
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /**
   * Accent folding: NFD-decompose, drop every combining mark (Unicode
   * category Mn), NFC-recompose — `café`/`café` -> `cafe`, `über` ->
   * `uber`. ASCII fast path skips the Normalizer entirely. Characters
   * without a decomposition (`ø`, `đ`, ligatures) pass through unchanged —
   * this is mark REMOVAL, not transliteration, so the behavior is
   * defined purely by the Unicode tables and reproducible anywhere.
   */
  def foldAccents(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) return text
    val s = text.toString
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val c = nfd.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  /**
   * Line-break dehyphenation — the standard crawl/OCR/PDF-text repair:
   * a word split across lines as `exam-\nple` rejoins to `example`.
   *
   * Exact single-pass rule (byte-level; only ASCII bytes are ever
   * removed, so UTF-8 passes through intact):
   *   an ASCII LETTER, then `-`, then `[ \t\r]*`, then `\n`, then
   *   `[ \t]*`, then a LOWERCASE ASCII letter
   * deletes the `-` and the whitespace span (the two halves join); the
   * scan continues AT the joining letter, so chained breaks
   * (`x-\ny-\nz` -> `xyz`) all repair in one pass. Everything else —
   * uppercase continuation (likely a true compound/proper noun), digits,
   * `--` dashes, hyphens not at a line end — is preserved. The rule is
   * fully specified so the python fixture replication is bit-for-bit.
   */
  def dehyphenate(text: UTF8String): UTF8String = {
    val b = text.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    var n = 0
    var changed = false
    while (i < b.length) {
      val c = b(i)
      var joined = false
      if (c == '-' && n > 0 && isAsciiLetterByte(out(n - 1))) {
        var j = i + 1
        while (j < b.length && (b(j) == ' ' || b(j) == '\t' || b(j) == '\r')) j += 1
        if (j < b.length && b(j) == '\n') {
          j += 1
          while (j < b.length && (b(j) == ' ' || b(j) == '\t')) j += 1
          if (j < b.length && b(j) >= 'a' && b(j) <= 'z') {
            i = j // drop '-' + whitespace + newline; continue AT the letter
            changed = true
            joined = true
          }
        }
      }
      if (!joined) { out(n) = c; n += 1; i += 1 }
    }
    if (!changed) text else UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  private def isAsciiLetterByte(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isDigitByte(c: Byte): Boolean = c >= '0' && c <= '9'

  /** Luhn mod-10 checksum (ISO/IEC 7812) over `d(0 until n)`, most
    * significant digit first: double every second digit from the RIGHT,
    * subtract 9 above 9, sum divisible by 10. */
  private def luhnOk(d: Array[Int], n: Int): Boolean = {
    var sum = 0
    var i = n - 1
    var second = false
    while (i >= 0) {
      var v = d(i)
      if (second) { v *= 2; if (v > 9) v -= 9 }
      sum += v
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  /** Card-candidate scan step for the Luhn kernels: starting at the digit
    * `i0`, consume the maximal run of digit groups separated by SINGLE
    * `' '` or `'-'` bytes; returns `(runEnd << 1) | luhnValid` where valid
    * additionally requires 13..19 digits. Shared by redact and count so
    * the two kernels cannot disagree on run boundaries. */
  private def cardRun(b: Array[Byte], i0: Int): Long = {
    val digits = new Array[Int](20)
    var k = i0
    var nd = 0
    while (k < b.length && isDigitByte(b(k))) {
      if (nd < 20) digits(nd) = b(k) - '0'
      nd += 1; k += 1
    }
    while (k + 1 < b.length && (b(k) == ' ' || b(k) == '-') && isDigitByte(b(k + 1))) {
      k += 1
      while (k < b.length && isDigitByte(b(k))) {
        if (nd < 20) digits(nd) = b(k) - '0'
        nd += 1; k += 1
      }
    }
    val valid = nd >= 13 && nd <= 19 && luhnOk(digits, nd)
    (k.toLong << 1) | (if (valid) 1L else 0L)
  }

  /**
   * Luhn-validated payment-card redaction — the precision upgrade over a
   * bare digit-run regex ([[graft.text.Redact.LongDigitPattern]] also
   * kills order ids, timestamps, ISBNs): a candidate is a maximal run of
   * ASCII digit groups separated by single spaces or dashes
   * (`4111 1111 1111 1111`, `4111-1111-1111-1111`, or unbroken), and it
   * redacts ONLY when its 13..19 digits pass the Luhn mod-10 checksum —
   * a random digit run passes one time in ten, so ~90% of non-card runs
   * survive intact while every real PAN (the checksum is part of the
   * numbering standard) is caught. Byte-level single pass; only ASCII
   * bytes are examined, UTF-8 passes through; fully specified so the
   * python fixture replication is bit-for-bit.
   */
  def redactValidCards(text: UTF8String, token: UTF8String): UTF8String = {
    val b = text.getBytes
    val tok = token.getBytes
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    var changed = false
    while (i < b.length) {
      val c = b(i)
      if (isDigitByte(c)) {
        val packed = cardRun(b, i)
        val k = (packed >>> 1).toInt
        if ((packed & 1L) == 1L) { out.write(tok, 0, tok.length); changed = true }
        else out.write(b, i, k - i)
        i = k
      } else { out.write(c); i += 1 }
    }
    if (!changed) text else UTF8String.fromBytes(out.toByteArray)
  }

  /**
   * American Soundex, 4 characters, fully specified for cross-engine
   * replay: only ASCII letters participate (every other byte is skipped and
   * does NOT reset the run state); lead letter uppercased; codes BFPV→1
   * CGJKQSXZ→2 DT→3 L→4 MN→5 R→6; vowels AEIOUY separate equal codes; H/W
   * are transparent (equal codes across them collapse); zero-padded. No
   * ASCII letter at all → "0000".
   */
  def soundex4(text: UTF8String): UTF8String = {
    val b = text.getBytes
    var i = 0
    while (i < b.length && !isAsciiLetterByte(b(i))) i += 1
    if (i == b.length) return UTF8String.fromString("0000")
    val out = new Array[Byte](4)
    val lead = (if (b(i) >= 'a') b(i) - 32 else b(i).toInt).toByte
    out(0) = lead
    var n = 1
    var lastCode = sdxCode(lead)
    i += 1
    while (i < b.length && n < 4) {
      val c = b(i)
      if (isAsciiLetterByte(c)) {
        val code = sdxCode((if (c >= 'a') c - 32 else c.toInt).toByte)
        if (code == 0) lastCode = 0            // vowel: separator
        else if (code != 7) {                   // 7 = H/W: transparent
          if (code != lastCode) { out(n) = ('0' + code).toByte; n += 1 }
          lastCode = code
        }
      }
      i += 1
    }
    while (n < 4) { out(n) = '0'; n += 1 }
    UTF8String.fromBytes(out)
  }

  private def sdxCode(u: Byte): Int = (u: @annotation.switch) match {
    case 'B' | 'F' | 'P' | 'V' => 1
    case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => 2
    case 'D' | 'T' => 3
    case 'L' => 4
    case 'M' | 'N' => 5
    case 'R' => 6
    case 'H' | 'W' => 7
    case _ => 0 // A E I O U Y
  }

  /**
   * Jaro-Winkler similarity as EXACT fixed point `floor(jw · 2^20)` — every
   * intermediate is integer arithmetic (the [[graft.search.Mining]]
   * fixed-point discipline), so two engines replaying the fully specified
   * algorithm agree bit for bit where an IEEE formulation differs in the
   * last ulp across libm/summation orders.
   *
   * Spec (unicode CODE POINTS, first 512 each): match window
   * `max(l1,l2)/2 − 1` (floor, min 0); greedy left-to-right first-unused
   * matching; t2 = mismatched positions between the matched sequences
   * (twice the classic transposition count); `jaro = (m/l1 + m/l2 +
   * (m − t2/2)/m)/3` cross-multiplied to integers; Winkler prefix boost
   * `p = 1/10`, prefix capped at 4, no boost threshold:
   * `jw = ((10−ℓ)·jaro + ℓ)/10`. Both empty → 2^20; one empty or no
   * match → 0.
   */
  def jaroWinklerFp(a: UTF8String, b: UTF8String): Long = {
    val s1raw = a.toString.codePoints().toArray
    val s2raw = b.toString.codePoints().toArray
    val s1 = if (s1raw.length > 512) java.util.Arrays.copyOf(s1raw, 512) else s1raw
    val s2 = if (s2raw.length > 512) java.util.Arrays.copyOf(s2raw, 512) else s2raw
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1L << 20
    if (l1 == 0 || l2 == 0) return 0L
    val w = math.max(0, math.max(l1, l2) / 2 - 1)
    val used = new Array[Boolean](l2)
    val m1 = new Array[Int](math.min(l1, l2))
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - w)
      val hi = math.min(l2 - 1, i + w)
      var found = false
      while (!found && j <= hi) {
        if (!used(j) && s2(j) == s1(i)) {
          used(j) = true; m1(m) = s1(i); m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    var t2 = 0
    var k = 0
    var j = 0
    while (j < l2) {
      if (used(j)) { if (s2(j) != m1(k)) t2 += 1; k += 1 }
      j += 1
    }
    val jaroNum = 2L * m * m * l2 + 2L * m * m * l1 + (2L * m - t2) * l1 * l2
    val jaroDen = 6L * l1 * l2 * m
    var ell = 0
    while (ell < 4 && ell < l1 && ell < l2 && s1(ell) == s2(ell)) ell += 1
    val jwNum = (10L - ell) * jaroNum + ell * jaroDen
    (jwNum << 20) / (10L * jaroDen)
  }

  /** Count of Luhn-valid card runs in `text` (same scan as
    * [[redactValidCards]]). */
  def validCardCount(text: UTF8String): Long = {
    val b = text.getBytes
    var i = 0
    var count = 0L
    while (i < b.length) {
      if (isDigitByte(b(i))) {
        val packed = cardRun(b, i)
        if ((packed & 1L) == 1L) count += 1
        i = (packed >>> 1).toInt
      } else i += 1
    }
    count
  }

  /**
   * Single-pass ASCII tokenizer: lowercased maximal [a-z0-9] runs, matching
   * `split(lower(text), '[^a-z0-9]+')` token identity for all inputs —
   * multi-byte UTF8 separates, except the two lowercase-to-ASCII codepoints
   * (see [[hasSpecialLowerToAscii]]), which take the renormalizing path.
   */
  def tokenizeAscii(text: UTF8String): Array[UTF8String] = {
    val raw = text.getBytes
    val bytes = if (hasSpecialLowerToAscii(raw)) renormalizeSpecial(raw) else raw
    var out = new Array[UTF8String](8)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')) {
        val start = i
        var changed = false
        while (i < bytes.length && {
          val c = bytes(i)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
            ((c >= 'A' && c <= 'Z') && { changed = true; true })
        }) i += 1
        val tok = java.util.Arrays.copyOfRange(bytes, start, i)
        if (changed) {
          var p = 0
          while (p < tok.length) {
            if (tok(p) >= 'A' && tok(p) <= 'Z') tok(p) = (tok(p) + 32).toByte
            p += 1
          }
        }
        if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
        out(n) = UTF8String.fromBytes(tok)
        n += 1
      } else i += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Fused token statistics: (tokenCount, distinctTokenCount, totalTokenChars,
    * stopwordCount) in one pass (chars == bytes for the ASCII tokens produced
    * here). `stopwords` may be empty (stopwordCount is then 0). */
  def tokenStats(text: UTF8String, stopwords: java.util.HashSet[UTF8String]): Array[Long] = {
    val tokens = tokenizeAscii(text)
    val seen = new java.util.HashSet[UTF8String](tokens.length * 2)
    var sumLen = 0L
    var stop = 0L
    var i = 0
    while (i < tokens.length) {
      seen.add(tokens(i))
      sumLen += tokens(i).numBytes()
      if (stopwords.contains(tokens(i))) stop += 1
      i += 1
    }
    Array(tokens.length.toLong, seen.size.toLong, sumLen, stop)
  }

  /** Unicode script-mix profile over CODEPOINTS (surrogate pairs count
    * once): [total, latin, cyrillic, greek, arabic, cjk, digit]. Classes
    * are EXPLICIT codepoint ranges — not Character.getType / UnicodeScript,
    * whose tables move with the JDK's Unicode version — so any engine
    * replays them exactly with the same ranges in a regex class:
    * latin A–Z a–z U+00C0–U+024F; cyrillic U+0400–U+04FF; greek
    * U+0370–U+03FF; arabic U+0600–U+06FF; cjk U+3040–U+30FF (kana) ∪
    * U+4E00–U+9FFF (unified) ∪ U+AC00–U+D7AF (hangul); digit 0–9.
    * Codepoints outside every class (whitespace, punctuation, emoji, other
    * scripts) count only in total. A profile, not a validator: the two
    * Latin-1 math signs × ÷ land in latin to keep the ranges contiguous. */
  def scriptProfile(text: UTF8String): Array[Long] = {
    val s = text.toString
    var total = 0L; var latin = 0L; var cyr = 0L; var greek = 0L
    var arab = 0L; var cjk = 0L; var digit = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0xC0 && cp <= 0x24F)) latin += 1
      else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1
      else if (cp >= 0x370 && cp <= 0x3FF) greek += 1
      else if (cp >= 0x600 && cp <= 0x6FF) arab += 1
      else if ((cp >= 0x3040 && cp <= 0x30FF) || (cp >= 0x4E00 && cp <= 0x9FFF) ||
               (cp >= 0xAC00 && cp <= 0xD7AF)) cjk += 1
      else if (cp >= '0' && cp <= '9') digit += 1
    }
    Array(total, latin, cyr, greek, arab, cjk, digit)
  }

  /** Hyperplane-LSH band buckets: packed sign bits of dot products with
    * planes[band][bit][dim], all bands in one pass over the vector's floats. */
  def lshBandBuckets(vec: ArrayData, planes: Array[Array[Array[Float]]]): Array[Long] = {
    val out = new Array[Long](planes.length)
    var b = 0
    while (b < planes.length) {
      val band = planes(b)
      var bucket = 0L
      var j = 0
      while (j < band.length) {
        val plane = band(j)
        val n = math.min(vec.numElements(), plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += vec.getFloat(i).toDouble * plane(i); i += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    out
  }

  /** Cosine similarity of an ArrayData vector against a float[] centroid. */
  @inline private def cosineTo(vec: ArrayData, c: Array[Float]): Double = {
    val n = math.min(vec.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      val y = c(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Cosine similarity to the single most-similar centroid — by definition
    * the maximum over centroids, so it needs no index bookkeeping. */
  def nearestCentroidCosine(vec: ArrayData, centroids: Array[Array[Float]]): Double = {
    var best = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val s = cosineTo(vec, centroids(c))
      if (s > best) best = s
      c += 1
    }
    best
  }

  /** Indices of the `nprobe` centroids most cosine-similar to `vec`, in
    * decreasing similarity (ties by lower index). One pass per centroid. */
  def nearestCentroids(vec: ArrayData, centroids: Array[Array[Float]], nprobe: Int): Array[Int] = {
    val k = centroids.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) { sims(c) = cosineTo(vec, centroids(c)); c += 1 }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var slot = 0
    while (slot < m) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && sims(i) > bestSim) { best = i; bestSim = sims(i) }
        i += 1
      }
      used(best) = true
      out(slot) = best
      slot += 1
    }
    out
  }

  /**
   * Product-quantization encode: for each of the `m = codebooks.length`
   * subspaces, the index of the sub-centroid with the smallest squared L2
   * distance to the vector's subvector (ties -> lower code). Output is one
   * byte per subspace — the 100 TB compression step (dim*4 bytes -> m bytes).
   * Vector elements past `m * subdim` are ignored; missing ones read as 0.
   */
  def pqEncode(vec: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    val n = vec.numElements()
    var s = 0
    var base = 0
    while (s < m) {
      val cb = codebooks(s)
      val subdim = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cen = cb(c)
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val x = (if (base + i < n) vec.getFloat(base + i).toDouble else 0.0) - cen(i).toDouble
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      base += subdim
      s += 1
    }
    out
  }

  /** [[pqEncode]] as int codes — the training-loop variant (joinable /
    * explodable in Column algebra without byte indexing). */
  def pqEncodeInts(vec: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Int] = {
    val bytes = pqEncode(vec, codebooks)
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xFF; i += 1 }
    out
  }

  /**
   * Query-side ADC lookup table: `lut[s * ksub + c] = dot(q_sub(s),
   * codebooks[s][c])`, flattened to one double array of length `m * ksub`.
   * Computed ONCE per query; every corpus candidate is then scored in O(m)
   * lookups by [[pqAdcDot]].
   */
  def pqLut(vec: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Double] = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val out = new Array[Double](m * ksub)
    val n = vec.numElements()
    var s = 0
    var base = 0
    while (s < m) {
      val cb = codebooks(s)
      val subdim = cb(0).length
      var c = 0
      while (c < ksub) {
        val cen = cb(c)
        var dot = 0.0
        var i = 0
        while (i < subdim) {
          if (base + i < n) dot += vec.getFloat(base + i).toDouble * cen(i).toDouble
          i += 1
        }
        out(s * ksub + c) = dot
        c += 1
      }
      base += subdim
      s += 1
    }
    out
  }

  /**
   * Dense rotation: `out[r] = dot(matrix[r], vec)` in float32 (double
   * accumulator, rounded once per output element — the arithmetic a float32
   * BLAS gemv with fused accumulation would produce deterministically).
   * The OPQ/PCA rotation path: matrix is orthonormal, so norms and pairwise
   * cosines are preserved exactly up to float rounding.
   */
  def matVecMul(vec: ArrayData, matrix: Array[Array[Float]]): Array[Float] = {
    val rows = matrix.length
    val n = vec.numElements()
    val out = new Array[Float](rows)
    var r = 0
    while (r < rows) {
      val row = matrix(r)
      val len = if (row.length < n) row.length else n
      var acc = 0.0
      var i = 0
      while (i < len) {
        acc += row(i).toDouble * vec.getFloat(i).toDouble
        i += 1
      }
      out(r) = acc.toFloat
      r += 1
    }
    out
  }

  /** Asymmetric-distance dot product: sum of the LUT entries the code bytes
    * select — O(m) per (query, candidate) pair. */
  def pqAdcDot(codes: Array[Byte], lut: ArrayData, ksub: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < codes.length) {
      acc += lut.getDouble(s * ksub + (codes(s) & 0xFF))
      s += 1
    }
    acc
  }

  /** Reconstruction norm of an encoded vector from precomputed per-centroid
    * squared norms: sqrt(sum_s |codebooks[s][code_s]|^2). */
  def pqCodeNorm(codes: Array[Byte], normSq: Array[Array[Double]]): Double = {
    var acc = 0.0
    var s = 0
    while (s < codes.length) {
      acc += normSq(s)(codes(s) & 0xFF)
      s += 1
    }
    math.sqrt(acc)
  }

  /** Decode m-byte PQ codes back to the quantized vector (the subspace
    * centroids concatenated) — residual-IVFADC encoding reconstructs to
    * compute each vector's exact approximation norm. */
  def pqReconstruct(codes: Array[Byte], codebooks: Array[Array[Array[Float]]]): Array[Float] = {
    val subdim = codebooks(0)(0).length
    val out = new Array[Float](codes.length * subdim)
    var s = 0
    while (s < codes.length) {
      System.arraycopy(codebooks(s)(codes(s) & 0xFF), 0, out, s * subdim, subdim)
      s += 1
    }
    out
  }

  /** Max |x_i| of a float vector, in double (0.0 for empty vectors). */
  def int8MaxAbs(vec: ArrayData): Double = {
    var m = 0.0
    var i = 0
    val n = vec.numElements()
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m
  }

  /**
   * Symmetric per-vector int8 quantization: `code_i =
   * floor(x_i * 127.0 / maxabs + 0.5)` clamped to [-127, 127] (zero vector
   * -> all zeros). `floor(v + 0.5)` is the SPECIFIED rounding — one fixed
   * IEEE expression both engines evaluate identically, unlike the
   * HALF_UP/HALF_EVEN zoo of round() builtins. The scale `maxabs / 127.0`
   * travels beside the codes ([[int8Scale]]); cosine between quantized
   * vectors needs no scale at all (it cancels).
   */
  def int8Encode(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    val m = int8MaxAbs(vec)
    if (m == 0.0) return out
    var i = 0
    while (i < n) {
      val v = math.floor(vec.getFloat(i).toDouble * 127.0 / m + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, v)).toByte
      i += 1
    }
    out
  }

  /** [[int8Encode]] as array<int> — the oracle-gate / Column-algebra view. */
  def int8EncodeInts(vec: ArrayData): Array[Int] = {
    val bytes = int8Encode(vec)
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i).toInt; i += 1 }
    out
  }

  /** Scale of [[int8Encode]]'s codes: maxabs / 127.0 (0.0 for zero/empty). */
  def int8Scale(vec: ArrayData): Double = int8MaxAbs(vec) / 127.0

  /** Exact integer dot product of two signed-int8 code arrays. The true
    * dot is `int8Dot(a, b) * scaleA * scaleB`; cosine needs no scales:
    * `int8Dot(a, b) / sqrt(int8Dot(a, a) * int8Dot(b, b))`. */
  def int8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    var acc = 0L
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }

  /** Decode int8 codes back to floats: `code_i * scale` (lossy inverse). */
  def int8Decode(codes: Array[Byte], scale: Double): Array[Float] = {
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) {
      out(i) = (codes(i).toDouble * scale).toFloat
      i += 1
    }
    out
  }

  /**
   * 1-bit sign quantization: bit `i` of word `i / 64` is set iff
   * `vec(i) >= 0.0f` (NaN packs as 0 — `>=` is false for NaN in both Java
   * and SQL engines). Words are two's-complement longs — ceil(dim / 64)
   * BIGINTs, exactly 1 bit per dimension at rest and on every scan: a
   * 100 TB float32 corpus reads as ~3 TB. Sign agreement between two such
   * codes is `dim - hamming`, a monotone proxy for cosine direction
   * (Charikar's SimHash bound applied to the identity rotation).
   */
  def bitSignPack(vec: ArrayData): Array[Long] = {
    val n = vec.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (vec.getFloat(i) >= 0.0f) out(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }

  /**
   * One-pass readability counters over the UTF-8 bytes:
   * `[n_words, n_sentences, n_syllable_groups]`.
   *  - words: maximal runs of ASCII letters;
   *  - sentences: maximal runs of `.`/`!`/`?` (floored at 1 — a text is at
   *    least one sentence);
   *  - syllable groups: per word, maximal runs of `aeiouy` (case-folded),
   *    floored at 1 per word — the standard Flesch syllable heuristic.
   * Rules are byte-exact and regex-expressible, so any engine replays them
   * (non-ASCII bytes are word/sentence boundaries by construction).
   */
  def readabilityStats(text: UTF8String): Array[Long] = {
    val bytes = text.getBytes
    var words = 0L
    var sentences = 0L
    var syllables = 0L
    var inWord = false
    var inVowel = false
    var inStop = false
    var wordVowelRuns = 0L
    var i = 0
    @inline def endWord(): Unit = if (inWord) {
      words += 1
      syllables += math.max(1L, wordVowelRuns)
      inWord = false; inVowel = false; wordVowelRuns = 0L
    }
    while (i < bytes.length) {
      val b = bytes(i)
      val lower = (b | 0x20).toByte
      val isLetter = lower >= 'a' && lower <= 'z'
      val isVowel = isLetter && (lower == 'a' || lower == 'e' || lower == 'i' ||
        lower == 'o' || lower == 'u' || lower == 'y')
      val isStop = b == '.' || b == '!' || b == '?'
      if (isLetter) {
        inWord = true
        if (isVowel && !inVowel) wordVowelRuns += 1
        inVowel = isVowel
      } else endWord()
      if (isStop && !inStop) sentences += 1
      inStop = isStop
      i += 1
    }
    endWord()
    Array(words, math.max(1L, sentences), syllables)
  }

  /** Hamming distance between two packed sign codes: sum of
    * `Long.bitCount(a_w ^ b_w)` over the common word prefix. */
  def hammingWords(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Feature index of a token/n-gram: the first byte of its md5 (0..255) —
    * engine-portable (any engine's md5 of the same UTF-8 bytes agrees). */
  @inline private def md5Bucket(bytes: Array[Byte], from: Int, len: Int): Int = {
    val d = md5Digest.get()
    d.reset()
    d.update(bytes, from, len)
    d.digest()(0) & 0xFF
  }

  /**
   * Per-document md5-bucket feature histogram: `counts[256]` over exactly
   * the token + (optional) bigram occurrence stream [[hashedLinearScore]]
   * scores — the DSIR-fit aggregation input, fused so the fit never
   * explodes feature STRINGS or re-hashes them in Column algebra (one
   * thread-local MessageDigest per feature vs cast+md5+conv+substring per
   * exploded row).
   */
  def md5BucketCounts(text: UTF8String, bigrams: Boolean): Array[Long] =
    featureBucketCounts(text, bigrams, portableHash = true)

  /** [[md5BucketCounts]] generalized over the bucketing family: portable
    * md5 first byte, or the production [[hash64]]&0xFF — EXACTLY the two
    * bucketings [[hashedLinearScore]] scores under, so a fit under either
    * family is consistent with inference under the same family. */
  def featureBucketCounts(text: UTF8String, bigrams: Boolean,
                          portableHash: Boolean): Array[Long] = {
    val toks = tokenizeAscii(text)
    @inline def bucket(b: Array[Byte]): Int =
      if (portableHash) md5Bucket(b, 0, b.length)
      else (hash64(UTF8String.fromBytes(b)) & 0xFF).toInt
    val counts = new Array[Long](256)
    var i = 0
    while (i < toks.length) {
      counts(bucket(toks(i).getBytes)) += 1
      i += 1
    }
    if (bigrams && toks.length >= 2) {
      i = 0
      while (i < toks.length - 1) {
        val a = toks(i).getBytes
        val b = toks(i + 1).getBytes
        val joined = new Array[Byte](a.length + 1 + b.length)
        System.arraycopy(a, 0, joined, 0, a.length)
        joined(a.length) = ' '
        System.arraycopy(b, 0, joined, a.length + 1, b.length)
        counts(bucket(joined)) += 1
        i += 1
      }
    }
    counts
  }

  /**
   * Hashing-trick linear-classifier logit (fasttext-style quality filter
   * inference): `Σ weights[bucket(feature)]` over the document's lowercase
   * tokens and (optionally) space-joined bigrams, one fused pass. Integer
   * weights → the logit is an exact BIGINT, bit-identical across
   * partitionings; the caller applies bias/threshold in Column algebra.
   * 256 buckets; larger models stack several weight tables with different
   * salts.
   *
   * `portableHash = true` buckets by the md5 first byte — any engine's md5
   * of the same UTF-8 bytes agrees, which is what lets the oracle replicate
   * the model. `false` buckets by xxhash64 — measured 2.8× faster end-to-end, the
   * production default when no cross-engine replication is needed (a model
   * is trained against one bucketing and scored with the same one).
   */
  def hashedLinearScore(text: UTF8String, weights: Array[Int], bigrams: Boolean,
                        portableHash: Boolean): Long = {
    val toks = tokenizeAscii(text)
    @inline def bucket(b: Array[Byte]): Int =
      if (portableHash) md5Bucket(b, 0, b.length)
      else (hash64(UTF8String.fromBytes(b)) & 0xFF).toInt
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc += weights(bucket(toks(i).getBytes))
      i += 1
    }
    if (bigrams && toks.length >= 2) {
      i = 0
      while (i < toks.length - 1) {
        val a = toks(i).getBytes
        val b = toks(i + 1).getBytes
        val joined = new Array[Byte](a.length + 1 + b.length)
        System.arraycopy(a, 0, joined, 0, a.length)
        joined(a.length) = ' '
        System.arraycopy(b, 0, joined, a.length + 1, b.length)
        acc += weights(bucket(joined))
        i += 1
      }
    }
    acc
  }

  /**
   * Token-occurrence coverage against a sorted 64-bit-hash vocabulary:
   * `[nTokens, nInVocab]` — total ASCII-token occurrences and how many of
   * them hash (via [[hash64]], the [[hashedWordShingles]] n=1 family) into
   * the sorted set. One fused pass: tokenize, hash, binary-search — no
   * explode, no join. `[0, 0]` for token-less documents.
   */
  def tokenSetCoverage(text: UTF8String, set: Array[Long]): Array[Long] = {
    val tokens = tokenizeAscii(text)
    var hits = 0L
    var i = 0
    while (i < tokens.length) {
      if (java.util.Arrays.binarySearch(set, hash64(tokens(i))) >= 0) hits += 1
      i += 1
    }
    Array(tokens.length.toLong, hits)
  }

  /**
   * Fused n-gram repetition statistics over ASCII tokens:
   * `[totalNgrams, topNgramCount]` — total n-gram occurrences (with repeats)
   * and the occurrence count of the single most frequent n-gram. One pass:
   * tokenize, hash each order-sensitive n-gram to 64 bits, count via open
   * addressing (collisions at 2^-64 are negligible for mode counting).
   * `[0, 0]` when the document has fewer than `n` tokens.
   */
  def topNgramStats(text: UTF8String, n: Int): Array[Long] = {
    val tokens = tokenizeAscii(text)
    val m = tokens.length - n + 1
    if (m <= 0) return Array(0L, 0L)
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val used = new Array[Boolean](cap)
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    var top = 0
    var i = 0
    while (i < m) {
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < n) { h = h * 0x100000001B3L + hash64(tokens(i + j)); j += 1 }
      var slot = (h.toInt & (cap - 1)).abs
      var found = false
      while (used(slot) && !found) {
        if (keys(slot) == h) found = true else slot = (slot + 1) & (cap - 1)
      }
      if (!found) { used(slot) = true; keys(slot) = h; counts(slot) = 0 }
      counts(slot) += 1
      if (counts(slot) > top) top = counts(slot)
      i += 1
    }
    Array(m.toLong, top.toLong)
  }

  /**
   * Token-window document chunking: chunk `c` covers tokens
   * `[c*stride, min(c*stride + chunkSize, nTokens))` joined by single spaces;
   * chunks are emitted while `c*stride < nTokens` (so `ceil(nTokens/stride)`
   * chunks; overlap = chunkSize - stride tokens between neighbors). Empty
   * documents produce no chunks. One tokenizer pass, then windowed joins.
   */
  def chunkTokens(text: UTF8String, chunkSize: Int, stride: Int): Array[UTF8String] = {
    val tokens = tokenizeAscii(text)
    if (tokens.length == 0) return new Array[UTF8String](0)
    val nChunks = (tokens.length + stride - 1) / stride
    val sep = UTF8String.fromString(" ")
    val out = new Array[UTF8String](nChunks)
    var c = 0
    while (c < nChunks) {
      val start = c * stride
      val end = math.min(start + chunkSize, tokens.length)
      out(c) = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(tokens, start, end): _*)
      c += 1
    }
    out
  }

  /** SimHash over pre-hashed features (already well-mixed 64-bit values). */
  def simhashLongs(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** cosine_similarity(a, b) over array<float> columns -> double. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b) over array<float> columns -> double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** simhash64(features) over array<string> (hashed per token) or array<long>
  * (pre-hashed features, used directly) -> long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string> or array<long>, got ${t.sql}")
  }

  private def kernel: String = child.dataType match {
    case ArrayType(LongType, _) => "simhashLongs"
    case _ => "simhash"
  }

  override def nullSafeEval(tokens: Any): Any = child.dataType match {
    case ArrayType(LongType, _) => VectorKernels.simhashLongs(tokens.asInstanceOf[ArrayData])
    case _ => VectorKernels.simhash(tokens.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.$kernel($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_signature(features, k) over array<string> or array<long>
  * -> array<long> of length k. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string> or array<long> and k>0, got ${t.sql}")
  }

  private def kernel: String = child.dataType match {
    case ArrayType(LongType, _) => "minhashLongs"
    case _ => "minhash"
  }

  override def nullSafeEval(tokens: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(child.dataType match {
      case ArrayType(LongType, _) => VectorKernels.minhashLongs(tokens.asInstanceOf[ArrayData], k)
      case _ => VectorKernels.minhash(tokens.asInstanceOf[ArrayData], k)
    })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.$kernel($a, $k))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hashed_word_shingles(text, n): single-pass tokenize + shingle + hash +
  * dedup over a string column -> array<long>. See
  * [[VectorKernels.hashedWordShingles]]. */
case class HashedWordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hashed_word_shingles expects string and n>0, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.hashedWordShingles(text.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.hashedWordShingles($a, $n))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_shingles(text, n): single-pass distinct word n-grams as strings ->
  * array<string>. String twin of [[HashedWordShingles]]. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles expects string and n>0, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.wordShingleStrings(text.asInstanceOf[UTF8String], n).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.wordShingleStrings($a, $n))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_shingles_all(text, n): single-pass word n-grams as strings WITH
  * multiplicity, in document order -> array<string>. Counting twin of
  * [[WordShingles]]; see [[VectorKernels.wordShingleStringsAll]]. */
case class WordShinglesAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles_all expects string and n>0, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.wordShingleStringsAll(text.asInstanceOf[UTF8String], n).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.wordShingleStringsAll($a, $n))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** deletion_variants(s): the string plus its distinct one-char-deletion
  * variants -> array<string> (FastSS edit-distance-1 blocking keys). */
case class DeletionVariants(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"deletion_variants expects string, got ${t.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.deletionVariants(s.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.deletionVariants($a))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** tokenize_ascii(text): single-pass lowercased [a-z0-9] tokens -> array<string>. */
/** canonicalize_text(text): NFC + control-char strip + whitespace collapse +
  * trim -> string. Semantics replicable by any engine with NFC + regex
  * (the curation text-canonicalization step — run it BEFORE fingerprints,
  * shingles, or tokenization so byte-level noise can't split duplicates). */
case class CanonicalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"canonicalize_text expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.canonicalizeText(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.canonicalizeText($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** decode_numeric_entities(text): HTML numeric character references
  * (`&#65;` / `&#x1F600;`) -> code points; whitespace-class / control /
  * invalid references -> one space; malformed stay literal. The codegen'd
  * companion of the strip_html regex chain (see
  * [[VectorKernels.decodeNumericEntities]] for the exact rules). */
case class DecodeNumericEntities(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"decode_numeric_entities expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.decodeNumericEntities(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.decodeNumericEntities($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** fix_mojibake(text): repair UTF-8-read-as-cp1252 corruption ("Ã©" ->
  * "é") by inverting the mis-decode and strictly re-decoding as UTF-8, to
  * a fixpoint (≤4 passes, handles double corruption); whole-string and
  * conservative — anything that doesn't round-trip exactly stays
  * unchanged (see [[VectorKernels.fixMojibake]] for the exact rules). */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fix_mojibake expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.fixMojibake(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.fixMojibake($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Serializable BPE encoder shipped inside the plan (like the PQ codebooks):
 * the merge-rank table plus a per-thread word→subwords memo — real text
 * repeats words heavily, so most words hit the memo and pay zero merge
 * work. Encode semantics match [[graft.text.Bpe]] training exactly: apply
 * the lowest-rank adjacent pair, one left-to-right non-overlapping
 * replacement pass, repeat until no adjacent pair has a rank.
 */
class BpeCoder(merges: Array[Array[String]]) extends Serializable {
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.putIfAbsent(merges(i)(0) + " " + merges(i)(1), Int.box(i))
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

  private def encodeWord(w: String): Array[String] = {
    val cached = memo.get.get(w)
    if (cached != null) return cached
    var syms: Array[String] = w.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
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
    memo.get.put(w, syms)
    syms
  }

  /** Encode full text: ascii-tokenize, concatenate each word's subwords. */
  def encode(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val words = VectorKernels.tokenizeAscii(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      val subs = encodeWord(words(i).toString)
      var j = 0
      while (j < subs.length) { out += UTF8String.fromString(subs(j)); j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** canonicalize_url(url) / url_host(url) / registrable_domain(url): the
  * deterministic URL-normalization family (see
  * [[VectorKernels.canonicalizeUrl]] for the exact rules). */
case class UrlKernel(child: Expression, mode: String) extends UnaryExpression {
  require(UrlKernel.Modes.contains(mode), s"unknown url kernel mode: $mode")
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$mode expects string, got ${t.sql}")
  }

  override def nullSafeEval(url: Any): Any = mode match {
    case "canonicalize_url" => VectorKernels.canonicalizeUrl(url.asInstanceOf[UTF8String])
    case "url_host" => VectorKernels.urlHost(url.asInstanceOf[UTF8String])
    case "registrable_domain" => VectorKernels.registrableDomain(url.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = mode match {
      case "canonicalize_url" => "canonicalizeUrl"
      case "url_host" => "urlHost"
      case "registrable_domain" => "registrableDomain"
    }
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.$fn($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlKernel {
  val Modes: Set[String] = Set("canonicalize_url", "url_host", "registrable_domain")
}

/** bpe_encode_tokens(text): trained-BPE subword stream of the ascii-
  * tokenized text — one narrow kernel pass, no shuffle. */
case class BpeEncodeTokens(child: Expression, merges: IndexedSeq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if merges.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_tokens expects string and a non-empty merge list, got ${t.sql}")
  }

  @transient private lazy val coder =
    new BpeCoder(merges.map(p => Array(p._1, p._2)).toArray)

  override def nullSafeEval(text: Any): Any =
    coder.encode(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCoder", coder, "graft.functions.BpeCoder")
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Serializable WordPiece encoder shipped inside the plan (the BpeCoder
 * pattern): the piece set plus a per-thread word→subwords memo. Encode is
 * the BERT-runtime rule — greedy longest-match-first: the longest
 * word-initial piece at position 0, then the longest `##`-continuation
 * piece at each subsequent position; a position with NO matching piece
 * makes the whole word `[UNK]` (cannot happen when every single character
 * is in the vocab, which training guarantees for its own corpus).
 */
class WordPieceCoder(pieces: Array[String]) extends Serializable {
  @transient private lazy val vocab: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { s.add(pieces(i)); i += 1 }
    s
  }

  /** Longest piece length in CHARACTERS of the word (## not counted) —
    * bounds the greedy scan. */
  @transient private lazy val maxLen: Int = {
    var m = 1
    var i = 0
    while (i < pieces.length) {
      val p = pieces(i)
      val l = if (p.startsWith("##")) p.length - 2 else p.length
      if (l > m) m = l
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

  private val Unk = Array("[UNK]")

  private def encodeWord(w: String): Array[String] = {
    val cached = memo.get.get(w)
    if (cached != null) return cached
    val out = Array.newBuilder[String]
    var i = 0
    var failed = false
    while (i < w.length && !failed) {
      var j = math.min(w.length, i + maxLen)
      var hit: String = null
      while (hit == null && j > i) {
        val cand = if (i == 0) w.substring(i, j) else "##" + w.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) failed = true
      else { out += hit; i = j }
    }
    val res = if (failed) Unk else out.result()
    memo.get.put(w, res)
    res
  }

  /** Encode full text: ascii-tokenize, concatenate each word's pieces. */
  def encode(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val words = VectorKernels.tokenizeAscii(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      val subs = encodeWord(words(i).toString)
      var j = 0
      while (j < subs.length) { out += UTF8String.fromString(subs(j)); j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** wordpiece_encode(text): greedy longest-match subword stream of the
  * ascii-tokenized text against a trained piece vocabulary — one narrow
  * kernel pass, no shuffle. */
case class WordPieceEncode(child: Expression, pieces: IndexedSeq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if pieces.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode expects string and a non-empty vocab, got ${t.sql}")
  }

  @transient private lazy val coder = new WordPieceCoder(pieces.toArray)

  override def nullSafeEval(text: Any): Any =
    coder.encode(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpCoder", coder, "graft.functions.WordPieceCoder")
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

class UnigramCoder(pieces: Array[String], scores: Array[Long])
    extends Serializable {
  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
    m
  }

  @transient private lazy val maxLen: Int = {
    var m = 1
    var i = 0
    while (i < pieces.length) { if (pieces(i).length > m) m = pieces(i).length; i += 1 }
    m
  }

  @transient private lazy val lookup: String => Long = { k =>
    val v = vocab.get(k)
    if (v == null) Long.MinValue else v.longValue()
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

  private def encodeWord(w: String): Array[String] = {
    val cached = memo.get.get(w)
    if (cached != null) return cached
    val res = graft.text.Unigram.viterbi(w, lookup, maxLen)
    memo.get.put(w, res)
    res
  }

  /** Encode full text: ascii-tokenize, concatenate each word's Viterbi
    * pieces. */
  def encode(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val words = VectorKernels.tokenizeAscii(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      val subs = encodeWord(words(i).toString)
      var j = 0
      while (j < subs.length) { out += UTF8String.fromString(subs(j)); j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** unigram_encode(text): globally-best (Viterbi) subword stream of the
  * ascii-tokenized text under a trained unigram model's fixed-point
  * scores — one narrow kernel pass, no shuffle. */
case class UnigramEncode(child: Expression, pieces: IndexedSeq[String],
                         scores: IndexedSeq[Long])
    extends UnaryExpression {
  // Model params are IndexedSeq, NOT Array: arrays compare by reference in
  // case-class equality, so two encode columns over the same model in one
  // select (e.g. size(encode) + concat_ws(encode)) would never be
  // semantically equal — defeating common-subexpression elimination and
  // doubling the Viterbi work per row. Seq equality is element-wise; CSE
  // collapses the twins to one evaluation. Same rule for WordPieceEncode
  // and BpeEncodeTokens above.
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if pieces.nonEmpty && pieces.length == scores.length =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode expects string and a non-empty piece/score vocab, got ${t.sql}")
  }

  @transient private lazy val coder = new UnigramCoder(pieces.toArray, scores.toArray)

  override def nullSafeEval(text: Any): Any =
    coder.encode(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugCoder", coder, "graft.functions.UnigramCoder")
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** decode_html_entities(text): one-pass named + numeric character-
  * reference decode (see [[VectorKernels.decodeHtmlEntities]]). */
case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"decode_html_entities expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.decodeHtmlEntities(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.decodeHtmlEntities($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Md5BucketCounts(child: Expression, bigrams: Boolean,
                           portableHash: Boolean = true) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_bucket_counts expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.featureBucketCounts(text.asInstanceOf[UTF8String], bigrams,
        portableHash))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.featureBucketCounts($a, $bigrams, $portableHash))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dehyphenate(text): line-break hyphenation repair (`exam-\nple` ->
  * `example`) — see [[VectorKernels.dehyphenate]] for the exact rule. */
case class Dehyphenate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"dehyphenate expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.dehyphenate(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.dehyphenate($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** redact_valid_cards(text) -> text with Luhn-valid 13..19-digit card
  * runs (groups joined by single spaces/dashes) replaced by `token`;
  * checksum-failing digit runs pass through untouched. */
case class RedactValidCards(child: Expression, token: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"redact_valid_cards expects string, got ${t.sql}")
  }

  @transient private lazy val tokenU = UTF8String.fromString(token)

  override def nullSafeEval(text: Any): Any =
    VectorKernels.redactValidCards(text.asInstanceOf[UTF8String], tokenU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cardToken", tokenU)
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.redactValidCards($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** soundex4(text) -> 4-char American Soundex code ("0000" when no ASCII
  * letter) — the classic phonetic blocking key for record linkage. */
case class Soundex4(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"soundex4 expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.soundex4(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.soundex4($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** jaro_winkler_fp(a, b) -> floor(jaro_winkler(a, b) * 2^20) in exact
  * integer arithmetic (engine-portable; see VectorKernels.jaroWinklerFp). */
case class JaroWinklerFp(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler_fp expects string inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.jaroWinklerFp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.jaroWinklerFp($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** valid_card_count(text) -> number of Luhn-valid card runs. */
case class ValidCardCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"valid_card_count expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.validCardCount(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.validCardCount($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FoldAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fold_accents expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.foldAccents(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.foldAccents($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TokenizeAscii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tokenize_ascii expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.tokenizeAscii(text.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.tokenizeAscii($a))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token_stats(text) -> array<long>
  * [tokenCount, distinctTokens, totalTokenChars, stopwordCount].
  * The stopword set is shipped as a plain Array[String] in the expression tree
  * (serialization-safe) and materialized once per executor as a UTF8String set. */
case class TokenStats(child: Expression, stopwords: Seq[String] = Seq.empty)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val stopwordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(stopwords.length * 2, 4))
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_stats expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.tokenStats(text.asInstanceOf[UTF8String], stopwordSet))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", stopwordSet, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.tokenStats($a, $setRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** script_profile(text) -> array<long> [total, latin, cyrillic, greek,
  * arabic, cjk, digit] over codepoints; explicit engine-portable ranges.
  * See [[VectorKernels.scriptProfile]]. */
/** readability_stats(text) -> array<long> [n_words, n_sentences,
  * n_syllable_groups]: one byte pass of the Flesch counting rules — see
  * [[VectorKernels.readabilityStats]] for the exact regex-replayable spec. */
case class ReadabilityStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"readability_stats expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.readabilityStats(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.readabilityStats($a))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ScriptProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"script_profile expects string, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.scriptProfile(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.scriptProfile($a))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** top_ngram_stats(text, n) -> array<long> [totalNgrams, topNgramCount]:
  * single-pass tokenize + n-gram hash + mode count. See
  * [[VectorKernels.topNgramStats]]. */
case class TopNgramStats(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"top_ngram_stats expects string and n>0, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.topNgramStats(text.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.topNgramStats($a, $n))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** chunk_tokens(text, chunkSize, stride): overlapping token-window chunks
  * re-joined as strings -> array<string>. See [[VectorKernels.chunkTokens]]. */
case class ChunkTokens(child: Expression, chunkSize: Int, stride: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if chunkSize > 0 && stride > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"chunk_tokens expects string and chunkSize,stride>0, got ${t.sql}")
  }

  override def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.chunkTokens(text.asInstanceOf[UTF8String], chunkSize, stride)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.chunkTokens($a, $chunkSize, $stride))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** lsh_band_buckets(vec, planes): hyperplane sign buckets for every band in
  * one pass over an array<float> vector -> array<long>. The planes live in a
  * codegen reference object, not 100+ separate literal expressions. */
case class LshBandBuckets(child: Expression, planes: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_band_buckets expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.lshBandBuckets(vec.asInstanceOf[ArrayData], planes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][][]")
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.lshBandBuckets($a, $planesRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nearest_centroids(vec, centroids, nprobe): indices of the nprobe most
  * cosine-similar centroids -> array<int>. Centroids live in a codegen
  * reference object (the IVF coarse quantizer is broadcast to executors as
  * part of the plan). */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nprobe > 0 && centroids.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float>, nprobe>0 and centroids, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.nearestCentroids(vec.asInstanceOf[ArrayData], centroids, nprobe))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.nearestCentroids($a, $ref, $nprobe))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nearest_centroid_cosine(vec): cosine similarity to the most-similar
  * centroid (the assigned one, same semantics as nearest_centroids'
  * first pick) -> double. Centroids ride as a codegen reference object. */
case class NearestCentroidCosine(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_cosine expects array<float> and centroids, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    VectorKernels.nearestCentroidCosine(vec.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.nearestCentroidCosine($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hashed_linear_score(text): exact-integer hashing-trick classifier logit
  * (weights in a codegen reference object, 256 buckets — md5 first byte
  * when portable, xxhash64 low byte otherwise). */
case class HashedLinearScore(child: Expression, weights: Array[Int], bigrams: Boolean,
                             portableHash: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if weights.length == 256 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_linear_score expects string and 256 weights, got ${t.sql} / ${weights.length}")
  }

  override def nullSafeEval(text: Any): Any =
    VectorKernels.hashedLinearScore(text.asInstanceOf[UTF8String], weights, bigrams,
      portableHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", weights, "int[]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.hashedLinearScore($a, $ref, $bigrams, $portableHash)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_encode(vec): product-quantization codes, one byte per subspace ->
  * binary of length m. The codebooks live in a codegen reference object
  * (they ship to executors inside the plan, like the IVF centroids). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if codebooks.nonEmpty && codebooks.forall(cb => cb.nonEmpty && cb.length <= 256) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float> and 1..256 centroids per subspace, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    VectorKernels.pqEncode(vec.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.pqEncode($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_encode_ints(vec): the same codes as array<int> — the training-loop
  * variant, explodable/groupable in Column algebra. */
case class PqEncodeInts(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if codebooks.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_ints expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.pqEncodeInts(vec.asInstanceOf[ArrayData], codebooks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.pqEncodeInts($a, $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_lut(qvec): per-query ADC lookup table (m * ksub doubles) — computed
  * once per query row, then every candidate scores in O(m). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if codebooks.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.pqLut(vec.asInstanceOf[ArrayData], codebooks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.pqLut($a, $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** mat_vec_mul(vec): dense rotation `R x` with the matrix riding as a
  * codegen reference object — the OPQ/PCA rotation applied inline in the
  * scan, narrow and streaming-legal. */
case class MatVecMul(child: Expression, matrix: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if matrix.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_mul expects array<float> and a non-empty matrix, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.matVecMul(vec.asInstanceOf[ArrayData], matrix))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matrix", matrix, "float[][]")
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.matVecMul($a, $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_adc_dot(codes, lut): asymmetric-distance dot product — the inner-loop
  * scorer of the PQ scan, O(m) per pair. */
case class PqAdcDot(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) if ksub > 0 => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dot expects (binary, array<double>), got (${a.sql}, ${b.sql})")
  }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    VectorKernels.pqAdcDot(codes.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.pqAdcDot($a, $b, $ksub)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** pq_reconstruct(codes): decode PQ codes back to the quantized vector —
  * the residual-IVFADC encode path reconstructs to take exact norms. */
case class PqReconstruct(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if codebooks.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_reconstruct expects binary, got ${t.sql}")
  }

  override def nullSafeEval(codes: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.pqReconstruct(codes.asInstanceOf[Array[Byte]], codebooks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.pqReconstruct($a, $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8_encode(vec): symmetric per-vector int8 quantization of a float
  * vector -> one signed byte per dimension (4x smaller at rest and on the
  * scan than float32; the cheap storage tier below PQ's 16x). */
case class Int8Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_encode expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    VectorKernels.int8Encode(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.int8Encode($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8_encode_ints(vec): the same codes as array<int> — the oracle-gate /
  * Column-algebra view of [[Int8Encode]]. */
case class Int8EncodeInts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_encode_ints expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.int8EncodeInts(vec.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.int8EncodeInts($a))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8_scale(vec): the dequantization scale maxabs/127 for [[Int8Encode]]'s
  * codes (0.0 for zero/empty vectors). */
case class Int8Scale(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_scale expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    VectorKernels.int8Scale(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.int8Scale($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8_dot(a, b): exact integer dot product of two int8 code arrays (the
  * true dot is this times both scales; cosine needs no scales at all). */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int8_dot expects binary inputs, got ${l.sql}, ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.int8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.int8Dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** int8_decode(codes, scale): lossy inverse of [[Int8Encode]]. */
case class Int8Decode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int8_decode expects (binary, double), got ${l.sql}, ${r.sql}")
  }

  override def nullSafeEval(codes: Any, scale: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.int8Decode(codes.asInstanceOf[Array[Byte]], scale.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, s) => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.int8Decode($a, $s))")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** bit_sign_pack(vec): 1-bit sign quantization of a float vector into
  * packed 64-bit words — the cheapest embedding storage tier (32x under
  * float32, 8x under int8). Bit i of word i/64 = (vec_i >= 0). */
case class BitSignPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bit_sign_pack expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(vec: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.bitSignPack(vec.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.bitSignPack($a))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hamming_words(a, b): Hamming distance between two [[BitSignPack]] codes
  * (XOR + popcount over the packed words — `dim - hamming` is the sign-
  * agreement count, a monotone proxy for cosine direction). */
case class HammingWords(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hamming_words expects (array<bigint>, array<bigint>), got ${l.sql}, ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.hammingWords(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.hammingWords($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** pq_code_norm(codes): reconstruction norm from precomputed per-centroid
  * squared norms — the denominator of the approximate cosine. */
case class PqCodeNorm(child: Expression, normSq: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if normSq.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_code_norm expects binary, got ${t.sql}")
  }

  override def nullSafeEval(codes: Any): Any =
    VectorKernels.pqCodeNorm(codes.asInstanceOf[Array[Byte]], normSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normSq", normSq, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.pqCodeNorm($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_band_hashes(features, bands, rowsPerBand): fused signature + LSH
  * band bucket hashes -> array<long> of length `bands`. Single kernel pass —
  * keeps the signature out of HOF lambdas where it would be re-evaluated per
  * band. */
case class MinHashBandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) if bands > 0 && rowsPerBand > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_hashes expects array<string> or array<long> and bands,rowsPerBand>0, got ${t.sql}")
  }

  private def kernel: String = child.dataType match {
    case ArrayType(LongType, _) => "minhashBandsLongs"
    case _ => "minhashBands"
  }

  override def nullSafeEval(tokens: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(child.dataType match {
      case ArrayType(LongType, _) =>
        VectorKernels.minhashBandsLongs(tokens.asInstanceOf[ArrayData], bands, rowsPerBand)
      case _ => VectorKernels.minhashBands(tokens.asInstanceOf[ArrayData], bands, rowsPerBand)
    })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.$kernel($a, $bands, $rowsPerBand))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-facing wrappers. */
object vectors {
  def canonicalize_text(text: Column): Column = CanonicalizeText(text.asExpression).asColumn

  def decode_numeric_entities(text: Column): Column =
    DecodeNumericEntities(text.asExpression).asColumn

  def decode_html_entities(text: Column): Column =
    DecodeHtmlEntities(text.asExpression).asColumn

  def fix_mojibake(text: Column): Column =
    FixMojibake(text.asExpression).asColumn

  def bpe_encode_tokens(text: Column, merges: IndexedSeq[(String, String)]): Column =
    BpeEncodeTokens(text.asExpression, merges).asColumn

  def byte_bpe_encode(text: Column, merges: IndexedSeq[(String, String)]): Column =
    ByteBpeEncode(text.asExpression, merges).asColumn

  def byte_bpe_decode(tokens: Column): Column =
    ByteBpeDecode(tokens.asExpression).asColumn

  def byte_bpe_encode_ids(text: Column, merges: IndexedSeq[(String, String)]): Column =
    ByteBpeEncodeIds(text.asExpression, merges).asColumn

  def byte_bpe_decode_ids(ids: Column, merges: IndexedSeq[(String, String)]): Column =
    ByteBpeDecodeIds(ids.asExpression, merges).asColumn

  def byte_bpe_encode_ids_special(text: Column, merges: IndexedSeq[(String, String)],
                                  specials: IndexedSeq[String]): Column =
    ByteBpeEncodeIdsSpecial(text.asExpression, merges, specials).asColumn

  def byte_bpe_decode_ids_special(ids: Column, merges: IndexedSeq[(String, String)],
                                  specials: IndexedSeq[String]): Column =
    ByteBpeDecodeIdsSpecial(ids.asExpression, merges, specials).asColumn

  def wordpiece_encode(text: Column, pieces: IndexedSeq[String]): Column =
    WordPieceEncode(text.asExpression, pieces).asColumn

  def unigram_encode(text: Column, pieces: IndexedSeq[String],
                     scores: IndexedSeq[Long]): Column =
    UnigramEncode(text.asExpression, pieces, scores).asColumn

  def canonicalize_url(url: Column): Column =
    UrlKernel(url.asExpression, "canonicalize_url").asColumn

  def url_host(url: Column): Column =
    UrlKernel(url.asExpression, "url_host").asColumn

  def registrable_domain(url: Column): Column =
    UrlKernel(url.asExpression, "registrable_domain").asColumn

  def fold_accents(text: Column): Column = FoldAccents(text.asExpression).asColumn

  def dehyphenate(text: Column): Column = Dehyphenate(text.asExpression).asColumn

  def redact_valid_cards(text: Column, token: String = "[CARD]"): Column =
    RedactValidCards(text.asExpression, token).asColumn

  def valid_card_count(text: Column): Column =
    ValidCardCount(text.asExpression).asColumn

  def soundex4(text: Column): Column = Soundex4(text.asExpression).asColumn

  def jaro_winkler_fp(a: Column, b: Column): Column =
    JaroWinklerFp(a.asExpression, b.asExpression).asColumn

  def md5_bucket_counts(text: Column, bigrams: Boolean = true): Column =
    Md5BucketCounts(text.asExpression, bigrams).asColumn

  def feature_bucket_counts(text: Column, bigrams: Boolean, portableHash: Boolean): Column =
    Md5BucketCounts(text.asExpression, bigrams, portableHash).asColumn

  def nearest_centroid_cosine(vec: Column, centroids: Array[Array[Float]]): Column =
    NearestCentroidCosine(vec.asExpression, centroids).asColumn

  def cosine_similarity(a: Column, b: Column): Column =
    CosineSimilarity(a.asExpression, b.asExpression).asColumn

  def dot_product(a: Column, b: Column): Column =
    DotProduct(a.asExpression, b.asExpression).asColumn

  def simhash64(tokens: Column): Column = SimHash64(tokens.asExpression).asColumn

  def minhash_signature(tokens: Column, k: Int): Column =
    MinHashSignature(tokens.asExpression, k).asColumn

  def minhash_band_hashes(tokens: Column, bands: Int, rowsPerBand: Int): Column =
    MinHashBandHashes(tokens.asExpression, bands, rowsPerBand).asColumn

  def hashed_word_shingles(text: Column, n: Int): Column =
    HashedWordShingles(text.asExpression, n).asColumn

  def word_shingles(text: Column, n: Int): Column =
    WordShingles(text.asExpression, n).asColumn

  def word_shingles_all(text: Column, n: Int): Column =
    WordShinglesAll(text.asExpression, n).asColumn

  def deletion_variants(s: Column): Column = DeletionVariants(s.asExpression).asColumn

  def tokenize_ascii(text: Column): Column = TokenizeAscii(text.asExpression).asColumn

  def token_stats(text: Column, stopwords: Seq[String] = Seq.empty): Column =
    TokenStats(text.asExpression, stopwords).asColumn

  def top_ngram_stats(text: Column, n: Int): Column =
    TopNgramStats(text.asExpression, n).asColumn

  def script_profile(text: Column): Column = ScriptProfile(text.asExpression).asColumn

  def readability_stats(text: Column): Column =
    ReadabilityStats(text.asExpression).asColumn

  def matched_patterns(text: Column, patterns: Seq[String]): Column =
    MatchedPatterns(text.asExpression, patterns).asColumn

  def mask_patterns(text: Column, patterns: Seq[String],
                    mask: String = "[REDACTED]"): Column =
    MaskPatterns(text.asExpression, patterns, mask).asColumn

  def chunk_tokens(text: Column, chunkSize: Int, stride: Int): Column =
    ChunkTokens(text.asExpression, chunkSize, stride).asColumn

  def lsh_band_buckets(vec: Column, planes: Array[Array[Array[Float]]]): Column =
    LshBandBuckets(vec.asExpression, planes).asColumn

  def nearest_centroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    NearestCentroids(vec.asExpression, centroids, nprobe).asColumn

  def hashed_linear_score(text: Column, weights: Array[Int], bigrams: Boolean = true,
                          portableHash: Boolean = true): Column =
    HashedLinearScore(text.asExpression, weights, bigrams, portableHash).asColumn

  def pq_encode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    PqEncode(vec.asExpression, codebooks).asColumn

  def pq_encode_ints(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    PqEncodeInts(vec.asExpression, codebooks).asColumn

  def pq_lut(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    PqLut(vec.asExpression, codebooks).asColumn

  def mat_vec_mul(vec: Column, matrix: Array[Array[Float]]): Column =
    MatVecMul(vec.asExpression, matrix).asColumn

  def pq_adc_dot(codes: Column, lut: Column, ksub: Int): Column =
    PqAdcDot(codes.asExpression, lut.asExpression, ksub).asColumn

  def pq_code_norm(codes: Column, normSq: Array[Array[Double]]): Column =
    PqCodeNorm(codes.asExpression, normSq).asColumn

  def pq_reconstruct(codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    PqReconstruct(codes.asExpression, codebooks).asColumn

  def int8_encode(vec: Column): Column = Int8Encode(vec.asExpression).asColumn

  def int8_encode_ints(vec: Column): Column = Int8EncodeInts(vec.asExpression).asColumn

  def int8_scale(vec: Column): Column = Int8Scale(vec.asExpression).asColumn

  def int8_dot(a: Column, b: Column): Column =
    Int8Dot(a.asExpression, b.asExpression).asColumn

  def int8_decode(codes: Column, scale: Column): Column =
    Int8Decode(codes.asExpression, scale.asExpression).asColumn

  def bit_sign_pack(vec: Column): Column = BitSignPack(vec.asExpression).asColumn

  def hamming_words(a: Column, b: Column): Column =
    HammingWords(a.asExpression, b.asExpression).asColumn

  /** Hamming distance between two 64-bit hashes as a Column. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
