package graft

import graft.diff.comparator.MapEquiv
import graft.functions.VectorKernels
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based tests (scalacheck, fixed seed for determinism) for the
 * kernels whose JVM-vs-SQL equality semantics are easy to get subtly wrong.
 * All properties evaluate kernels directly (no Spark jobs), so hundreds of
 * cases run in milliseconds; the Spark-integration behavior of the same code
 * is pinned by DiffMatrixSuite / PipelineSuite.
 */
class PropertySuite extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(300)
    .withInitialSeed(Seed(20260812L))

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(params, prop)
    assert(result.passed, s"$name failed: ${result.status}")
  }

  // --------------------------------------------------------------------------
  // MapEquiv vs a canonical model
  // --------------------------------------------------------------------------

  /** Canonical form under SQL comparison semantics: -0.0 folded into 0.0,
    * all NaNs collapsed (doubleToLongBits canonicalizes), bytes by content. */
  private def canon(v: Any): Any = v match {
    case d: java.lang.Double =>
      java.lang.Double.doubleToLongBits(if (d.doubleValue() == 0.0d) 0.0d else d.doubleValue())
    case b: Array[Byte] => b.toSeq
    case other => other
  }

  private def toMapData(entries: Seq[(Any, Any)]): MapData =
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1).toArray),
      new GenericArrayData(entries.map(_._2).toArray))

  /** Reference semantics: equal size; keys as a sequence (order-sensitive) or
    * as a set (insensitive); values SQL-equal per key. */
  private def modelEquiv(l: Seq[(Any, Any)], r: Seq[(Any, Any)], ordered: Boolean): Boolean = {
    val lc = l.map { case (k, v) => (canon(k), Option(v).map(canon)) }
    val rc = r.map { case (k, v) => (canon(k), Option(v).map(canon)) }
    if (ordered) lc == rc
    else lc.size == rc.size && lc.toMap == rc.toMap
  }

  // special doubles appear often so equal-but-differently-represented maps
  // (0.0 vs -0.0, NaN bit patterns) are generated frequently
  private val genDouble: Gen[java.lang.Double] = Gen.oneOf(
    Gen.oneOf[Double](0.0, -0.0, Double.NaN, 1.5, -2.25, Double.MaxValue),
    Gen.choose(-5.0, 5.0)).map(java.lang.Double.valueOf)

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-2, 2).map(_.toByte)).map(_.toArray))

  private def genEntries[K, V](genK: Gen[K], genV: Gen[V]): Gen[Seq[(K, V)]] =
    for {
      n <- Gen.chooseNum(0, 4)
      ks <- Gen.listOfN(n, genK)
      vs <- Gen.listOfN(n, genV)
    } yield {
      // Spark map keys are unique: dedup by canonical form, keep first
      val seen = scala.collection.mutable.HashSet.empty[Any]
      ks.zip(vs).filter { case (k, _) => seen.add(canon(k)) }
    }

  /** Pairs biased toward near-equality: identical, shuffled, one-value
    * mutation, or independent. */
  private def genPair[K, V](genE: Gen[Seq[(K, V)]], mutate: Gen[V]): Gen[(Seq[(K, V)], Seq[(K, V)])] =
    for {
      l <- genE
      mode <- Gen.chooseNum(0, 3)
      r <- mode match {
        case 0 => Gen.const(l)
        case 1 => Gen.const(l.reverse)
        case 2 if l.nonEmpty => mutate.map(v => l.updated(l.size - 1, (l.last._1, v)))
        case _ => genE
      }
    } yield (l, r)

  test("MapEquiv double keys/values match canonical SQL semantics (signed zeros, NaN)") {
    val gen = genPair(genEntries(genDouble, genDouble), genDouble)
    for (ordered <- Seq(false, true)) {
      val eqv = MapEquiv(DoubleType, DoubleType, ordered)
      check(s"double ordered=$ordered", Prop.forAll(gen) { case (l, r) =>
        eqv.equiv(toMapData(l), toMapData(r)) == modelEquiv(l, r, ordered)
      })
    }
  }

  test("MapEquiv binary keys/values match content equality") {
    val gen = genPair(genEntries(genBytes, genBytes), genBytes)
    for (ordered <- Seq(false, true)) {
      val eqv = MapEquiv(BinaryType, BinaryType, ordered)
      check(s"binary ordered=$ordered", Prop.forAll(gen) { case (l, r) =>
        // fresh array instances: content equality must not depend on identity
        def copy(e: Seq[(Array[Byte], Array[Byte])]) = e.map { case (k, v) => (k.clone(), v.clone()) }
        eqv.equiv(toMapData(copy(l)), toMapData(copy(r))) == modelEquiv(l, r, ordered)
      })
    }
  }

  test("MapEquiv string keys with nullable int values match the model") {
    val genK = Gen.oneOf("a", "b", "c", "d").map(UTF8String.fromString)
    val genV = Gen.oneOf(Gen.const(null: Integer), Gen.chooseNum(0, 2).map(Integer.valueOf))
    val gen = genPair(genEntries[UTF8String, Integer](genK, genV),
      genV.map(_.asInstanceOf[Integer]))
    for (ordered <- Seq(false, true)) {
      val eqv = MapEquiv(StringType, IntegerType, ordered)
      check(s"string ordered=$ordered", Prop.forAll(gen) { case (l, r) =>
        eqv.equiv(toMapData(l), toMapData(r)) == modelEquiv(l, r, ordered)
      })
    }
  }

  // --------------------------------------------------------------------------
  // text kernels vs naive models
  // --------------------------------------------------------------------------

  private val genWord: Gen[String] = Gen.oneOf("a", "bb", "key", "row", "x1", "scan")
  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    ws <- Gen.listOfN(n, genWord)
    sep <- Gen.oneOf(" ", "  ", ", ", "\t")
  } yield ws.mkString(sep)

  test("topNgramStats equals the naive mode count on random docs") {
    def naive(s: String, n: Int): Seq[Long] = {
      val toks = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      if (grams.isEmpty) Seq(0L, 0L)
      else Seq(grams.size.toLong, grams.groupBy(identity).values.map(_.size).max.toLong)
    }
    check("topNgramStats", Prop.forAll(genDoc, Gen.chooseNum(1, 4)) { (doc, n) =>
      VectorKernels.topNgramStats(UTF8String.fromString(doc), n).toSeq == naive(doc, n)
    })
  }

  test("tokenSetCoverage equals the naive occurrence count on random docs and vocabs") {
    val genVocab: Gen[Seq[String]] =
      Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, genWord)).map(_.distinct)
    check("tokenSetCoverage", Prop.forAll(genDoc, genVocab) { (doc, vocab) =>
      val set = vocab.map(t => VectorKernels.hash64(UTF8String.fromString(t))).toArray
      java.util.Arrays.sort(set)
      val got = VectorKernels.tokenSetCoverage(UTF8String.fromString(doc), set).toSeq
      val toks = doc.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val vs = vocab.toSet
      got == Seq(toks.size.toLong, toks.count(vs.contains).toLong)
    })
  }

  test("chunkTokens partitions the token stream (no overlap) and respects window size") {
    check("chunkTokens", Prop.forAll(genDoc, Gen.chooseNum(1, 8), Gen.chooseNum(0, 7)) {
      (doc, chunkSize, rawOverlap) =>
        val overlap = math.min(rawOverlap, chunkSize - 1)
        val stride = chunkSize - overlap
        val toks = VectorKernels.tokenizeAscii(UTF8String.fromString(doc)).map(_.toString)
        val chunks = VectorKernels.chunkTokens(UTF8String.fromString(doc), chunkSize, stride)
          .map(_.toString)
        val chunkToks = chunks.map(_.split(" ").filter(_.nonEmpty).toSeq)
        val starts = chunks.indices.map(_ * stride)
        // every chunk is exactly its token window
        val windowsOk = chunkToks.zip(starts).forall { case (c, s) =>
          c == toks.slice(s, math.min(s + chunkSize, toks.length)).toSeq
        }
        // chunk count: ceil(len / stride), zero for empty docs
        val countOk = chunks.length == (toks.length + stride - 1) / stride
        // overlap=0 partitions the stream exactly
        val partitionOk = overlap != 0 || chunkToks.flatten.toSeq == toks.toSeq
        windowsOk && countOk && partitionOk
    })
  }

  test("hashedWordShingles cardinality equals distinct string shingles") {
    check("shingles", Prop.forAll(genDoc, Gen.chooseNum(1, 4)) { (doc, n) =>
      val toks = VectorKernels.tokenizeAscii(UTF8String.fromString(doc)).map(_.toString)
      val strShingles = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      VectorKernels.hashedWordShingles(UTF8String.fromString(doc), n).length == strShingles.size
    })
  }

  test("wordShingleStringsAll keeps every occurrence; distinct twin is its dedup") {
    val genDoc = Gen.listOf(Gen.oneOf("a", "b", "ab", "x1", "yy", "zzz", "!", "  "))
      .map(_.mkString(" "))
    check("wordShingleStringsAll", Prop.forAll(genDoc, Gen.choose(1, 3)) { (doc, n) =>
      val toks = doc.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val expectAll = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      val all = VectorKernels.wordShingleStringsAll(UTF8String.fromString(doc), n)
        .map(_.toString).toSeq
      val dist = VectorKernels.wordShingleStrings(UTF8String.fromString(doc), n)
        .map(_.toString).toSeq
      all == expectAll && dist == all.distinct
    })
  }

  test("hashedLinearScore equals the naive md5-bucket model on random docs") {
    val genWeights: Gen[Array[Int]] =
      Gen.listOfN(256, Gen.chooseNum(-100, 100)).map(_.toArray)
    def naive(s: String, w: Array[Int], bigrams: Boolean): Long = {
      val toks = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val feats = toks ++ (if (bigrams) toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq else Seq.empty)
      val d = java.security.MessageDigest.getInstance("MD5")
      feats.map(f => w(d.digest(f.getBytes("UTF-8"))(0) & 0xFF).toLong).sum
    }
    check("hashedLinearScore", Prop.forAll(genDoc, genWeights, Gen.oneOf(true, false)) {
      (doc, w, bg) =>
        VectorKernels.hashedLinearScore(UTF8String.fromString(doc), w, bg,
          portableHash = true) == naive(doc, w, bg)
    })
    // the xxhash64 fast path: same token/bigram feature stream, own buckets
    // — pin determinism and the naive xx model (hash64 is itself
    // property-tested against the corpus shingle kernels)
    def naiveXx(s: String, w: Array[Int], bigrams: Boolean): Long = {
      val toks = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val feats = toks ++ (if (bigrams) toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq else Seq.empty)
      feats.map(f => w((VectorKernels.hash64(UTF8String.fromString(f)) & 0xFF).toInt).toLong).sum
    }
    check("hashedLinearScoreXx", Prop.forAll(genDoc, genWeights, Gen.oneOf(true, false)) {
      (doc, w, bg) =>
        VectorKernels.hashedLinearScore(UTF8String.fromString(doc), w, bg,
          portableHash = false) == naiveXx(doc, w, bg)
    })
  }

  test("pq encode/lut/adc: ADC dot equals the exact dot against the reconstruction") {
    val genVec: Gen[Array[Float]] =
      Gen.listOfN(8, Gen.chooseNum(-8, 8).map(_.toFloat / 2f)).map(_.toArray)
    val genCb: Gen[Array[Array[Array[Float]]]] = for {
      ksub <- Gen.chooseNum(1, 6)
      cbs <- Gen.listOfN(2, Gen.listOfN(ksub, Gen.listOfN(4,
        Gen.chooseNum(-8, 8).map(_.toFloat / 2f)).map(_.toArray)).map(_.toArray))
    } yield cbs.toArray
    check("pqAdc", Prop.forAll(genVec, genVec, genCb) { (v, q, cbs) =>
      val va = new GenericArrayData(v.map(x => x: Any))
      val qa = new GenericArrayData(q.map(x => x: Any))
      val codes = VectorKernels.pqEncode(va, cbs)
      val ksub = cbs(0).length
      val lut = new GenericArrayData(VectorKernels.pqLut(qa, cbs).map(x => x: Any))
      val adc = VectorKernels.pqAdcDot(codes, lut, ksub)
      // reconstruction = the selected sub-centroids concatenated
      val recon = cbs.zipWithIndex.flatMap { case (cb, s) => cb(codes(s) & 0xFF) }
      val exact = recon.zip(q).map { case (x, y) => x.toDouble * y.toDouble }.sum
      math.abs(adc - exact) < 1e-9
    })
  }

  test("MisraGries merged summaries keep every item above N/(m+1)") {
    import graft.agg.FrequentItems.MisraGriesAgg
    val genStream = Gen.listOfN(120,
      Gen.frequency(5 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        4 -> Gen.choose(0, 50).map("x" + _)))
    check("misraGries", Prop.forAll(genStream, Gen.choose(2, 8), Gen.choose(0, 119)) {
      (stream, m, cut) =>
        val mg = new MisraGriesAgg(m)
        val (s1, s2) = stream.splitAt(cut)
        val merged = mg.merge(
          s1.foldLeft(mg.zero)(mg.reduce), s2.foldLeft(mg.zero)(mg.reduce))
        val counts = stream.groupBy(identity).view.mapValues(_.size).toMap
        val bound = stream.size.toDouble / (m + 1)
        val kept = mg.finish(merged).map(_._1).toSet
        merged.size <= m &&
          counts.forall { case (k, c) => c <= bound || kept.contains(k) }
    })
  }

  test("SortedSetOverlapCount counts exactly like a naive set intersection") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.catalyst.expressions.Literal
    val genLongs = Gen.listOf(Gen.choose(-50L, 50L))
    check("sortedSetOverlap", Prop.forAll(genLongs, genLongs) { (set, arr) =>
      val sorted = set.distinct.sorted.toArray
      val bc = spark.sparkContext.broadcast(sorted)
      val expr = graft.functions.SortedSetOverlapCount(
        Literal.create(arr, ArrayType(LongType, containsNull = false)), bc)
      val got = expr.nullSafeEval(new GenericArrayData(arr.toArray)).asInstanceOf[Int]
      val want = arr.count(set.contains)
      bc.destroy()
      got == want
    })
  }

  test("canonicalizeText equals the NFC + strip + collapse + trim reference on random unicode") {
    // the reference model applies the DOCUMENTED contract literally as three
    // separate passes; the kernel fuses them into one loop
    def model(s: String): String = {
      val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      val stripped = nfc.filterNot(c =>
        (c < 0x20 && c != '\t' && c != '\n' && c != '\f' && c != '\r') || c == 0x7f)
      stripped.replaceAll("[\t\n\f\r ]+", " ").replaceAll("^ | $", "")
    }
    val genChar: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '\f', '\r'),
      1 -> Gen.oneOf('\u0000', '\u0001', '\u000b', '\u001f', '\u007f'),
      1 -> Gen.oneOf('\u0301', '\u00e9', '\u00a0', '\u212b', 'A'),
      1 -> Gen.oneOf('\ud83d', '\ude00')) // lone surrogates too
    val genStr: Gen[String] = Gen.listOf(genChar).map(_.mkString)
    check("canonicalizeText", Prop.forAll(genStr) { s =>
      VectorKernels.canonicalizeText(UTF8String.fromString(s)).toString ==
        model(new String(s.getBytes("UTF-8"), "UTF-8")) // UTF-8 round-trip like UTF8String
    })
  }

  test("canonicalizeUrl is idempotent and structure-preserving") {
    // idempotence is load-bearing: the canonical form IS the dedup key, so
    // re-canonicalizing stored keys (a re-run, a migration) must be a no-op
    val genLabel: Gen[String] = Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 1 -> Gen.const('-'))).map(_.mkString))
    val genHost: Gen[String] = for {
      www <- Gen.oneOf("", "www.", "WWW.")
      labels <- Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genLabel))
    } yield www + labels.mkString(".")
    val genUrl: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp")
      host <- genHost
      port <- Gen.oneOf("", ":80", ":443", ":8080", ":", ":x9")
      path <- Gen.oneOf("", "/", "/a", "/A/b/", "/a//b/", "/%20x")
      query <- Gen.oneOf("", "?", "?b=2&a=1", "?utm_source=x", "?a=1&a=1",
        "?ref=r&z", "?UTM_X=1&k")
      frag <- Gen.oneOf("", "#f", "#a#b")
      junk <- Gen.oneOf("", " ", "  ")
    } yield junk + scheme + "://" + host + port + path + query + frag
    def canon(s: String): String =
      VectorKernels.canonicalizeUrl(UTF8String.fromString(s)).toString
    check("canonicalizeUrl idempotent", Prop.forAll(genUrl) { u =>
      val c = canon(u)
      canon(c) == c
    })
    check("canonicalizeUrl structure", Prop.forAll(genUrl) { u =>
      val c = canon(u)
      // canonical form never carries a fragment, an unsorted query, or a
      // tracking param; host/scheme are lowercase
      val si = c.indexOf("://")
      si > 0 && {
        val scheme = c.substring(0, si)
        val qi = c.indexOf('?')
        val params = if (qi >= 0) c.substring(qi + 1).split("&").toSeq else Seq.empty
        scheme == scheme.toLowerCase &&
          !c.contains("#") &&
          params == params.sorted &&
          !params.exists(p => p.toLowerCase.startsWith("utm_") ||
            p.toLowerCase.startsWith("ref=") || p.toLowerCase == "ref") &&
          VectorKernels.urlHost(UTF8String.fromString(c)).toString ==
            VectorKernels.urlHost(UTF8String.fromString(u)).toString
      }
    })
    // non-URLs (no scheme) pass through trimmed and stay fixed points
    check("canonicalizeUrl non-url fixpoint", Prop.forAll(Gen.alphaNumStr) { s =>
      canon(s) == s.trim && canon(canon(s)) == canon(s)
    })
  }

  test("decodeHtmlEntities: escape round-trip, never lengthens, &-free fixpoint") {
    val genPiece: Gen[String] = Gen.frequency(
      4 -> Gen.alphaNumStr.map(_.take(6)),
      2 -> Gen.oneOf("&amp;", "&lt;", "&eacute;", "&nbsp;", "&mdash;"),
      2 -> Gen.oneOf("&#65;", "&#x42;", "&#;", "&#x;", "&# ", "&"),
      1 -> Gen.oneOf("&bogus;", "&amp;amp;", "&amp;#65;", ";", "#", " "))
    val genStr: Gen[String] = Gen.listOf(genPiece).map(_.mkString)
    def dec(s: String): String =
      VectorKernels.decodeHtmlEntities(UTF8String.fromString(s)).toString
    // the single-decode-level guarantee, stated as a round-trip: escaping
    // every '&' as &amp; then decoding once returns the original, no
    // matter what ref-shaped text the original carried
    check("decodeHtmlEntities escape round-trip", Prop.forAll(genStr) { s =>
      dec(s.replace("&", "&amp;")) == s
    })
    // every replacement (named, numeric, space-classed) is no longer than
    // its reference, so decode never lengthens
    check("decodeHtmlEntities never lengthens", Prop.forAll(genStr) { s =>
      dec(s).length <= s.length
    })
    check("decodeHtmlEntities &-free fixpoint", Prop.forAll(genStr) { s =>
      val noAmp = s.replace("&", "")
      dec(noAmp) == noAmp
    })
  }

  test("winnowedShingles: subset, guarantee, and density properties") {
    import graft.functions.WinnowKernels
    val genTok: Gen[String] = Gen.choose(1, 5)
      .flatMap(l => Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString))
    val genDoc: Gen[String] = Gen.choose(0, 40)
      .flatMap(k => Gen.listOfN(k, genTok).map(_.mkString(" ")))
    def winnow(s: String, n: Int, w: Int): Set[Long] =
      WinnowKernels.winnowedShingles(UTF8String.fromString(s), n, w).toSet
    def shingles(s: String, n: Int): Set[Long] =
      VectorKernels.hashedWordShingles(UTF8String.fromString(s), n).toSet
    // every selected print is one of the document's shingle hashes (same
    // token + hash identity — this is what lets candidates verify against
    // the full sets), and at least one print is selected whenever any
    // shingle exists
    check("winnow subset + nonempty", Prop.forAll(genDoc) { d =>
      val sh = shingles(d, 3)
      val wp = winnow(d, 3, 4)
      wp.subsetOf(sh) && (sh.isEmpty == wp.isEmpty)
    })
    // THE winnowing guarantee: planting a shared run of w+n-1 tokens into
    // two otherwise-unrelated documents forces a shared selected print
    val genPair = for {
      a <- genDoc; b <- genDoc
      run <- Gen.listOfN(6, genTok).map(_.mkString(" ")) // w+n-1 = 4+3-1 = 6
    } yield (s"$a $run $b".trim, s"$b $run $a".trim)
    check("winnow guarantee", Prop.forAll(genPair) { case (x, y) =>
      winnow(x, 3, 4).intersect(winnow(y, 3, 4)).nonEmpty
    })
    // selection thins the index: never more prints than windows, and long
    // random docs select well under half their positions
    check("winnow density", Prop.forAll(genDoc) { d =>
      val m = VectorKernels.hashedWordShingles(UTF8String.fromString(d), 3).length
      val sel = winnow(d, 3, 4).size
      sel <= math.max(1, m) && (m < 20 || sel <= (m * 2) / 3)
    })
  }

  test("zValue is monotonic per coordinate and within lane bounds") {
    import graft.write.ZOrder
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    import spark.implicits._
    // evaluate the column once over a grid, then check properties of the grid
    val bits = 4
    val grid = for { a <- 0 to 15; b <- 0 to 15 } yield (a, b)
    val z = grid.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.zValue(Seq(col("a"), col("b")), Seq(0.0, 0.0), Seq(15.0, 15.0), bits).as("z"))
      .as[(Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    grid.foreach { case (a, b) =>
      assert(z((a, b)) >= 0 && z((a, b)) < (1L << (2 * bits)), s"z out of range at ($a,$b)")
      if (a < 15) assert(z((a, b)) < z((a + 1, b)), s"not monotonic in a at ($a,$b)")
      if (b < 15) assert(z((a, b)) < z((a, b + 1)), s"not monotonic in b at ($a,$b)")
    }
    // bijective on the grid (no two cells share a key)
    assert(z.values.toSet.size === grid.size)
  }

  // --------------------------------------------------------------------------
  // tokenizer invariants (driver-side coder/DP paths, no Spark jobs)
  // --------------------------------------------------------------------------

  private val genTokWord: Gen[String] = for {
    n <- Gen.choose(1, 24)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ ('0' to '3')))
  } yield cs.mkString

  test("unigram log2fp: exact on powers of two, within 1 ulp-of-fixed-point elsewhere, monotone") {
    import graft.text.Unigram.log2fp
    check("log2fp pow2", Prop.forAll(Gen.choose(0, 62)) { k =>
      log2fp(1L << k) == (k.toLong << 16)
    })
    check("log2fp vs double reference", Prop.forAll(Gen.choose(1L, Long.MaxValue / 2)) { c =>
      val ref = math.floor(65536.0 * (math.log(c.toDouble) / math.log(2.0))).toLong
      math.abs(log2fp(c) - ref) <= 1L
    })
    check("log2fp monotone", Prop.forAll(Gen.choose(1L, Long.MaxValue / 2 - 1)) { c =>
      log2fp(c) <= log2fp(c + 1)
    })
  }

  test("unigram viterbi: pieces concat to the word; never beaten by greedy") {
    // vocab = random subset of the word's substrings plus all single chars
    // (so segmentation always exists without the UNK fallback)
    val genCase = for {
      w <- genTokWord
      all = (for { i <- 0 until w.length; j <- (i + 1) to math.min(w.length, i + 6) }
        yield w.substring(i, j)).distinct
      keepMask <- Gen.listOfN(all.size, Gen.choose(0, 2))
      scores <- Gen.listOfN(all.size, Gen.choose(-1000000L, -1L))
    } yield {
      val chars = w.map(_.toString).distinct
      val kept = all.zip(keepMask).zip(scores).collect {
        case ((p, keep), s) if keep == 0 || p.length == 1 => p -> s
      }.toMap
      val full = chars.map(ch => ch -> kept.getOrElse(ch, -500000L)).toMap ++ kept
      (w, full)
    }
    check("viterbi concat + optimality", Prop.forAll(genCase) { case (w, sc) =>
      val lookup: String => Long = p => sc.getOrElse(p, Long.MinValue)
      val pieces = graft.text.Unigram.viterbi(w, lookup, 6)
      val concatOk = pieces.mkString("") == w
      val vScore = pieces.map(lookup).sum
      // greedy longest-match under the same vocab
      var i = 0
      var gScore = 0L
      while (i < w.length) {
        var j = math.min(w.length, i + 6)
        while (j > i + 1 && lookup(w.substring(i, j)) == Long.MinValue) j -= 1
        gScore += lookup(w.substring(i, j))
        i = j
      }
      concatOk && vScore >= gScore
    })
  }

  test("wordpiece coder: pieces reassemble the word or the whole word is [UNK]") {
    val genCase = for {
      w <- genTokWord
      all = (for { i <- 0 until w.length; j <- (i + 1) to math.min(w.length, i + 6) }
        yield if (i == 0) w.substring(i, j) else "##" + w.substring(i, j)).distinct
      keepMask <- Gen.listOfN(all.size, Gen.choose(0, 3))
    } yield (w, all.zip(keepMask).collect { case (p, 0) => p })
    check("wordpiece reassembly", Prop.forAll(genCase) { case (w, vocab) =>
      if (vocab.isEmpty) true
      else {
        val coder = new graft.functions.WordPieceCoder(vocab.toArray)
        val out = coder.encode(UTF8String.fromString(w)).array
          .map(_.asInstanceOf[UTF8String].toString)
        if (out.sameElements(Array("[UNK]"))) true
        else out.zipWithIndex.map { case (p, idx) =>
          if (idx == 0) p else p.stripPrefix("##")
        }.mkString("") == w
      }
    })
  }
}
