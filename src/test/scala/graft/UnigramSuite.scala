package graft

import graft.text.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram tokenizer: exact fixed-point log2, Viterbi-vs-greedy global
  * optimality, unknown-char fallback, training determinism, kernel ==
  * driver segmentation, save/load. */
class UnigramSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  test("log2fp is the exact floor(2^16 * log2 c)") {
    assert(Unigram.log2fp(1L) == 0L)
    assert(Unigram.log2fp(2L) == (1L << 16))
    assert(Unigram.log2fp(4L) == (2L << 16))
    assert(Unigram.log2fp(1L << 40) == (40L << 16))
    // floor(65536 * log2 3) = floor(103872.19...) = 103872
    assert(Unigram.log2fp(3L) == 103872L)
    // floor(65536 * log2 10) = floor(217705.97...) = 217705
    assert(Unigram.log2fp(10L) == 217705L)
    // monotone over a range
    var prev = -1L
    (1L to 5000L).foreach { c =>
      val v = Unigram.log2fp(c)
      assert(v >= prev, s"log2fp not monotone at $c")
      prev = v
    }
  }

  test("viterbi picks the GLOBAL optimum where greedy longest-match fails") {
    // scores: greedy would take "ab" then be forced into expensive "c";
    // the global best is "a" + "bc"
    val sc = Map("a" -> -2L, "b" -> -5L, "c" -> -10L, "ab" -> -1L, "bc" -> -2L)
    val lookup: String => Long = p => sc.getOrElse(p, Long.MinValue)
    assert(Unigram.viterbi("abc", lookup, 3).toSeq == Seq("a", "bc"))
    // and when "ab"+"c" IS the best, it wins
    val sc2 = Map("a" -> -2L, "b" -> -5L, "c" -> -1L, "ab" -> -1L, "bc" -> -9L)
    val lookup2: String => Long = p => sc2.getOrElse(p, Long.MinValue)
    assert(Unigram.viterbi("abc", lookup2, 3).toSeq == Seq("ab", "c"))
  }

  test("unknown characters segment as themselves at the fixed penalty") {
    val sc = Map("a" -> -1L, "b" -> -1L, "ab" -> -1L)
    val lookup: String => Long = p => sc.getOrElse(p, Long.MinValue)
    assert(Unigram.viterbi("a9b", lookup, 2).toSeq == Seq("a", "9", "b"))
  }

  test("training is deterministic; pieces concat back to each word") {
    val docs = spark.range(0, 200).select(
      concat(lit("alpha beta gamma alphabet betagamma doc"),
        col("id").cast("string"), lit(" word wording")).as("t"))
    val m1 = Unigram.train(docs, col("t"), vocabSize = 120, seedSize = 1024)
    val m2 = Unigram.train(docs, col("t"), vocabSize = 120, seedSize = 1024)
    assert(m1 == m2)
    // segmentation covers: pieces of each word concatenate to the word
    val enc = docs.select(col("t"),
      Unigram.encode(col("t"), m1).as("p")).head()
    val rebuilt = enc.getSeq[String](1).mkString("")
    val plain = enc.getString(0).toLowerCase.replaceAll("[^a-z0-9]+", "")
    assert(rebuilt == plain)
  }

  test("frequent multi-char pieces survive training and shorten encodings") {
    val docs = spark.range(0, 500).select(
      lit("internationalization internationalization antidisestablishment").as("t"))
    val m = Unigram.train(docs, col("t"), vocabSize = 100, seedSize = 2048,
      maxPieceLen = 10)
    val n = docs.select(size(Unigram.encode(col("t"), m))).head().getInt(0)
    // 3 words of ~20 chars each; with learned 10-char pieces the stream
    // must be far below the 60-ish single-char fallback
    assert(n <= 12, s"expected multi-char pieces to dominate, got $n tokens")
  }

  test("kernel encode equals the driver-side viterbi on every word") {
    val docs = spark.range(0, 50).select(
      concat(lit("streaming analytics engine doc"), col("id").cast("string")).as("t"))
    val m = Unigram.train(docs, col("t"), vocabSize = 80, seedSize = 512)
    val sc = m.pieces.zip(m.scores).toMap
    val lookup: String => Long = p => sc.getOrElse(p, Long.MinValue)
    val maxLen = m.pieces.map(_.length).max
    val rows = docs.select(col("t"), Unigram.encode(col("t"), m).as("p")).collect()
    rows.foreach { r =>
      val words = r.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val expected = words.flatMap(w => Unigram.viterbi(w, lookup, maxLen)).toSeq
      assert(r.getSeq[String](1) == expected)
    }
  }

  test("pathological out-of-vocab runs saturate at the floor, never wrap") {
    // >2^23 UNK chars would overflow a naive Long accumulation
    // (2^23 * 2^40 > 2^63); the saturating add must keep a sane
    // one-char-per-position segmentation instead of garbage
    val sc = Map("a" -> -1L)
    val lookup: String => Long = p => sc.getOrElse(p, Long.MinValue)
    val w = "9" * ((1 << 23) + 10)
    val pieces = Unigram.viterbi(w, lookup, 4)
    assert(pieces.length == w.length)
    assert(pieces.forall(_ == "9"))
  }

  test("two encode columns over one model are semantically equal (CSE)") {
    // Seq (not Array) params: element-wise case-class equality, so
    // size(encode) + concat_ws(encode) in one select collapses to ONE
    // Viterbi evaluation under subexpression elimination. With Array
    // params each column built fresh arrays and was never semanticEqual.
    import graft.functions.UnigramEncode
    import org.apache.spark.sql.catalyst.expressions.Literal
    val m1 = Unigram.UnigramModel(Vector("a", "b", "ab"), Vector(1L, 2L, 3L))
    val m2 = Unigram.UnigramModel(Vector("a", "b", "ab"), Vector(1L, 2L, 3L))
    val e1 = UnigramEncode(Literal("abab"), m1.pieces, m1.scores)
    val e2 = UnigramEncode(Literal("abab"), m2.pieces, m2.scores)
    assert(e1.semanticEquals(e2), "fresh model instances must stay CSE-able")
    assert(e1 == e2)
    // the gate shape: both derived columns in one projection agree
    val row = Seq("abab").toDF("t")
      .select(size(Unigram.encode(col("t"), m1)).as("n"),
        concat_ws(" ", Unigram.encode(col("t"), m2)).as("s"))
      .head()
    assert(row.getInt(0) == row.getString(1).split(" ").length)
  }

  test("save/load round-trips the model exactly") {
    val docs = spark.range(0, 50).select(
      concat(lit("alpha beta gamma doc"), col("id").cast("string")).as("t"))
    val m = Unigram.train(docs, col("t"), vocabSize = 80, seedSize = 512)
    val dir = java.nio.file.Files.createTempDirectory("graft_ug").toString + "/m"
    Unigram.saveUnigram(spark, m, dir)
    val loaded = Unigram.loadUnigram(spark, dir)
    assert(loaded == m)
  }
}
