package graft

import graft.functions.ByteBpeKernels
import graft.text.ByteBpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE: the pre-token scanner's alternation semantics, display
  * mapping bijection, deterministic training, save/load round-trip, and
  * the codegen pin. */
class ByteBpeSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def pre(s: String): Seq[String] =
    ByteBpeKernels.preTokenize(s.getBytes("UTF-8")).toSeq
      .map(ByteBpeKernels.display)

  test("pre-tokenizer: contractions, space attachment, class runs") {
    // Ġ is the display form of 0x20
    assert(pre("it's fine") == Seq("it", "'s", "Ġfine"))
    assert(pre("they'll we're I'm") ==
      Seq("they", "'ll", "Ġwe", "'re", "ĠI", "'m"))
    // apostrophe after a space is an OTHER run, not a contraction
    assert(pre("it 's") == Seq("it", "Ġ'", "s"))
    // class splits: letters / digits / punctuation, space attaches once
    assert(pre("v2.0 x!") == Seq("v", "2", ".", "0", "Ġx", "!"))
  }

  test("pre-tokenizer: whitespace runs, the (?!\\S) backtrack, edges") {
    // run of 3 spaces before a word: first two are one token, the last
    // attaches to the word
    assert(pre("a   b") == Seq("a", "ĠĠ", "Ġb"))
    // trailing whitespace run is ONE token
    assert(pre("a  ") == Seq("a", "ĠĠ"))
    // a non-space single whitespace stands alone (no ` ?` attachment)
    assert(pre("a\nb") == Seq("a", "Ċ", "b"))
    // tab+newline run before a word: run-minus-last, then single newline
    assert(pre("a\t\nb") == Seq("a", "ĉ", "Ċ", "b"))
    assert(pre("") == Seq.empty)
    assert(pre("  lead") == Seq("Ġ", "Ġlead"))
  }

  test("pre-tokenizer: multi-byte UTF-8 groups with letters") {
    // é = 0xC3 0xA9, both >= 0x80 -> letter class, joins the run
    assert(pre("café x") == Seq("cafÃ©".map(c =>
      ByteBpeKernels.byteToChar(c.toInt)).mkString, "Ġx"))
  }

  test("display mapping is a bijection over all 256 bytes") {
    val all = (0 until 256).map(_.toChar).mkString
    assert(ByteBpeKernels.fromDisplay(ByteBpeKernels.display(all)) == all)
    assert(ByteBpeKernels.display(all).toSet.size == 256)
    // 0x20 maps to the GPT-2 'Ġ'
    assert(ByteBpeKernels.display(" ") == "Ġ")
  }

  test("training is deterministic and case/punctuation-faithful; save/load round-trips") {
    val docs = Seq.fill(8)("Low low LOW lower lowest").toDF("text")
    val m1 = ByteBpe.train(docs, col("text"), numMerges = 10)
    val m2 = ByteBpe.train(docs, col("text"), numMerges = 10)
    assert(m1 == m2)
    val enc = docs.limit(1)
      .select(concat_ws(" ", ByteBpe.encode(col("text"), m1)).as("s"))
      .as[String].head()
    // case survives: "Low" and "low" tokenize differently
    assert(enc.contains("L"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bbpe").toString
    ByteBpe.saveByteBpe(spark, m1, dir)
    assert(ByteBpe.loadByteBpe(spark, dir) == m1)
    // counts come from the same kernel
    val n = docs.limit(1)
      .select(ByteBpe.tokenCount(col("text"), m1)).as[Long].head()
    assert(n > 0 && n == enc.split(" ").length)
  }

  test("encode matches a tuple-keyed reference on separator-hostile inputs") {
    // symbols may contain ANY byte (spaces, NUL) — a separator-joined rank
    // key would collide distinct pairs with equal concatenation; the
    // reference below keys ranks by the (left, right) TUPLE, so any
    // divergence flags a key-ambiguity bug in the kernel
    import graft.functions.ByteBpeKernels
    def refEncode(text: String, merges: IndexedSeq[(String, String)]): Seq[String] = {
      val ranks = merges.zipWithIndex.groupBy(_._1)
        .map { case (p, xs) => p -> xs.map(_._2).min }
      ByteBpeKernels.preTokenize(text.getBytes("UTF-8")).toSeq.flatMap { w =>
        var syms = w.map(_.toString).toVector
        var done = syms.length < 2
        while (!done) {
          val cand = syms.indices.dropRight(1)
            .flatMap(i => ranks.get((syms(i), syms(i + 1))).map(r => (r, syms(i), syms(i + 1))))
          if (cand.isEmpty) done = true
          else {
            val (_, bl, br) = cand.minBy(_._1)
            val out = Vector.newBuilder[String]
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
        syms.map(ByteBpeKernels.display)
      }
    }
    val rng = new scala.util.Random(77)
    val alphabet = " \t\n!a1\u0000\u0001."
    def randStr(maxLen: Int) =
      Seq.fill(1 + rng.nextInt(maxLen))(alphabet(rng.nextInt(alphabet.length))).mkString
    (0 until 40).foreach { trial =>
      // merges built from random splits of random strings — including
      // colliding-concatenation pairs by construction
      val merges = IndexedSeq.fill(6) {
        val s = randStr(4) + randStr(2)
        val cut = 1 + rng.nextInt(math.max(1, s.length - 1))
        (s.substring(0, cut), s.substring(cut))
      }
      val text = randStr(12)
      val got = Seq(text).toDF("t")
        .select(graft.functions.vectors.byte_bpe_encode(col("t"), merges).as("e"))
        .head().getSeq[String](0)
      assert(got == refEncode(text, merges),
        s"trial $trial: text=${text.map(_.toInt)} merges=$merges got=$got")
    }
  }

  test("SQL-artifact path: byte_bpe_encode_model == the API encode") {
    val docs = Seq.fill(6)("pack my box with five dozen jugs").toDF("text")
    val m = ByteBpe.train(docs, col("text"), numMerges = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_bbsqlt").toString + "/m"
    ByteBpe.saveByteBpe(spark, m, dir)
    graft.GraftExtensions.registerAll(spark)
    docs.limit(1).createOrReplaceTempView("bb_docs_t")
    val viaSql = spark.sql(
      s"SELECT concat_ws(' ', byte_bpe_encode_model('$dir', text)) AS s FROM bb_docs_t")
      .as[String].head()
    val viaApi = docs.limit(1)
      .select(concat_ws(" ", ByteBpe.encode(col("text"), m)).as("s"))
      .as[String].head()
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("encode plan stays whole-stage-codegen (no udf, narrow)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = ByteBpe.train(docs.limit(50), col("text"), numMerges = 20)
    val plan = docs.select(ByteBpe.encode(col("text"), m))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"))
  }
}
