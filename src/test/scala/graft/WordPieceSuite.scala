package graft

import graft.text.WordPiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece: deterministic vocab selection, greedy longest-match encode,
  * [UNK] fallback, save/load round-trip, BPE disagreement. */
class WordPieceSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  test("trainFromCounts scores every occurrence and keeps the char base") {
    // "abab" x 3: word-initial pieces a/ab/aba/abab, continuations
    // ##b/##ba/##bab/##a/##ab/##b... — single chars a, ##b, ##a always kept
    val m = WordPiece.trainFromCounts(Array(("abab", 3L)), vocabSize = 5,
      maxPieceLen = 4)
    val base = m.pieces.filter(p =>
      (if (p.startsWith("##")) p.length - 2 else p.length) == 1)
    assert(base.toSet == Set("a", "##a", "##b"))
    assert(m.pieces.length == 5)
    // highest-scoring multi-char candidates: ##ab occurs once per word
    // (pos 2) x3 = 3... compute: candidates and scores replicated by hand
    // a:3 ab:3 aba:3 abab:3 ##b:6 ##ba:3 ##bab:3 ##a:3 ##ab:3
    // top-2 non-base by (score desc, piece asc): score 3 group sorted
    // lexicographically: "##ab" < "##ba" < "##bab" < "ab" < "aba" < "abab"
    assert(m.pieces.toSet == Set("a", "##a", "##b", "##ab", "##ba"))
  }

  test("greedy longest-match-first encode with continuations") {
    val m = WordPiece.WordPieceModel(Vector(
      "un", "##able", "##b", "##a", "##l", "##e", "u", "##n", "a", "able"))
    val df = Seq(Tuple1("unable able u")).toDF("t")
    val got = df.select(WordPiece.encode(col("t"), m).as("p"))
      .head().getSeq[String](0)
    assert(got == Seq("un", "##able", "able", "u"))
  }

  test("a position with no piece yields [UNK] for the whole word") {
    val m = WordPiece.WordPieceModel(Vector("x", "##y"))
    val df = Seq(Tuple1("xy xz zz x")).toDF("t")
    val got = df.select(WordPiece.encode(col("t"), m).as("p"))
      .head().getSeq[String](0)
    assert(got == Seq("x", "##y", "[UNK]", "[UNK]", "x"))
  }

  test("training vocab never UNKs its own corpus; save/load round-trips") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat"),
      (3L, "concatenation of catastrophic categories")).toDF("id", "text")
    val m = WordPiece.train(docs, col("text"), vocabSize = 40)
    val toks = docs.select(explode(WordPiece.encode(col("text"), m)).as("p"))
    assert(toks.where(col("p") === "[UNK]").count() == 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_wp").toString
    WordPiece.saveWordPiece(spark, m, dir)
    val m2 = WordPiece.loadWordPiece(spark, dir)
    assert(m2.pieces.toSet == m.pieces.toSet)
    val a = docs.select(concat_ws(" ", WordPiece.encode(col("text"), m)).as("s"))
      .collect().map(_.getString(0)).toSeq
    val b = docs.select(concat_ws(" ", WordPiece.encode(col("text"), m2)).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(a == b)
  }

  test("wordpiece and bpe segment the same corpus differently") {
    val docs = Seq((1L, "internationalization internationalism international"),
      (2L, "nation nationalism rationalization")).toDF("id", "text")
    val wp = WordPiece.train(docs, col("text"), vocabSize = 60)
    val bpe = graft.text.Bpe.train(docs, col("text"), numMerges = 30)
    val a = docs.select(concat_ws(" ", WordPiece.encode(col("text"), wp)).as("s"))
      .collect().map(_.getString(0)).mkString("|")
    val b = docs.select(concat_ws(" ", graft.text.Bpe.encode(col("text"), bpe)).as("s"))
      .collect().map(_.getString(0)).mkString("|")
    assert(a != b)
  }

  test("encode plan stays whole-stage-codegen (no udf, narrow)") {
    // a file-backed scan (a local relation would constant-fold the kernel)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = WordPiece.train(docs.limit(50), col("text"), vocabSize = 80)
    val plan = docs.select(WordPiece.encode(col("text"), m))
      .queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen stage marker in the plan string
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"))
  }
}
