package graft

import graft.text.Sentences
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sentence split + budget-line chunking: segmentation rules, chunk
  * assignment, never-split-a-sentence, empty edges. */
class SentencesSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def sents(t: String): Seq[String] =
    Seq(Tuple1(t)).toDF("t")
      .select(Sentences.splitSentences(col("t")).as("s"))
      .head().getSeq[String](0)

  test("terminator runs, trailing fragments, and empties") {
    assert(sents("One two. Three! Four?? Five tail") ==
      Seq("One two.", "Three!", "Four??", "Five tail"))
    assert(sents("no terminator at all") == Seq("no terminator at all"))
    assert(sents("") == Seq.empty)
    assert(sents("...") == Seq.empty) // punctuation-only: no sentence content
  }

  test("chunks break on the budget line and never split a sentence") {
    // tokens: 3, 3, 3, 3 with budget 5 -> tokens-before: 0,3,6,9 ->
    // chunks 0,0,1,1
    val df = Seq((1L, "a b c. d e f. g h i. j k l.")).toDF("id", "t")
    val out = Sentences.chunkBySentences(df, col("id"), col("t"), 5)
      .orderBy("chunk_id").collect()
    assert(out.map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSeq ==
      Seq((0L, 2, 6L), (1L, 2, 6L)))
    assert(out.map(_.getString(4)).toSeq ==
      Seq("a b c. d e f.", "g h i. j k l."))
  }

  test("one oversized sentence still lands whole in its own chunk") {
    val df = Seq((1L, "a. one two three four five six seven eight. b.")).toDF("id", "t")
    val out = Sentences.chunkBySentences(df, col("id"), col("t"), 3)
      .orderBy("chunk_id").collect()
    // tokens-before: 0, 1, 9 -> chunks 0, 0, 3 (the long sentence is not cut)
    assert(out.map(r => (r.getLong(1), r.getString(4))).toSeq ==
      Seq((0L, "a. one two three four five six seven eight."), (3L, "b.")))
  }

  test("idName keeps the caller's id column name; collisions fail fast") {
    val df = Seq((1L, "a b. c d.")).toDF("doc_id", "t")
    val out = Sentences.chunkBySentences(df, col("doc_id"), col("t"), 5,
      idName = "doc_id")
    assert(out.columns.head == "doc_id")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val e = intercept[IllegalArgumentException] {
      Sentences.chunkBySentences(df, col("doc_id"), col("t"), 5,
        idName = "chunk_id")
    }
    assert(e.getMessage.contains("collides"))
  }

  test("empty and whitespace docs produce no chunks; plan stays narrow") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "x.")).toDF("id", "t")
    val out = Sentences.chunkBySentences(df, col("id"), col("t"), 5)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
