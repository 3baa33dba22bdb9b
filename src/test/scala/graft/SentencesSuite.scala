package graft

import org.apache.spark.sql.functions.{col, lit}

class ChatSuite extends org.scalatest.funsuite.AnyFunSuite with SparkTest {
  import spark.implicits._
  import graft.text.Chat

  test("parseTurns: roles, offsets, invalid marker, empty content") {
    val turns = Seq("system: be brief\nuser: hi there\nassistant: \nnope\ntool: x: y")
      .toDF("t").select(Chat.parseTurns(col("t")).as("turns"))
      .selectExpr("inline(turns)")
      .as[(String, String)].collect().toSeq
    assert(turns == Seq(
      ("system", "be brief"), ("user", "hi there"), ("assistant", ""),
      ("", "nope"), ("tool", "x: y")))
  }

  test("chatStats: the strict alternation contract, violation by violation") {
    def stats(t: String) = Seq((1L, t)).toDF("id", "t")
      .transform(df => Chat.chatStats(df, col("id"), col("t")))
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(stats("system: s\nuser: a\nassistant: b\nuser: c\nassistant: d") ==
      ((1L, 5L, 2L, 2L, 0L, true)))
    assert(stats("user: a\nassistant: b") == ((1L, 2L, 1L, 1L, 0L, true)))
    assert(!stats("user: a\nuser: b")._6)                  // double user
    assert(!stats("assistant: b")._6)                      // starts with assistant
    assert(!stats("user: a\nsystem: late")._6)             // system not leading
    assert(!stats("user: a\nbad line")._6)                 // invalid line
    assert(!stats("user: a\ntool: t")._6)                  // tool breaks strict SFT
    assert(stats("user: a\nbad line")._5 == 1L)            // n_invalid
  }

  test("parseMessages: valid turns, quarantine markers, embedded newlines") {
    def turns(j: String) = Seq(j).toDF("j")
      .select(Chat.parseMessages(col("j")).as("turns"))
      .selectExpr("inline(turns)").as[(String, String)].collect().toSeq
    // the happy path, content embedding a newline the line format can't carry
    assert(turns("""{"messages": [{"role": "user", "content": "a\nb"},
                     {"role": "assistant", "content": "ok"}]}""") ==
      Seq(("user", "a\nb"), ("assistant", "ok")))
    // malformed JSON -> ONE invalid turn carrying the raw payload
    assert(turns("""{"messages": [{"role":""") ==
      Seq(("", """{"messages": [{"role":""")))
    // missing / empty messages -> one invalid turn
    assert(turns("""{"other": 1}""") == Seq(("", """{"other": 1}""")))
    assert(turns("""{"messages": []}""") == Seq(("", """{"messages": []}""")))
    // unknown role and null content -> per-message invalid markers
    assert(turns("""{"messages": [{"role": "narrator", "content": "x"},
                     {"role": "user"}]}""") == Seq(("", "x"), ("", "")))
  }

  test("messages format: stats and trim share the line-format algebra") {
    val j =
      """{"messages": [{"role": "system", "content": "one two three"},
         {"role": "user", "content": "a b\nc d"},
         {"role": "assistant", "content": "e f"}]}"""
    val st = Seq((1L, j)).toDF("id", "j")
      .transform(df => Chat.chatStatsMessages(df, col("id"), col("j")))
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(st == ((1L, 3L, 1L, 1L, 0L, true)))
    // trim: sys=3 charges first; budget 5 keeps only the last turn (2) —
    // the newline-bearing user turn (4 tokens) exceeds the remaining 2
    val kept = Seq((1L, j)).toDF("id", "j")
      .transform(df => Chat.truncateMessagesToBudget(df, col("id"), col("j"), 5L))
      .orderBy(col("turn_idx")).select(col("kept")).as[Boolean].collect().toSeq
    assert(kept == Seq(true, false, true))
    // a malformed row still appears in the audit (never dropped)
    val bad = Seq((2L, "{nope")).toDF("id", "j")
      .transform(df => Chat.chatStatsMessages(df, col("id"), col("j")))
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(bad == ((2L, 1L, 0L, 0L, 1L, false)))
  }

  test("rebuild: trimmed conversations reassemble to exactly the kept turns") {
    val t = "system: one two three\nuser: a b c d\nassistant: e f"
    // budget 5: system (3) pins, remaining 2 fits assistant (2), not user
    val line = Seq((1L, t)).toDF("id", "t")
      .transform(df => Chat.rebuildTranscript(df, col("id"), col("t"), 5L))
      .as[(Long, String)].head()
    assert(line == ((1L, "system: one two three\nassistant: e f")))
    // everything kept = identity, invalid lines re-emitted raw
    val full = Seq((1L, "user: a\nbad line")).toDF("id", "t")
      .transform(df => Chat.rebuildTranscript(df, col("id"), col("t"), 100L))
      .as[(Long, String)].head()
    assert(full == ((1L, "user: a\nbad line")))
    // nothing kept -> the conversation is absent
    val none = Seq((1L, "user: a b")).toDF("id", "t")
      .transform(df => Chat.rebuildTranscript(df, col("id"), col("t"), 1L))
    assert(none.count() == 0)
    // MESSAGES: rebuilt JSON round-trips to the kept turns, newline intact
    val j = """{"messages": [{"role": "system", "content": "one two three"},
       {"role": "user", "content": "a b\nc d"},
       {"role": "assistant", "content": "e f"}]}"""
    val rebuilt = Seq((1L, j)).toDF("id", "j")
      .transform(df => Chat.rebuildMessages(df, col("id"), col("j"), 5L))
    val turns = Chat.explodeMessages(rebuilt, col("id"), col("messages_json"))
      .orderBy("turn_idx")
      .select("role", "content").as[(String, String)].collect().toSeq
    assert(turns == Seq(("system", "one two three"), ("assistant", "e f")))
    // a kept newline-bearing turn survives serialization byte-for-byte
    val all = Seq((1L, j)).toDF("id", "j")
      .transform(df => Chat.rebuildMessages(df, col("id"), col("j"), 100L))
    val roundTrip = Chat.explodeMessages(all, col("id"), col("messages_json"))
      .orderBy("turn_idx").select("content").as[String].collect().toSeq
    assert(roundTrip(1) == "a b\nc d")
  }

  test("truncateToBudget: suffix fit, system pin charges the budget first") {
    val t = "system: one two three\nuser: a b c d\nassistant: e f\nuser: g\nassistant: h i j"
    def kept(budget: Long) = Seq((1L, t)).toDF("id", "t")
      .transform(df => Chat.truncateToBudget(df, col("id"), col("t"), budget))
      .orderBy(col("turn_idx"))
      .select(col("kept")).as[Boolean].collect().toSeq
    // tokens: sys=3, 4, 2, 1, 3; system always kept, charges budget first
    assert(kept(100L) == Seq(true, true, true, true, true))
    assert(kept(9L) == Seq(true, false, true, true, true))   // 3+2+1+3 = 9 fits
    assert(kept(7L) == Seq(true, false, false, true, true))  // 3+1+3
    assert(kept(3L) == Seq(true, false, false, false, false)) // only the pin
    assert(kept(0L) == Seq(true, false, false, false, false))
    // no system turn: plain suffix fit
    val noSys = Seq((1L, "user: a b\nassistant: c")).toDF("id", "t")
      .transform(df => Chat.truncateToBudget(df, col("id"), col("t"), 1L))
      .orderBy(col("turn_idx")).select(col("kept")).as[Boolean].collect().toSeq
    assert(noSys == Seq(false, true))
  }
}

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
