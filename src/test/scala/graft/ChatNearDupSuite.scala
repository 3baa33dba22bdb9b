package graft

import graft.text.Chat
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conversation-level near-dup: the fingerprint is the content-only
  * canonical form — role scaffolding and turn boundaries must not split
  * or join duplicates. */
class ChatNearDupSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val dialogue =
    "the quick brown fox jumps over the lazy dog and keeps running far away today"

  private def lines(roles: Seq[String]): String = {
    val parts = dialogue.split(" ").grouped(7).map(_.mkString(" ")).toSeq
    parts.zipWithIndex
      .map { case (p, i) => s"${roles(i % roles.size)}: $p" }.mkString("\n")
  }

  test("conversationContent drops roles, keeps contents in order") {
    val df = Seq("system: be brief\nuser: hello there\nassistant: hi")
      .toDF("t")
    val c = df.select(Chat.conversationContent(col("t"))).head().getString(0)
    assert(c == "be brief\nhello there\nhi")
    // invalid line contributes its raw text (never dropped)
    val inv = Seq("user: ok\nno role here").toDF("t")
    assert(inv.select(Chat.conversationContent(col("t"))).head().getString(0)
      == "ok\nno role here")
    // NULL transcript reads as one empty turn
    assert(Seq(Option.empty[String]).toDF("t")
      .select(Chat.conversationContent(col("t"))).head().getString(0) == "")
  }

  test("role-scrambled re-wraps pair at jaccard 1.0; unrelated do not pair") {
    val a = lines(Seq("user", "assistant"))
    val b = lines(Seq("assistant", "user", "system")) // same content, new roles
    val other = "user: completely different subject matter entirely about " +
      "gardening soil compost quality and the joy of tomatoes in summer"
    val df = Seq((1L, a), (2L, b), (3L, other)).toDF("id", "t")
    val pairs = Chat.conversationNearDupPairs(df, col("id"), col("t"),
      threshold = 0.8)
      .select(col("idA"), col("idB"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("turn boundaries stay out of the fingerprint (re-chunked turns still pair)") {
    val parts = dialogue.split(" ")
    val a = s"user: ${parts.take(6).mkString(" ")}\n" +
      s"assistant: ${parts.drop(6).mkString(" ")}"
    val b = s"user: ${parts.take(10).mkString(" ")}\n" +
      s"assistant: ${parts.drop(10).mkString(" ")}"
    val df = Seq((1L, a), (2L, b)).toDF("id", "t")
    val pairs = Chat.conversationNearDupPairs(df, col("id"), col("t"),
      threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSeq
    // shingles crossing the moved boundary differ slightly — near, not 1.0
    assert(pairs.size == 1 && pairs.head._1 == 1L && pairs.head._2 == 2L)
    assert(pairs.head._3 >= 0.7)
  }

  test("renderTemplate wraps turns in control tokens; invalid turns surfaced") {
    val df = Seq(
      "system: be brief\nuser: hi\nassistant: hello",
      "user: ok\nno role here",
      "").toDF("t")
    val got = df.select(Chat.renderTemplate(col("t"))).collect()
      .map(_.getString(0))
    assert(got(0) ==
      "<|system|>be brief<|end|><|user|>hi<|end|><|assistant|>hello<|end|>")
    assert(got(1) == "<|user|>ok<|end|><|invalid|>no role here<|end|>")
    // empty transcript = one empty invalid turn (never dropped)
    assert(got(2) == "<|invalid|><|end|>")
    // the render + P63g specials give one reserved id per control token
    val model = graft.text.ByteBpe.train(
      df.filter(length(col("t")) > 0), col("t"), numMerges = 5)
    val sp = Chat.templateSpecials()
    val base = graft.text.ByteBpe.vocabSize(model)
    val ids = df.limit(1).select(graft.text.ByteBpe.encodeIds(
      Chat.renderTemplate(col("t")), model, sp)).head().getSeq[Int](0)
    assert(ids.count(_ >= base) == 6) // 3 turns x (role + end)
    // MESSAGES twin renders the same template
    val m = Seq("""{"messages": [{"role": "user", "content": "a\nb"}]}""")
      .toDF("j")
    assert(m.select(Chat.renderMessagesTemplate(col("j"))).head().getString(0)
      == "<|user|>a\nb<|end|>")
  }

  test("MESSAGES-format twin pairs the same dialogues") {
    def msgs(roles: Seq[String]): String = {
      val parts = dialogue.split(" ").grouped(7).map(_.mkString(" ")).toSeq
      val arr = parts.zipWithIndex.map { case (p, i) =>
        s"""{"role": "${roles(i % roles.size)}", "content": "$p"}"""
      }.mkString(", ")
      s"""{"messages": [$arr]}"""
    }
    val df = Seq(
      (1L, msgs(Seq("user", "assistant"))),
      (2L, msgs(Seq("assistant", "user")))).toDF("id", "j")
    val pairs = Chat.conversationNearDupPairsMessages(df, col("id"), col("j"),
      threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }
}
