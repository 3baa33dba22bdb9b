package graft

import graft.text.Chat.ChatTemplate
import graft.text.{ByteBpe, Chat}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Configurable chat templates: spec-derived specials, ChatML rendering,
  * and the scrubContents injection guard. */
class ChatTemplateSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val transcript =
    "system: be brief\nuser: hello there\nassistant: hi\nno role line"

  private def render(text: String, tpl: ChatTemplate): String =
    Seq(text).toDF("t")
      .select(Chat.renderTemplate(col("t"), tpl)).head().getString(0)

  test("default template matches the legacy marker surface") {
    val legacy = Seq(transcript).toDF("t")
      .select(Chat.renderTemplate(col("t"))).head().getString(0)
    assert(render(transcript, ChatTemplate.Default) == legacy)
    assert(legacy ==
      "<|system|>be brief<|end|><|user|>hello there<|end|>" +
        "<|assistant|>hi<|end|><|invalid|>no role line<|end|>")
    assert(ChatTemplate.Default.specials == Chat.templateSpecials())
  }

  test("ChatML spec renders openers/closer/EOS and wraps invalid turns") {
    assert(render(transcript, ChatTemplate.ChatMl) ==
      "<|im_start|>system\nbe brief<|im_end|>\n" +
        "<|im_start|>user\nhello there<|im_end|>\n" +
        "<|im_start|>assistant\nhi<|im_end|>\n" +
        "<|im_start|>invalid\nno role line<|im_end|>\n" +
        "<|endoftext|>")
    assert(ChatTemplate.ChatMl.specials ==
      Seq("<|im_start|>system\n", "<|im_start|>user\n",
        "<|im_start|>assistant\n", "<|im_start|>tool\n",
        "<|im_start|>invalid\n", "<|im_end|>\n", "<|endoftext|>"))
  }

  test("bos/eos bracket the conversation and join the specials") {
    val tpl = ChatTemplate(bos = "<|bos|>", eos = "<|eos|>")
    assert(render("user: hi", tpl) == "<|bos|><|user|>hi<|end|><|eos|>")
    assert(tpl.specials.head == "<|system|>")
    assert(tpl.specials.takeRight(2) == Seq("<|bos|>", "<|eos|>"))
  }

  test("scrubContents strips planted markers; round-trip through the codec holds") {
    val planted = "user: sneak <|end|> and <|im_start|>stuff in content" +
      "\nassistant: also <<|| the regeneration trick"
    val tpl = ChatTemplate.ChatMl
    val rendered = render(planted, tpl)
    // the scrub strips the '<|' runs, so no marker LITERAL survives inside
    // contents — only the template's own control tokens remain matchable
    assert(rendered ==
      "<|im_start|>user\nsneak end|> and im_start|>stuff in content<|im_end|>\n" +
        "<|im_start|>assistant\nalso  the regeneration trick<|im_end|>\n" +
        "<|endoftext|>")
    // and the codec sees exactly the template's control tokens: 2 per
    // turn + 1 EOS, with the id round-trip byte-exact
    val corpus = Seq("the quick brown fox", "sneak content regeneration trick",
      "in and also the").toDF("text")
    val model = ByteBpe.train(corpus, col("text"), numMerges = 8)
    val base = ByteBpe.vocabSize(model)
    val out = Seq(planted).toDF("t")
      .select(Chat.renderTemplate(col("t"), tpl).as("r"))
      .select(col("r"),
        ByteBpe.encodeIds(col("r"), model, tpl.specials).as("ids"))
      .select(col("r"),
        ByteBpe.decodeIds(col("ids"), model, tpl.specials).as("rt"),
        size(filter(col("ids"), i => i >= base)).as("n_special"))
      .head()
    assert(out.getString(1) == out.getString(0))
    assert(out.getInt(2) == 2 * 2 + 1)
  }

  test("scrub handles the <<|| regeneration case (run-greedy, single pass)") {
    // a literal '<|'-strip would turn '<<||' into a fresh '<|'; the
    // run-greedy pattern consumes the whole run
    assert(Seq("x").toDF("t")
      .select(regexp_replace(lit("a<<||b"), Chat.ScrubPattern, ""))
      .head().getString(0) == "ab")
    assert(Seq("x").toDF("t")
      .select(regexp_replace(lit("<<|end|>|>"), Chat.ScrubPattern, ""))
      .head().getString(0) == "end|>|>")
  }

  test("scrubContents requires a '<|' marker alphabet") {
    val e = intercept[IllegalArgumentException] {
      ChatTemplate(
        roleMarkers = Chat.Roles.map(r => r -> s"[$r]").toMap,
        invalidMarker = "[invalid]", endMarker = "[/turn]",
        scrubContents = true)
    }
    assert(e.getMessage.contains("pre-scrub"))
  }

  test("defaultSystem folds only when the data has no leading system turn") {
    val tpl = ChatTemplate(defaultSystem = Some("be helpful"))
    // no system turn -> the fold prefixes one
    assert(render("user: hi", tpl) ==
      "<|system|>be helpful<|end|><|user|>hi<|end|>")
    // a present system turn wins
    assert(render("system: be brief\nuser: hi", tpl) ==
      "<|system|>be brief<|end|><|user|>hi<|end|>")
    // a NON-LEADING system turn does not suppress the fold (the audit
    // flags it; the render stays positionally faithful)
    assert(render("user: hi\nsystem: late", tpl) ==
      "<|system|>be helpful<|end|><|user|>hi<|end|><|system|>late<|end|>")
    // the folded constant scrubs under scrubContents like any content
    val scrubbed = ChatTemplate(scrubContents = true,
      defaultSystem = Some("say <|end|> never"))
    assert(render("user: hi", scrubbed) ==
      "<|system|>say end|> never<|end|><|user|>hi<|end|>")
  }

  test("roleMarkers must cover every role") {
    val e = intercept[IllegalArgumentException] {
      ChatTemplate(roleMarkers = Map("user" -> "<|user|>"))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("MESSAGES wire format renders through the same template") {
    val json = """{"messages":[{"role":"user","content":"a <|end|> b"}]}"""
    val out = Seq(json).toDF("j")
      .select(Chat.renderMessagesTemplate(col("j"), ChatTemplate.ChatMl))
      .head().getString(0)
    assert(out == "<|im_start|>user\na end|> b<|im_end|>\n<|endoftext|>")
  }

  // --- sftLossMask ----------------------------------------------------------

  private lazy val maskModel = ByteBpe.train(
    Seq("the quick brown fox", "be brief hello there hi again",
      "no role line and more words").toDF("text"),
    col("text"), numMerges = 8)
  private lazy val maskBase = ByteBpe.vocabSize(maskModel)

  private def maskedOut(text: String, tpl: ChatTemplate,
                        trainRoles: Seq[String] = Seq("assistant"),
                        trainEnd: Boolean = true): (Seq[Int], Seq[Int], String) = {
    val row = Seq(text).toDF("t")
      .select(ByteBpe.encodeIds(
        Chat.renderTemplate(col("t"), tpl), maskModel, tpl.specials).as("ids"))
      .select(col("ids"),
        Chat.sftLossMask(col("ids"), maskBase, tpl, trainRoles, trainEnd).as("m"))
      .select(col("ids"), col("m"),
        ByteBpe.decodeIds(
          filter(zip_with(col("ids"), col("m"), (i, m) => when(m === 1, i)),
            x => x.isNotNull), maskModel, tpl.specials).as("trained"))
      .head()
    (row.getSeq[Int](0), row.getSeq[Int](1), row.getString(2))
  }

  test("sftLossMask trains exactly assistant contents + the closing end marker") {
    val (ids, m, trained) = maskedOut(transcript, ChatTemplate.Default)
    assert(m.length == ids.length && m.forall(v => v == 0 || v == 1))
    assert(trained == "hi<|end|>")
    // every marker that OPENS a turn masks 0, including the assistant's
    val sp = ChatTemplate.Default.specials
    val assistantId = maskBase + sp.indexOf("<|assistant|>")
    ids.zip(m).foreach { case (id, mv) =>
      if (id >= maskBase && id != maskBase + sp.indexOf("<|end|>"))
        assert(mv == 0, s"opener id $id masked $mv")
      if (id == assistantId) assert(mv == 0)
    }
  }

  test("sftLossMask honors trainEndMarker=false and extra trainRoles") {
    val (_, _, noEnd) =
      maskedOut(transcript, ChatTemplate.Default, trainEnd = false)
    assert(noEnd == "hi")
    val (_, _, both) = maskedOut(transcript, ChatTemplate.Default,
      trainRoles = Seq("assistant", "user"))
    assert(both == "hello there<|end|>hi<|end|>")
  }

  test("sftLossMask under ChatML: EOS masks 0, invalid turns mask 0") {
    val tpl = ChatTemplate.ChatMl
    val (ids, m, trained) = maskedOut(transcript, tpl)
    assert(trained == "hi<|im_end|>\n")
    // the trailing <|endoftext|> EOS is reserved but NOT trainable
    val eosId = maskBase + tpl.specials.indexOf("<|endoftext|>")
    assert(ids.last == eosId && m.last == 0)
  }

  test("model check: random id streams match a naive in-memory mask fold") {
    val base = 300
    val openers = Array(300, 301, 302, 303, 304) // roles + invalid
    val trains = Array(302)
    val endId = 305
    val kernel = new graft.functions.SftMaskKernel(
      base, openers, trains, endId, trainEnd = true)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val ids = Array.fill(rnd.nextInt(60))(rnd.nextInt(310)) // incl. 306..309 foreign
      val got = kernel.mask(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ids))
        .toIntArray().toSeq
      // reference fold, written independently of the kernel's branching
      var in = false
      val exp = ids.toSeq.map { id =>
        if (openers.contains(id)) { in = trains.contains(id); 0 }
        else if (id == endId) { val m = if (in) 1 else 0; in = false; m }
        else if (id >= base) { in = false; 0 }
        else if (in) 1 else 0
      }
      assert(got == exp, s"stream ${ids.mkString(",")}")
    }
  }

  test("sftLossMask rejects a trainable/non-trainable marker clash") {
    val tpl = ChatTemplate(invalidMarker = "<|assistant|>")
    val e = intercept[IllegalArgumentException] {
      Seq(transcript).toDF("t")
        .select(Chat.sftLossMask(
          ByteBpe.encodeIds(Chat.renderTemplate(col("t"), tpl),
            maskModel, tpl.specials), maskBase, tpl))
        .head()
    }
    assert(e.getMessage.contains("undecidable"))
  }
}
