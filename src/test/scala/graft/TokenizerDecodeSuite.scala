package graft

import graft.text.{Bpe, ByteBpe, Unigram, WordPiece}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Detokenizers: byte-BPE decode is the EXACT inverse of encode for every
 * string; the lossy families honor their documented whitespace contracts
 * (no-marker streams concatenate the ascii token stream, WordPiece's `##`
 * marks rebuild space-joined words).
 */
class TokenizerDecodeSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // every scanner path + unicode hazards (the SparkEntry hazard rows plus
  // emoji/CJK/mixed-script stress)
  private val hazards = Seq(
    "it's the'll 've 'd mix",
    "Hello World HELLO hello",
    "a  b   c\td\ne f  ",
    "version 2.0 has 123 bugs, v2>v1!",
    "café naïve €9",
    "",
    "'s start and end'",
    "  leading spaces",
    "汉字 and ひらがな mixed",
    "emoji 🙂🙃 pair",
    "tab\tnewline\ncarriage\rmix",
    "ümlaut ÄÖÜ ß")

  test("byte-BPE decode(encode(x)) == x for every hazard, any model") {
    val docs = hazards.toDF("text")
    val model = ByteBpe.train(
      docs.filter(length(col("text")) > 0), col("text"), numMerges = 30)
    val got = docs
      .select(col("text"), ByteBpe.decode(ByteBpe.encode(col("text"), model))
        .as("rt"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0),
      s"round-trip broke on: ${r.getString(0)}"))
  }

  test("byte-BPE decode is model-free (raw pre-token stream inverts too)") {
    val docs = hazards.toDF("text")
    val enc = graft.functions.vectors.byte_bpe_encode(
      col("text"), IndexedSeq.empty)
    val got = docs
      .select(col("text"), ByteBpe.decode(enc).as("rt")).collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0)))
  }

  test("byte-BPE decode: nulls propagate; null elements skipped; bad display char fails") {
    val row = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
    assert(row.select(graft.functions.vectors.byte_bpe_decode(col("toks")))
      .head().isNullAt(0))
    val withNullElem = Seq(Tuple1(Seq[String](null, "ab", null)))
      .toDF("toks")
    assert(withNullElem
      .select(graft.functions.vectors.byte_bpe_decode(col("toks")))
      .head().getString(0) == "ab")
    val bad = Seq(Tuple1(Seq("汉"))).toDF("toks")
    val e = intercept[Exception] {
      bad.select(graft.functions.vectors.byte_bpe_decode(col("toks")))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("byte_bpe_decode is SQL-registered and inverts the SQL encode") {
    GraftExtensions.registerAll(spark)
    val docs = hazards.toDF("t")
    val root = java.nio.file.Files
      .createTempDirectory("graft_sqldecode").toString
    val model = ByteBpe.train(
      docs.filter(length(col("t")) > 0), col("t"), numMerges = 20)
    ByteBpe.saveByteBpe(spark, model, s"$root/bb")
    docs.createOrReplaceTempView("sql_decode_docs")
    val bad = spark.sql(
      s"SELECT t, byte_bpe_decode(byte_bpe_encode_model('$root/bb', t)) AS rt " +
        "FROM sql_decode_docs").filter(col("rt") =!= col("t")).count()
    assert(bad == 0L)
  }

  test("byte-BPE token-ID codec: ids round-trip, GPT-2 vocab construction") {
    val docs = hazards.toDF("text")
    val model = ByteBpe.train(
      docs.filter(length(col("text")) > 0), col("text"), numMerges = 30)
    assert(ByteBpe.vocabSize(model) == 256 + model.merges.length)
    // ids are the token stream re-labeled: same count, exact round-trip
    val got = docs.select(col("text"),
      ByteBpe.decodeIds(ByteBpe.encodeIds(col("text"), model), model).as("rt"),
      size(ByteBpe.encodeIds(col("text"), model)).as("nIds"),
      size(ByteBpe.encode(col("text"), model)).as("nToks"),
      ByteBpe.encodeIds(col("text"), model).as("ids")).collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(0), s"on: ${r.getString(0)}")
      assert(r.getInt(2) == r.getInt(3))
      r.getSeq[Int](4).foreach(id =>
        assert(id >= 0 && id < ByteBpe.vocabSize(model)))
    }
    // vocab artifact: (id, token) covers 0..vocabSize-1, single bytes first
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vocab").toString + "/v"
    ByteBpe.saveVocab(spark, model, dir)
    val vocab = spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(vocab.length == ByteBpe.vocabSize(model))
    assert(vocab.map(_._1).toSeq == (0 until vocab.length))
    assert(vocab(0x20.toInt)._2 == "Ġ") // byte 0x20 at id 0x20, displayed
    // out-of-range id fails loudly
    val bad = Seq(Tuple1(Seq(99999))).toDF("ids")
    intercept[Exception] {
      bad.select(ByteBpe.decodeIds(col("ids"), model)).collect()
    }
  }

  test("special tokens: reserved ids, never split, exact round-trip") {
    val sp = Seq("<|endoftext|>", "<|x|>")
    val docs = Seq(
      "plain text with no specials",
      "lead <|endoftext|> mid <|x|> tail",
      "<|endoftext|><|endoftext|>", // adjacent
      "<|x|>", // whole text
      "almost <|endoftex but not quite").toDF("t")
    val model = ByteBpe.train(docs, col("t"), numMerges = 10)
    val base = ByteBpe.vocabSize(model)
    val got = docs.select(col("t"),
      ByteBpe.encodeIds(col("t"), model, sp).as("ids"),
      ByteBpe.decodeIds(ByteBpe.encodeIds(col("t"), model, sp), model, sp)
        .as("rt")).collect()
    got.foreach { r =>
      assert(r.getString(2) == r.getString(0), s"on: ${r.getString(0)}")
      val ids = r.getSeq[Int](1)
      val wantSpecials =
        sp.map(s0 => s0 -> {
          val t = r.getString(0)
          var c = 0; var i = t.indexOf(s0)
          while (i >= 0) { c += 1; i = t.indexOf(s0, i + s0.length) }
          c
        }).toMap
      assert(ids.count(_ == base) == wantSpecials("<|endoftext|>"))
      assert(ids.count(_ == base + 1) == wantSpecials("<|x|>"))
    }
    // specials survive byte-identical even when the model would split them
    val adj = docs.filter(col("t") === "<|endoftext|><|endoftext|>")
      .select(ByteBpe.encodeIds(col("t"), model, sp)).head().getSeq[Int](0)
    assert(adj == Seq(base, base))
  }

  test("byte_bpe_*_ids_model are SQL-registered and invert each other") {
    GraftExtensions.registerAll(spark)
    val docs = hazards.toDF("t")
    val root = java.nio.file.Files
      .createTempDirectory("graft_sqlids").toString
    val model = ByteBpe.train(
      docs.filter(length(col("t")) > 0), col("t"), numMerges = 20)
    ByteBpe.saveByteBpe(spark, model, s"$root/bb")
    docs.createOrReplaceTempView("sql_ids_docs")
    val bad = spark.sql(
      s"SELECT t, byte_bpe_decode_ids_model('$root/bb', " +
        s"byte_bpe_encode_ids_model('$root/bb', t)) AS rt " +
        "FROM sql_ids_docs").filter(col("rt") =!= col("t")).count()
    assert(bad == 0L)
  }

  test("WordPiece decode rebuilds the space-joined ascii word stream") {
    val texts = Seq(
      "Alpha beta GAMMA delta99 x",
      "punctuation, splits; words!",
      "one",
      "")
    val docs = texts.toDF("text")
    val model = WordPiece.train(docs, col("text"), vocabSize = 60)
    val got = docs.select(col("text"),
      WordPiece.decode(WordPiece.encode(col("text"), model)).as("d"))
      .collect()
    got.foreach { r =>
      val want = r.getString(0).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).mkString(" ")
      assert(r.getString(1) == want, s"on: ${r.getString(0)}")
    }
  }

  test("word-BPE and unigram decode concatenate the ascii token stream") {
    val texts = Seq(
      "Alpha beta alphabet beta beta",
      "MIXED case, with 42 numbers",
      "solo")
    val docs = texts.toDF("text")
    val bpe = Bpe.train(docs, col("text"), numMerges = 20)
    val ug = Unigram.train(docs, col("text"), vocabSize = 40, seedSize = 256)
    val got = docs.select(col("text"),
      Bpe.decode(Bpe.encode(col("text"), bpe)).as("b"),
      Unigram.decode(Unigram.encode(col("text"), ug)).as("u"))
      .collect()
    got.foreach { r =>
      val want = r.getString(0).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).mkString("")
      assert(r.getString(1) == want)
      assert(r.getString(2) == want)
    }
  }
}
