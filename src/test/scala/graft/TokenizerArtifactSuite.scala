package graft

import graft.text.{ByteBpe, TokenizerArtifact}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-directory tokenizer artifact: save/load round-trip, params-last
  * fail-loud discipline, the complete id-space vocab table, and the
  * ASCII-only specials contract. */
class TokenizerArtifactSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private lazy val corpus = Seq(
    "the cat sat on the mat", "the dog ran over the log",
    "a cat and a dog met the fox", "it's the quick brown fox again")
    .toDF("text")

  private lazy val model = ByteBpe.train(corpus, col("text"), numMerges = 12)

  test("save/load round-trips model and specials exactly") {
    val dir = java.nio.file.Files.createTempDirectory("tok-art").toString
    val tok = TokenizerArtifact.Tokenizer(model,
      Seq("<|endoftext|>", "<|pad|>"))
    TokenizerArtifact.save(spark, tok, dir)
    val loaded = TokenizerArtifact.load(spark, dir)
    assert(loaded.model.merges == tok.model.merges)
    assert(loaded.specials == tok.specials)
    assert(loaded.vocabSize == 256 + 12 + 2)
    // encode via the loaded artifact == encode via the in-memory one,
    // with a planted special landing on its reserved id
    val planted = "the cat<|endoftext|>sat"
    val row = Seq(planted).toDF("t").select(
      loaded.encodeIds(col("t")).as("a"),
      tok.encodeIds(col("t")).as("b"))
      .select(col("a") === col("b"), loaded.decodeIds(col("a")),
        array_contains(col("a"), loaded.baseVocabSize))
      .head()
    assert(row.getBoolean(0))
    assert(row.getString(1) == planted)
    assert(row.getBoolean(2)) // <|endoftext|> = first reserved id
  }

  test("vocab/ covers the COMPLETE id space including reserved specials") {
    val dir = java.nio.file.Files.createTempDirectory("tok-art-vocab").toString
    val tok = TokenizerArtifact.Tokenizer(model, Seq("<|endoftext|>"))
    TokenizerArtifact.save(spark, tok, dir)
    val vocab = spark.read.parquet(s"$dir/vocab")
      .as[(Int, String)].collect().toMap
    assert(vocab.size == tok.vocabSize)
    assert(vocab(tok.baseVocabSize) == "<|endoftext|>")
    assert((0 until tok.vocabSize).forall(vocab.contains))
  }

  test("a bundled fertility report rides along as provenance") {
    val dir = java.nio.file.Files.createTempDirectory("tok-art-fert").toString
    val report = corpus.selectExpr("'all' AS grp", "length(text) AS n_chars")
      .groupBy("grp").agg(org.apache.spark.sql.functions.sum("n_chars").as("n_chars"))
    val tok = TokenizerArtifact.Tokenizer(model, Seq("<|endoftext|>"))
    TokenizerArtifact.save(spark, tok, dir, fertility = Some(report))
    val back = TokenizerArtifact.loadFertility(spark, dir)
    assert(back.isDefined)
    assert(back.get.collect().toSeq == report.collect().toSeq)
    // and an artifact without one says so
    val dir2 = java.nio.file.Files.createTempDirectory("tok-art-nofert").toString
    TokenizerArtifact.save(spark, tok, dir2)
    assert(TokenizerArtifact.loadFertility(spark, dir2).isEmpty)
  }

  test("a half-finished save fails loudly at load (params last)") {
    val dir = java.nio.file.Files.createTempDirectory("tok-art-half").toString
    ByteBpe.saveByteBpe(spark, model, s"$dir/merges") // no params/
    intercept[Exception] { TokenizerArtifact.load(spark, dir) }
  }

  test("a piece count disagreeing with params fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("tok-art-drift").toString
    TokenizerArtifact.save(spark,
      TokenizerArtifact.Tokenizer(model, Seq("<|endoftext|>")), dir)
    val smaller = ByteBpe.ByteBpeModel(model.merges.take(5))
    ByteBpe.saveByteBpe(spark, smaller, s"$dir/merges")
    val e = intercept[IllegalArgumentException] {
      TokenizerArtifact.load(spark, dir)
    }
    assert(e.getMessage.contains("inconsistent"))
  }

  test("non-ASCII specials are rejected (byte-level match contract)") {
    val tok = TokenizerArtifact.Tokenizer(model, Seq("<|spëcial|>"))
    val e = intercept[Exception] {
      Seq("x").toDF("t").select(tok.encodeIds(col("t"))).collect()
    }
    assert(e.getMessage.contains("ASCII"))
  }
}
