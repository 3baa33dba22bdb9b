package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/**
 * One-directory tokenizer artifact — the byte-BPE merge list, the derived
 * id→token vocabulary, and the reserved special-token list persisted and
 * loaded AS A UNIT, so the pieces a trainer/server must agree on cannot
 * drift apart (the P81 "banding comes FROM the index" discipline applied
 * to tokenization: encode/decode config comes FROM the artifact, never
 * from call sites).
 *
 * Layout under `dir` (all tiny, model-sized tables):
 *  - `merges/`   — `(rank, left, right)` in the display alphabet
 *                  ([[ByteBpe.saveByteBpe]]'s format);
 *  - `vocab/`    — `(id, token)` for ids `0..255+numMerges-1`
 *                  ([[ByteBpe.saveVocab]]'s format) PLUS one row per
 *                  special at its reserved id `256+numMerges+i` — the
 *                  complete id space a consumer reads like a GPT-2
 *                  vocab.json;
 *  - `specials/` — `(idx, token)`, idx = the reserved-id offset;
 *  - `fertility/` (optional) — the training-corpus fertility report
 *                  ([[CorpusStats.tokenizerFertility]]) as provenance:
 *                  which corpus shaped these merges and at what
 *                  tokens-per-char cost — riding along so the one
 *                  directory answers "should I reuse this tokenizer for
 *                  that corpus?" without a side channel;
 *  - `params/`   — one row `(num_merges, num_specials, vocab_size,
 *                  has_fertility)`
 *                  written LAST: its presence marks a complete artifact,
 *                  so a half-finished save fails loudly at load time (the
 *                  [[graft.dedup.DedupIndex]] discipline), and load
 *                  cross-checks the piece counts against it.
 *
 * Reference scope note: tokenizer artifacts are green-field (no
 * counterpart in /root/reference); the lifecycle shape follows
 * ann/Pq.scala's saveAnnIndex.
 */
object TokenizerArtifact {

  /** A byte-BPE model plus its reserved specials — the full id space:
    * `0..255` bytes, `256..255+numMerges` merge results,
    * `256+numMerges..` one reserved id per special (P63g order). */
  case class Tokenizer(model: ByteBpe.ByteBpeModel, specials: Seq[String]) {
    require(specials.distinct.length == specials.length,
      s"duplicate specials: ${specials.mkString(", ")}")

    /** Ids below this are bytes/merges; specials start here. */
    def baseVocabSize: Int = ByteBpe.vocabSize(model)

    /** The full id space including reserved specials. */
    def vocabSize: Int = baseVocabSize + specials.length

    /** text → ids, specials matched leftmost-longest first (tiktoken's
      * `allowed_special` discipline); plain byte-BPE when no specials. */
    def encodeIds(text: Column): Column =
      if (specials.isEmpty) ByteBpe.encodeIds(text, model)
      else ByteBpe.encodeIds(text, model, specials)

    /** Exact inverse of [[encodeIds]]. */
    def decodeIds(ids: Column): Column =
      if (specials.isEmpty) ByteBpe.decodeIds(ids, model)
      else ByteBpe.decodeIds(ids, model, specials)

    /** Token count in this tokenizer's units — the budget/packing input. */
    def tokenCount(text: Column): Column =
      size(encodeIds(text)).cast("long")
  }

  /** Persist `tokenizer` under `dir`; `params/` lands last. `fertility`
    * optionally bundles the training-corpus fertility report (a small
    * per-group table — written as-is). Every piece except the
    * caller-supplied fertility frame is model-sized and driver-resident,
    * so the four side tables land via [[graft.parquet.LocalParquet]]
    * (driver-side parquet, zero Spark jobs) instead of four sequential
    * coalesce(1) write jobs. */
  def save(spark: SparkSession, tokenizer: Tokenizer, dir: String,
           fertility: Option[org.apache.spark.sql.DataFrame] = None): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.parquet.LocalParquet
    ByteBpe.saveByteBpe(spark, tokenizer.model, s"$dir/merges")
    val vocab = new graft.functions.ByteBpeVocab(
      tokenizer.model.merges.map(p => Array(p._1, p._2)).toArray)
    val byteAndMergeRows = vocab.symbols.zipWithIndex
      .map { case (sym, id) => (id, graft.functions.ByteBpeKernels.display(sym)) }
    val specialRows = tokenizer.specials.zipWithIndex
      .map { case (sp, i) => (tokenizer.baseVocabSize + i, sp) }
    val idToken = StructType(Seq(StructField("id", IntegerType),
      StructField("token", StringType)))
    LocalParquet.write(spark, s"$dir/vocab", idToken,
      (byteAndMergeRows ++ specialRows).toSeq.map { case (id, t) => Row(id, t) })
    LocalParquet.write(spark, s"$dir/specials",
      StructType(Seq(StructField("idx", IntegerType),
        StructField("token", StringType))),
      tokenizer.specials.zipWithIndex.toSeq.map { case (sp, i) => Row(i, sp) })
    fertility.foreach(
      _.coalesce(1).write.mode("overwrite").parquet(s"$dir/fertility"))
    // params last: their presence marks a COMPLETE artifact
    LocalParquet.write(spark, s"$dir/params",
      StructType(Seq(StructField("num_merges", IntegerType),
        StructField("num_specials", IntegerType),
        StructField("vocab_size", IntegerType),
        StructField("has_fertility", BooleanType))),
      Seq(Row(tokenizer.model.merges.length, tokenizer.specials.length,
        tokenizer.vocabSize, fertility.isDefined)))
  }

  /** The bundled fertility report, when the artifact carries one. */
  def loadFertility(spark: SparkSession,
                    dir: String): Option[org.apache.spark.sql.DataFrame] = {
    val p = graft.parquet.LocalParquet.readRow(spark, s"$dir/params")
    if (p.getAs[Boolean]("has_fertility"))
      Some(spark.read.parquet(s"$dir/fertility"))
    else None
  }

  /** Load an artifact saved by [[save]] (bounded model-sized DRIVER-side
    * reads — zero Spark jobs, the load-side twin of [[save]]'s layout).
    * Fails loudly on an incomplete save (missing `params/`) or on a piece
    * count that disagrees with the params row (a partially overwritten
    * artifact must never half-load). */
  def load(spark: SparkSession, dir: String): Tokenizer = {
    val p = graft.parquet.LocalParquet.readRow(spark, s"$dir/params")
    val numMerges = p.getAs[Int]("num_merges")
    val numSpecials = p.getAs[Int]("num_specials")
    val model = ByteBpe.loadByteBpe(spark, s"$dir/merges")
    require(model.merges.length == numMerges,
      s"tokenizer artifact at $dir is inconsistent: params say " +
        s"$numMerges merges, merges/ holds ${model.merges.length}")
    val specials = graft.parquet.LocalParquet.read(spark, s"$dir/specials")
      .map(r => (r.getAs[Int]("idx"), r.getAs[String]("token")))
      .sortBy(_._1).map(_._2).toIndexedSeq
    require(specials.length == numSpecials,
      s"tokenizer artifact at $dir is inconsistent: params say " +
        s"$numSpecials specials, specials/ holds ${specials.length}")
    Tokenizer(model, specials)
  }
}
