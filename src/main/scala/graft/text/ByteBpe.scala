package graft.text

import graft.parquet.LocalParquet
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/**
 * Byte-level BPE tokenizer (GPT-2/tiktoken lineage) — the unit real
 * models charge against context windows, upgrading [[Bpe]]'s word-level
 * trainer for the token-budget consumers (P45/P86/P113): a byte alphabet
 * plus the fully-specified pre-token scanner in
 * [[graft.functions.ByteBpeKernels]] means ZERO out-of-vocabulary risk
 * and case/punctuation-faithful counts.
 *
 * Spark-first split of the work, sized for 100 TB (the [[Bpe.train]]
 * shape):
 *  - The corpus-sized pass is the PRE-TOKEN COUNT: one map-side-combined
 *    hash aggregation over the kernel's pre-token stream — the exchange
 *    carries one row per distinct pre-token per task, never corpus
 *    tokens.
 *  - Merge learning runs single-node on the bounded frequency table (top
 *    `maxWords` by (count desc, token) — deterministic cutoff, the
 *    require-capped collect every production BPE trainer does).
 *  - Encoding is one narrow codegen kernel pass
 *    ([[graft.functions.ByteBpeEncode]]) with a per-thread memo; no
 *    shuffle, streaming-legal.
 *
 * Determinism: no RNG; ties in the merge loop break by the
 * lexicographically smallest (left, right) BYTE pair — the same corpus
 * always yields the same merges, and the gate fixture replicates the
 * whole algorithm independently in python (tools/make_golden.py).
 *
 * Symbols travel as latin-1 strings internally; the persisted artifact
 * and all OUTPUT tokens use the printable byte-display alphabet
 * (0x20 → 'Ġ'), so vocab files read like GPT-2's.
 */
object ByteBpe {

  /** An ordered merge list over latin-1 byte symbols. */
  case class ByteBpeModel(merges: IndexedSeq[(String, String)]) {
    require(merges.nonEmpty, "byte-BPE model needs at least one merge")
  }

  /**
   * Learn `numMerges` merges from the corpus. `maxWords` caps the driver
   * collect (top pre-tokens by frequency, ties by display token —
   * deterministic); `minFreq` drops hapax noise before the cap; 1-byte
   * pre-tokens carry no pairs and are excluded.
   */
  def train(corpus: DataFrame, text: Column, numMerges: Int,
            maxWords: Int = 1 << 20, minFreq: Long = 1L): ByteBpeModel = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    require(maxWords > 0 && maxWords <= (1 << 24),
      s"maxWords out of range (driver collect cap): $maxWords")
    val counts = corpus
      .select(explode(graft.functions.vectors.byte_bpe_encode(
        coalesce(text, lit("")), IndexedSeq.empty)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minFreq && length(col("w")) >= 2)
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (graft.functions.ByteBpeKernels.fromDisplay(r.getString(0)),
        r.getLong(1)))
    ByteBpeModel(Bpe.trainFromCounts(counts, numMerges).merges)
  }

  /** Tokenize `text` into the model's byte-level token stream
    * (`array<string>` in the display alphabet): one codegen kernel pass,
    * no shuffle. */
  def encode(text: Column, model: ByteBpeModel): Column =
    graft.functions.vectors.byte_bpe_encode(text, model.merges)

  /** Byte-level token count per row — the budget/packing input. */
  def tokenCount(text: Column, model: ByteBpeModel): Column =
    size(encode(text, model)).cast("long")

  /** EXACT-inverse detokenizer: display tokens → bytes → UTF-8 text.
    * Model-free (merges only concatenate byte symbols, so the inverse
    * never consults them): `decode(encode(x, anyModel)) == x` for every
    * string — the self-verifying round-trip any pipeline that ships
    * token streams (packing, batching, chat trims) audits with. One
    * codegen kernel pass, no shuffle. */
  def decode(tokens: Column): Column =
    graft.functions.vectors.byte_bpe_decode(tokens)

  /** Token-ID stream (`array<int>`) under the GPT-2 vocab construction
    * (ids 0..255 = bytes in byte order, 256+i = merge i) — what a pipeline
    * ships to a trainer; zero OOV carried into id space. One codegen
    * kernel pass, no shuffle. */
  def encodeIds(text: Column, model: ByteBpeModel): Column =
    graft.functions.vectors.byte_bpe_encode_ids(text, model.merges)

  /** ids → bytes → UTF-8 text: the exact inverse of [[encodeIds]] under
    * the same model. */
  def decodeIds(ids: Column, model: ByteBpeModel): Column =
    graft.functions.vectors.byte_bpe_decode_ids(ids, model.merges)

  /** The model's vocabulary size: 256 + numMerges (GPT-2 construction). */
  def vocabSize(model: ByteBpeModel): Int = 256 + model.merges.length

  /** [[encodeIds]] with SPECIAL tokens — the tiktoken `allowed_special`
    * discipline: each special literal (e.g. `<|endoftext|>`) matches
    * leftmost-longest FIRST and becomes its reserved id
    * `vocabSize + i`; the text between specials encodes normally
    * (pre-token context never crosses a special boundary). */
  def encodeIds(text: Column, model: ByteBpeModel,
                specials: Seq[String]): Column =
    graft.functions.vectors.byte_bpe_encode_ids_special(
      text, model.merges, specials.toIndexedSeq)

  /** Exact inverse of the special-aware [[encodeIds]]: reserved ids
    * decode to the special's literal bytes. */
  def decodeIds(ids: Column, model: ByteBpeModel,
                specials: Seq[String]): Column =
    graft.functions.vectors.byte_bpe_decode_ids_special(
      ids, model.merges, specials.toIndexedSeq)

  /** Persist the id→token vocabulary as an `(id, token)` parquet table in
    * the display alphabet — the artifact a serving/training stack reads
    * alongside the id streams (reads like a GPT-2 vocab.json). */
  def saveVocab(spark: SparkSession, model: ByteBpeModel, path: String): Unit = {
    val vocab = new graft.functions.ByteBpeVocab(
      model.merges.map(p => Array(p._1, p._2)).toArray)
    LocalParquet.write(spark, path,
      StructType(Seq(StructField("id", IntegerType),
        StructField("token", StringType))),
      vocab.symbols.zipWithIndex.toSeq.map { case (sym, id) =>
        Row(id, graft.functions.ByteBpeKernels.display(sym))
      })
  }

  /** Persist the merge list as a tiny `(rank, left, right)` parquet table
    * in the DISPLAY alphabet (readable like a GPT-2 vocab file). Model-sized
    * and driver-resident, so it lands via [[graft.parquet.LocalParquet]]
    * (zero Spark jobs) instead of a coalesce(1) write. */
  def saveByteBpe(spark: SparkSession, model: ByteBpeModel, path: String): Unit =
    LocalParquet.write(spark, path,
      StructType(Seq(StructField("rank", IntegerType),
        StructField("left", StringType), StructField("right", StringType))),
      model.merges.zipWithIndex.toSeq.map { case ((l, r), rank) =>
        Row(rank,
          graft.functions.ByteBpeKernels.display(l),
          graft.functions.ByteBpeKernels.display(r))
      })

  /** Load a model persisted by [[saveByteBpe]] (bounded numMerges-row
    * driver-side read — no Spark job). */
  def loadByteBpe(spark: SparkSession, path: String): ByteBpeModel =
    ByteBpeModel(LocalParquet.read(spark, path)
      .map(r => (r.getAs[Int]("rank"),
        (graft.functions.ByteBpeKernels.fromDisplay(r.getAs[String]("left")),
          graft.functions.ByteBpeKernels.fromDisplay(r.getAs[String]("right")))))
      .sortBy(_._1).map(_._2).toIndexedSeq)
}
