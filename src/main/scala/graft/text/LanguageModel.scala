package graft.text

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Quantized bigram language-model scoring — the CCNet-style "perplexity
 * filter" for corpus curation, reformulated so every number is an exact
 * integer (engine-portable, order-independent, oracle-checkable).
 *
 * Standard LM quality filtering scores each document by the average
 * negative log-probability of its tokens under a corpus n-gram model and
 * drops the tails. Floating-point `log` is libm-dependent and float sums are
 * order-dependent — poison for reproducible pipelines (and for cross-engine
 * verification). This operator quantizes the information content per bigram
 * position to whole bits via integer floor-log2:
 *
 *   bits(w1 w2) = floor(log2 C(w1)) - floor(log2 C(w1 w2))
 *
 * (C = corpus occurrence counts; C(w1 w2) <= C(w1), so bits >= 0; the true
 * -log2 P(w2|w1) differs by < 1 bit from the quantized value). Per document:
 * `sum_bits` (exact BIGINT — order-independent), `n_bigrams`, and
 * `avg_bits = sum/n` (one exact-integer division — the only double).
 * Repetitive/templated text scores near 0 bits; natural prose lands mid;
 * token-salad scores high. Same filtering power as float perplexity for
 * threshold purposes, none of the float irreproducibility.
 *
 * Scale shape (100 TB): counting is `explode -> groupBy` with map-side
 * partial aggregation — the shuffle carries distinct grams, not positions.
 * The bits table is a join of the two COUNT tables (distinct bigrams X
 * their first word), far smaller than the corpus. Scoring joins the
 * occurrence stream against the bits table ONCE on the bigram key (hash
 * shuffle join; AQE broadcasts it when small), then aggregates per doc.
 * Floor-log2 is `length(bin(cnt)) - 1` — integer-exact string arithmetic,
 * reproducible in any engine.
 */
object LanguageModel {

  /** Corpus token occurrence counts (ASCII tokens, with multiplicity). */
  def unigramCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(vectors.tokenize_ascii(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Corpus bigram occurrence counts (with multiplicity). */
  def bigramCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(vectors.word_shingles_all(textCol, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))

  /** floor(log2(c)) for a positive BIGINT column, integer-exact. */
  private def floorLog2(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /**
   * Quantized bits per distinct bigram under the given corpus counts:
   * `bigram`, `bits`. Exposed for cross-corpus scoring (train counts on A,
   * score B); bigrams absent from the counts table get no row — see
   * [[scoreBits]] `unseenBits`.
   */
  def bigramBits(unigrams: DataFrame, bigrams: DataFrame): DataFrame =
    bigrams
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(unigrams.withColumnRenamed("tok", "w1").withColumnRenamed("cnt", "w1cnt"), "w1")
      .select(col("bigram"), (floorLog2(col("w1cnt")) - floorLog2(col("cnt"))).as("bits"))

  /**
   * Score every document of `docs` against an LM trained on `lmDocs`
   * (pass the same frame for the usual self-scoring: every doc bigram is
   * then in the counts and `unseenBits` never applies). Output per doc:
   * id column, `n_bigrams`, `sum_bits`, `avg_bits`.
   */
  def scoreBits(
      docs: DataFrame,
      idColumn: String,
      textCol: Column,
      lmDocs: DataFrame = null,
      lmTextCol: Column = null,
      unseenBits: Long = 20L): DataFrame = {
    val trainDocs = Option(lmDocs).getOrElse(docs)
    val trainText = Option(lmTextCol).getOrElse(textCol)
    val bits = bigramBits(unigramCounts(trainDocs, trainText), bigramCounts(trainDocs, trainText))

    val occ = docs.select(col(idColumn).as("_lm_id"),
      explode(vectors.word_shingles_all(textCol, 2)).as("bigram"))
    val perDoc = occ.join(bits, Seq("bigram"), "left")
      .groupBy(col("_lm_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("bits"), lit(unseenBits))).as("sum_bits"))

    docs.select(col(idColumn).as("_lm_id"))
      .join(perDoc, Seq("_lm_id"), "left")
      .select(
        col("_lm_id").as(idColumn),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("sum_bits").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_bits"))
  }
}
