package graft.text

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * DSIR-style importance resampling — select raw-corpus documents that look
 * like a small target corpus (Xie et al., "Data Selection for Language
 * Models via Importance Resampling", NeurIPS 2023) — reformulated so every
 * number is an exact integer (engine-portable, order-independent,
 * oracle-checkable), the same discipline as [[LanguageModel]].
 *
 * The published method fits two bag-of-hashed-n-gram models (target p,
 * raw q) and weighs each raw document by `log p(doc) - log q(doc) =
 * sum over feature occurrences of log(p_b / q_b)`. Here:
 *
 *  - features are EXACTLY the stream [[graft.functions.HashedLinearScore]]
 *    scores: lowercase ASCII tokens plus space-joined bigrams, hashed to
 *    256 buckets by the first md5 byte (any engine's md5 of the same UTF-8
 *    bytes agrees);
 *  - per-bucket log-probabilities are quantized to whole bits via integer
 *    floor-log2 (`length(bin(cnt)) - 1`) with add-one smoothing, so the
 *    per-bucket weight `w_b = bits(t_b) - bits(tTot) - bits(r_b) +
 *    bits(rTot)` is a small exact integer (within 1 bit per term of the
 *    true log2 ratio — the same fidelity/robustness trade as
 *    [[LanguageModel.scoreBits]]);
 *  - fit and inference share ONE bucketing family: portable md5 (the
 *    oracle-checkable default) or the production `hash64`&0xFF fast path
 *    (`portableHash = false` on BOTH fit and score — the classifier's
 *    measured-2.8x-faster bucketing);
 *  - a document's importance score is then the INTEGER-weighted feature
 *    sum — one fused codegen'd kernel pass per document next to the scan
 *    (no explode, no shuffle, no UDF), i.e. DSIR inference IS
 *    [[Classifier]] inference with fitted rather than trained weights;
 *  - selection is deterministic: top-n by `(score desc, id asc)`.
 *
 * Scale shape (100 TB): fitting aggregates the exploded feature stream to
 * 256 buckets with map-side partial aggregation — the shuffle carries at
 * most 256 rows per task regardless of corpus size; the weight table is a
 * bounded 256-row driver collect (the IVF-init pattern). Scoring is a
 * narrow kernel pass (streaming-legal). Top-n select plans
 * TakeOrderedAndProject (per-partition heads, never a global sort);
 * rate-style selection (`score >= threshold`) stays a pure narrow filter.
 */
object Dsir {

  val Buckets = 256

  /** floor(log2(c)) for a positive BIGINT column, integer-exact. */
  private def floorLog2(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /**
   * Hashed feature-bucket occurrence counts for a corpus: `(bucket, cnt)`,
   * over exactly the feature stream the scoring kernel sees (tokens with
   * multiplicity, plus space-joined bigrams when `bigrams`). Buckets with
   * no occurrences are absent (the weight fit re-adds them with count 0).
   *
   * One fused kernel pass per document builds its 256-bucket histogram
   * ([[graft.functions.Md5BucketCounts]] — thread-local MessageDigest per
   * feature), so the plan explodes 256 small long pairs per doc instead of
   * every feature STRING, and nothing re-hashes in Column algebra. The
   * map-side-combined aggregate still sends <= 256 rows per task.
   */
  def bucketCounts(docs: DataFrame, text: Column, bigrams: Boolean = true,
                   portableHash: Boolean = true): DataFrame =
    docs.select(posexplode(vectors.feature_bucket_counts(text, bigrams, portableHash))
        .as(Seq("bucket", "cnt")))
      .filter(col("cnt") > 0)
      .groupBy("bucket").agg(sum(col("cnt")).as("cnt"))

  /**
   * The fitted 256-row weight table: `(bucket, target_cnt, raw_cnt,
   * weight)` for every bucket 0..255, where `weight = bits(target_cnt + 1)
   * - bits(targetTotal + 256) - bits(raw_cnt + 1) + bits(rawTotal + 256)`
   * (add-one smoothing keeps every log argument positive; totals are the
   * smoothed bucket sums so the two distributions normalize consistently).
   * Positive weight = feature over-represented in the target.
   */
  def weightTable(
      target: DataFrame, raw: DataFrame,
      targetText: Column, rawText: Column,
      bigrams: Boolean = true,
      portableHash: Boolean = true): DataFrame = {
    val spark = target.sparkSession
    val all = spark.range(Buckets).select(col("id").cast("int").as("bucket"))
    val t = bucketCounts(target, targetText, bigrams, portableHash)
      .withColumnRenamed("cnt", "__t")
    val r = bucketCounts(raw, rawText, bigrams, portableHash)
      .withColumnRenamed("cnt", "__r")
    val joined = all.join(t, Seq("bucket"), "left").join(r, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__t"), lit(0L)).as("target_cnt"),
        coalesce(col("__r"), lit(0L)).as("raw_cnt"))
    // totals: one tiny aggregate over the 256-row frame, broadcast back
    val totals = joined.agg(
      sum(col("target_cnt") + 1).as("__tTot"),
      sum(col("raw_cnt") + 1).as("__rTot"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("target_cnt"), col("raw_cnt"),
        (floorLog2(col("target_cnt") + 1) - floorLog2(col("__tTot"))
          - floorLog2(col("raw_cnt") + 1) + floorLog2(col("__rTot")))
          .cast("long").as("weight"))
  }

  /** Driver-side weight materialization for the scoring kernel: 256 ints —
    * a bounded collect (the IVF-init pattern). */
  def fitWeights(
      target: DataFrame, raw: DataFrame,
      targetText: Column, rawText: Column,
      bigrams: Boolean = true,
      portableHash: Boolean = true): Array[Int] = {
    val w = new Array[Int](Buckets)
    weightTable(target, raw, targetText, rawText, bigrams, portableHash)
      .select(col("bucket"), col("weight"))
      .collect()
      .foreach(row => w(row.getInt(0)) = row.getLong(1).toInt)
    w
  }

  /** Original columns + exact-BIGINT `dsir_score` from one fused kernel
    * pass (narrow, streaming-legal). */
  def score(df: DataFrame, text: Column, weights: Array[Int],
            bigrams: Boolean = true, portableHash: Boolean = true): DataFrame =
    df.withColumn("dsir_score",
      vectors.hashed_linear_score(text, weights, bigrams, portableHash))

  /** The `n` most target-like documents, deterministically: top-n by
    * `(dsir_score desc, id asc)` — plans TakeOrderedAndProject (bounded k,
    * per-partition heads, no global sort). */
  def selectTop(df: DataFrame, id: Column, text: Column, weights: Array[Int],
                n: Int, bigrams: Boolean = true,
                portableHash: Boolean = true): DataFrame =
    score(df, text, weights, bigrams, portableHash)
      .orderBy(col("dsir_score").desc, id.asc)
      .limit(n)
}
