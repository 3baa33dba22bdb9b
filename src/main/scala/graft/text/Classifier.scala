package graft.text

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Quality-classifier inference with the hashing trick — the
 * fasttext-shaped linear filter every curation pipeline runs (quality,
 * toxicity, domain routing), re-expressed so the decision is exact and the
 * scan narrow:
 *
 *  - features are the document's lowercase tokens plus space-joined
 *    bigrams, hashed to 256 buckets by the first md5 byte
 *    (engine-portable — any engine's md5 of the same UTF-8 bytes agrees);
 *  - weights are INTEGER (a trained float model quantizes to int by a
 *    scale factor folded into the threshold), so the logit is an exact
 *    BIGINT sum — bit-identical across engines and partitionings;
 *  - the whole logit is ONE fused codegen'd kernel pass per document
 *    ([[graft.functions.HashedLinearScore]]) running next to the scan —
 *    no explode, no shuffle, no UDF. Filtering is a narrow predicate, so
 *    it is also streaming-legal and belongs BEFORE any shuffling curation
 *    stage.
 *
 * Larger models stack several 256-bucket weight tables trained with
 * different feature salts; at inference each table is one more kernel
 * column added in the same scan.
 */
object Classifier {

  /** Exact-integer logit of a 256-bucket hashed linear model.
    * `portableHash = true` buckets by the md5 first byte (replicable by any
    * engine with md5 — what the oracle gate uses); `false` buckets by
    * xxhash64 — measured 2.8× faster end-to-end at 250k docs (ScaleProbe) —
    * the production choice when the
    * model is trained and scored under the same bucketing. */
  def logit(text: Column, weights: Array[Int], bias: Long = 0L,
            bigrams: Boolean = true, portableHash: Boolean = true): Column =
    vectors.hashed_linear_score(text, weights, bigrams, portableHash) + lit(bias)

  /** Score every document: original columns + `logit` + boolean `keep`
    * (logit >= threshold). */
  def score(df: DataFrame, text: Column, weights: Array[Int],
            bias: Long = 0L, threshold: Long = 0L,
            bigrams: Boolean = true, portableHash: Boolean = true): DataFrame =
    df.withColumn("logit", logit(text, weights, bias, bigrams, portableHash))
      .withColumn("keep", col("logit") >= threshold)

  /** Keep only documents scoring at or above `threshold` — a pure narrow
    * filter (streaming-legal, fused with the scan). */
  def filterByScore(df: DataFrame, text: Column, weights: Array[Int],
                    bias: Long = 0L, threshold: Long = 0L,
                    bigrams: Boolean = true, portableHash: Boolean = true): DataFrame =
    df.filter(logit(text, weights, bias, bigrams, portableHash) >= threshold)
}
