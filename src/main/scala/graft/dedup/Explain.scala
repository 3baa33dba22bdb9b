package graft.dedup

import graft.functions.vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Near-dup EXPLANATION — the evidence behind a dedup decision: given
 * flagged pairs (from MinHash/SimHash/semantic dedup, a reviewer queue, a
 * takedown complaint), emit the exact matched token runs of each pair.
 * Pipelines that delete documents need this for auditability ("which
 * spans made these two the same?"), and threshold tuning needs it to see
 * WHAT a 0.8-Jaccard match physically looks like.
 *
 * Method: k-token windows of both documents match by portable 16-hex-md5
 * hash (the [[graft.text.SpanDedup]] window discipline — the oracle makes
 * the same decisions byte for byte; window-hash collisions can in
 * principle forge a match, the standard 2^-64-class trade of the hashed
 * dedup family); matched (posA, posB) points lie on diagonals
 * `posA − posB`, and maximal consecutive runs per diagonal merge into one
 * span row via the sessionize island pattern. Output per matched run:
 * `(id_a, id_b, a_start, a_end, b_start, b_end, match_tokens)` — token
 * positions inclusive, `a_end − a_start + 1 = match_tokens ≥ k`.
 *
 * Scale shape: explanation is a REVIEW operation over a bounded pair
 * list, and the plan only ever touches documents under review — both
 * window tables are semi-joined against the pair ids before the shingle
 * kernel runs, so cost is O(|pairs| + tokens of reviewed docs), never a
 * corpus scan. The diagonal windows partition by (pair, diag) — groups
 * bounded by document length.
 */
object Explain {

  /**
   * Matched-span evidence for each (idA, idB) pair. `pairs` must carry
   * the two id columns; documents provide `(id, text)`.
   */
  def explainPairs(docs: DataFrame, id: Column, text: Column,
                   pairs: DataFrame, pairIdA: Column, pairIdB: Column,
                   k: Int = 3): DataFrame = {
    require(k >= 1, s"window size must be >= 1: $k")
    // duplicate pair rows (concatenated review feeds) would double every
    // matched point and fragment the islands — dedup the pair list first
    val p = pairs.select(pairIdA.as("id_a"), pairIdB.as("id_b")).distinct()
    val reviewed = p.select(col("id_a").as("did"))
      .unionAll(p.select(col("id_b").as("did"))).distinct()
    val w = docs
      .select(id.as("did"), text.as("__text"))
      .join(reviewed, Seq("did"), "left_semi")
      .select(col("did"),
        posexplode(vectors.word_shingles_all(col("__text"), k)).as(Seq("pos", "win")))
      .select(col("did"), col("pos").cast("long").as("pos"),
        substring(md5(col("win")), 1, 16).as("h"))

    val m = p
      .join(w.select(col("did").as("id_a"), col("pos").as("pos_a"), col("h")),
        Seq("id_a"))
      .join(w.select(col("did").as("id_b"), col("pos").as("pos_b"), col("h")),
        Seq("id_b", "h"))
      .withColumn("diag", col("pos_a") - col("pos_b"))

    // (pos_a unique per diagonal: pos_b = pos_a - diag is determined)
    val byDiag = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pos_a"))
    m.withColumn("ni",
        when(lag(col("pos_a"), 1).over(byDiag).isNull ||
          col("pos_a") =!= lag(col("pos_a"), 1).over(byDiag) + 1, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(byDiag))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("isl"))
      .agg(
        min(col("pos_a")).as("a_start"),
        max(col("pos_a") + (k - 1)).as("a_end"),
        min(col("pos_b")).as("b_start"),
        max(col("pos_b") + (k - 1)).as("b_end"))
      .select(col("id_a"), col("id_b"),
        col("a_start"), col("a_end"), col("b_start"), col("b_end"),
        (col("a_end") - col("a_start") + 1).as("match_tokens"))
  }
}
