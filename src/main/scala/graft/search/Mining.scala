package graft.search

import graft.text.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Hard-negative mining — the training-data op behind every dense-retriever
 * / embedding-model recipe (DPR, Karpukhin et al. 2020; sentence-encoder
 * contrastive training): for each training query, the corpus documents a
 * LEXICAL ranker scores highest that are NOT known positives. Those are
 * the "hard" negatives — near the decision boundary, so gradients carry
 * signal random negatives lack.
 *
 * Plan shape: candidates come from [[graft.text.Bm25.topK]] at
 * `k * candidateFactor` (postings restricted to query terms BEFORE the tf
 * shuffle; WindowGroupLimit top-k), positives leave via a hash anti-join
 * on (query_id, doc_id), and survivors re-rank per query over the bounded
 * `k * candidateFactor` remainder — nothing here scales with corpus size
 * beyond the BM25 posting scan itself.
 *
 * Contract: if more than `(candidateFactor - 1) * k` of a query's top
 * candidates are positives, fewer than `k` negatives come back for that
 * query (mine wider with a larger `candidateFactor` rather than silently
 * reaching deeper than requested).
 */
object Mining {

  /**
   * Margin-based aligned-pair mining (Artetxe & Schwenk 2019 — the CCMatrix
   * / LASER bitext-mining criterion, and the standard recipe for pairing
   * any two embedded corpora: translations, near-duplicate sources,
   * query↔document alignment): raw cosine over-fires in dense "hubness"
   * regions, so each candidate cosine is RATIO-NORMALIZED by the average
   * similarity of both endpoints' own neighborhoods —
   *
   *   margin(x, y) = cos(x, y) / ((avgcos(x, NNk(x)) + avgcos(y, NNk(y))) / 2)
   *
   * — and a pair survives only when each side is the other's best candidate
   * by that margin (mutual best, the "max" strategy) above `minMargin`.
   *
   * Engine-exact by construction: pairwise cosines are bit-reproducible
   * (single fixed-order kernel pass — the property every ANN gate already
   * pins), but an AVERAGE of k cosines is not (float addition is order-
   * sensitive and shuffle order is not deterministic). So neighborhood
   * mass is summed in FIXED POINT — `floor(cos * 2^20)` per neighbor,
   * summed exactly as longs — and the margin is ONE IEEE division of
   * exact integers: every engine that replays the documented algebra
   * reproduces each margin bit-for-bit, ties and thresholds included.
   * Ties on margin break by neighbor id ascending; a non-positive
   * neighborhood mass yields a null margin (ranked last on both engines).
   *
   * Scale shape: this operator never touches vectors — it consumes the
   * `(query_id, rank, neighbor_id, cosine)` neighbor tables of ANY ANN
   * tier (the IVF/PQ/Hamming serving indexes at 100 TB, [[crossTopK]]'s
   * broadcast brute force as the labeled referee below), so the expensive
   * step inherits whatever index the corpus already has. The margin
   * algebra itself is two grouped integer sums (map-side combined), two
   * bounded hash joins back onto the k·|queries|-row candidate tables,
   * and per-query WindowGroupLimit-shaped rank-1 selection.
   */
  def alignedPairsFromNeighbors(forwardIn: DataFrame, backwardIn: DataFrame,
                                k: Int, minMargin: Double = 1.0): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    // materialize both neighbor tables ONCE (k * |queries| rows by
    // construction — the mining working set): each is consumed by its mass
    // aggregate, the eager coverage checks below, and the margin join, and
    // an un-cached table re-runs its PRODUCER (the ANN search / brute-force
    // referee, the expensive part) once per consumer
    val forward = forwardIn.localCheckpoint(true)
    val backward = backwardIn.localCheckpoint(true)
    val Scale = 1L << 20
    def fp(c: Column): Column = floor(c * Scale).cast("long")

    // exact per-endpoint neighborhood mass (sum of fixed-point cosines)
    // WITH the actual neighbor count — a query with fewer than k neighbors
    // must not have its average inflated by a fixed k divisor
    val massL = forward.groupBy(col("query_id").as("lid"))
      .agg(sum(fp(col("cosine"))).as("afp"), count(lit(1)).as("na"))
    val massR = backward.groupBy(col("query_id").as("rid"))
      .agg(sum(fp(col("cosine"))).as("bfp"), count(lit(1)).as("nb"))

    // coverage contract, checked eagerly: every candidate endpoint must
    // have a neighborhood in the OTHER direction's table — an inner join
    // would otherwise silently drop the candidate and promote a lower-
    // cosine neighbor to "mutual best" (build both directions over the
    // same two corpora; the check is two bounded anti-join counts over
    // the k x |queries| neighbor tables)
    val missR = forward.select(col("neighbor_id").as("rid")).distinct()
      .join(massR, Seq("rid"), "left_anti").count()
    require(missR == 0,
      s"$missR forward neighbors have no backward neighborhood — margins would silently mis-rank")
    val missL = backward.select(col("neighbor_id").as("lid")).distinct()
      .join(massL, Seq("lid"), "left_anti").count()
    require(missL == 0,
      s"$missL backward neighbors have no forward neighborhood — margins would silently mis-rank")

    // margin = cos / ((avgL + avgR) / 2) in exact integer form:
    // cfp·2·na·nb / (afp·nb + bfp·na) — one IEEE division of exact longs
    def margined(nn: DataFrame, qAs: String, nAs: String): DataFrame =
      nn.select(col("query_id").as(qAs), col("neighbor_id").as(nAs),
          col("cosine"), fp(col("cosine")).as("cfp"))
        .join(massL, Seq("lid"))
        .join(massR, Seq("rid"))
        .withColumn("margin",
          when(col("afp") * col("nb") + col("bfp") * col("na") > 0,
            (col("cfp") * 2L * col("na") * col("nb")).cast("double") /
              (col("afp") * col("nb") + col("bfp") * col("na")).cast("double")))

    val fw = margined(forward, "lid", "rid")
      .withColumn("fr", row_number().over(Window.partitionBy(col("lid"))
        .orderBy(col("margin").desc_nulls_last, col("rid"))))
      .filter(col("fr") === 1)
      .select(col("lid"), col("rid"), col("cosine"), col("margin"))
    val bw = margined(backward, "rid", "lid")
      .withColumn("br", row_number().over(Window.partitionBy(col("rid"))
        .orderBy(col("margin").desc_nulls_last, col("lid"))))
      .filter(col("br") === 1)
      .select(col("lid"), col("rid"))

    fw.join(bw, Seq("lid", "rid"), "left_semi")
      .filter(col("margin") >= minMargin)
      .select(col("lid").as("left_id"), col("rid").as("right_id"),
        col("cosine"), col("margin"))
  }

  /** Exact cross-corpus top-k by cosine — the brute-force referee for
    * [[alignedPairsFromNeighbors]]: unlike [[graft.ann.Ann.bruteForceTopK]]
    * there is NO self-exclusion (left and right are different id spaces).
    * Queries broadcast; corpus streams through the codegen cosine kernel. */
  def crossTopK(queries: DataFrame, queryId: Column, queryVec: Column,
                corpus: DataFrame, corpusId: Column, corpusVec: Column,
                k: Int): DataFrame = {
    val q = queries.select(queryId.as("query_id"), queryVec.as("qvec"))
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cvec"))
    broadcast(q).crossJoin(c)
      .withColumn("cosine",
        graft.functions.vectors.cosine_similarity(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /**
   * Convenience end-to-end mining over two embedded corpora with the exact
   * referee: brute-force NNk both directions, then the margin algebra.
   * At scale, build the two neighbor tables with the served ANN tier
   * instead and call [[alignedPairsFromNeighbors]] directly.
   */
  def mineAlignedPairs(left: DataFrame, leftId: Column, leftVec: Column,
                       right: DataFrame, rightId: Column, rightVec: Column,
                       k: Int, minMargin: Double = 1.0): DataFrame =
    alignedPairsFromNeighbors(
      crossTopK(left, leftId, leftVec, right, rightId, rightVec, k),
      crossTopK(right, rightId, rightVec, left, leftId, leftVec, k),
      k, minMargin)

  /**
   * Per-query hard negatives `(query_id, neg_rank, doc_id, score)`:
   * BM25 top `k * candidateFactor` minus `positives`, re-ranked 1..k.
   */
  def mineHardNegatives(corpus: DataFrame, docId: Column, text: Column,
                        queries: DataFrame, queryId: Column, queryTerms: Column,
                        positives: DataFrame, posQueryId: Column, posDocId: Column,
                        k: Int, candidateFactor: Int = 2): DataFrame = {
    require(k >= 1 && candidateFactor >= 1,
      s"need k >= 1 and candidateFactor >= 1: $k, $candidateFactor")
    val ranked = Bm25.topK(corpus, docId, text, queries, queryId, queryTerms,
      k * candidateFactor)
    val pos = positives.select(posQueryId.as("query_id"), posDocId.as("doc_id"))
    ranked
      .join(pos, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rank"))))
      .filter(col("neg_rank") <= k)
      .select(col("query_id"), col("neg_rank"), col("doc_id"), col("score"))
  }
}
