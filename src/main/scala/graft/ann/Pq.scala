package graft.ann

import graft.functions.vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Product-quantization ANN — the memory/IO-bound scale path of the similarity
 * search family (brute / LSH / IVF / PQ).
 *
 * At 100 TB the corpus embeddings themselves are the bottleneck: a
 * 1024-dim float corpus is 4 KB/vector, so every ANN scan pays 4 KB of IO
 * per candidate. PQ encodes each vector to `m` bytes (one code per
 * subspace, 256-entry codebooks): a 4 KB vector becomes 16 bytes at m=16 —
 * ~250x less scan IO — and each (query, candidate) score drops from O(dim)
 * multiply-adds to O(m) table lookups against a per-query lookup table
 * (asymmetric distance computation). The encoded corpus is what executors
 * scan; full vectors are touched only for the final exact re-rank of the
 * per-query shortlist (|queries| * k * refine rows).
 *
 * Training is deterministic (no RNG): init = the `ksub` vectors with the
 * smallest ids split into subvectors, then Lloyd's iterations where the
 * assign pass is a distributed codegen'd kernel and only
 * `ksub * dim` sub-centroid means cross to the driver per iteration — the
 * same driver-traffic bound as [[Ann.trainIvf]]. At 100 TB, train on a
 * representative sample.
 */
object Pq {

  /** Trained product quantizer: `codebooks(sub)(code)` is a `dim / m`-float
    * sub-centroid. Tiny (`ksub * dim` floats) — ships inside the plan. */
  case class PqIndex(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def subdim: Int = codebooks(0)(0).length

    /** Per-(subspace, code) squared centroid norms, for reconstruction-norm
      * lookup at scoring time. */
    lazy val normSq: Array[Array[Double]] =
      codebooks.map(_.map { cen =>
        var acc = 0.0
        var i = 0
        while (i < cen.length) { acc += cen(i).toDouble * cen(i).toDouble; i += 1 }
        acc
      })
  }

  /**
   * Train a product quantizer with deterministic Lloyd's iterations.
   * Init = the `ksub` smallest-id vectors, sliced into `m` subvectors each.
   * Each iteration runs one distributed assign pass (the codegen'd
   * [[graft.functions.PqEncodeInts]] kernel) and one per-(subspace, code,
   * dimension) mean aggregation; `ksub * dim` doubles cross to the driver.
   * Sub-clusters that lose all members keep their previous sub-centroid.
   */
  def trainPq(corpus: DataFrame, id: Column, vec: Column,
              dim: Int, m: Int, ksub: Int, iterations: Int = 3): PqIndex = {
    require(m > 0 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub > 0 && ksub <= 256, s"ksub=$ksub must fit one byte (1..256)")
    val subdim = dim / m
    val base = corpus.select(id.as("id"), vec.as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds: Array[Array[Float]] = base.orderBy(col("id")).limit(ksub)
        .select("v").collect().map(_.getSeq[Float](0).toArray)
      require(seeds.length == ksub,
        s"need at least ksub=$ksub training vectors, got ${seeds.length}")
      var codebooks: Array[Array[Array[Float]]] =
        Array.tabulate(m, ksub) { (s, c) =>
          java.util.Arrays.copyOfRange(seeds(c), s * subdim, (s + 1) * subdim)
        }
      for (_ <- 0 until iterations) {
        val means = base
          .select(vectors.pq_encode_ints(col("v"), codebooks).as("codes"),
            posexplode(col("v")).as(Seq("i", "x")))
          .select((col("i") / subdim).cast("int").as("sub"),
            (col("i") % subdim).as("within"),
            get(col("codes"), (col("i") / subdim).cast("int")).as("code"),
            col("x"))
          .groupBy(col("sub"), col("code"), col("within"))
          .agg(avg(col("x")).as("mean"))
          .collect()
        val next = codebooks.map(_.map(_.clone()))
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
        }
        codebooks = next
      }
      PqIndex(codebooks)
    } finally base.unpersist(blocking = false)
  }

  /** Encode a corpus against a trained index: `(id, codes, cnorm)` with
    * `codes` the m-byte PQ code and `cnorm` the reconstruction norm. This is
    * the table a production pipeline writes ONCE and scans per query batch —
    * m + 8ish bytes per vector instead of dim * 4. */
  def encode(corpus: DataFrame, id: Column, vec: Column, index: PqIndex): DataFrame =
    corpus
      .select(id.as("neighbor_id"), vectors.pq_encode(vec, index.codebooks).as("codes"))
      .withColumn("cnorm", vectors.pq_code_norm(col("codes"), index.normSq))

  /**
   * PQ top-k by approximate cosine with exact re-rank: queries are broadcast
   * with their precomputed ADC lookup table; the encoded corpus streams
   * through the O(m)-per-pair ADC scorer; the per-query shortlist of
   * `k * refine` best approximate candidates (map-side-limited
   * WindowGroupLimit) joins back to the full vectors for an exact cosine
   * re-rank. Output: (query_id, rank, neighbor_id, cosine) — cosine exact.
   */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
             queryId: Column, queryVec: Column, corpusId: Column, corpusVec: Column,
             index: PqIndex, k: Int, refine: Int = 8): DataFrame = {
    val enc = encode(corpus, corpusId, corpusVec, index)
    val q = queries.select(
      queryId.as("query_id"), queryVec.as("qvec"),
      vectors.pq_lut(queryVec, index.codebooks).as("lut"),
      sqrt(vectors.dot_product(queryVec, queryVec)).as("qnorm"))
    val scored = broadcast(q).crossJoin(enc)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx_cos",
        when(col("qnorm") === 0.0 || col("cnorm") === 0.0, lit(0.0))
          .otherwise(
            vectors.pq_adc_dot(col("codes"), col("lut"), index.ksub) /
              (col("qnorm") * col("cnorm"))))
    val shortlist = scored
      .withColumn("__srank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("approx_cos").desc, col("neighbor_id"))))
      .filter(col("__srank") <= k * refine)
      .select(col("query_id"), col("qvec"), col("neighbor_id"))
    // the shortlist is |queries| * k * refine rows by construction — always
    // broadcastable — so the exact re-rank is one more narrow pass over the
    // corpus scan, never a corpus-wide shuffle to meet a tiny join side
    corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cvec"))
      .join(broadcast(shortlist), "neighbor_id")
      .withColumn("cosine", vectors.cosine_similarity(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /**
   * Persist trained codebooks as a tiny parquet table
   * `(subspace, code, centroid)` — the corpus is encoded ONCE against a
   * fixed quantizer; persisting it is what lets tomorrow's ingest encode
   * against the same codes instead of silently re-quantizing. m×ksub rows,
   * float32-exact round-trip.
   */
  def savePq(spark: org.apache.spark.sql.SparkSession, index: PqIndex,
             path: String): Unit = {
    import spark.implicits._
    (for {
      (cb, sub) <- index.codebooks.zipWithIndex
      (cen, code) <- cb.zipWithIndex
    } yield (sub, code, cen.toSeq)).toSeq
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load codebooks persisted by [[savePq]] (bounded m×ksub-row collect). */
  def loadPq(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
    val rows = spark.read.parquet(path).select("subspace", "code", "centroid")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    PqIndex(rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => g.sortBy(_._2).map(_._3) }.map(_.toArray).toArray)
  }
}
