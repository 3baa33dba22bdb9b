package graft.graph

import graft.text.Urls
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Link-graph authority rank — the classic web-curation quality signal
 * (PageRank, Brin & Page 1998): crawl-derived corpora weight or cut pages
 * by the authority of their domain, and retrieval mixes authority into
 * ranking. The operator takes an EDGE table (build one from crawl text
 * with [[Urls.extractUrls]] + [[Urls.registrableDomain]], or use
 * [[domainEdges]]) and returns a rank per node.
 *
 * Determinism contract: the whole iteration runs in FIXED-POINT INTEGER
 * arithmetic on `scale`-scaled longs — float summation order can never
 * change a result, so any engine replaying the documented recurrence
 * reproduces every rank bit-for-bit:
 *
 *   - edges are first deduplicated and self-loops dropped;
 *   - `n` = |distinct src ∪ dst|, `r0 = scale div n`;
 *   - `base = ((scale * (dampDen - dampNum)) div dampDen) div n`
 *     (left-associated integer divisions, exactly as written);
 *   - per iteration: each node sends `r div outdeg` along every out-edge
 *     (integer division; the sub-`outdeg` remainder is dropped), and
 *     `r' = base + ((dampNum * inflow) div dampDen)` with `inflow` the
 *     exact long sum of arriving contributions.
 *
 * Dangling nodes (no out-edges) keep receiving but send nothing — the
 * dropped-dangling-mass variant (ranks then sum to slightly less than
 * `scale`; documented, standard for quality-signal use where only the
 * ordering and relative mass matter).
 *
 * Scale shape (the 100 TB story): ranks/outdeg are |V| rows — tiny next
 * to a crawl corpus; each of the `iterations` steps is ONE equi-join of
 * the edge list with the rank table on `src` (AQE broadcasts the rank
 * side while it fits) and ONE map-side-combined long-sum aggregation on
 * `dst`. No driver-side collection of graph data — the only scalar the
 * driver sees is the node count. Iterations are bounded small (3–10 in
 * practice); the plan is a depth-`iterations` chain of join+agg stages
 * evaluated once.
 */
object LinkRank {

  /** Distinct registrable-domain edge list from (page URL, outlink URL)
    * rows — self-links and unparsable hosts dropped. Compose with
    * [[Urls.extractUrls]]/`explode` to go from raw text to this shape. */
  def domainEdges(df: DataFrame, pageUrl: Column, outlinkUrl: Column): DataFrame =
    df.select(Urls.registrableDomain(pageUrl).as("src"),
        Urls.registrableDomain(outlinkUrl).as("dst"))
      .where(col("src") =!= "" && col("dst") =!= "" && col("src") =!= col("dst"))
      .distinct()

  /**
   * Fixed-point PageRank over `edges`. Returns `(node, rank_fp, rank)`
   * where `rank_fp` is the exact scaled-long rank and `rank` its one-IEEE-
   * division double readout `rank_fp / scale`.
   */
  def rank(edges: DataFrame, src: Column, dst: Column,
           iterations: Int = 3,
           dampNum: Long = 85L, dampDen: Long = 100L,
           scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    require(scale > 0 && scale <= 1000000000000L,
      s"scale must be in (0, 1e12] to keep dampNum * inflow inside long range, got $scale")

    val e = edges.select(src.cast("string").as("src"), dst.cast("string").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    // The one driver-side scalar: |V| (a single long, bounded by the node
    // universe — never graph data).
    val n = nodes.count()
    require(n > 0, "rank needs a non-empty edge list")
    val base = scale * (dampDen - dampNum) / dampDen / n

    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))

    var r = nodes.withColumn("__r", lit(scale / n))
    for (it <- 1 to iterations) {
      val inflow = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("__r div __outdeg").as("__contrib"))
        .groupBy("dst").agg(sum(col("__contrib")).as("__inflow"))
      r = nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(__inflow, 0L)) div $dampDen"))
            .as("__r"))
      // truncate lineage on long runs: a depth-50 join chain costs the
      // analyzer/optimizer quadratically; one eager checkpoint per 8
      // iterations keeps the plan shallow at unchanged results. RELIABLE
      // checkpoint when the session has a checkpoint dir (blocks land on
      // the cluster's fault-tolerant store — executor loss recovers);
      // otherwise localCheckpoint, whose executor-resident blocks make
      // the truncated lineage unrecoverable on executor loss — on a real
      // cluster set sc.setCheckpointDir for iterations > 8. Reliable
      // checkpoint files persist after the job: enable
      // spark.cleaner.referenceTracking.cleanCheckpoints=true (or clean the
      // dir externally) on drivers that call rank() repeatedly.
      if (it % 8 == 0 && it < iterations) {
        r = if (r.sparkSession.sparkContext.getCheckpointDir.isDefined)
          r.checkpoint(true)
        else r.localCheckpoint(true)
      }
    }
    r.select(col("node"), col("__r").as("rank_fp"),
      (col("__r").cast("double") / lit(scale.toDouble)).as("rank"))
  }
}
