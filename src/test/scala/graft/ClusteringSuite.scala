package graft

import graft.dedup.{Clustering, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components clustering over near-dup pair lists. */
class ClusteringSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)],
                         localEdgeThreshold: Long = 1L << 20): Map[Long, Long] =
    Clustering.connectedComponents(pairs.toDF("idA", "idB"), col("idA"), col("idB"),
      maxIterations = 50, localEdgeThreshold = localEdgeThreshold)
      .as[(Long, Long)].collect().toMap

  test("path graph collapses to one component rooted at the minimum (both paths)") {
    // worst case for naive propagation: a chain; the alternating algorithm
    // must still converge and label every node with the chain minimum.
    // threshold 0 forces the distributed alternation; the default takes the
    // driver union-find fast path — both must agree exactly
    val chain = (1L until 17L).map(i => (i, i + 1))
    for (threshold <- Seq(0L, 1L << 20)) {
      val comp = components(chain, threshold)
      assert(comp.keySet == (1L to 17L).toSet, s"threshold=$threshold")
      assert(comp.values.toSet == Set(1L), s"threshold=$threshold")
    }
  }

  test("multiple components, arbitrary pair orientation and duplicates") {
    val pairs = Seq((5L, 2L), (2L, 9L), (9L, 5L), (5L, 2L), (20L, 30L), (7L, 7L))
    // self-loop (7,7) contributes no node; {2,5,9} -> 2; {20,30} -> 20
    for (threshold <- Seq(0L, 1L << 20)) {
      assert(components(pairs, threshold) ==
        Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 20L -> 20L, 30L -> 20L), s"threshold=$threshold")
    }
  }

  test("matches a driver-side union-find on a random graph") {
    val rng = new scala.util.Random(7)
    val n = 120
    val edges = Seq.fill(90)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> {
        // component label = min node id in the component among touched nodes
        val root = find(id.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).filter(x => find(x.toInt) == root).min
      }).toMap
    assert(components(edges) == expected)                 // driver fast path
    assert(components(edges, localEdgeThreshold = 0L) == expected) // distributed path
  }

  test("assignClusters labels singletons with their own id") {
    val docs = Seq(1L, 2L, 3L, 4L, 10L).toDF("doc_id")
    val pairs = Seq((2L, 4L)).toDF("idA", "idB")
    val out = Clustering.assignClusters(docs, col("doc_id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 10L -> 10L))
  }

  test("deduplicateByClusters honors transitivity where keepFirst does not") {
    // edges (1,3) and (2,3): pairwise keep-first keeps {1, 2}; clustering
    // knows 1~3~2 is one family and keeps only 1
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("idA", "idB")
    val kept = Clustering.deduplicateByClusters(docs, col("doc_id"), pairs)
      .as[Long].collect().toSet
    assert(kept == Set(1L))
    val keptPairwise = Dedup.keepFirst(docs, col("doc_id"), pairs.toDF("idA", "idB"))
      .as[Long].collect().toSet
    assert(keptPairwise == Set(1L, 2L))
  }

  test("empty pair list leaves the corpus untouched") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("idA", "idB")
    assert(Clustering.deduplicateByClusters(docs, col("doc_id"), pairs)
      .as[Long].collect().toSet == Set(1L, 2L))
  }

  test("keepBestByClusters keeps the highest score per component, ties to smallest id") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), // one family 1~3~2: best score is doc 2
      (4L, 5L), (5L, 5L),              // family 4~5: tie on score -> doc 4
      (9L, 1L)                         // singleton passes through
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 3L), (2L, 3L), (4L, 5L)).toDF("idA", "idB")
    val kept = Clustering.keepBestByClusters(docs, col("doc_id"), col("score"), pairs)
    assert(kept.columns.toSeq == Seq("doc_id", "score")) // internals dropped
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 4L, 9L))
  }

  test("keepBestByClusters with an empty pair list keeps everything") {
    val docs = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "score")
    val pairs = Seq.empty[(Long, Long)].toDF("idA", "idB")
    assert(Clustering.keepBestByClusters(docs, col("doc_id"), col("score"), pairs)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("keepBestByClusters matches a driver-side brute force on a random graph") {
    val rng = new scala.util.Random(13)
    val n = 150
    val edges = Seq.fill(100)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val scores = (0 until n).map(i => i.toLong -> rng.nextInt(20).toLong).toMap
    // driver reference: union-find components, then per-component argmax
    // with the smallest-id tie-break
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0L until n.toLong).groupBy(id => find(id.toInt))
      .values.map(members => members.minBy(id => (-scores(id), id))).toSet

    val docs = scores.toSeq.toDF("doc_id", "score")
    val pairs = edges.toDF("idA", "idB")
    for (threshold <- Seq(0L, 1L << 20)) { // distributed and driver CC paths
      val kept = Clustering.keepBestByClusters(
        docs, col("doc_id"), col("score"), pairs, localEdgeThreshold = threshold)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == expected, s"threshold=$threshold")
    }
  }

  test("keepBestByClusters argmax plans as a map-side WindowGroupLimit") {
    // the rank-1 filter must trigger InferWindowGroupLimit (Partial before
    // the shuffle, Final after) — not a full per-cluster sort of all members
    val docs = spark.range(500).select(col("id").as("doc_id"), (col("id") % 7).as("score"))
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("idA", "idB")
    val plan = Clustering.keepBestByClusters(docs, col("doc_id"), col("score"), pairs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
    assert(plan.contains("Partial") && plan.contains("Final"),
      s"expected Partial+Final WindowGroupLimit:\n$plan")
  }

  test("deduplicateMinHashKeepBest keeps the longest member of each family") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home " * 3
    val docs = Seq(
      (1L, base),
      (2L, base + " tail one extra"),  // near-dup of 1, LONGER -> kept
      (3L, base + " tail2"),           // near-dup of 1 and 2
      (4L, "completely different text about spark clusters and parquet files and shuffles today")
    ).toDF("doc_id", "text")
    val kept = Clustering.deduplicateMinHashKeepBest(
      docs, col("doc_id"), col("text"), length(col("text")), threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("deduplicateMinHashClusters keeps one doc per near-dup family end-to-end") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home " * 3
    val docs = Seq(
      (1L, base),
      (2L, base + " tail one"),   // near-dup of 1
      (3L, base + " tail two"),   // near-dup of 1 and 2
      (4L, "completely different text about spark clusters and parquet files and shuffles today")
    ).toDF("doc_id", "text")
    val kept = Clustering.deduplicateMinHashClusters(
      docs, col("doc_id"), col("text"), threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("splitByClusters never lets a near-dup cluster straddle splits") {
    // 200 docs; pairs chain them into 50 clusters of 4 (0~1~2~3, 4~5~6~7, …)
    val docs = spark.range(200).select(col("id").as("doc_id"))
    val pairs = (0L until 200L by 4).flatMap(b =>
      Seq((b, b + 1), (b + 1, b + 2), (b + 2, b + 3))).toDF("idA", "idB")
    val out = Clustering.splitByClusters(
      docs, col("doc_id"), pairs, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .as[(Long, Long, String)].collect()
    assert(out.length == 200)
    // structural leakage-safety: one split label per cluster
    out.groupBy(_._2).foreach { case (cl, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $cl straddles splits")
    }
    // cluster ids are the chain minima; split equals splitByHash on that id
    assert(out.forall { case (id, cl, _) => cl == (id / 4) * 4 })
    val byHash = graft.sample.Sampling.splitByHash(
      docs.select((col("doc_id") / 4).cast("long").multiply(4).as("k")), col("k"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    assert(out.forall { case (_, cl, sp) => byHash(cl) == sp })
  }

  test("softDedupWeights: 1/size weights; total weight == cluster count") {
    val docs = spark.range(100).select(col("id").as("doc_id"))
    // one cluster of 10 (ids 0..9), one of 2 (20, 21), rest singletons
    val pairs = ((0L until 9L).map(i => (i, i + 1)) :+ (20L, 21L)).toDF("idA", "idB")
    val out = Clustering.softDedupWeights(docs, col("doc_id"), pairs)
      .select(col("doc_id"), col("cluster_id"), col("dedup_weight"))
      .as[(Long, Long, Double)].collect()
    assert(out.length == 100)
    val w = out.map(r => r._1 -> r._3).toMap
    assert((0L until 10L).forall(i => w(i) == 0.1))
    assert(w(20L) == 0.5 && w(21L) == 0.5)
    assert(w(50L) == 1.0)
    // alpha=1 invariant: every cluster contributes exactly one unit
    val clusters = out.map(_._2).distinct.length
    assert(math.abs(out.map(_._3).sum - clusters) < 1e-9)
    // alpha=0 is no dedup; alpha=0.5 interpolates (10-cluster: 10^-0.5)
    val w0 = Clustering.softDedupWeights(docs, col("doc_id"), pairs, alpha = 0.0)
      .select(col("doc_id"), col("dedup_weight")).as[(Long, Double)].collect().toMap
    assert(w0.values.forall(_ == 1.0))
    val wHalf = Clustering.softDedupWeights(docs, col("doc_id"), pairs, alpha = 0.5)
      .select(col("doc_id"), col("dedup_weight")).as[(Long, Double)].collect().toMap
    assert(math.abs(wHalf(0L) - math.pow(10.0, -0.5)) < 1e-12)
  }
}
