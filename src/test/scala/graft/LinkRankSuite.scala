package graft

import graft.graph.LinkRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank: conservation, determinism, hand-computed ranks. */
class LinkRankSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val S = 1000000000000L

  test("two-node cycle: symmetric graph yields equal ranks summing to scale") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = LinkRank.rank(e, col("src"), col("dst"), iterations = 5)
      .orderBy("node").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b"))
    // symmetric 2-cycle: r = base + 0.85 * r  ==> fixed point stays at S/2
    // (each node forwards its whole rank; integer ops keep it exact)
    assert(r(0).getLong(1) == r(1).getLong(1))
    // no dangling nodes => mass conserved up to the per-node integer-division
    // remainders (< dampDen per node per iteration)
    val total = r.map(_.getLong(1)).sum
    assert(total <= S && total > S - 2 * 100 * 5)
  }

  test("hand-computed 3-node chain matches the documented recurrence") {
    // a -> b, b -> c, c -> a plus a -> c: outdeg a=2, b=1, c=1
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("src", "dst")
    val got = LinkRank.rank(e, col("src"), col("dst"), iterations = 2)
      .orderBy("node").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // replicate the documented integer recurrence exactly
    val n = 3L
    val base = S * 15L / 100L / n
    var r = Map("a" -> S / n, "b" -> S / n, "c" -> S / n)
    val out = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
    for (_ <- 1 to 2) {
      val inflow = Map(
        "a" -> r("c") / out("c"),
        "b" -> r("a") / out("a"),
        "c" -> ((r("a") / out("a")) + (r("b") / out("b"))))
      r = r.keys.map(k => k -> (base + 85L * inflow(k) / 100L)).toMap
    }
    assert(got == r)
  }

  test("dangling node receives but never sends; self-loops and dup edges drop") {
    val e = Seq(("a", "b"), ("a", "b"), ("a", "a"), ("b", "sink"))
      .toDF("src", "dst")
    val r = LinkRank.rank(e, col("src"), col("dst"), iterations = 3)
      .orderBy("node").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set("a", "b", "sink"))
    // 'a' has no in-edges after self-loop removal: rank = base after iter 1
    val base = S * 15L / 100L / 3L
    assert(r("a") == base)
    assert(r("sink") > base) // got inflow from b
  }

  test("iteration plan stays a bounded join+agg chain (no cartesian)") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val plan = LinkRank.rank(e, col("src"), col("dst"), iterations = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("deep iteration counts converge across the checkpoint boundary") {
    // 20 iterations crosses the every-8 lineage truncation twice; the
    // 2-cycle's fixed point must hold exactly regardless
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = LinkRank.rank(e, col("src"), col("dst"), iterations = 20)
      .orderBy("node").collect().map(_.getLong(1))
    assert(r(0) == r(1))
    val r5 = LinkRank.rank(e, col("src"), col("dst"), iterations = 5)
      .orderBy("node").collect().map(_.getLong(1))
    // the symmetric fixed point is reached immediately and never moves
    assert(r.toSeq == r5.toSeq)
  }

  test("with a checkpoint dir configured, deep runs use RELIABLE checkpoints") {
    // executor-loss robustness: when sc.setCheckpointDir is set, lineage
    // truncation lands on the fault-tolerant store instead of
    // executor-local blocks — and the ranks are bit-identical either way
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("src", "dst")
    val noDir = LinkRank.rank(e, col("src"), col("dst"), iterations = 10)
      .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val withDir = LinkRank.rank(e, col("src"), col("dst"), iterations = 10)
        .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(withDir.toSeq == noDir.toSeq)
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "expected reliable checkpoint files under the dir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("domainEdges collapses to registrable domains and drops self-links") {
    val df = Seq(
      ("https://blog.example.com/p1", "https://www.example.com/home"),
      ("https://blog.example.com/p1", "https://other.org/x"),
      ("not a url", "https://other.org/y")).toDF("page", "link")
    val e = LinkRank.domainEdges(df, col("page"), col("link"))
      .orderBy("src", "dst").collect().map(r => (r.getString(0), r.getString(1)))
    assert(e.toSeq == Seq(("example.com", "other.org")))
  }
}
