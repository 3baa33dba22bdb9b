package graft

import graft.agg.VectorMoments
import graft.ann.{Opq, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ-lite rotation: moments sketch, Jacobi, allocation, end-to-end PQ. */
class OpqSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // deterministic correlated vectors: a low-dim latent code expanded by a
  // fixed mixing matrix plus small deterministic "noise" — the shape PCA
  // rotation is built for (dimensions strongly correlated pairwise)
  private val dim = 8
  private def synth(n: Int) = {
    val rows = Seq.tabulate(n) { i =>
      val a = math.sin(i * 0.7); val b = math.cos(i * 1.3); val c = math.sin(i * 2.1 + 1.0)
      val v = Array(
        a + 0.9 * b, 0.9 * a + b, a - 0.9 * b, 0.9 * a - b,
        c + 0.5 * a, c - 0.5 * a, 0.1 * math.sin(i * 3.7), 0.1 * math.cos(i * 4.3))
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    rows.toDF("id", "v")
  }

  test("vec_moments sketch matches a driver-side exact computation") {
    val df = synth(50)
    val flat = df.select(VectorMoments.vecMoments(col("v"), dim)).head().getSeq[Double](0)
    val local = df.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    assert(flat(0) == 50.0)
    val (n, mean, m) = VectorMoments.secondMoment(flat.toArray, dim)
    assert(n == 50L)
    for (i <- 0 until dim) {
      val exact = local.map(_(i)).sum / 50.0
      assert(math.abs(mean(i) - exact) < 1e-9, s"mean $i")
      for (j <- i until dim) {
        val exactM = local.map(r => r(i) * r(j)).sum / 50.0
        assert(math.abs(m(i)(j) - exactM) < 1e-9, s"moment $i $j")
        assert(m(i)(j) == m(j)(i))
      }
    }
  }

  test("vec_moments is partitioning-invariant up to float addition order") {
    val df = synth(100)
    val one = df.coalesce(1).select(VectorMoments.vecMoments(col("v"), dim))
      .head().getSeq[Double](0)
    val many = df.repartition(7).select(VectorMoments.vecMoments(col("v"), dim))
      .head().getSeq[Double](0)
    one.zip(many).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)))
    }
  }

  test("jacobiEig diagonalizes: A v_i = lambda_i v_i and V is orthonormal") {
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.2, 0.1),
      Array(0.5, 0.2, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (lambda, v) = Opq.jacobiEig(a)
    val n = 4
    for (c <- 0 until n) {
      for (r <- 0 until n) {
        val av = (0 until n).map(k => a(r)(k) * v(k)(c)).sum
        assert(math.abs(av - lambda(c) * v(r)(c)) < 1e-9, s"eigpair $c row $r")
      }
    }
    for (c1 <- 0 until n; c2 <- 0 until n) {
      val dot = (0 until n).map(k => v(k)(c1) * v(k)(c2)).sum
      assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-9)
    }
    // trace and eigenvalue sum agree
    assert(math.abs(lambda.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-9)
  }

  test("eigenvalue allocation balances log-variance under capacity") {
    // descending eigenvalues; m=2, cap=2: greedy puts 0 in b0, 1 in b1,
    // then 2 joins the smaller-product bucket (b1), 3 fills b0
    val perm = Opq.eigenvalueAllocation(Array(8.0, 4.0, 2.0, 1.0), 2)
    assert(perm.toSeq == Seq(0, 3, 1, 2))
    // every dimension exactly once, capacity respected
    val p2 = Opq.eigenvalueAllocation(Array(5.0, 5.0, 5.0, 5.0, 5.0, 5.0), 3)
    assert(p2.sorted.toSeq == (0 until 6))
  }

  test("trained rotation is orthonormal and preserves norms and cosines") {
    val df = synth(200)
    val rot = Opq.trainRotation(df, col("v"), dim, m = 2)
    val r = rot.matrix.map(_.map(_.toDouble))
    for (i <- r.indices; j <- r.indices) {
      val dot = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-5, s"RRt $i $j")
    }
    val pair = df.limit(2).select(Opq.rotate(col("v"), rot).as("rv"), col("v"))
      .collect()
    pair.foreach { row =>
      val orig = row.getSeq[Float](1).map(_.toDouble)
      val rotd = row.getSeq[Float](0).map(_.toDouble)
      val n0 = math.sqrt(orig.map(x => x * x).sum)
      val n1 = math.sqrt(rotd.map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-4, "norm not preserved")
    }
  }

  test("rotation concentrates then re-balances variance across subspaces") {
    val df = synth(200)
    val rot = Opq.trainRotation(df, col("v"), dim, m = 4)
    // per output-dimension variance of the rotated data
    val rows = df.select(Opq.rotate(col("v"), rot).as("rv")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length.toDouble
    val varByDim = (0 until dim).map { i =>
      val xs = rows.map(_(i))
      val mu = xs.sum / n
      xs.map(x => (x - mu) * (x - mu)).sum / n
    }
    // subspaces of size 2: each should hold one high-variance and one
    // low-variance principal dim (allocation interleaves), so the max/min
    // subspace log-variance-sum spread is far below the unbalanced split
    val bySub = varByDim.grouped(dim / 4)
      .map(_.map(v => math.log(math.max(v, 1e-12))).sum).toSeq
    val sorted = varByDim.sortBy(-_)
    val unbalanced = sorted.grouped(dim / 4)
      .map(_.map(v => math.log(math.max(v, 1e-12))).sum).toSeq
    assert(bySub.max - bySub.min < unbalanced.max - unbalanced.min + 1e-9,
      s"allocation spread ${bySub.max - bySub.min} vs unbalanced ${unbalanced.max - unbalanced.min}")
  }

  test("rotated PQ recall is at least raw PQ recall on correlated data") {
    val df = synth(300).persist()
    val q = df.filter(col("id") < 15)
    val brute = graft.ann.Ann.bruteForceTopK(q, df,
      col("id"), col("v"), col("id"), col("v"), k = 3)
      .select(col("query_id"), col("neighbor_id"))
    def recallOf(topk: org.apache.spark.sql.DataFrame): Double = {
      val hits = brute.join(topk, Seq("query_id", "neighbor_id"), "left_semi").count()
      hits.toDouble / brute.count()
    }
    val raw = Pq.trainPq(df, col("id"), col("v"), dim, m = 4, ksub = 8, iterations = 3)
    val rawRec = recallOf(Pq.pqTopK(q, df, col("id"), col("v"), col("id"), col("v"),
      raw, k = 3, refine = 4).select(col("query_id"), col("neighbor_id")))
    val rot = Opq.trainRotation(df, col("v"), dim, m = 4)
    val rpq = Opq.trainPqRotated(df, col("id"), col("v"), rot, dim, m = 4, ksub = 8,
      iterations = 3)
    val rotRec = recallOf(Opq.pqTopKRotated(q, df, col("id"), col("v"), col("id"), col("v"),
      rot, rpq, k = 3, refine = 4).select(col("query_id"), col("neighbor_id")))
    info(s"raw recall@3 = $rawRec, rotated recall@3 = $rotRec")
    assert(rotRec >= rawRec,
      s"rotation should not hurt on strongly-correlated data: $rotRec < $rawRec")
    df.unpersist()
  }

  test("rotation save/load round-trips exactly") {
    val df = synth(100)
    val rot = Opq.trainRotation(df, col("v"), dim, m = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_rot").toString
    Opq.saveRotation(spark, rot, s"$dir/rot")
    val back = Opq.loadRotation(spark, s"$dir/rot")
    assert(back.matrix.map(_.toSeq).toSeq == rot.matrix.map(_.toSeq).toSeq)
  }
}
