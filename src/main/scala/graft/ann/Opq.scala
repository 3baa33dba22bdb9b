package graft.ann

import graft.agg.VectorMoments
import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * OPQ-lite: a data-learned orthonormal rotation applied before product
 * quantization ("Optimized Product Quantization", Ge et al., CVPR 2013 —
 * the parametric variant: PCA + eigenvalue allocation).
 *
 * Why a rotation helps PQ: product quantization quantizes each `dim/m`-dim
 * subspace independently, so it wastes its `ksub` centroids when dimensions
 * are correlated (the sub-codebook spends entries tracing a line) or when
 * variance is concentrated in a few subspaces (high-variance subspaces are
 * under-quantized while low-variance ones idle). The fix is an orthonormal
 * `R`: rotate to the PCA basis (decorrelates), then PERMUTE the principal
 * dimensions across the m subspaces so each subspace receives ~the same
 * total variance (eigenvalue allocation: greedily assign dimensions in
 * descending-eigenvalue order to the subspace with the smallest current
 * log-variance product — the parametric-OPQ balancing objective under the
 * independent-Gaussian assumption). Orthonormality means norms and pairwise
 * cosines are EXACTLY preserved (up to float rounding), so the exact
 * re-rank and all downstream cosine semantics are untouched — only the
 * lossy PQ approximation gets a better-conditioned input.
 *
 * Scale shape: the only corpus-sized pass is the [[graft.agg.VecMomentsAgg]]
 * second-moment sketch — ONE mergeable `1 + dim + dim(dim+1)/2`-double
 * buffer per task, map-side combined; the eigendecomposition runs on the
 * driver over a dim x dim matrix (64x64 here; 1024x1024 = 8 MB at
 * production dim — still driver-trivial); the learned matrix ships to
 * executors as a plan reference object and the rotation itself is a narrow
 * codegen'd kernel fused into the scan. Nothing here shuffles the corpus.
 *
 * Determinism: the moments sketch sums doubles (order-insensitive up to FP
 * addition order, the standard Spark sum contract), cyclic Jacobi with a
 * fixed sweep schedule, descending-eigenvalue sort with index tie-break,
 * and a largest-|component|-positive sign convention per eigenvector.
 */
object Opq {

  /** Learned orthonormal rotation; `matrix(r)` is output dimension `r`'s
    * row, i.e. `y = R x`. Tiny (`dim * dim` floats) — ships in the plan. */
  case class Rotation(matrix: Array[Array[Float]]) {
    def dim: Int = matrix.length
  }

  /**
   * Learn the rotation from the corpus: one sketch pass -> driver-side
   * Jacobi eigendecomposition of the (uncentered, by default) second-moment
   * matrix -> eigenvalue allocation of the principal dimensions across the
   * `m` PQ subspaces.
   *
   * `center = false` (default) decomposes E[x xT]: cosine search must not
   * translate vectors, and the rotation is applied WITHOUT subtracting the
   * mean, so learning it from the uncentered moment matches what the
   * rotation actually sees. `center = true` uses the covariance instead
   * (classic PCA) — still a valid orthonormal rotation, sometimes better
   * when the mean is large.
   */
  def trainRotation(corpus: DataFrame, vec: Column, dim: Int, m: Int,
                    center: Boolean = false): Rotation = {
    require(m > 0 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val flat = corpus.select(VectorMoments.vecMoments(vec, dim).as("mom"))
      .head().getSeq[Double](0).toArray
    val mat =
      if (center) VectorMoments.covariance(flat, dim)
      else VectorMoments.secondMoment(flat, dim)._3
    val (values, vecs) = jacobiEig(mat)
    // order eigenpairs by descending eigenvalue (index tie-break), fix signs
    val order = values.indices.sortBy(i => (-values(i), i))
    val principal: Array[Array[Double]] = order.map { c =>
      val v = Array.tabulate(dim)(r => vecs(r)(c))
      var best = 0
      var i = 1
      while (i < dim) {
        if (math.abs(v(i)) > math.abs(v(best))) best = i
        i += 1
      }
      if (v(best) < 0) { i = 0; while (i < dim) { v(i) = -v(i); i += 1 } }
      v
    }.toArray
    val lambda = order.map(values(_)).toArray
    val perm = eigenvalueAllocation(lambda, m)
    Rotation(perm.map(p => principal(p).map(_.toFloat)))
  }

  /**
   * Eigenvalue allocation (Ge et al. 2013, Alg. "balanced partition"):
   * dimensions in descending-eigenvalue order, each assigned to the
   * subspace with the smallest current log-variance product among those
   * with free capacity (tie -> lowest subspace index). Returns the output
   * dimension order: subspace 0's dims first, then subspace 1's, ...
   */
  private[graft] def eigenvalueAllocation(lambda: Array[Double], m: Int): Array[Int] = {
    val dim = lambda.length
    val cap = dim / m
    val buckets = Array.fill(m)(List.empty[Int])
    val logSum = new Array[Double](m)
    val counts = new Array[Int](m)
    lambda.indices.foreach { d =>
      var best = -1
      var i = 0
      while (i < m) {
        if (counts(i) < cap && (best < 0 || logSum(i) < logSum(best))) best = i
        i += 1
      }
      buckets(best) ::= d
      counts(best) += 1
      logSum(best) += math.log(math.max(lambda(d), 1e-12))
    }
    buckets.flatMap(_.reverse)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Deterministic: fixed (p, q) sweep order, fixed convergence budget. */
  private[graft] def jacobiEig(sym: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val a = sym.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.sqrt(2 * s)
    }
    var frob = 0.0
    for (i <- 0 until n; j <- 0 until n) frob += a(i)(j) * a(i)(j)
    frob = math.sqrt(frob)
    val eps = math.max(frob, 1.0) * 1e-14
    var sweep = 0
    while (sweep < 64 && offNorm > eps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > eps / (n * n)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(if (theta == 0.0) 1.0 else theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Apply the rotation inline: a narrow codegen'd kernel column. */
  def rotate(vec: Column, rotation: Rotation): Column =
    vectors.mat_vec_mul(vec, rotation.matrix)

  /** Train a PQ on the ROTATED corpus — same deterministic Lloyd's as
    * [[Pq.trainPq]], better-conditioned input. */
  def trainPqRotated(corpus: DataFrame, id: Column, vec: Column, rotation: Rotation,
                     dim: Int, m: Int, ksub: Int, iterations: Int = 3): Pq.PqIndex =
    Pq.trainPq(corpus, id, rotate(vec, rotation), dim, m, ksub, iterations)

  /**
   * Rotated-PQ top-k: both sides rotate inline (narrow kernels fused with
   * their scans), then the plan IS [[Pq.pqTopK]] — broadcast query LUTs,
   * O(m) ADC scan of the encoded corpus, exact cosine re-rank of the
   * k*refine shortlist. Because R is orthonormal the re-rank cosine on
   * rotated vectors equals the original-space cosine up to float rounding.
   */
  def pqTopKRotated(queries: DataFrame, corpus: DataFrame,
                    queryId: Column, queryVec: Column, corpusId: Column, corpusVec: Column,
                    rotation: Rotation, index: Pq.PqIndex, k: Int, refine: Int = 8): DataFrame =
    Pq.pqTopK(queries, corpus,
      queryId, rotate(queryVec, rotation), corpusId, rotate(corpusVec, rotation),
      index, k, refine)

  /** Persist a rotation as parquet rows `(r, row)` — same artifact
    * discipline as [[Pq.savePq]]. */
  def saveRotation(spark: SparkSession, rotation: Rotation, path: String): Unit = {
    import org.apache.spark.sql.types._
    graft.parquet.LocalParquet.write(spark, path,
      StructType(Seq(StructField("r", IntegerType),
        StructField("row", ArrayType(FloatType, containsNull = false)))),
      rotation.matrix.zipWithIndex.toSeq
        .map { case (row, r) => org.apache.spark.sql.Row(r, row.toSeq) })
  }

  def loadRotation(spark: SparkSession, path: String): Rotation = {
    val rows = graft.parquet.LocalParquet.read(spark, path)
      .sortBy(_.getAs[Int]("r")).map(_.getAs[Seq[Float]]("row").toArray).toArray
    require(rows.nonEmpty, s"no rotation rows at $path")
    Rotation(rows)
  }
}
