package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext._

import graft.functions.KmvBottomK

/**
 * Corpus-vs-corpus overlap WITHOUT a join: KMV (k-minimum-values)
 * coordinated sampling over document fingerprints.
 *
 * [[graft.dedup.Dedup.crossCorpusNearDuplicates]] answers "WHICH documents
 * overlap" with a banded equi-join; this answers the cheaper, earlier
 * question — "HOW MUCH do these corpora overlap?" — the go/no-go a curation
 * pipeline asks before paying for pairwise dedup between a new crawl and
 * 100 TB of existing data. Each corpus reduces to its `k` smallest distinct
 * `md5(value)` hashes in one bounded aggregation pass (the
 * [[graft.functions.KmvBottomK]] sketch: partial aggregation trims map-side,
 * so every task ships at most `k` 32-byte strings — communication is
 * corpus-size-independent). Because md5 is a fixed hash, the two bottom-k
 * sets are a COORDINATED sample: the same document draws the same hash in
 * both corpora, which is what makes set-operation estimates valid
 * (Beyer et al., SIGMOD 2007).
 *
 * Estimator: with `X` = the k smallest of `sketch(A) ∪ sketch(B)`,
 * `J ≈ |X ∩ sketch(A) ∩ sketch(B)| / |X|` — every step is a deterministic
 * function of the hashes, so the DuckDB oracle replays it exactly (no
 * tolerance band needed).
 */
object CorpusOverlap {

  /** Bottom-k distinct values of `c` (ascending array), as a Column. */
  def kmvBottomK(c: Column, k: Int): Column =
    KmvBottomK(c.asExpression, k).toAggregateExpression().asColumn

  /**
   * One-row sketch of a corpus: the `k` smallest distinct md5 hex hashes of
   * `value`. Persist it (one tiny row per corpus/day/shard) and compare any
   * two later without touching raw data — sketches of disjoint shards merge
   * by re-sketching the concatenated arrays, so incremental daily sketches
   * compose like the HLL family in [[graft.agg.Profile]].
   */
  def kmvSketch(df: DataFrame, value: Column, k: Int): DataFrame =
    df.select(md5(value.cast("string")).as("__graft_kmv_h"))
      .where(col("__graft_kmv_h").isNotNull)
      .agg(kmvBottomK(col("__graft_kmv_h"), k).as("kmv"))

  /**
   * Merge previously persisted sketch rows (one array per corpus/day/shard)
   * into a single sketch of their union. Bottom-k-distinct is a lattice:
   * `merge(sketch(A), sketch(B)) == sketch(A ∪ B)` exactly (sbt-pinned), so
   * incremental daily sketches answer the cross-run overlap question with
   * no rescan — the same composition contract as
   * [[graft.agg.Profile.mergeHllSketches]].
   */
  def mergeKmvSketches(sketches: DataFrame, sketchCol: Column, k: Int): DataFrame =
    sketches.select(explode(sketchCol).as("__graft_kmv_h"))
      .agg(kmvBottomK(col("__graft_kmv_h"), k).as("kmv"))

  /**
   * Jaccard overlap estimate between two corpora from their KMV sketches:
   * one row `(k_used, n_both, j_estimate)`. `k_used < k` means the union
   * has fewer than `k` distinct fingerprints — the estimate is then exact.
   *
   * Scale shape: two bounded sketch passes (one per corpus, nothing but
   * k-element arrays leave them) + a broadcast of two 1-row frames; the
   * estimate itself is array algebra on 2k strings. No corpus ever joins
   * or shuffles against the other.
   */
  def overlapEstimate(
      a: DataFrame, aValue: Column, b: DataFrame, bValue: Column,
      k: Int): DataFrame = {
    val sa = kmvSketch(a, aValue, k).withColumnRenamed("kmv", "ka")
    val sb = kmvSketch(b, bValue, k).withColumnRenamed("kmv", "kb")
    val x = slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, k)
    sa.join(broadcast(sb)) // 1 row x 1 row
      .select(
        size(x).as("k_used"),
        size(array_intersect(array_intersect(x, col("ka")), col("kb"))).as("n_both"))
      .select(col("k_used"), col("n_both"),
        when(col("k_used") > 0,
          col("n_both").cast("double") / col("k_used").cast("double"))
          .otherwise(lit(0.0)).as("j_estimate"))
  }

  /**
   * Distinct-count estimate from a sketch array: exact when the corpus has
   * fewer than `k` distinct values (the sketch holds all of them), else the
   * KMV estimator `(k - 1) / u_k` where `u_k` is the k-th smallest hash
   * mapped to (0, 1) via its first 8 hex digits. sbt-tested against exact
   * distinct counts; kept out of the oracle gate because hex-to-double
   * parsing is the one step not expressible identically in both engines.
   */
  def distinctEstimate(sketch: Column, k: Int): Column = {
    val uk = (conv(substring(element_at(sketch, k), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1.0) / uk)
  }
}
