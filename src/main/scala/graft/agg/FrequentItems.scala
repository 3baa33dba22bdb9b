package graft.agg

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

import scala.collection.mutable

/**
 * Exact frequent items (heavy hitters) at corpus scale.
 *
 * A plain `groupBy(item).count()` shuffles every distinct item. For the
 * columns where heavy hitters matter — URLs, hosts, n-grams, user ids —
 * distinct cardinality is within a small factor of the row count, so at
 * 100 TB the shuffle IS the job, just to find a handful of hot keys.
 *
 * Two-pass design with a bounded shuffle instead:
 *
 *  1. Candidate generation: a Misra-Gries summary (capacity m) runs as a
 *     typed [[Aggregator]] — each input partition reduces to at most m
 *     (item, residual) entries map-side, merges pairwise to one summary of
 *     at most m entries. Shuffled data: m entries per partition, total
 *     m * partitions, independent of input size. The MG guarantee survives
 *     unions of decrements: any item with true count > N/(m+1) is present in
 *     the merged summary, so with m >= 1/minSupport the candidate set is a
 *     superset of every item at or above support (false positives possible,
 *     false negatives not).
 *  2. Exact verification: broadcast the candidate set (≤ m items), semi-join
 *     the corpus against it (narrow — no shuffle of the corpus), and count
 *     only the surviving rows exactly. The groupBy that remains shuffles
 *     only rows of candidate items.
 *
 * Output is EXACT (item, cnt) for every item with count >= ceil(N *
 * minSupport) — the sketch only bounds the shuffle, it never touches the
 * reported numbers. The support threshold is computed in-plan from the same
 * scan, so no extra driver-side count pass.
 *
 * The MG summary (Berinde et al., "Space-optimal heavy hitters with strong
 * error bounds", PODS'09 for the merge bound) is deliberately preferred over
 * count-min sketches: it is deterministic, mergeable by simple count-sum +
 * re-prune, and its candidate set is tiny enough to broadcast.
 */
object FrequentItems {

  /** Misra-Gries summary of a stream of strings, capacity `m` entries. */
  private[graft] class MisraGriesAgg(m: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(b: mutable.HashMap[String, Long], v: String): mutable.HashMap[String, Long] = {
      val cur = b.getOrElse(v, 0L)
      if (cur > 0L || b.size < m) b.update(v, cur + 1L)
      else {
        // decrement-all: every tracked count pays for this untracked arrival
        val dead = mutable.ArrayBuffer.empty[String]
        b.mapValuesInPlace((_, c) => c - 1L)
        b.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(b.remove)
      }
      b
    }

    override def merge(
        b1: mutable.HashMap[String, Long],
        b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
      small.foreach { case (k, c) => big.update(k, big.getOrElse(k, 0L) + c) }
      if (big.size > m) {
        // subtract the (m+1)-th largest residual from all, drop non-positive:
        // the standard mergeable-summaries prune (keeps the N/(m+1) bound)
        val counts = big.values.toArray
        java.util.Arrays.sort(counts)
        val d = counts(counts.length - (m + 1)) // (m+1)-th largest
        val dead = mutable.ArrayBuffer.empty[String]
        big.mapValuesInPlace((_, c) => c - d)
        big.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(big.remove)
      }
      big
    }

    override def finish(b: mutable.HashMap[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (k, c) => (-c, k) }

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /**
   * Exact counts of every value of `itemCol` with frequency at least
   * `minSupport` (fraction of non-null rows). `capacity` bounds the sketch;
   * must satisfy `capacity + 1 > 1 / minSupport` for the no-false-negative
   * guarantee (checked): Misra-Gries only keeps items whose count is
   * STRICTLY greater than N/(capacity+1), so at exact equality an item whose
   * count equals the support threshold could be pruned. Output columns:
   * `item` (string), `cnt` (bigint), sorted nowhere — order downstream if
   * needed.
   */
  def frequentItems(
      df: DataFrame,
      itemCol: Column,
      minSupport: Double,
      capacity: Int = 4096): DataFrame = {
    require(minSupport > 0.0 && minSupport <= 1.0, s"minSupport must be in (0, 1]: $minSupport")
    require(capacity + 1 > 1.0 / minSupport,
      s"capacity=$capacity too small for minSupport=$minSupport " +
        s"(the Misra-Gries bound is strict: needs capacity + 1 > ${1.0 / minSupport})")
    val spark = df.sparkSession
    import spark.implicits._

    val items = df.select(itemCol.cast("string").as("item")).filter($"item".isNotNull)
    val mg = new MisraGriesAgg(capacity)

    // pass 1: bounded-size candidate set (one tiny row out of the aggregation)
    val candidates = items.as[String]
      .select(mg.toColumn.name("cands"))
      .select(explode($"cands").as("c"))
      .select($"c._1".as("item"))

    // total non-null rows, computed in-plan (single tiny row)
    val total = items.agg(count(lit(1)).as("n_total"))

    // pass 2: exact recount of candidate items only; corpus side stays narrow
    items
      .join(broadcast(candidates), Seq("item"), "leftsemi")
      .groupBy($"item")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter($"cnt" >= ceil($"n_total" * lit(minSupport)))
      .select($"item", $"cnt")
  }
}
