package graft.write

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Z-order (Morton-curve) data layout for multi-column file skipping.
 *
 * Parquet readers prune files and row groups with min/max statistics, but
 * sorting by one column destroys locality in every other: a scan filtered
 * on `(a BETWEEN ..) AND (b BETWEEN ..)` over data sorted by `a` still
 * reads every file for the `b` predicate. Interleaving the bits of the
 * sort columns into one Morton key and range-partitioning + sorting by it
 * gives every file a small hyper-rectangle of the value space — min/max
 * stats become selective on ALL z-columns at once. At 100 TB this is the
 * difference between scanning a shelf and scanning the warehouse; it is
 * how table formats implement multi-dimensional clustering, rebuilt here
 * on plain parquet.
 *
 * Mechanics: each column is affinely mapped onto `bitsPerColumn` bits
 * using its global min/max (one tiny driver-side agg — same footprint as
 * collecting k means for IVF), then bits interleave column-round-robin
 * into a single long. The whole computation is Column algebra (shifts,
 * masks, ors) — constant-folded, codegen'd, no UDF — and the key is
 * dropped after the sort, so the layout costs one range exchange + local
 * sort, exactly like `writePartitionedBy`.
 *
 * Skew caveat: the affine map spreads VALUES uniformly, not ROWS —
 * `repartitionByRange` on the z-key re-balances rows regardless, so a
 * skewed distribution costs stat selectivity (hot hyper-rectangles), not
 * task balance.
 */
object ZOrder {

  /** Max columns interleavable into one 63-bit key (>= 15-bit lanes each). */
  private val MaxCols = 4

  /** Widest lane that still fits `k` columns in 63 bits, capped at 16. */
  private[write] def autoBits(k: Int): Int = math.min(16, 63 / k)

  /** Affine map of a column onto a `[0, maxLane]` integer lane given its
    * global [min, max]; nulls and constant-range columns land on 0. Shared
    * by the Morton and Hilbert layouts. */
  private[write] def lane(c: Column, mn: Double, mx: Double, maxLane: Long): Column = {
    val span = mx - mn
    val unit = // value scaled to [0, 1]; constant-range columns -> 0
      if (span <= 0.0) lit(0.0)
      else least(greatest((c.cast("double") - lit(mn)) / lit(span), lit(0.0)), lit(1.0))
    coalesce(round(unit * lit(maxLane.toDouble)).cast("long"), lit(0L))
  }

  /** One tiny driver-side min/max agg over `columns` -> (mins, maxs). */
  private[write] def globalRanges(df: DataFrame, columns: Seq[String])
      : (Seq[Double], Seq[Double]) = {
    val aggs = columns.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"_min_$c"), max(col(c)).cast("double").as(s"_max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = columns.indices.map(i => Option(row.get(2 * i)).fold(0.0)(_.asInstanceOf[Double]))
    val maxs = columns.indices.map(i => Option(row.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double]))
    (mins, maxs)
  }

  /**
   * The Morton key for `cols` given their global `[min, max]` ranges:
   * values clamp into `bitsPerColumn`-bit lanes and interleave round-robin
   * (column j supplies bit positions j, j+k, j+2k, ...). Nulls map to lane
   * 0 (sort first). Exposed for tests and custom pipelines.
   * `bitsPerColumn = 0` (the default) auto-sizes lanes to `min(16, 63/k)`,
   * so any 2..4-column call fits the 64-bit key; an explicit width must
   * satisfy `bitsPerColumn * k <= 63` (16-bit lanes fit at most 3 columns).
   */
  def zValue(
      cols: Seq[Column],
      mins: Seq[Double],
      maxs: Seq[Double],
      bitsPerColumn: Int = 0): Column = {
    val k = cols.length
    require(k >= 2 && k <= MaxCols, s"z-order needs 2..$MaxCols columns, got $k")
    require(mins.length == k && maxs.length == k, "mins/maxs must match cols")
    val laneBits = if (bitsPerColumn == 0) autoBits(k) else bitsPerColumn
    require(laneBits >= 1 && laneBits * k <= 63,
      s"bitsPerColumn=$laneBits with $k columns exceeds the 64-bit key")
    val maxLane = (1L << laneBits) - 1
    val lanes = cols.zipWithIndex.map { case (c, j) => lane(c, mins(j), maxs(j), maxLane) }
    // interleave: bit i of lane j lands at position i * k + j
    val terms = for {
      j <- 0 until k
      i <- 0 until laneBits
    } yield shiftleft(shiftrightunsigned(lanes(j), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * Re-layout `df` along the z-curve of `columns` (numeric/date/timestamp):
   * range-partition into `partitions` (0 = leave to AQE/defaults) and sort
   * within partitions by the z-key, which is dropped again. Write the
   * result with any format; its files then carry tight min/max ranges on
   * every z-column. Runs one tiny min/max aggregation on the driver first.
   */
  def zorderBy(
      df: DataFrame,
      columns: Seq[String],
      partitions: Int = 0,
      bitsPerColumn: Int = 0): DataFrame = {
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(", ")}")
    // one driver-visible row of 2k doubles — the only non-lazy step
    val (mins, maxs) = globalRanges(df, columns)

    val zCol = "__graft_zorder"
    val withZ = df.withColumn(zCol,
      zValue(columns.map(col), mins, maxs, bitsPerColumn))
    val ranged =
      if (partitions > 0) withZ.repartitionByRange(partitions, col(zCol))
      else withZ.repartitionByRange(col(zCol))
    ranged.sortWithinPartitions(col(zCol)).drop(zCol)
  }
}
