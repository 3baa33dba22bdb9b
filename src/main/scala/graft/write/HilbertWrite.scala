package graft.write

import graft.functions.layout
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Hilbert-curve data layout — the locality-tightened sibling of
 * [[ZOrder]], the ordering Delta/Iceberg offer as the premium clustering
 * option for the same reason it exists here.
 *
 * Morton (z-order) interleaving is cheap but takes long diagonal jumps at
 * every power-of-two boundary: a file holding a run of z-keys that crosses
 * such a jump spans a WIDE min/max hyper-rectangle, and wide rectangles
 * are what min/max file skipping pays for. The Hilbert curve's defining
 * property — consecutive indices are UNIT steps in exactly one coordinate,
 * proven by [[graft.functions.LayoutKernels.hilbertIndex]]'s adjacency
 * test — means an equal-size run of sorted keys stays inside a compact
 * region, so per-file min/max ranges are tighter on every clustered
 * column at the same write cost.
 *
 * Mechanics match [[ZOrder.zorderBy]] exactly: one tiny driver-side
 * min/max agg, affine lanes, then ONE narrow codegen'd kernel computes
 * the key (the Hilbert transform is a sequential bit recurrence — a
 * kernel loop, where Morton could stay pure Column algebra), one range
 * exchange + local sort, key dropped. Cost at 100 TB is identical to
 * z-order: the layout is a one-time write-side investment that every
 * subsequent multi-predicate scan collects on.
 */
object Hilbert {

  /**
   * The Hilbert key for `cols` given their global `[min, max]` ranges.
   * Same lane quantization as [[ZOrder.zValue]]; `bitsPerColumn = 0`
   * auto-sizes lanes to `min(16, 63/k)`.
   */
  def hilbertValue(
      cols: Seq[Column],
      mins: Seq[Double],
      maxs: Seq[Double],
      bitsPerColumn: Int = 0): Column = {
    val k = cols.length
    require(k >= 2 && k <= 4, s"hilbert layout needs 2..4 columns, got $k")
    require(mins.length == k && maxs.length == k, "mins/maxs must match cols")
    val laneBits = if (bitsPerColumn == 0) ZOrder.autoBits(k) else bitsPerColumn
    require(laneBits >= 1 && laneBits * k <= 63,
      s"bitsPerColumn=$laneBits with $k columns exceeds the 64-bit key")
    val maxLane = (1L << laneBits) - 1
    val lanes = cols.zipWithIndex.map { case (c, j) =>
      ZOrder.lane(c, mins(j), maxs(j), maxLane)
    }
    layout.hilbert_index(array(lanes: _*), laneBits)
  }

  /**
   * Re-layout `df` along the Hilbert curve of `columns` — drop-in
   * replacement for [[ZOrder.zorderBy]] with tighter per-file ranges.
   */
  def hilbertOrderBy(
      df: DataFrame,
      columns: Seq[String],
      partitions: Int = 0,
      bitsPerColumn: Int = 0): DataFrame = {
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(", ")}")
    val (mins, maxs) = ZOrder.globalRanges(df, columns)
    val hCol = "__graft_hilbert"
    val withH = df.withColumn(hCol,
      hilbertValue(columns.map(col), mins, maxs, bitsPerColumn))
    val ranged =
      if (partitions > 0) withH.repartitionByRange(partitions, col(hCol))
      else withH.repartitionByRange(col(hCol))
    ranged.sortWithinPartitions(col(hCol)).drop(hCol)
  }
}
