package graft

import graft.functions.distinctPrefixFor
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/**
 * Global contiguous row numbers (1..N) without collapsing the Dataset into a
 * single partition.
 *
 * Three-phase plan (reference: /root/reference/src/main/scala/uk/co/gresearch/
 * spark/RowNumbers.scala:43-95, ROW_NUMBER.md):
 *  1. order the data globally (range exchange) — or tag with
 *     `monotonically_increasing_id` when no order is given (no shuffle);
 *  2. pin partition assignment with `spark_partition_id` and `persist` (the
 *     persist is load-bearing: it stops AQE from re-planning between phases
 *     and changing partition ids), then compute per-partition row numbers
 *     with a window partitioned by the partition id;
 *  3. aggregate per-partition max row numbers (~12 bytes per partition into
 *     one tiny single-partition window), turn them into cumulative offsets,
 *     and broadcast-join them back.
 *
 * At scale: the only full-data exchanges are the optional global sort and the
 * pid-window; the offsets side is #partitions rows, always broadcastable.
 */
object RowNumbers {

  def withRowNumbers(
      df: DataFrame,
      rowNumberColumnName: String = "row_number",
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      unpersistHandle: UnpersistHandle = UnpersistHandle.Noop,
      order: Seq[Column] = Seq.empty): DataFrame = {

    require(storageLevel != StorageLevel.NONE,
      "storageLevel must not be NONE: the persist pins partition ids between phases")

    val prefix = distinctPrefixFor(df.columns.toSeq :+ rowNumberColumnName)
    val monoIdCol = prefix + "mono_id"
    val pidCol = prefix + "partition_id"
    val localRnCol = prefix + "local_row_number"
    val maxRnCol = prefix + "max_row_number"
    val offsetCol = prefix + "cum_row_number"

    // phase 1: global order (or preserve current order with a monotonic id)
    val ordered =
      if (order.isEmpty) df.withColumn(monoIdCol, monotonically_increasing_id())
      else df.orderBy(order: _*)

    // phase 2: pin partitions and persist, then local row numbers
    val withPid = ordered.withColumn(pidCol, spark_partition_id()).persist(storageLevel)
    unpersistHandle.setDataFrame(withPid)

    val localOrder = if (order.isEmpty) Seq(col(monoIdCol)) else order
    val localWindow = Window.partitionBy(col(pidCol)).orderBy(localOrder: _*)
    val withLocalRn = withPid.withColumn(localRnCol, row_number().over(localWindow))

    // phase 3: cumulative offsets over the (tiny) per-partition maxima,
    // shifted by one partition, broadcast back. The window sees exactly
    // #partitions rows — single-partition by design; the constant
    // partition key makes that explicit instead of tripping WindowExec's
    // "No Partition Defined" warning on every run
    val cumWindow = Window.partitionBy(lit(0)).orderBy(col(pidCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // dense pid frame: per-partition maxima exist only for NON-EMPTY
    // partitions, and the pid+1 join after an empty partition (possible
    // under heavy range-sort skew) would otherwise find no offset row and
    // restart numbering; null maxima are skipped by the window sum, so
    // the cumulative offset carries across gaps
    val offsets = graft.agg.PrefixSum.densePids(withPid, pidCol)
      .join(withLocalRn.groupBy(col(pidCol)).agg(max(col(localRnCol)).as(maxRnCol)),
        Seq(pidCol), "left")
      .withColumn(offsetCol, sum(col(maxRnCol)).over(cumWindow))
      .select((col(pidCol) + 1).as(pidCol), col(offsetCol))

    withLocalRn
      .join(broadcast(offsets), Seq(pidCol), "left")
      .withColumn(rowNumberColumnName, col(localRnCol) + coalesce(col(offsetCol), lit(0L)))
      .drop(monoIdCol, pidCol, localRnCol, offsetCol)
  }
}
