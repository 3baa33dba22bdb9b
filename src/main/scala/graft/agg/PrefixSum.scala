package graft.agg

import graft.functions.distinctPrefixFor
import graft.UnpersistHandle
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/**
 * Global prefix sums (running totals) without a single-partition window.
 *
 * `sum(x).over(Window.orderBy(...))` moves ALL data to one partition — the
 * same scaling cliff global `row_number` has, with the same cure
 * (see [[graft.RowNumbers]], whose three-phase plan this generalizes from
 * counting rows to summing an arbitrary numeric column):
 *
 *  1. global range order;
 *  2. pin partition ids (`spark_partition_id` + load-bearing persist) and
 *     compute partition-local running sums;
 *  3. per-partition totals (one tiny row each) -> cumulative offsets over a
 *     #partitions-row window -> broadcast-join the offset back and add.
 *
 * The only full-data exchange is the range sort; coordination traffic is
 * ~16 bytes per partition.
 */
object PrefixSum {

  /**
   * Dense partition-id frame `0..numPartitions-1` for the offsets side of
   * the three-phase plan. Per-partition totals come from a groupBy, so an
   * EMPTY partition produces no row — keying the join on pid+1 would then
   * find nothing for the partition after a gap and silently drop every
   * earlier partition's contribution. Left-joining the totals onto this
   * dense frame closes the gap: null totals are skipped by the sum/max
   * window aggregate, carrying the cumulative value forward across empty
   * partitions. `getNumPartitions` is metadata-only (no job).
   */
  private[graft] def densePids(withPid: DataFrame, pidCol: String): DataFrame =
    // dense 0..max(observed pid) DERIVED inside the plan — never
    // `withPid.rdd.getNumPartitions`: under AQE, `.rdd` finalizes the
    // adaptive plan, which MATERIALIZES the sort's shuffle stages as real
    // jobs before the caller's own action runs the same work again (a
    // measured double-job on every prefix-sum consumer, §1.2). Trailing
    // empty partitions beyond the max observed pid carry no rows, so
    // nothing needs an offset there; gap partitions in the middle stay
    // covered, which is all the pid+1-shifted join needs. The extra
    // subplan is one cache-backed max over #partition rows.
    withPid.agg(max(col(pidCol)).as("__mx"))
      .select(explode(when(col("__mx").isNull, array().cast("array<int>"))
        .otherwise(sequence(lit(0), col("__mx")))).as(pidCol))

  /**
   * Add `outputColumn` = running total of `valueCol` over the global order
   * `order` (ties broken by the trailing order columns you pass — make the
   * order total for deterministic output). `exclusive` (default) sums rows
   * STRICTLY BEFORE the current row (first row gets 0), which is what
   * offset/packing computations want; set it false for inclusive totals.
   *
   * Sums in the column's own numeric type (integral -> long, double -> double,
   * decimal -> widened decimal), so fractional inputs keep their fractions.
   */
  def withRunningTotal(
      df: DataFrame,
      valueCol: Column,
      order: Seq[Column],
      outputColumn: String = "running_total",
      exclusive: Boolean = true,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      unpersistHandle: UnpersistHandle = UnpersistHandle.Noop): DataFrame = {
    require(order.nonEmpty, "withRunningTotal needs at least one order column")
    require(storageLevel != StorageLevel.NONE,
      "storageLevel must not be NONE: the persist pins partition ids between phases")

    val prefix = distinctPrefixFor(df.columns.toSeq :+ outputColumn)
    val valCol = prefix + "value"
    val pidCol = prefix + "partition_id"
    val localCol = prefix + "local_sum"
    val totalCol = prefix + "partition_total"
    val offsetCol = prefix + "offset"

    // phase 1+2: order, pin pids, persist; partition-local running sums
    val withPid = df
      .withColumn(valCol, valueCol)
      .orderBy(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .persist(storageLevel)
    unpersistHandle.setDataFrame(withPid)

    val bounds =
      if (exclusive) (Window.unboundedPreceding, -1L) else (Window.unboundedPreceding, Window.currentRow)
    val localWindow = Window.partitionBy(col(pidCol)).orderBy(order: _*)
      .rowsBetween(bounds._1, bounds._2)
    val withLocal = withPid.withColumn(localCol,
      coalesce(sum(col(valCol)).over(localWindow), lit(0)))

    // phase 3: per-partition totals -> cumulative offsets (tiny window,
    // exactly #partitions rows — constant partition key documents the
    // single-partition intent and silences WindowExec's warning),
    // shifted one partition forward, broadcast back
    val cumWindow = Window.partitionBy(lit(0)).orderBy(col(pidCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = densePids(withPid, pidCol)
      .join(withPid.groupBy(col(pidCol)).agg(sum(col(valCol)).as(totalCol)),
        Seq(pidCol), "left")
      .withColumn(offsetCol, sum(col(totalCol)).over(cumWindow))
      .select((col(pidCol) + 1).as(pidCol), col(offsetCol))

    withLocal
      .join(broadcast(offsets), Seq(pidCol), "left")
      .withColumn(outputColumn, col(localCol) + coalesce(col(offsetCol), lit(0)))
      .drop(valCol, pidCol, localCol, offsetCol)
  }

  /**
   * Global running MAXIMUM over `order` — the same three-phase plan as
   * [[withRunningTotal]] with max in place of sum (max is equally
   * decomposable: partition-local running max, then the cumulative max of
   * whole previous partitions, combined with `greatest`). `exclusive`
   * (default) takes the max over rows STRICTLY BEFORE the current row —
   * the first row gets null (there is no previous value; a sentinel would
   * corrupt comparisons against genuinely small values). The streaming
   * watermark recurrence is exactly an exclusive running max of event
   * time over arrival order, which is what [[graft.events.Lateness]]
   * builds on.
   */
  def withRunningMax(
      df: DataFrame,
      valueCol: Column,
      order: Seq[Column],
      outputColumn: String = "running_max",
      exclusive: Boolean = true,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      unpersistHandle: UnpersistHandle = UnpersistHandle.Noop): DataFrame = {
    require(order.nonEmpty, "withRunningMax needs at least one order column")
    require(storageLevel != StorageLevel.NONE,
      "storageLevel must not be NONE: the persist pins partition ids between phases")

    val prefix = distinctPrefixFor(df.columns.toSeq :+ outputColumn)
    val valCol = prefix + "value"
    val pidCol = prefix + "partition_id"
    val localCol = prefix + "local_max"
    val totalCol = prefix + "partition_max"
    val offsetCol = prefix + "offset"

    val withPid = df
      .withColumn(valCol, valueCol)
      .orderBy(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .persist(storageLevel)
    unpersistHandle.setDataFrame(withPid)

    val bounds =
      if (exclusive) (Window.unboundedPreceding, -1L)
      else (Window.unboundedPreceding, Window.currentRow)
    val localWindow = Window.partitionBy(col(pidCol)).orderBy(order: _*)
      .rowsBetween(bounds._1, bounds._2)
    val withLocal = withPid.withColumn(localCol, max(col(valCol)).over(localWindow))

    val cumWindow = Window.partitionBy(lit(0)).orderBy(col(pidCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // dense pids: with only non-empty partitions in the frame, a gap
    // partition would leave the NEXT partition offset-less — and unlike
    // the sum twin, greatest(local, null) cannot distinguish
    // null-because-first-partition from null-because-gap
    val offsets = densePids(withPid, pidCol)
      .join(withPid.groupBy(col(pidCol)).agg(max(col(valCol)).as(totalCol)),
        Seq(pidCol), "left")
      .withColumn(offsetCol, max(col(totalCol)).over(cumWindow))
      .select((col(pidCol) + 1).as(pidCol), col(offsetCol))

    withLocal
      .join(broadcast(offsets), Seq(pidCol), "left")
      // greatest ignores nulls; both-null (first row, first partition) stays null
      .withColumn(outputColumn, greatest(col(localCol), col(offsetCol)))
      .drop(valCol, pidCol, localCol, offsetCol)
  }
}
