package graft.write

import graft.UnpersistHandle
import graft.fluent.Fluent._
import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Dataset, Row}

/**
 * One-call partitioned write with an optimal file layout:
 * range-partition on (partition columns ++ file columns) so each output
 * partition-dir gets few, evenly sized files, sort within partitions so
 * files are internally ordered, optionally project, then hand off to
 * `DataFrameWriter.partitionBy`.
 *
 * Cost shape at scale: exactly one range exchange + local sort before the
 * write — no global sort, no driver involvement. The SPARK-40588 AQE caching
 * workaround the reference carries is obsolete on Spark >= 3.4 and dropped
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/package.scala:61-73, 717-768).
 */
object PartitionedWrite {

  /** Resolve Columns to their output names by analyzing a projection over the
    * dataset (handles attributes and aliases; reference: package.scala:751). */
  private[graft] def columnNames[T](ds: Dataset[T], columns: Seq[Column]): Seq[String] =
    ds.toDF().select(columns: _*).queryExecution.analyzed.output.map(_.name)

  def writePartitionedBy[T](
      ds: Dataset[T],
      partitionColumns: Seq[Column],
      moreFileColumns: Seq[Column] = Seq.empty,
      moreFileOrder: Seq[Column] = Seq.empty,
      partitions: Option[Int] = None,
      writtenProjection: Option[Seq[Column]] = None,
      unpersistHandle: UnpersistHandle = UnpersistHandle.Noop): DataFrameWriter[Row] = {
    require(partitionColumns.nonEmpty, "partition columns must not be empty")

    val partitionColumnNames = columnNames(ds, partitionColumns)
    val rangeColumns = partitionColumns ++ moreFileColumns
    val sortColumns = partitionColumns ++ moreFileColumns ++ moreFileOrder

    val arranged: DataFrame = ds.toDF()
      .on(partitions.isDefined)
        .either(_.repartitionByRange(partitions.get, rangeColumns: _*))
        .or(_.repartitionByRange(rangeColumns: _*))
      .sortWithinPartitions(sortColumns: _*)
      .when(writtenProjection.isDefined).call(_.select(writtenProjection.get: _*))

    // a non-Noop handle opts into caching the arranged data (e.g. to write it
    // twice); the handle then owns releasing that cache
    if (unpersistHandle ne UnpersistHandle.Noop) {
      arranged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    unpersistHandle.setDataFrame(arranged)
    arranged.write.partitionBy(partitionColumnNames: _*)
  }
}
