package graft.write

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Dataset, Row}

/**
 * One-call bucketed table write for shuffle-free co-located joins.
 *
 * Bucketing is THE pre-commitment that deletes the join shuffle at 100 TB:
 * two tables written with the same bucket count on the join key hash-split
 * identically on disk, so Spark plans their join (and `groupBy` on the
 * bucket key) with zero Exchange — the shuffle is paid once at write time,
 * then amortized over every downstream read. Use it for the fact tables
 * that are joined on the same key every day; use `broadcast()` for small
 * dims and AQE/salting for ad-hoc skew instead.
 *
 * Layout discipline, same spirit as [[PartitionedWrite]]: a naive
 * `bucketBy` write lets EVERY input task emit a file per bucket it sees —
 * tasks × buckets small files. This helper first hash-repartitions into
 * exactly `numBuckets` partitions on the bucket columns; Spark's
 * repartition hash and its bucket-id hash are the same Murmur3-mod, so each
 * write task holds exactly one complete bucket and each bucket becomes ONE
 * file. Rows are sorted within buckets by `sortColumns` (metadata Spark's
 * reader exploits to skip the sort of a sort-merge join).
 *
 * Returns the configured writer: finish with `.saveAsTable(name)` (bucket
 * metadata lives in the catalog; a plain `.save(path)` loses it).
 */
object BucketedWrite {

  def writeBucketedBy[T](
      ds: Dataset[T],
      numBuckets: Int,
      bucketColumns: Seq[Column],
      sortColumns: Seq[Column] = Seq.empty): DataFrameWriter[Row] = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    require(bucketColumns.nonEmpty, "bucket columns must not be empty")

    val bucketNames = PartitionedWrite.columnNames(ds, bucketColumns)
    val sortNames = PartitionedWrite.columnNames(ds, sortColumns)

    val arranged: DataFrame = ds.toDF()
      .repartition(numBuckets, bucketColumns: _*)
      .sortWithinPartitions((bucketColumns ++ sortColumns): _*)

    val w = arranged.write.bucketBy(numBuckets, bucketNames.head, bucketNames.tail: _*)
    if (sortNames.nonEmpty) w.sortBy(sortNames.head, sortNames.tail: _*) else w
  }
}
