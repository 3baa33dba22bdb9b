package graft.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/**
 * Driver-side parquet footer statistics — the metadata a Spark scan's own
 * planning reads (row-group min/max), exposed without submitting a job.
 * Replaces "run a filtered scan just to learn WHICH file holds key k"
 * probes: the scan's row-group pruning consults exactly these stats, so
 * asking them directly is the same information at zero job-submission
 * cost. O(files) footer reads, metadata only — the same class of work the
 * scan planner does before the first task launches.
 */
object FooterStats {

  /** Per-file `(min, max)` of a required/optional INT64 column across all
    * row groups; None when the file carries no stats for the column. */
  def longColumnRange(conf: Configuration, file: Path,
                      column: String): Option[(Long, Long)] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val ranges = reader.getFooter.getBlocks.toArray.flatMap { b =>
        b.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
          .getColumns.toArray.collectFirst {
            case c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
              if c.getPath.toDotString == column &&
                c.getStatistics != null && !c.getStatistics.isEmpty =>
              (c.getStatistics.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                c.getStatistics.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
      }
      if (ranges.isEmpty) None
      else Some((ranges.map(_._1).min, ranges.map(_._2).max))
    } finally reader.close()
  }
}
