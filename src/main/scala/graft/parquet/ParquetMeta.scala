package graft.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.{DataFrame, DataFrameReader, Dataset, SparkSession}

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import scala.jdk.CollectionConverters._
import scala.util.Try

/**
 * Parquet metadata scans: DataFrames of per-file footer facts — file
 * metadata, schema, row groups (blocks), per-block columns, and Spark's own
 * file-split planning.
 *
 * Architecture (same shape as the reference, re-implemented:
 * /root/reference/src/main/scala/uk/co/gresearch/spark/parquet/package.scala:560-585):
 * the driver only *lists* files (reusing Spark's FilePartition planning so
 * `parquetPartitions` reports real splits); footers are read on executors via
 * a distributed flatMap — min(#files, defaultParallelism) tasks, no footer
 * bytes ever pass through the driver. That keeps a 100k-file scan parallel
 * and driver-light.
 */
object ParquetMeta {

  /** Hadoop Configuration is not Serializable; minimal wrapper for closures. */
  private[parquet] class SerializableConf(@transient var value: Configuration) extends Serializable {
    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = { out.defaultWriteObject(); value.write(out) }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
    }
  }

  private case class Split(partition: Int, filename: String, start: Long, length: Long, fileLength: Long)

  /** Reuse Spark's FilePartition planning (sensitive to maxPartitionBytes, as documented). */
  private def plannedSplits(reader: DataFrameReader, paths: Seq[String]): Seq[Split] =
    reader.parquet(paths: _*).rdd.partitions.toSeq.flatMap {
      case fp: FilePartition =>
        fp.files.map(f => Split(fp.index, f.filePath.toString, f.start, f.length, f.fileSize))
      case _ => Seq.empty
    }

  private def distributeFiles(spark: SparkSession, files: Seq[String], parallelism: Option[Int]): Dataset[String] = {
    import spark.implicits._
    val n = parallelism.getOrElse(math.min(math.max(files.length, 1), spark.sparkContext.defaultParallelism))
    spark.createDataset(files).repartition(n)
  }

  private def hadoopConf(spark: SparkSession): SerializableConf =
    new SerializableConf(spark.sparkContext.hadoopConfiguration)

  private def withFooter[T](conf: SerializableConf)(path: String)(f: (String, org.apache.parquet.hadoop.metadata.ParquetMetadata) => Iterator[T]): Iterator[T] = {
    val in = HadoopInputFile.fromPath(new Path(path), conf.value)
    val reader = ParquetFileReader.open(in)
    try f(path, reader.getFooter) finally reader.close()
  }

  private def baseName(path: String): String = path.substring(path.lastIndexOf('/') + 1)

  /** Per-file footer facts (SURVEY.md O25). */
  def parquetMetadata(spark: SparkSession, parallelism: Option[Int], paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(spark.read, paths).map(_.filename).distinct
    val conf = hadoopConf(spark)
    distributeFiles(spark, files, parallelism).flatMap { path =>
      withFooter(conf)(path) { (p, footer) =>
        val blocks = footer.getBlocks.asScala.toSeq
        val cols = blocks.flatMap(_.getColumns.asScala)
        Iterator.single((
          baseName(p),
          blocks.size,
          blocks.map(_.getCompressedSize).sum,
          blocks.map(_.getTotalByteSize).sum,
          blocks.map(_.getRowCount).sum,
          footer.getFileMetaData.getSchema.getFieldCount,
          cols.map(_.getValueCount).sum,
          cols.flatMap(c => Try(c.getStatistics.getNumNulls).toOption.filter(_ >= 0)).sum,
          footer.getFileMetaData.getCreatedBy,
          footer.getFileMetaData.getSchema.toString,
          footer.getFileMetaData.getKeyValueMetaData.asScala.toMap))
      }
    }.toDF("filename", "blocks", "compressedBytes", "uncompressedBytes", "rows",
      "columns", "values", "nulls", "createdBy", "schema", "keyValues")
  }

  /** Per-column schema facts (SURVEY.md O26). */
  def parquetSchema(spark: SparkSession, parallelism: Option[Int], paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(spark.read, paths).map(_.filename).distinct
    val conf = hadoopConf(spark)
    distributeFiles(spark, files, parallelism).flatMap { path =>
      withFooter(conf)(path) { (p, footer) =>
        val schema = footer.getFileMetaData.getSchema
        schema.getColumns.asScala.iterator.map { cd =>
          val pt = cd.getPrimitiveType
          (baseName(p),
            cd.getPath.lastOption.getOrElse(""),
            cd.getPath.mkString("."),
            Option(pt.getRepetition).map(_.name).orNull,
            pt.getPrimitiveTypeName.name,
            pt.getTypeLength,
            Option(pt.getLogicalTypeAnnotation).map(_.toString).orNull,
            Option(pt.columnOrder).map(_.toString).orNull,
            cd.getMaxDefinitionLevel,
            cd.getMaxRepetitionLevel)
        }
      }
    }.toDF("filename", "columnName", "columnPath", "repetition", "type", "length",
      "logicalType", "primitiveOrder", "maxDefinitionLevel", "maxRepetitionLevel")
  }

  /** Per-row-group facts (SURVEY.md O27). */
  def parquetBlocks(spark: SparkSession, parallelism: Option[Int], paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(spark.read, paths).map(_.filename).distinct
    val conf = hadoopConf(spark)
    distributeFiles(spark, files, parallelism).flatMap { path =>
      withFooter(conf)(path) { (p, footer) =>
        footer.getBlocks.asScala.iterator.zipWithIndex.map { case (block, i) =>
          val cols = block.getColumns.asScala.toSeq
          (baseName(p),
            i + 1L,
            block.getStartingPos,
            block.getCompressedSize,
            block.getTotalByteSize,
            block.getRowCount,
            cols.size,
            cols.map(_.getValueCount).sum,
            cols.flatMap(c => Try(c.getStatistics.getNumNulls).toOption.filter(_ >= 0)).sum)
        }
      }
    }.toDF("filename", "block", "blockStart", "compressedBytes", "uncompressedBytes",
      "rows", "columns", "values", "nulls")
  }

  /** Per-(row-group, column) facts (SURVEY.md O28). */
  def parquetBlockColumns(spark: SparkSession, parallelism: Option[Int], paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(spark.read, paths).map(_.filename).distinct
    val conf = hadoopConf(spark)
    distributeFiles(spark, files, parallelism).flatMap { path =>
      withFooter(conf)(path) { (p, footer) =>
        footer.getBlocks.asScala.iterator.zipWithIndex.flatMap { case (block, i) =>
          block.getColumns.asScala.iterator.map { c =>
            val stats = Try(c.getStatistics).toOption
            (baseName(p),
              i + 1L,
              c.getPath.asScala.mkString("."),
              c.getCodec.toString,
              c.getEncodings.asScala.map(_.name).toSeq.sorted,
              stats.flatMap(s => Option(s.minAsString())).orNull,
              stats.flatMap(s => Option(s.maxAsString())).orNull,
              stats.map(_.getNumNulls).getOrElse(-1L),
              c.getStartingPos,
              c.getTotalSize,
              c.getTotalUncompressedSize,
              c.getValueCount)
          }
        }
      }
    }.toDF("filename", "block", "column", "codec", "encodings", "minValue", "maxValue",
      "nulls", "columnStart", "compressedBytes", "uncompressedBytes", "values")
  }

  /** Spark's file-split planning: which blocks land in which partition (O29).
    * A block belongs to the split containing its midpoint. */
  def parquetPartitions(spark: SparkSession, parallelism: Option[Int], paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val splits = plannedSplits(spark.read, paths)
    val conf = hadoopConf(spark)
    val n = parallelism.getOrElse(math.min(math.max(splits.length, 1), spark.sparkContext.defaultParallelism))
    spark.createDataset(splits.map(s => (s.partition, s.filename, s.start, s.length, s.fileLength)))
      .repartition(n)
      .flatMap { case (partition, filename, start, length, fileLength) =>
        withFooter(conf)(filename) { (p, footer) =>
          val blocks = footer.getBlocks.asScala.toSeq.filter { b =>
            val mid = b.getStartingPos + b.getCompressedSize / 2
            mid >= start && mid < start + length
          }
          Iterator.single((
            partition, start, start + length, length,
            blocks.size,
            blocks.map(_.getCompressedSize).sum,
            blocks.map(_.getTotalByteSize).sum,
            blocks.map(_.getRowCount).sum,
            baseName(p), fileLength))
        }
      }
      .toDF("partition", "start", "end", "length", "blocks", "compressedBytes",
        "uncompressedBytes", "rows", "filename", "fileLength")
  }
}

/** Reader-side implicit surface: `spark.read.parquetMetadata(path)` etc. */
object implicits {
  implicit class ExtendedDataFrameReader(private val reader: DataFrameReader) extends AnyVal {
    // The reader itself cannot expose the session; require it explicitly via
    // SparkSession.active (classic sessions only).
    private def spark: SparkSession = SparkSession.active

    def parquetMetadata(paths: String*): DataFrame =
      ParquetMeta.parquetMetadata(spark, None, paths)
    def parquetMetadata(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetMetadata(spark, Some(parallelism), paths)

    def parquetSchema(paths: String*): DataFrame =
      ParquetMeta.parquetSchema(spark, None, paths)
    def parquetSchema(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetSchema(spark, Some(parallelism), paths)

    def parquetBlocks(paths: String*): DataFrame =
      ParquetMeta.parquetBlocks(spark, None, paths)
    def parquetBlocks(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetBlocks(spark, Some(parallelism), paths)

    def parquetBlockColumns(paths: String*): DataFrame =
      ParquetMeta.parquetBlockColumns(spark, None, paths)
    def parquetBlockColumns(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetBlockColumns(spark, Some(parallelism), paths)

    def parquetPartitions(paths: String*): DataFrame =
      ParquetMeta.parquetPartitions(spark, None, paths)
    def parquetPartitions(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetPartitions(spark, Some(parallelism), paths)
  }
}
