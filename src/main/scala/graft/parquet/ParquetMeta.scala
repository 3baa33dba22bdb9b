package graft.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.crypto.ParquetCryptoRuntimeException
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.{FileMetaData, ParquetMetadata}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.{DataFrame, DataFrameReader, Dataset, SparkSession}

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Try}

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
 *
 * Encryption: modular-encrypted files with a plaintext footer are reported
 * rather than failed — size/statistics fields that live behind column
 * encryption come back null, `encryption` reports the footer's encryption
 * type, and `parquetBlockColumns.encrypted` flags encrypted columns
 * (reference: ParquetMetaDataUtil.scala:29-111).
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

  /** Reuse Spark's FilePartition planning (sensitive to maxPartitionBytes, as
    * documented). Uses the caller's DataFrameReader so its options apply. */
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

  private def withFooter[T](conf: SerializableConf)(path: String)(f: (String, ParquetMetadata) => Iterator[T]): Iterator[T] = {
    val in = HadoopInputFile.fromPath(new Path(path), conf.value)
    val reader = ParquetFileReader.open(in)
    try f(path, reader.getFooter) finally reader.close()
  }

  private def baseName(path: String): String = path.substring(path.lastIndexOf('/') + 1)

  // --------------------------------------------------------------------------
  // encryption guards (reference: ParquetMetaDataUtil.scala:29-111)
  // --------------------------------------------------------------------------

  /** Footer encryption type name; None when this parquet version lacks the API. */
  private[parquet] def encryptionType(fm: FileMetaData): Option[String] =
    Try(fm.getEncryptionType).toOption.map(_.name)

  /**
   * Whether size/statistics metadata can be accessed: true when a decryptor
   * is attached or the file is unencrypted; when unknown, probe an access
   * that throws ParquetCryptoRuntimeException on locked metadata.
   */
  private[parquet] def isSafe(md: ParquetMetadata): Boolean = {
    val fm = md.getFileMetaData
    if (Option(fm.getFileDecryptor).isDefined) true
    else encryptionType(fm) match {
      case Some("UNENCRYPTED") => true
      case Some(_) => false
      case None =>
        Try(md.getBlocks.asScala.headOption.map(_.getTotalByteSize)) match {
          case Failure(_: ParquetCryptoRuntimeException) => false
          case _ => true
        }
    }
  }

  private def guarded[T](safe: Boolean)(f: => T): Option[T] = if (safe) Some(f) else None

  // --------------------------------------------------------------------------
  // scans
  // --------------------------------------------------------------------------

  /** Per-file footer facts (SURVEY.md O25). `nulls` is null unless every
    * column chunk carries statistics (partial sums would understate). */
  def parquetMetadata(spark: SparkSession, parallelism: Option[Int], paths: Seq[String],
                      reader: Option[DataFrameReader] = None): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(reader.getOrElse(spark.read), paths).map(_.filename).distinct
    val conf = hadoopConf(spark)
    distributeFiles(spark, files, parallelism).flatMap { path =>
      withFooter(conf)(path) { (p, footer) =>
        val safe = isSafe(footer)
        val blocks = footer.getBlocks.asScala.toSeq
        def cols = blocks.flatMap(_.getColumns.asScala)
        Iterator.single((
          baseName(p),
          blocks.size,
          guarded(safe)(blocks.map(_.getCompressedSize).sum),
          guarded(safe)(blocks.map(_.getTotalByteSize).sum),
          blocks.map(_.getRowCount).sum,
          footer.getFileMetaData.getSchema.getColumns.size(),
          guarded(safe)(cols.map(_.getValueCount).sum),
          guarded(safe) {
            val stats = cols.map(c => Option(c.getStatistics))
            if (stats.nonEmpty && stats.forall(_.isDefined)) Some(stats.flatten.map(_.getNumNulls).sum)
            else None
          }.flatten,
          footer.getFileMetaData.getCreatedBy,
          footer.getFileMetaData.getSchema.toString,
          encryptionType(footer.getFileMetaData).orNull,
          footer.getFileMetaData.getKeyValueMetaData.asScala.toMap))
      }
    }.toDF("filename", "blocks", "compressedBytes", "uncompressedBytes", "rows",
      "columns", "values", "nulls", "createdBy", "schema", "encryption", "keyValues")
  }

  /** Per-column schema facts (SURVEY.md O26). */
  def parquetSchema(spark: SparkSession, parallelism: Option[Int], paths: Seq[String],
                    reader: Option[DataFrameReader] = None): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(reader.getOrElse(spark.read), paths).map(_.filename).distinct
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
  def parquetBlocks(spark: SparkSession, parallelism: Option[Int], paths: Seq[String],
                    reader: Option[DataFrameReader] = None): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(reader.getOrElse(spark.read), paths).map(_.filename).distinct
    val conf = hadoopConf(spark)
    distributeFiles(spark, files, parallelism).flatMap { path =>
      withFooter(conf)(path) { (p, footer) =>
        val safe = isSafe(footer)
        footer.getBlocks.asScala.iterator.zipWithIndex.map { case (block, i) =>
          val cols = block.getColumns.asScala.toSeq
          (baseName(p),
            i + 1L,
            block.getStartingPos,
            guarded(safe)(block.getCompressedSize),
            guarded(safe)(block.getTotalByteSize),
            block.getRowCount,
            cols.size,
            guarded(safe)(cols.map(_.getValueCount).sum),
            guarded(safe) {
              val stats = cols.map(c => Option(c.getStatistics))
              if (stats.nonEmpty && stats.forall(_.isDefined)) Some(stats.flatten.map(_.getNumNulls).sum)
              else None
            }.flatten)
        }
      }
    }.toDF("filename", "block", "blockStart", "compressedBytes", "uncompressedBytes",
      "rows", "columns", "values", "nulls")
  }

  /** Per-(row-group, column) facts (SURVEY.md O28), incl. per-column
    * `encrypted` flag. */
  def parquetBlockColumns(spark: SparkSession, parallelism: Option[Int], paths: Seq[String],
                          reader: Option[DataFrameReader] = None): DataFrame = {
    import spark.implicits._
    val files = plannedSplits(reader.getOrElse(spark.read), paths).map(_.filename).distinct
    val conf = hadoopConf(spark)
    distributeFiles(spark, files, parallelism).flatMap { path =>
      withFooter(conf)(path) { (p, footer) =>
        val safe = isSafe(footer)
        footer.getBlocks.asScala.iterator.zipWithIndex.flatMap { case (block, i) =>
          block.getColumns.asScala.iterator.map { c =>
            val encrypted = Try(c.isEncrypted).toOption
            val colSafe = safe || encrypted.contains(false)
            val stats = guarded(colSafe)(Option(c.getStatistics)).flatten
            (baseName(p),
              i + 1L,
              c.getPath.asScala.mkString("."),
              guarded(colSafe)(c.getCodec.toString).orNull,
              guarded(colSafe)(c.getEncodings.asScala.map(_.name).toSeq.sorted).getOrElse(Seq.empty),
              stats.flatMap(s => Option(s.minAsString())).orNull,
              stats.flatMap(s => Option(s.maxAsString())).orNull,
              stats.map(_.getNumNulls),
              guarded(colSafe)(c.getStartingPos),
              guarded(colSafe)(c.getTotalSize),
              guarded(colSafe)(c.getTotalUncompressedSize),
              guarded(colSafe)(c.getValueCount),
              encrypted)
          }
        }
      }
    }.toDF("filename", "block", "column", "codec", "encodings", "minValue", "maxValue",
      "nulls", "columnStart", "compressedBytes", "uncompressedBytes", "values", "encrypted")
  }

  /** Spark's file-split planning: which blocks land in which partition (O29).
    * A block belongs to the split containing its midpoint. */
  def parquetPartitions(spark: SparkSession, parallelism: Option[Int], paths: Seq[String],
                        reader: Option[DataFrameReader] = None): DataFrame = {
    import spark.implicits._
    val splits = plannedSplits(reader.getOrElse(spark.read), paths)
    val conf = hadoopConf(spark)
    val n = parallelism.getOrElse(math.min(math.max(splits.length, 1), spark.sparkContext.defaultParallelism))
    spark.createDataset(splits.map(s => (s.partition, s.filename, s.start, s.length, s.fileLength)))
      .repartition(n)
      .flatMap { case (partition, filename, start, length, fileLength) =>
        withFooter(conf)(filename) { (p, footer) =>
          val safe = isSafe(footer)
          // block offsets live behind column encryption: without keys, assign
          // all blocks to the file's first split rather than failing
          val blocks =
            if (safe) footer.getBlocks.asScala.toSeq.filter { b =>
              val mid = b.getStartingPos + b.getCompressedSize / 2
              mid >= start && mid < start + length
            }
            else if (start == 0) footer.getBlocks.asScala.toSeq
            else Seq.empty
          Iterator.single((
            partition, start, start + length, length,
            blocks.size,
            guarded(safe)(blocks.map(_.getCompressedSize).sum),
            guarded(safe)(blocks.map(_.getTotalByteSize).sum),
            blocks.map(_.getRowCount).sum,
            baseName(p), fileLength))
        }
      }
      .toDF("partition", "start", "end", "length", "blocks", "compressedBytes",
        "uncompressedBytes", "rows", "filename", "fileLength")
  }
}

/** Reader-side implicit surface: `spark.read.parquetMetadata(path)` etc.
  * The receiver reader is used for file planning, so options set on it apply. */
object implicits {
  implicit class ExtendedDataFrameReader(private val reader: DataFrameReader) extends AnyVal {
    // The reader itself cannot expose the session; require it explicitly via
    // SparkSession.active (classic sessions only).
    private def spark: SparkSession = SparkSession.active

    def parquetMetadata(paths: String*): DataFrame =
      ParquetMeta.parquetMetadata(spark, None, paths, Some(reader))
    def parquetMetadata(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetMetadata(spark, Some(parallelism), paths, Some(reader))

    def parquetSchema(paths: String*): DataFrame =
      ParquetMeta.parquetSchema(spark, None, paths, Some(reader))
    def parquetSchema(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetSchema(spark, Some(parallelism), paths, Some(reader))

    def parquetBlocks(paths: String*): DataFrame =
      ParquetMeta.parquetBlocks(spark, None, paths, Some(reader))
    def parquetBlocks(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetBlocks(spark, Some(parallelism), paths, Some(reader))

    def parquetBlockColumns(paths: String*): DataFrame =
      ParquetMeta.parquetBlockColumns(spark, None, paths, Some(reader))
    def parquetBlockColumns(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetBlockColumns(spark, Some(parallelism), paths, Some(reader))

    def parquetPartitions(paths: String*): DataFrame =
      ParquetMeta.parquetPartitions(spark, None, paths, Some(reader))
    def parquetPartitions(parallelism: Int, paths: String*): DataFrame =
      ParquetMeta.parquetPartitions(spark, Some(parallelism), paths, Some(reader))
  }
}
