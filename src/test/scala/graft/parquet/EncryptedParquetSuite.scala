package graft.parquet

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Encrypted-parquet handling of the metadata scans: plaintext-footer
  * encrypted files are reported (not failed), locked fields come back null,
  * and column encryption flags are exposed. */
class EncryptedParquetSuite extends AnyFunSuite with SparkTest {

  private val kmsConfs = Map(
    "parquet.crypto.factory.class" -> "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
    "parquet.encryption.kms.client.class" -> "graft.parquet.TestKms",
    "graft.test.kms.keys" -> "k1:AAECAwQFBgcICQoLDA0ODw==",
    "parquet.encryption.key.list" -> "k1:AAECAwQFBgcICQoLDA0ODw==")

  private def withKmsConf[T](extra: Map[String, String])(f: => T): T = {
    val hc = spark.sparkContext.hadoopConfiguration
    val all = kmsConfs ++ extra
    val previous = all.keys.map(k => k -> Option(hc.get(k))).toMap
    all.foreach { case (k, v) => hc.set(k, v) }
    try f finally previous.foreach {
      case (k, Some(v)) => hc.set(k, v)
      case (k, None) => hc.unset(k)
    }
  }

  private lazy val encryptedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_enc").toString + "/data"
    withKmsConf(Map(
      "parquet.encryption.footer.key" -> "k1",
      "parquet.encryption.column.keys" -> "k1:secret",
      "parquet.encryption.plaintext.footer" -> "true")) {
      spark.range(100)
        .select(col("id"), (col("id") * 2).as("secret"), (col("id") % 5).as("open"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  test("parquetMetadata reports plaintext-footer encryption without failing") {
    val row = ParquetMeta.parquetMetadata(spark, None, Seq(encryptedDir))
      .select("encryption", "rows", "compressedBytes", "values").collect().head
    assert(row.getString(0) == "PLAINTEXT_FOOTER")
    assert(row.getLong(1) == 100L)
    assert(row.isNullAt(2), "locked size must be null")
    assert(row.isNullAt(3), "locked value count must be null")
  }

  test("parquetMetadata reports UNENCRYPTED for plain files") {
    val rows = ParquetMeta.parquetMetadata(spark, None, Seq("/root/testdata/sf0.001/orders.parquet"))
      .select("encryption", "compressedBytes").collect()
    assert(rows.forall(_.getString(0) == "UNENCRYPTED"))
    assert(rows.forall(!_.isNullAt(1)))
  }

  test("parquetBlockColumns flags encrypted columns and nulls locked fields") {
    val rows = ParquetMeta.parquetBlockColumns(spark, None, Seq(encryptedDir))
      .select("column", "encrypted", "values", "minValue").collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(rows("secret")._1, "secret column must be flagged encrypted")
    assert(!rows("id")._1 && !rows("open")._1)
    assert(rows("secret")._2 && rows("secret")._3, "locked column stats must be null")
  }

  test("parquetBlocks and parquetPartitions survive encrypted files") {
    val block = ParquetMeta.parquetBlocks(spark, None, Seq(encryptedDir))
      .select("rows", "compressedBytes").collect().head
    assert(block.getLong(0) == 100L && block.isNullAt(1))
    val part = ParquetMeta.parquetPartitions(spark, None, Seq(encryptedDir))
      .agg(sum("rows")).collect().head.getLong(0)
    assert(part == 100L)
  }

  test("encrypted files are unreadable without keys but metadata scan still works") {
    // double-check the fixture actually IS encrypted: plain read must fail
    val err = intercept[Exception] {
      spark.read.parquet(encryptedDir).select(sum("secret")).collect()
    }
    assert(err.getMessage != null)
  }
}
