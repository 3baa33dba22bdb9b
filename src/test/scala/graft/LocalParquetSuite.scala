package graft

import graft.parquet.LocalParquet
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class LocalParquetSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("d", DoubleType), StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("af", ArrayType(FloatType, containsNull = false)),
    StructField("as", ArrayType(StringType, containsNull = false))))

  test("LocalParquet.write round-trips through spark.read.parquet") {
    val dir = java.nio.file.Files.createTempDirectory("localparquet-w").toString + "/t"
    val rows = Seq(
      Row(1, 10L, 1.5, true, "hello", Seq(1.0f, 2.5f), Seq("a", "b")),
      Row(2, 20L, -0.25, false, "wörld ", Seq.empty[Float], Seq("c")),
      Row(null, null, null, null, null, null, null))
    LocalParquet.write(spark, dir, schema, rows)
    val got = spark.read.parquet(dir)
    // compare modulo array containsNull: Spark's parquet reader surfaces
    // list elements as nullable regardless of the file's repetition
    def shape(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => ArrayType(shape(e), containsNull = true)
      case other => other
    }
    assert(got.schema.fields.map(f => (f.name, shape(f.dataType))).toSeq ==
      schema.fields.map(f => (f.name, shape(f.dataType))).toSeq)
    val collected = got.orderBy(col("l").asc_nulls_last).collect()
    assert(collected.length == 3)
    assert(collected(0).getInt(0) == 1 && collected(0).getString(4) == "hello")
    assert(collected(0).getSeq[Float](5) == Seq(1.0f, 2.5f))
    assert(collected(1).getSeq[String](6) == Seq("c"))
    assert(collected(1).getString(4) == "wörld ")
    assert(collected(2).isNullAt(0) && collected(2).isNullAt(5))
  }

  test("LocalParquet.read consumes Spark-written and self-written files alike") {
    val dir = java.nio.file.Files.createTempDirectory("localparquet-r").toString
    // Spark-written params-style row (the pre-existing artifact layout)
    spark.range(1).select(lit(512).as("capacity"), lit(7L).as("total_ids"),
      lit(true).as("has_tokenizer"), lit("x").as("tag"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/spark")
    val r = LocalParquet.readRow(spark, s"$dir/spark")
    assert(r.getAs[Int]("capacity") == 512)
    assert(r.getAs[Long]("total_ids") == 7L)
    assert(r.getAs[Boolean]("has_tokenizer"))
    assert(r.getAs[String]("tag") == "x")
    // Spark-written list column
    Seq((0, Seq(1.5f, 2.5f)), (1, Seq(3.5f))).toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/list")
    val lr = LocalParquet.read(spark, s"$dir/list").sortBy(_.getAs[Int]("cid"))
    assert(lr.map(_.getAs[Seq[Float]]("centroid")) == Seq(Seq(1.5f, 2.5f), Seq(3.5f)))
    // self-written read-back
    LocalParquet.write(spark, s"$dir/self",
      StructType(Seq(StructField("file", StringType), StructField("rows", LongType))),
      Seq(Row("f1", 3L), Row("f2", 4L)))
    val sr = LocalParquet.read(spark, s"$dir/self").sortBy(_.getAs[String]("file"))
    assert(sr.map(r2 => (r2.getAs[String]("file"), r2.getAs[Long]("rows"))) ==
      Seq(("f1", 3L), ("f2", 4L)))
  }

  test("LocalParquet.write overwrites and fails loudly on empty dirs") {
    val dir = java.nio.file.Files.createTempDirectory("localparquet-o").toString + "/t"
    val s = StructType(Seq(StructField("v", IntegerType)))
    LocalParquet.write(spark, dir, s, Seq(Row(1), Row(2)))
    LocalParquet.write(spark, dir, s, Seq(Row(3)))
    assert(LocalParquet.read(spark, dir).map(_.getInt(0)) == Seq(3))
    assert(spark.read.parquet(dir).as[Int].collect().toSeq == Seq(3))
    intercept[IllegalArgumentException] {
      LocalParquet.read(spark, java.nio.file.Files.createTempDirectory("localparquet-e").toString)
    }
  }
}
