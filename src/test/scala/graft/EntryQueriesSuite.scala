package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the gate queries' robustness to datagen drift in the `events.ts`
 * physical type. The round-5 datagen silently switched `ts` from parquet
 * TIMESTAMP(NANOS) (read as long nanos under nanosAsLong=true) to
 * timestamp[us] (TIMESTAMP_NTZ), which broke `asof_join`/`sessionize` at
 * the bench gate with a DATATYPE_MISMATCH on `ts DIV 1000`. SparkEntry now
 * dispatches on the actual column type; these tests keep every branch live.
 */
class EntryQueriesSuite extends AnyFunSuite with SparkTest {

  private val base = 1700000000000000L // epoch micros

  test("eventTsUs yields identical epoch micros for long-nanos, NTZ, and instant ts") {
    import spark.implicits._
    val micros = Seq(base, base + 1500000L, base + 90000000L)

    val fromLongNanos = Seq(micros.map(_ * 1000L): _*).toDF("ts") // nanos column
    val ntzSchema = StructType(Seq(StructField("ts", TimestampNTZType)))
    val fromNtz = spark.createDataFrame(
      spark.sparkContext.parallelize(
        micros.map(us => Row(java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)))),
      ntzSchema)
    val tsSchema = StructType(Seq(StructField("ts", TimestampType)))
    val fromInstant = spark.createDataFrame(
      spark.sparkContext.parallelize(
        micros.map(us => Row(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          us / 1000000L, (us % 1000000L) * 1000L))))),
      tsSchema)

    for (df <- Seq(fromLongNanos, fromNtz, fromInstant)) {
      val got = df.select(SparkEntry.eventTsUs(df).as("us"))
        .as[Long].collect().sorted.toSeq
      assert(got == micros, s"ts type ${df.schema("ts").dataType}")
    }
  }

  test("eventTsUs rejects unsupported ts types") {
    import spark.implicits._
    val df = Seq("not-a-timestamp").toDF("ts")
    val e = intercept[IllegalStateException] { SparkEntry.eventTsUs(df) }
    assert(e.getMessage.contains("unsupported events.ts type"))
  }

  test("every gate query executes against the real sf0.001 datagen output") {
    // The full-surface datagen-drift guard: any silent schema/type change in
    // the driver-generated tables surfaces here at `sbt test` time instead
    // of at the round gate. Execution only (forced via toRdd.count, like
    // Bench) — value correctness is the DuckDB oracle's job.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, dir).queryExecution.toRdd.count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("events gate queries run against the real sf0.001 datagen output") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())

    val asof = SparkEntry.queries("asof_join")(spark, dir)
    assert(asof.columns.toSeq == Seq("event_id", "user_id", "ts_us", "m_ts", "m_value"))
    assert(asof.count() > 0)

    val sess = SparkEntry.queries("sessionize")(spark, dir)
    assert(sess.columns.contains("session_idx"))
    assert(sess.count() > 0)

    val nulls = SparkEntry.queries("count_null_events")(spark, dir)
    assert(nulls.count() == 1)
  }
}
