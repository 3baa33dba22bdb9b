package graft

import graft.fluent.Fluent._
import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("backticks quotes only where needed") {
    assert(backticks("column") === "column")
    assert(backticks("a.column") === "`a.column`")
    assert(backticks("a column") === "`a column`")
    assert(backticks("a`column") === "`a``column`")
    assert(backticks("some", "a.column") === "some.`a.column`")
    assert(backticks("_under_score9") === "_under_score9")
    assert(backticks("9starts") === "`9starts`")
  }

  test("distinctPrefixFor always yields a fresh prefix") {
    assert(distinctPrefixFor(Seq.empty) === "_")
    assert(distinctPrefixFor(Seq("a", "b")) === "_")
    assert(distinctPrefixFor(Seq("_a", "b")) === "__")
    assert(distinctPrefixFor(Seq("___a", "_b")) === "____")
  }

  test("count_null counts nulls") {
    val df = Seq(Some(1), None, Some(3), None, None).toDF("v")
    val got = df.agg(count_null($"v").as("nulls"), count($"v").as("nonnull"))
      .as[(Long, Long)].head()
    assert(got === ((3L, 2L)))
  }

  test("ticks round trips") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2020-06-01 12:34:56.789")
    val df = Seq(ts).toDF("t")
    val ticks = df.select(timestampToDotNetTicks($"t").as("ticks")).as[Long].head()
    // 2020-06-01T12:34:56.789Z == 1591014896.789 epoch seconds
    assert(ticks === 621355968000000000L + 15910148967890000L)
    val back = df.select(dotNetTicksToTimestamp(timestampToDotNetTicks($"t")).as("t"))
      .as[Timestamp].head()
    assert(back === ts)
  }

  test("ticks to unix epoch (nanos)") {
    val ticks = 621355968000000000L + 10000000L // 1970-01-01T00:00:01Z
    val df = Seq(ticks).toDF("ticks")
    assert(df.select(dotNetTicksToUnixEpochNanos($"ticks")).as[Long].head() === 1000000000L)
    assert(df.select(dotNetTicksToUnixEpoch($"ticks").cast("double")).as[Double].head() === 1.0)
    // overflow guard
    val big = Seq(Long.MaxValue).toDF("ticks")
    assert(big.select(dotNetTicksToUnixEpochNanos($"ticks")).as[Option[Long]].head().isEmpty)
  }

  // Golden literal fixtures matching the reference suite exactly, including
  // the 100ns truncation direction (truncate toward the past, never round)
  // and the nanos overflow boundary
  // (/root/reference/src/test/scala/uk/co/gresearch/spark/SparkSuite.scala:548-761).
  test("ticks golden fixtures: ticks -> timestamp/epoch/nanos") {
    import java.sql.Timestamp
    import java.time.Instant
    val df = Seq(
      (1, 599266080000000000L),          // 1900-01-01
      (2, 621355968000000000L),          // unix epoch
      (3, 638155413748959308L),          // .8 of a tick below...
      (4, 638155413748959309L),          // ...and .9: both truncate to 895930us
      (5, 638155413748959310L),          // exact: 895931us
      (6, 713589688368547758L),          // largest ticks whose nanos fit a Long
      (7, 3155378975999999999L)          // 9999-12-31, overflows nanos -> null
    ).toDF("id", "ticks")
    val got = df.select($"id",
      dotNetTicksToTimestamp($"ticks").as("ts"),
      dotNetTicksToUnixEpoch($"ticks").as("sec"),
      dotNetTicksToUnixEpochNanos($"ticks").as("ns"))
      .orderBy($"id")
    assert(got.schema.fields.map(_.dataType) === Seq(
      IntegerType, TimestampType, DecimalType(29, 9), LongType))
    val rows = got.collect()
    assert(rows.map(_.getTimestamp(1)) === Array(
      Timestamp.from(Instant.parse("1900-01-01T00:00:00Z")),
      Timestamp.from(Instant.parse("1970-01-01T00:00:00Z")),
      Timestamp.from(Instant.parse("2023-03-27T19:16:14.89593Z")),
      Timestamp.from(Instant.parse("2023-03-27T19:16:14.89593Z")),
      Timestamp.from(Instant.parse("2023-03-27T19:16:14.895931Z")),
      Timestamp.from(Instant.parse("2262-04-11T23:47:16.854775Z")),
      Timestamp.from(Instant.parse("9999-12-31T23:59:59.999999Z"))))
    assert(rows.map(r => BigDecimal(r.getDecimal(2))) === Array(
      BigDecimal(-2208988800000000000L, 9),
      BigDecimal(0, 9),
      BigDecimal(1679944574895930800L, 9),
      BigDecimal(1679944574895930900L, 9),
      BigDecimal(1679944574895931000L, 9),
      BigDecimal(9223372036854775800L, 9),
      BigDecimal(2534023007999999999L, 7).setScale(9)))
    assert(rows.map(r => if (r.isNullAt(3)) None else Some(r.getLong(3))) === Array(
      Some(-2208988800000000000L),
      Some(0L),
      Some(1679944574895930800L),
      Some(1679944574895930900L),
      Some(1679944574895931000L),
      Some(9223372036854775800L),  // == Long.MaxValue - 7: the boundary
      None))
  }

  test("ticks golden fixtures: timestamp/epoch/nanos -> ticks") {
    import java.sql.Timestamp
    import java.time.Instant
    val ts = Seq(
      (1, Timestamp.from(Instant.parse("1900-01-01T00:00:00Z"))),
      (2, Timestamp.from(Instant.parse("1970-01-01T00:00:00Z"))),
      (3, Timestamp.from(Instant.parse("2023-03-27T19:16:14.895931Z"))),
      (4, Timestamp.from(Instant.parse("9999-12-31T23:59:59.999999Z")))
    ).toDF("id", "ts")
    assert(ts.select(timestampToDotNetTicks($"ts")).orderBy($"id").as[Long].collect() ===
      Array(599266080000000000L, 621355968000000000L, 638155413748959310L, 3155378975999999990L))

    // sub-second epoch input keeps 100ns resolution (lowest 2 nanos digits lost);
    // integer epoch input has no sub-second part
    assert(Seq(BigDecimal("1679944574.895931234")).toDF("s")
      .select(unixEpochToDotNetTicks($"s")).as[Long].head() === 638155413748959312L)
    assert(Seq("1679944574.895931234").toDF("s")
      .select(unixEpochToDotNetTicks($"s")).as[Long].head() === 638155413748959312L)
    assert(Seq(1679944574.895931234).toDF("s")
      .select(unixEpochToDotNetTicks($"s")).as[Long].head() === 638155413748959312L)
    assert(Seq(1679944574L).toDF("s")
      .select(unixEpochToDotNetTicks($"s")).as[Long].head() === 638155413740000000L)

    assert(Seq(1679944574895931234L).toDF("ns")
      .select(unixEpochNanosToDotNetTicks($"ns")).as[Long].head() === 638155413748959312L)
    assert(Seq("1679944574895931234").toDF("ns")
      .select(unixEpochNanosToDotNetTicks($"ns")).as[Long].head() === 638155413748959312L)
    // double can only represent the nanos as 1.67994457489593114E18
    assert(Seq(1679944574895931234.0).toDF("ns")
      .select(unixEpochNanosToDotNetTicks($"ns")).as[Long].head() === 638155413748959311L)
  }

  test("unix epoch to ticks") {
    val df = Seq(1.5).toDF("s")
    assert(df.select(unixEpochToDotNetTicks($"s")).as[Long].head() ===
      621355968000000000L + 15000000L)
    val dfn = Seq(1500000000L).toDF("ns")
    assert(dfn.select(unixEpochNanosToDotNetTicks($"ns")).as[Long].head() ===
      621355968000000000L + 15000000L)
  }

  test("fluent call/when/on-either") {
    assert(5.call(_ + 1) === 6)
    assert(5.when(true).call(_ + 1) === 6)
    assert(5.when(false).call(_ + 1) === 5)
    assert(5.on(true).either(_.toString).or(_ => "no") === "5")
    assert(5.on(false).either(_.toString).or(_ => "no") === "no")
    val df = Seq(1, 2, 3).toDF("v")
    val filtered = df.when(true).call(_.filter($"v" > 1))
    assert(filtered.count() === 2)
  }
}
