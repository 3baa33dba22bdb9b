package graft

import graft.fluent.Fluent._
import graft.functions._
import org.apache.spark.sql.functions._
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
