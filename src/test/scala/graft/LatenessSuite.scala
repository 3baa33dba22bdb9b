package graft

import graft.agg.PrefixSum
import graft.events.Lateness
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LatenessSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("withRunningMax matches the naive global window, exclusive semantics") {
    val df = Seq(5L, 3L, 9L, 1L, 9L, 2L, 12L, 0L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
    val got = PrefixSum.withRunningMax(df, col("v"), Seq(col("i")), "rm")
      .select("i", "rm").as[(Long, Option[Long])].collect().sortBy(_._1).map(_._2)
    // exclusive: first row null, then max of strictly-previous values
    assert(got.toSeq == Seq(None, Some(5L), Some(5L), Some(9L), Some(9L),
      Some(9L), Some(9L), Some(12L)))
    val incl = PrefixSum.withRunningMax(df, col("v"), Seq(col("i")), "rm",
      exclusive = false)
      .select("i", "rm").as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(incl.toSeq == Seq(5L, 5L, 9L, 9L, 9L, 9L, 12L, 12L))
  }

  test("withRunningMax is partitioning-independent and avoids the global window") {
    val df = spark.range(5000).select(col("id"),
      ((col("id") * 37) % 1000).as("v"))
    val a = PrefixSum.withRunningMax(df, col("v"), Seq(col("id")), "rm")
      .select("id", "rm").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    val b = PrefixSum.withRunningMax(df.repartition(13), col("v"), Seq(col("id")), "rm")
      .select("id", "rm").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(a == b)
    val plan = PrefixSum.withRunningMax(df, col("v"), Seq(col("id")), "rm")
      .queryExecution.executedPlan.toString
    // corpus windows are pid-partitioned; the only unpartitioned window is
    // the #partitions-row offset roll-up keyed by a constant
    assert(!plan.contains("windowspecdefinition(id#"),
      s"global-order window over the corpus leaked:\n$plan")
  }

  test("lateness is the watermark recurrence in integer micros") {
    // arrival order: times 100s, 400s, 200s, 700s, 100s
    val ev = Seq(
      (0L, 100L), (1L, 400L), (2L, 200L), (3L, 700L), (4L, 100L)
    ).toDF("arr", "sec").select(col("arr"),
      timestamp_micros(col("sec") * 1000000L).as("ts"))
    val got = Lateness.withLateness(ev, col("arr"), col("ts"))
      .select("arr", "lateness_us").as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    // first event 0; advancing events 0; event 2 is 200s behind wm=400s;
    // event 4 is 600s behind wm=700s
    assert(got.toSeq == Seq(0L, 0L, 200000000L, 0L, 600000000L))
  }

  test("watermarkPlan counts drops per candidate delay exactly") {
    val ev = Seq(
      (0L, 100L), (1L, 400L), (2L, 200L), (3L, 700L), (4L, 100L)
    ).toDF("arr", "sec").select(col("arr"),
      timestamp_micros(col("sec") * 1000000L).as("ts"))
    val got = Lateness.watermarkPlan(ev, col("arr"), col("ts"),
      Seq(0L, 200L, 300L, 600L))
      .select("delay_s", "events", "dropped", "max_lateness_us")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // lateness profile: {0,0,200s,0,600s}
    assert(got(0L) == (5L, 2L, 600000000L))
    assert(got(200L) == (5L, 1L, 600000000L)) // 200s late is NOT > 200s
    assert(got(300L) == (5L, 1L, 600000000L))
    assert(got(600L) == (5L, 0L, 600000000L))
  }

  test("delays must be non-empty and non-negative") {
    val ev = Seq((0L, 1L)).toDF("arr", "sec").select(col("arr"),
      timestamp_micros(col("sec")).as("ts"))
    intercept[IllegalArgumentException] {
      Lateness.watermarkPlan(ev, col("arr"), col("ts"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Lateness.watermarkPlan(ev, col("arr"), col("ts"), Seq(-1L))
    }
  }
}
