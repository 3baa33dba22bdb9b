package graft

import graft.events.Funnel
import graft.streaming.StreamingFunnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel: the greedy k-longs chain equals the batch funnel on
  * in-order feeds, transitions are append-final, and the events-family
  * round additions (approx retention, the exclusion counter) hold. */
class StreamingFunnelSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val steps = Seq("s1", "s2", "s3")

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  // (user, type, t_us) — micros; timestamps carry ms precision here so
  // the micros stay exact through timestamp_micros
  private def feed(rows: (Long, String, Long)*): Seq[(Long, String, java.sql.Timestamp)] =
    rows.map { case (u, ty, t) => (u, ty, ts(t)) }

  private def runStream(batches: Seq[Seq[(Long, String, java.sql.Timestamp)]],
                        windowUs: Long = Long.MaxValue,
                        anchor: Funnel.WindowAnchor = Funnel.AnchorFirstStep)
      : Seq[(Long, Int, String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingFunnel.funnelProgress(
      input.toDF().toDF("u", "ty", "ts"),
      col("u"), "ts", col("ty"), steps, windowUs, anchor)
    val name = s"sf_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name)
        .select(col("user_id"), col("depth"), col("step"), col("t_us"))
        .as[(Long, Int, String, Long)].collect().toSeq
    } finally q.stop()
  }

  test("greedy chain equals the batch funnel on an in-order feed") {
    val all = Seq(
      (1L, "s1", 1000000L), (1L, "s2", 2000000L), (1L, "s3", 3000000L),
      (2L, "s1", 1000000L), (2L, "s3", 1500000L), (2L, "s2", 2500000L),
      (3L, "s2", 1000000L), // no s1 -> absent
      (4L, "s1", 5000000L), (4L, "s2", 5000000L)) // tie does not chain
    val batches = all.sortBy(_._3).grouped(3).toSeq.map(b => feed(b: _*))
    val hits = runStream(batches)
    val streamed = hits.groupBy(_._1).map { case (u, h) =>
      (u, h.map(_._2).max, h.map(_._4).min, h.map(_._4).max) }.toSet
    val batch = Funnel.funnelTimes(
      all.map { case (u, ty, t) => (u, ty, t) }.toDF("u", "ty", "t"),
      col("u"), col("t"), col("ty"), steps)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed ==
      Set((1L, 3, 1000000L, 3000000L), (2L, 2, 1000000L, 2500000L),
        (4L, 1, 5000000L, 5000000L)))
  }

  test("transitions are append-final: a completed chain emits nothing more") {
    val hits = runStream(Seq(
      feed((1L, "s1", 1000000L), (1L, "s2", 2000000L), (1L, "s3", 3000000L)),
      feed((1L, "s1", 4000000L), (1L, "s2", 5000000L), (1L, "s3", 6000000L))))
    assert(hits.size == 3)
    assert(hits.map(h => (h._2, h._4)).sorted ==
      Seq((1, 1000000L), (2, 2000000L), (3, 3000000L)))
  }

  test("window anchors bound the chain exactly like the batch operator") {
    val all = Seq(
      (1L, "s1", 1000000L), (1L, "s2", 2000000L), (1L, "s3", 4100000L),
      (2L, "s1", 1000000L), (2L, "s2", 3500000L), (2L, "s3", 7000000L))
    val batches = Seq(feed(all.sortBy(_._3): _*))
    // first-step anchor, 3s window: u1 s3 at +3.1s fails; u2 s2 at +2.5s ok,
    // s3 at +6s fails (and +3.5s after s2 fails the previous anchor too)
    val firstHits = runStream(batches, windowUs = 3000000L)
    val firstDepths = firstHits.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    // previous-step anchor, 3s window: u1 s3 (+2.1s after s2) passes
    val prevHits = runStream(batches, windowUs = 3000000L,
      anchor = Funnel.AnchorPreviousStep)
    val prevDepths = prevHits.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    def batchDepths(anchor: Funnel.WindowAnchor): Map[Long, Int] =
      Funnel.funnelTimes(all.toDF("u", "ty", "t"), col("u"), col("t"),
        col("ty"), steps, windowUs = 3000000L, anchor = anchor)
        .select(col("user_id"), col("depth"))
        .as[(Long, Int)].collect().toMap
    assert(firstDepths == batchDepths(Funnel.AnchorFirstStep))
    assert(prevDepths == batchDepths(Funnel.AnchorPreviousStep))
    assert(firstDepths == Map(1L -> 2, 2L -> 2))
    assert(prevDepths == Map(1L -> 3, 2L -> 2))
  }

  test("streaming retention equals the batch triangle on an in-order feed") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val out = graft.streaming.StreamingRetention.retentionHits(
      input.toDF().toDF("u", "ts"), col("u"), "ts",
      periodUs = 100000L, horizon = 16)
    val name = s"sr_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def t(us: Long) = new java.sql.Timestamp(us / 1000L)
    try {
      // user 1: periods 0, 1, 1 (dup), 3; user 2: periods 1, 2
      input.addData((1L, t(10000L)), (1L, t(110000L)), (2L, t(150000L)))
      q.processAllAvailable()
      input.addData((1L, t(120000L)), (2L, t(250000L)), (1L, t(310000L)))
      q.processAllAvailable()
      val hits = spark.table(name)
        .select(col("user_id"), col("cohort_period"), col("period_offset"))
        .as[(Long, Long, Long)].collect().toSet
      assert(hits == Set((1L, 0L, 0L), (1L, 0L, 1L), (1L, 0L, 3L),
        (2L, 1L, 0L), (2L, 1L, 1L)))
      // aggregated hits == the batch triangle
      val ev = Seq((1L, 10000L), (1L, 110000L), (1L, 120000L), (1L, 310000L),
        (2L, 150000L), (2L, 250000L)).toDF("u", "tu")
      val batch = Funnel.retentionCohorts(ev, col("u"), col("tu"), 100000L)
        .as[(Long, Long, Long)].collect().toSet
      val streamed = hits.groupBy(h => (h._2, h._3))
        .map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("retentionCohortsApprox matches exact on small cardinalities") {
    val ev = Seq(
      (1L, 0L), (1L, 100L), (2L, 0L), (2L, 200L),
      (3L, 100L), (3L, 200L), (4L, 100L))
      .toDF("u", "t")
    val exact = Funnel.retentionCohorts(ev, col("u"), col("t"), periodUs = 100L)
      .as[(Long, Long, Long)].collect().toSet
    val approx = Funnel.retentionCohortsApprox(ev, col("u"), col("t"),
      periodUs = 100L)
      .select(col("cohort_period"), col("period_offset"),
        col("users_estimate").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(exact == approx)
    assert(exact == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 2L), (1L, 1L, 1L)))
  }

  test("transitionMatrixExcluded makes the null-exclusion contract observable") {
    val ev = Seq(
      (Some(1L), Some(10L), Some(1L), "a"),
      (Some(1L), Some(20L), None, "b"), // null tiebreak id -> excluded
      (None, Some(30L), Some(3L), "c"), // null user -> excluded
      (Some(2L), None, Some(4L), "d")) // null ts -> excluded
      .toDF("u", "t", "eid", "ty")
    val r = Funnel.transitionMatrixExcluded(ev, col("u"), col("t"), col("eid"))
      .as[(Long, Long)].head()
    assert(r == ((3L, 4L)))
  }
}
