package graft

import graft.streaming.StreamingLateness
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming lateness monitor: stateless per-row lateness, windowed drop
  * counts per candidate delay, batch-split determinism, bounded state. */
class StreamingLatenessSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1000000020000L + s * 1000L)

  /** (event_sec, ingest_sec) batches -> ((win_rel_s, delay_s) -> (events,
    * dropped, max_late_us), max state rows). */
  private def run(batches: Seq[Seq[(Long, Long)]],
                  delays: Seq[Long]): (Map[(Long, Long), (Long, Long, Long)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Timestamp)]
    val out = StreamingLateness.latenessByWindow(
      input.toDF().toDF("ets", "its"), "ets", col("its"),
      "1 minute", "10 minutes", delays)
    val name = "slate_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b.map { case (e, i) => (ts(e), ts(i)) })
        q.processAllAvailable()
      }
      input.addData(Seq((ts(100000L), ts(100000L))))
      q.processAllAvailable()
      val maxState = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)
      val rows = spark.table(name)
        .select(unix_timestamp(col("window.start")) - lit(1000000020L),
          col("delay_s"), col("events"), col("dropped"), col("max_lateness_us"))
        .collect()
        .filter(_.getLong(0) < 90000L)
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      (rows, maxState)
    } finally q.stop()
  }

  test("drop counts per delay are exact; on-time events never drop") {
    // window 0: on-time (late 0) + 90s late + 200s late
    val (rows, _) = run(
      Seq(Seq((0L, 0L), (10L, 100L), (20L, 220L))), Seq(0L, 100L, 300L))
    assert(rows((0L, 0L)) == ((3L, 2L, 200000000L)))   // both late ones drop at 0s
    assert(rows((0L, 100L)) == ((3L, 1L, 200000000L))) // only the 200s one
    assert(rows((0L, 300L)) == ((3L, 0L, 200000000L))) // nothing
  }

  test("ingest before event time clamps to zero lateness") {
    val (rows, _) = run(Seq(Seq((30L, 10L))), Seq(0L))
    assert(rows((0L, 0L)) == ((1L, 0L, 0L)))
  }

  test("batch split does not change the report; state stays bounded") {
    val events = (0L until 120L).map(i => (i, i + (i % 7) * 30L))
    val oneShot = run(Seq(events), Seq(0L, 60L, 180L))._1
    val split = run(Seq(events.take(40), events.slice(40, 90),
      events.drop(90)), Seq(0L, 60L, 180L))
    assert(split._1 == oneShot)
    // state ≤ |open windows| x |delays| (plus the drain window's rows)
    assert(split._2 <= (2 + 1) * 3 * 2, s"state rows ${split._2}")
  }

  test("delays validated") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Timestamp)]
    intercept[IllegalArgumentException] {
      StreamingLateness.latenessByWindow(
        input.toDF().toDF("ets", "its"), "ets", col("its"),
        "1 minute", "0 seconds", Seq.empty)
    }
  }
}
