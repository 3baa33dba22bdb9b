package graft

import graft.streaming.StreamingTopK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming Misra-Gries heavy hitters: exact degenerate case, MG bounds
  * under a tight capacity, window close on watermark. */
class StreamingTopKSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1000000020000L + s * 1000L)

  /** Feed (ts-seconds, key) batches through the operator, return emitted
    * (window_start_sec, rank, key, est) rows. */
  private def run(k: Int, capacity: Int, batches: Seq[Seq[(Long, String)]],
                  drain: Boolean = true):
      Seq[(Long, Int, String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamingTopK.topKeysPerWindow(
      input.toDF().toDF("ts", "key"), col("key"), "ts",
      "1 minute", "0 seconds", k, capacity)
    val name = "stk_out_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b.map { case (s, kk) => (ts(s), kk) })
        q.processAllAvailable()
      }
      if (drain) {
        // event-time timeouts fire in the batch AFTER the watermark
        // advance — drive one more far-future batch so closed windows flush
        input.addData(Seq((ts(100000L), "__drain__")))
        q.processAllAvailable()
      }
      spark.table(name).collect().map(r =>
        ((r.getTimestamp(0).getTime - 1000000020000L) / 1000L,
          r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    } finally q.stop()
  }

  test("capacity >= distinct keys: exact counts, ranked, one emit per window") {
    // window [0, 60): a x3, b x2, c x1; flush row at 600s closes it
    val got = run(k = 2, capacity = 8, Seq(
      Seq((1L, "a"), (2L, "b"), (3L, "a")),
      Seq((4L, "a"), (5L, "b"), (6L, "c")),
      Seq((600L, "zz"))))
    val w0 = got.filter(_._1 == 0L).sortBy(_._2)
    assert(w0 == Seq((0L, 1, "a", 3L), (0L, 2, "b", 2L)))
  }

  test("rank ties break by key ascending") {
    val got = run(k = 3, capacity = 8, Seq(
      Seq((1L, "x"), (2L, "y"), (3L, "w")),
      Seq((600L, "zz"))))
    assert(got.filter(_._1 == 0L).sortBy(_._2).map(_._3) == Seq("w", "x", "y"))
  }

  test("tight capacity: estimates never exceed truth and the true heavy hitter survives") {
    // 40 'hh' + 10 distinct singletons, capacity 4: hh freq 40 > 50/5
    val heavy = (1L to 40L).map(i => (i % 50, "hh"))
    val noise = (1L to 10L).map(i => (i, s"n$i"))
    val got = run(k = 1, capacity = 4, Seq(
      heavy, noise, Seq((600L, "zz"))))
    val w0 = got.filter(_._1 == 0L)
    assert(w0.nonEmpty)
    assert(w0.head._3 == "hh")
    assert(w0.head._4 <= 40L) // MG one-sided: never over-counts
    assert(w0.head._4 >= 40L - 50L / 5L) // undercount bounded by n/(cap+1)
  }

  test("windows close independently; an open window emits nothing") {
    // no drain: after the last batch the watermark is 140, so [0,60) and
    // [60,120) have flushed but [120,180) (c, d) is still open and silent
    val got = run(k = 1, capacity = 8, Seq(
      Seq((1L, "a"), (61L, "b")),
      Seq((130L, "c")),
      Seq((140L, "d"))), drain = false)
    assert(got.map(t => (t._1, t._3)).toSet == Set((0L, "a"), (60L, "b")))
  }
}
