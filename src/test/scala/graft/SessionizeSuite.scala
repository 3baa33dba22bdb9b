package graft

import graft.events.Sessionize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  test("withSessionIndex splits at strict gap boundaries per key") {
    val df = Seq((1L, 0L), (1L, 100L), (1L, 101L), (1L, 300L), (2L, 0L))
      .toDF("k", "t")
    val out = Sessionize.withSessionIndex(df, col("k"), col("t"), lit(100L))
      .select("k", "t", "session_idx").as[(Long, Long, Long)].collect().toSet
    // gap of exactly 100 does NOT split (strict >); 101 -> 300 (199) does
    assert(out == Set(
      (1L, 0L, 1L), (1L, 100L, 1L), (1L, 101L, 1L), (1L, 300L, 2L),
      (2L, 0L, 1L)))
  }

  test("equal timestamps share a session regardless of tie order") {
    val df = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 500L, "c")).toDF("k", "t", "tag")
    val out = Sessionize.withSessionIndex(df, col("k"), col("t"), lit(100L))
      .select("tag", "session_idx").as[(String, Long)].collect().toMap
    assert(out("a") == 1L && out("b") == 1L && out("c") == 2L)
  }

  test("sessionBounds aggregates counts and extents per session") {
    val df = Seq((1L, 0L), (1L, 50L), (1L, 500L), (1L, 510L)).toDF("k", "t")
    val out = Sessionize.sessionBounds(df, col("k"), col("t"), lit(100L))
      .select("key", "session_idx", "n_events", "session_start", "session_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L, 0L, 50L), (1L, 2L, 2L, 500L, 510L)))
  }

  test("timestamp columns work with INTERVAL gaps") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:10:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 12:00:00"))).toDF("k", "ts")
    val out = Sessionize.withSessionIndex(
      df, col("k"), col("ts"), expr("INTERVAL 30 MINUTES"))
      .select("session_idx").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 1L, 2L))
  }
}
