package graft

import graft.events.Sessionize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._
  import graft.events.Funnel

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("u", "t", "ty")

  private def times(df: org.apache.spark.sql.DataFrame, w: Long = Long.MaxValue) =
    Funnel.funnelTimes(df, col("u"), col("t"), col("ty"),
      Seq("a", "b", "c"), windowUs = w)
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("funnel: ordered chaining, strict >, min-first semantics") {
    val df = ev(
      (1L, 10L, "a"), (1L, 5L, "b"), (1L, 20L, "b"), (1L, 30L, "c"), // b@5 is BEFORE a
      (2L, 10L, "a"), (2L, 10L, "b"),                               // same micro: no chain
      (3L, 10L, "b"), (3L, 20L, "c"),                               // never enters (no a)
      (4L, 10L, "a"))
    val got = times(df)
    assert(got(1L) == ((3, 10L, 30L)))
    assert(got(2L) == ((1, 10L, 10L)))
    assert(got(4L) == ((1, 10L, 10L)))
    assert(!got.contains(3L))
  }

  test("funnel: the conversion window anchors at the FIRST step") {
    val df = ev((1L, 0L, "a"), (1L, 50L, "b"), (1L, 120L, "c"),
      (2L, 0L, "a"), (2L, 90L, "b"), (2L, 100L, "c"))
    val got = times(df, w = 100L)
    assert(got(1L)._1 == 2)   // c at 120 falls outside t1+100
    assert(got(2L)._1 == 3)   // c exactly AT t1+100 converts (<=)
  }

  test("funnel: AnchorPreviousStep re-anchors the window at each step") {
    val df = ev(
      (1L, 0L, "a"), (1L, 90L, "b"), (1L, 150L, "c"),  // c-b=60 <= 100, c-a=150 > 100
      (2L, 0L, "a"), (2L, 90L, "b"), (2L, 250L, "c"))  // c-b=160 > 100
    val first = times(df, w = 100L)
    assert(first(1L)._1 == 2) // first-anchor: c at 150 outside t1+100
    val got = Funnel.funnelTimes(df, col("u"), col("t"), col("ty"),
      Seq("a", "b", "c"), windowUs = 100L, anchor = Funnel.AnchorPreviousStep)
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(1L) == 3) // per-step: c within 100 of b
    assert(got(2L) == 2) // per-step: c 160 after b — out
  }

  test("model check: AnchorPreviousStep matches an in-memory per-step fold") {
    val rng = new scala.util.Random(1337)
    val types = Seq("a", "b", "c", "x")
    val steps = Seq("a", "b", "c")
    val rows = Seq.fill(600)((rng.nextInt(40).toLong,
      rng.nextInt(200).toLong, types(rng.nextInt(types.size))))
    val w = 30L
    def model(evs: Seq[(Long, Long, String)]): Map[Long, Int] =
      evs.groupBy(_._1).flatMap { case (u, es) =>
        val byType = es.groupBy(_._3).map { case (k, v) => k -> v.map(_._2).sorted }
        byType.get("a").map(_.head).map { t1 =>
          var depth = 1
          var last = t1
          var cont = true
          steps.tail.foreach { s =>
            if (cont) {
              byType.getOrElse(s, Seq.empty)
                .find(t => t > last && t - last <= w) match {
                case Some(t) => depth += 1; last = t
                case None => cont = false
              }
            }
          }
          u -> depth
        }
      }
    val got = Funnel.funnelTimes(rows.toDF("u", "t", "ty").repartition(7),
      col("u"), col("t"), col("ty"), steps, windowUs = w,
      anchor = Funnel.AnchorPreviousStep)
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got == model(rows), s"mismatch: got $got")
  }

  test("funnel plan: each step's events are scanned exactly once — no union recompute") {
    // parquet-backed source so the step literals can only appear in FILTER
    // conditions (a literal-bearing projection would muddy the count); the
    // union-of-depth-prefixes shape this pins against showed step i's
    // filter k-i+1 times
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_plan").toString
    spark.range(1000).select((col("id") % 50).as("u"), col("id").as("t"),
      concat(lit("step"), (col("id") % 3).cast("string")).as("ty"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = Funnel.funnelTimes(df, col("u"), col("t"), col("ty"),
      Seq("step0", "step1", "step2")).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), plan)
    Seq("step0", "step1", "step2").foreach { s =>
      val n = plan.sliding(s.length).count(_ == s)
      assert(n == 1, s"step $s appears $n times in the plan (want 1):\n$plan")
    }
  }

  test("funnelReport counts depth-reaching users per step, zeros included") {
    val df = ev((1L, 0L, "a"), (1L, 1L, "b"), (2L, 0L, "a"))
    val rep = Funnel.funnelReport(df, col("u"), col("t"), col("ty"), Seq("a", "b", "c"))
      .orderBy(col("step_idx"))
      .as[(Int, String, Long)].collect().toSeq
    assert(rep == Seq((1, "a", 2L), (2, "b", 1L), (3, "c", 0L)))
  }

  test("model check: random event streams match an in-memory funnel fold") {
    val rng = new scala.util.Random(421)
    val types = Seq("a", "b", "c", "x")
    val steps = Seq("a", "b", "c")
    val rows = Seq.fill(600)((rng.nextInt(40).toLong,
      rng.nextInt(200).toLong, types(rng.nextInt(types.size))))
    val w = 60L
    // in-memory reference: literal sequential-min semantics
    def model(evs: Seq[(Long, Long, String)]): Map[Long, (Int, Long, Long)] =
      evs.groupBy(_._1).flatMap { case (u, es) =>
        val byType = es.groupBy(_._3).map { case (k, v) => k -> v.map(_._2).sorted }
        byType.get("a").map(_.head).map { t1 =>
          var depth = 1
          var last = t1
          var cont = true
          steps.tail.foreach { s =>
            if (cont) {
              byType.getOrElse(s, Seq.empty)
                .find(t => t > last && t - t1 <= w) match {
                case Some(t) => depth += 1; last = t
                case None => cont = false
              }
            }
          }
          u -> ((depth, t1, last))
        }
      }
    val got = times(rows.toDF("u", "t", "ty").repartition(7), w)
    assert(got == model(rows), s"mismatch: got $got")
  }

  test("funnel plan: user-keyed hash exchanges only — no window, no cartesian") {
    val df = spark.range(1000).select((col("id") % 50).as("u"),
      col("id").as("t"),
      element_at(array(lit("a"), lit("b"), lit("c")),
        (col("id") % 3 + 1).cast("int")).as("ty"))
    val plan = Funnel.funnelTimes(df, col("u"), col("t"), col("ty"), Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("Window"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
    // partial aggregation on every min (map-side combine before the exchange)
    assert(plan.contains("partial_min"), plan)
  }

  test("funnelStepTimes / funnelLags: long view and exact lag algebra") {
    val df = ev(
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 25L, "c"),
      (2L, 5L, "a"), (2L, 9L, "b"),
      (3L, 7L, "a"))
    val st = Funnel.funnelStepTimes(df, col("u"), col("t"), col("ty"),
      Seq("a", "b", "c")).as[(Long, Int, String, Long)].collect().toSet
    assert(st == Set(
      (1L, 1, "a", 0L), (1L, 2, "b", 10L), (1L, 3, "c", 25L),
      (2L, 1, "a", 5L), (2L, 2, "b", 9L),
      (3L, 1, "a", 7L)))
    val lags = Funnel.funnelLags(df, col("u"), col("t"), col("ty"),
      Seq("a", "b", "c"))
      .as[(Int, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(lags(1) == ((3L, 0L, 0L, 0L)))        // first step: lag 0 by def
    assert(lags(2) == ((2L, 4L, 10L, 14L)))      // lags 10 and 4
    assert(lags(3) == ((1L, 15L, 15L, 15L)))     // 25 - 10
    // empty funnel: zero users, zeroed lag bounds, all steps present
    val empty = Funnel.funnelLags(ev((9L, 1L, "x")), col("u"), col("t"),
      col("ty"), Seq("a", "b"))
      .as[(Int, String, Long, Long, Long, Long)].collect().toSet
    assert(empty == Set((1, "a", 0L, 0L, 0L, 0L), (2, "b", 0L, 0L, 0L, 0L)))
    // hostile step names survive the stack-literal round trip byte-for-byte
    // (backslash is an escape char in SQL literals; quotes double)
    val hostile = Seq("nav\\home", "it's", "a\nb")
    val hv = ev((1L, 0L, "nav\\home"), (1L, 5L, "it's"), (1L, 9L, "a\nb"))
    val names = Funnel.funnelStepTimes(hv, col("u"), col("t"), col("ty"), hostile)
      .orderBy("step_idx").select("step").as[String].collect().toSeq
    assert(names == hostile)
    val lagNames = Funnel.funnelLags(hv, col("u"), col("t"), col("ty"), hostile)
      .orderBy("step_idx").select("step").as[String].collect().toSeq
    assert(lagNames == hostile)
  }

  test("transitionMatrix: total order, per-user chains, last event contributes nothing") {
    val df = Seq(
      (1L, 0L, 10L, "a"), (1L, 1L, 11L, "b"), (1L, 2L, 12L, "a"),
      (2L, 5L, 20L, "a"), (2L, 5L, 21L, "b"), // same micro: id tiebreak orders a->b
      (3L, 9L, 30L, "c")                       // singleton: no pair
    ).toDF("u", "t", "eid", "ty")
    val got = Funnel.transitionMatrix(df, col("u"), col("t"), col("eid"), col("ty"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("topPaths: ordered journeys, maxSteps cut, null type surfaced, tie rule") {
    val df = Seq(
      (1L, 0L, 10L, "a"), (1L, 1L, 11L, "b"), (1L, 2L, 12L, "c"),
      (2L, 5L, 20L, "a"), (2L, 6L, 21L, "b"), (2L, 7L, 22L, "c"),
      (3L, 1L, 30L, "a"), (3L, 1L, 31L, null.asInstanceOf[String]), // id tiebreak; null renders
      (4L, 0L, 40L, "x"), (4L, 1L, 41L, "y"), (4L, 2L, 42L, "z"),
      (4L, 3L, 43L, "w") // 4th event beyond maxSteps=3: cut
    ).toDF("u", "t", "eid", "ty")
    val got = Funnel.topPaths(df, col("u"), col("t"), col("eid"), col("ty"),
      maxSteps = 3, k = 10).as[(String, Long)].collect().toSeq
    assert(got.toSet == Set(("a > b > c", 2L), ("a > (null)", 1L),
      ("x > y > z", 1L)))
    // top-k ordering: count desc, then path asc — fully deterministic
    assert(got == Seq(("a > b > c", 2L), ("a > (null)", 1L),
      ("x > y > z", 1L)))
    // k cuts after ordering
    val top1 = Funnel.topPaths(df, col("u"), col("t"), col("eid"), col("ty"),
      maxSteps = 3, k = 1).as[(String, Long)].collect().toSeq
    assert(top1 == Seq(("a > b > c", 2L)))
  }

  test("topPaths top-k plans as TakeOrderedAndProject, not a global sort") {
    // a local 1-row Seq constant-folds the whole top-k away (maxRows <= k
    // eliminates the limit, then the sort) — use a range source whose
    // row count exceeds k so the plan shape is the production one
    val df = spark.range(100).select((col("id") % 25).as("u"),
      (col("id") / 25).as("t"), col("id").as("eid"),
      concat(lit("e"), col("id") % 3).as("ty"))
    val plan = Funnel.topPaths(df, col("u"), col("t"), col("eid"), col("ty"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a per-partition top-k in:\n$plan")
  }

  test("retentionCohorts: integer periods, distinct users per cell") {
    val df = Seq(
      (1L, 0L), (1L, 5L), (1L, 25L),    // cohort 0, offsets 0 and 2
      (2L, 12L), (2L, 19L),             // cohort 1, offsets 0 and 0
      (3L, 21L),                         // cohort 2, offset 0
      (4L, -5L),                         // pre-epoch: FLOOR to cohort -1
      (5L, 9007199254740997L)            // past 2^53: exact under integer DIV
    ).toDF("u", "t")
    val got = Funnel.retentionCohorts(df, col("u"), col("t"), periodUs = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L),
      (-1L, 0L, 1L), (900719925474099L, 0L, 1L)))
  }
}

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
