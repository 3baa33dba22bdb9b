package graft

import graft.diff.History
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HistorySuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // id 1: unchanged v1..v3 (one run, current)
  // id 2: attr changes at v2 (two runs; first closes at v2)
  // id 3: present v1, absent v2, back at v3 with SAME attrs (gap = two runs)
  // id 4: deleted after v1 (valid_to = v2, not current)
  // id 5: appears only at v3 (valid_from = v3, current)
  private def snaps = Seq(
    (1, 1, "a"), (2, 1, "a"), (3, 1, "a"), (4, 1, "a"),
    (1, 2, "a"), (2, 2, "B"),
    (1, 3, "a"), (2, 3, "B"), (3, 3, "a"), (5, 3, "x")
  ).toDF("id", "v", "attr")

  private def hist = History.fromSnapshots(snaps, "v", Seq("id"))

  test("runs, exclusive valid_to and is_current are exact") {
    val got = hist
      .select($"id", $"attr", $"valid_from", $"valid_to", $"is_current")
      .as[(Int, String, Int, Option[Int], Boolean)].collect().toSet
    assert(got === Set(
      (1, "a", 1, None, true),
      (2, "a", 1, Some(2), false),
      (2, "B", 2, None, true),
      (3, "a", 1, Some(2), false), // gap: absent at v2 closes the run
      (3, "a", 3, None, true),     // re-insert = NEW run despite equal attrs
      (4, "a", 1, Some(2), false),
      (5, "x", 3, None, true)))
  }

  test("null attributes compare null-safe (null == null stays one run)") {
    val s = Seq((1, 1, Option.empty[String]), (1, 2, Option.empty[String]),
      (1, 3, Some("z"))).toDF("id", "v", "attr")
    val got = History.fromSnapshots(s, "v", Seq("id"))
      .select($"valid_from", $"valid_to").as[(Int, Option[Int])].collect().toSet
    assert(got === Set((1, Some(3)), (3, None)))
  }

  test("snapshotAt reconstructs every input vintage exactly") {
    for (v <- Seq(1, 2, 3)) {
      val back = History.snapshotAt(hist, v, "v")
        .select($"id", $"v", $"attr").as[(Int, Int, String)].collect().toSet
      val want = snaps.where($"v" === v)
        .as[(Int, Int, String)].collect().toSet
      assert(back === want, s"vintage $v")
    }
  }

  test("snapshotAt between versions reads as of the prior snapshot") {
    // attr columns restored without the dropped validity columns
    val s = Seq((1, 10, "a"), (1, 30, "b")).toDF("id", "v", "attr")
    val h = History.fromSnapshots(s, "v", Seq("id"))
    val got = History.snapshotAt(h, 20, "v")
      .select($"id", $"attr").as[(Int, String)].collect().toSet
    assert(got === Set((1, "a")))
  }

  test("null version values fail fast instead of silently dropping rows") {
    val s = Seq((1, Some(1), "a"), (1, Option.empty[Int], "b"))
      .toDF("id", "v", "attr")
    val e = intercept[IllegalArgumentException] {
      History.fromSnapshots(s, "v", Seq("id"))
    }
    assert(e.getMessage.contains("null"))
  }

  test("a high-cardinality version column fails the cap without a driver collect") {
    // 2^20 + 1 distinct versions (a per-row timestamp mis-pointed as the
    // version column): the require must fire, and the limit ahead of the
    // collect means only cap+1 rows ever reach the driver
    val n = (1 << 20) + 1
    val s = spark.range(n.toLong).select(
      lit(1).as("id"), col("id").as("v"), lit("a").as("attr"))
    val e = intercept[IllegalArgumentException] {
      History.fromSnapshots(s, "v", Seq("id"))
    }
    assert(e.getMessage.contains("not a snapshot stack"), e.getMessage)
  }

  test("snapshotAt accepts a Column version (the py4j date/timestamp route)") {
    val got = History.snapshotAt(hist, lit(2), "v")
      .select($"id", $"attr").as[(Int, String)].collect().toSet
    assert(got === Set((1, "a"), (2, "B")))
  }

  test("output-column collisions fail fast") {
    val s = Seq((1, 1, "a")).toDF("id", "v", "valid_from")
    val e = intercept[IllegalArgumentException] {
      History.fromSnapshots(s, "v", Seq("id"))
    }
    assert(e.getMessage.contains("valid_from"))
  }

  test("model check: random stacks match an in-memory SCD2 model; snapshotAt inverts") {
    val rng = new scala.util.Random(20260816L)
    for (trial <- 1 to 8) {
      val nIds = 1 + rng.nextInt(12)
      val versions = (1 to (2 + rng.nextInt(4))).toList
      // presence + attr value as pure random functions of (id, version)
      val rows = for {
        id <- 0 until nIds
        v <- versions
        if rng.nextInt(10) < 7 // ~70% presence, gaps guaranteed over trials
      } yield (id, v, s"a${rng.nextInt(3)}")
      if (rows.nonEmpty) {
        val df = rows.toDF("id", "v", "attr")
        val got = History.fromSnapshots(df, "v", Seq("id"))
          .select($"id", $"attr", $"valid_from", $"valid_to")
          .as[(Int, String, Int, Option[Int])].collect().toSet

        // in-memory model: walk each id's present versions in order
        val presentVs = rows.map(r => (r._1, r._2) -> r._3).toMap
        val vsAll = rows.map(_._2).distinct.sorted
        val model = scala.collection.mutable.Set[(Int, String, Int, Option[Int])]()
        for (id <- rows.map(_._1).distinct) {
          var runStart = -1
          var runAttr = ""
          def close(at: Option[Int]): Unit =
            if (runStart >= 0) { model += ((id, runAttr, runStart, at)); runStart = -1 }
          for (v <- vsAll) presentVs.get((id, v)) match {
            case Some(a) =>
              if (runStart < 0) { runStart = v; runAttr = a }
              else if (a != runAttr) { close(Some(v)); runStart = v; runAttr = a }
            case None =>
              close(Some(v)) // absence closes; a later reappearance is a new run
          }
          close(None)
        }
        assert(got === model.toSet, s"trial $trial rows=$rows")

        // snapshotAt inverts every vintage
        val hist = History.fromSnapshots(df, "v", Seq("id"))
        for (v <- vsAll) {
          val back = History.snapshotAt(hist, v, "v")
            .select($"id", $"v", $"attr").as[(Int, Int, String)].collect().toSet
          val want = rows.filter(_._2 == v).toSet
          assert(back === want, s"trial $trial vintage $v")
        }

        // incremental apply == full rebuild, whenever a prefix stack exists
        val lastV = vsAll.last
        val prefix = rows.filter(_._2 != lastV)
        if (vsAll.size >= 2 && prefix.nonEmpty) {
          val prefixHist = History.fromSnapshots(
            prefix.toDF("id", "v", "attr"), "v", Seq("id"))
          val lastSnap = rows.filter(_._2 == lastV)
            .map(r => (r._1, r._3)).toDF("id", "attr")
          val inc = History.applySnapshot(
            prefixHist, lastSnap, lastV, "v", Seq("id"))
            .as[(Int, String, Int, Option[Int], Boolean)].collect().toSet
          val full = hist
            .as[(Int, String, Int, Option[Int], Boolean)].collect().toSet
          assert(inc === full, s"trial $trial incremental != rebuild")
        }
      }
    }
  }

  test("applySnapshot rejects a version not after the history's horizon") {
    val e = intercept[IllegalArgumentException] {
      History.applySnapshot(hist, Seq((1, "z")).toDF("id", "attr"),
        2, "v", Seq("id"))
    }
    assert(e.getMessage.contains("strictly after"), e.getMessage)
  }

  test("plan: one corpus hash exchange, version dimension broadcast back") {
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    // windows + run grouping share the one id partitioning; the version
    // dimension is a collected local table, never re-scanned
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.size == 1, s"${exchanges.size} hash exchanges in:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange leaked into the corpus plan:\n$plan")
  }
}
