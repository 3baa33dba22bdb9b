package graft

import graft.text.BinPack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** No-split bin packing: solve validity, assignment determinism under
  * re-partitioning, and the fail-loud/drop edge rules. */
class BinPackSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def assignments(df: org.apache.spark.sql.DataFrame, cap: Int) =
    BinPack.packBins(df, col("n"), Seq(col("id")), cap)
      .select($"id", $"n_tokens", $"bin_id", $"slot")
      .as[(Long, Int, Long, Int)].collect().toSeq.sortBy(_._1)

  test("every doc placed once, bins dense, sums within capacity, slots ordered") {
    val docs = Seq(
      (1L, 300), (2L, 300), (3L, 212), (4L, 212), (5L, 100), (6L, 100),
      (7L, 100), (8L, 100), (9L, 100), (10L, 100), (11L, 100), (12L, 12),
      (13L, 1), (14L, 512), (15L, 0), (16L, 0)).toDF("id", "n")
    val got = assignments(docs, 512)
    // zero-token docs dropped, everything else placed exactly once
    assert(got.map(_._1) == (1L to 14L))
    val byBin = got.groupBy(_._3)
    // dense bin ids from 0
    assert(byBin.keySet == (0L until byBin.size).toSet)
    byBin.values.foreach { bin =>
      assert(bin.map(_._2).sum <= 512)
      val bySlot = bin.sortBy(_._4)
      // slots contiguous from 0, lengths non-increasing by slot
      assert(bySlot.map(_._4) == bin.indices)
      assert(bySlot.map(_._2) == bySlot.map(_._2).sorted.reverse)
    }
    // best-fit actually packs: 14 docs in far fewer bins than one-per-doc
    assert(byBin.size <= 6, s"expected tight packing, got ${byBin.size} bins")
  }

  test("assignment is a pure function of (lengths, order) — partitioning-free") {
    val docs = (1L to 300L).map(i => (i, 1 + (i * 37 % 97).toInt)).toDF("id", "n")
    val a = assignments(docs.repartition(2), 100)
    val b = assignments(docs.repartition(13), 100)
    assert(a == b)
  }

  test("assignment joins broadcast the bounded event table — never a cartesian") {
    val docs = (1L to 500L).map(i => (i, 1 + (i % 60).toInt)).toDF("id", "n")
    val plan = BinPack.packBins(docs, col("n"), Seq(col("id")), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected a broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in the assignment plan:\n$plan")
  }

  test("oversized documents fail loudly; zero capacity rejected") {
    val docs = Seq((1L, 600), (2L, 10)).toDF("id", "n")
    val e = intercept[IllegalArgumentException](assignments(docs, 512))
    assert(e.getMessage.contains("chunk oversized"))
    intercept[IllegalArgumentException](
      BinPack.packBins(docs, col("n"), Seq(col("id")), 0))
    // output-name collisions fail fast instead of silently duplicating
    val clash = Seq((1L, 5, 0L)).toDF("id", "n", "bin_id")
    val c = intercept[IllegalArgumentException](
      BinPack.packBins(clash, col("n"), Seq(col("id")), 8))
    assert(c.getMessage.contains("bin_id"))
  }

  test("report fields are exact integers incl. the ceil-div lower bound") {
    val docs = Seq((1L, 5), (2L, 5), (3L, 3), (4L, 2)).toDF("id", "n")
    val assigned = BinPack.packBins(docs, col("n"), Seq(col("id")), 8)
    val r = BinPack.binPackReport(assigned, 8).head()
    assert(r.getAs[Long]("n_docs") == 4 && r.getAs[Long]("total_tokens") == 15)
    assert(r.getAs[Long]("min_bins") == 2) // ceil(15/8)
    assert(r.getAs[Long]("n_bins") >= 2 &&
      r.getAs[Long]("slot_capacity") == r.getAs[Long]("n_bins") * 8)
  }

  test("packBinSequences materializes whole docs with exact doc_starts and padding") {
    val texts = Seq((1L, "aa bb cc"), (2L, ""), (3L, "dd ee ff gg"),
      (4L, "mm"), (5L, "nn oo pp"))
    val docs = texts.toDF("doc_id", "text")
    val model = graft.text.ByteBpe.train(
      docs.filter(length($"text") > 0), $"text", numMerges = 5)
    val enc = graft.text.ByteBpe.encodeIds($"text", model)
    val seqs = BinPack.packBinSequences(docs, enc, Seq($"doc_id"), capacity = 12)
      .select($"bin_id", $"ids", $"doc_starts", $"n_pad")
      .as[(Long, Seq[Int], Seq[Int], Int)].collect().toSeq
    seqs.foreach { case (_, ids, starts, pad) =>
      assert(ids.length + pad == 12 && pad >= 0)
      // starts: 0-led, strictly increasing, within the ids
      assert(starts.head == 0 && starts == starts.sorted && starts.distinct == starts)
      assert(starts.forall(s => s >= 0 && s < ids.length))
    }
    // every non-empty doc's id stream appears exactly once as a block
    val blocks = seqs.flatMap { case (_, ids, starts, _) =>
      (starts :+ ids.length).sliding(2).map {
        case Seq(a, b) => ids.slice(a, b) }.toSeq
    }
    val expected = docs.filter(length($"text") > 0).orderBy($"doc_id")
      .select(enc).collect().map(_.getSeq[Int](0)).toSeq
    assert(blocks.sortBy(_.mkString(",")) ==
      expected.sortBy(_.mkString(",")))
  }

  test("model check: random histograms always solve to a valid dense layout") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { trial =>
      val cap = 16 + rnd.nextInt(500)
      val hist = (1 to (1 + rnd.nextInt(30)))
        .map(_ => (1 + rnd.nextInt(cap), (1 + rnd.nextInt(40)).toLong))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val (events, nBins) = BinPack.solve(hist, cap)
      // every doc assigned exactly once per length class
      hist.foreach { case (len, count) =>
        val covered = events.filter(_.len == len).map(_.n).sum
        assert(covered == count, s"trial $trial len $len")
      }
      // per-bin loads within capacity; bins dense from 0
      val load = scala.collection.mutable.Map.empty[Long, Long]
      events.foreach { e =>
        (0L until e.n).foreach { i =>
          load(e.binStart + i) = load.getOrElse(e.binStart + i, 0L) + e.len
        }
      }
      assert(load.keySet == (0L until nBins).toSet, s"trial $trial density")
      assert(load.values.forall(_ <= cap), s"trial $trial overflow")
    }
  }

  test("solve matches a hand-traced case (fit, split, bulk open, tie rules)") {
    // cap 8; lengths desc: 5 (x2), 3 (x3), 2 (x1)
    // open 5s: per-bin 1 -> 2 bins [5], rem 3 each (bins 0,1)
    // 3s: best fit rem 3 (both; earliest group) -> both bins take a 3
    //     (t = min(3,2) = 2); remaining one 3: no rem >= 3 -> open bin 2
    // 2: best fit rem 5 (bin 2) -> slot 1
    val docs = Seq((1L, 5), (2L, 5), (3L, 3), (4L, 3), (5L, 3), (6L, 2))
      .toDF("id", "n")
    val got = assignments(docs, 8).map(t => t._1 -> ((t._3, t._4))).toMap
    assert(got == Map(
      1L -> ((0L, 0)), 2L -> ((1L, 0)),
      3L -> ((0L, 1)), 4L -> ((1L, 1)), 5L -> ((2L, 0)),
      6L -> ((2L, 1))))
  }
}
