package graft

import graft.streaming.StreamingDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming drift monitor: vocab-bounded state, batch-identical counts
  * under any batch split, and the exact integer total-variation readout. */
class StreamingDriftSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val vocab = Seq("the", "cat", "dog")

  private def ts(s: Long) = new Timestamp(1000000020000L + s * 1000L)

  /** Run doc batches through tokenCountsByWindow, return
    * (window_start_sec, token, cnt) and the max state rows seen. */
  private def run(batches: Seq[Seq[(Long, String)]]): (Seq[(Long, String, Long)], Long) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamingDrift.tokenCountsByWindow(
      input.toDF().toDF("ts", "text"), col("text"), "ts",
      "1 minute", "0 seconds", vocab)
    val name = "sdrift_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b.map { case (s, t) => (ts(s), t) })
        q.processAllAvailable()
      }
      input.addData(Seq((ts(100000L), "__drain__")))
      q.processAllAvailable()
      val maxState = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)
      val rows = spark.table(name)
        .select(unix_timestamp(col("window.start")) - lit(1000000020L),
          col("token"), col("cnt"))
        .collect()
        .filter(r => r.getLong(0) < 90000L) // drop the drain window
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      (rows, maxState)
    } finally q.stop()
  }

  test("counts bucket to vocab + OOV and match the batch equivalent") {
    val (rows, _) = run(Seq(Seq(
      (1L, "the cat sat on the mat"), // the x2, cat, oov x3 (sat on mat)
      (2L, "dog and dog"))))          // dog x2, oov (and)
    val got = rows.filter(_._1 == 0L).map(t => (t._2, t._3)).toMap
    assert(got == Map("the" -> 2L, "cat" -> 1L, "dog" -> 2L, "<oov>" -> 4L))
  }

  test("batch split never changes a window's counts (replay determinism)") {
    val docs = Seq(
      (1L, "the cat"), (5L, "dog dog dog"), (10L, "cat cat unknown"),
      (70L, "the the"), (80L, "word salad here"))
    val oneBatch = run(Seq(docs))._1.sorted
    val threeBatches = run(Seq(docs.take(2), docs.slice(2, 4), docs.drop(4)))._1.sorted
    assert(oneBatch == threeBatches)
    assert(oneBatch.nonEmpty)
  }

  test("state is bounded by (vocab + 1) per open window, not by cardinality") {
    // 200 distinct unknown tokens in ONE window: a naive groupBy(token)
    // would hold 200+ state rows; the bucketed plan holds <= 4
    val spam = (0 until 200).map(i => (3L, s"zz$i yy$i")).toSeq
    val (rows, maxState) = run(Seq(spam))
    assert(rows.filter(_._1 == 0L).map(_._2).toSet == Set("<oov>"))
    assert(maxState <= vocab.size + 2, // +1 oov, +1 the drain window's row
      s"state rows $maxState exceed the vocab bound")
  }

  test("totalVariation: 0 on identical mix, 1 on disjoint support, exact scaled") {
    val ref = Seq(("the", 6L), ("cat", 3L), ("dog", 3L)).toDF("token", "cnt")
    // identical proportions (x2 mass): TV = 0
    val same = Seq((0L, "the", 12L), (0L, "cat", 6L), (0L, "dog", 6L))
      .toDF("w", "token", "cnt")
    val r1 = StreamingDrift.totalVariationByWindow(same, Seq("w"), ref).head()
    assert(r1.getAs[Long]("tv_scaled") == 0L && r1.getAs[Double]("tv") == 0.0)
    // disjoint support: TV = 1 exactly
    val disjoint = Seq((0L, "<oov>", 10L)).toDF("w", "token", "cnt")
    val r2 = StreamingDrift.totalVariationByWindow(disjoint, Seq("w"), ref).head()
    assert(r2.getAs[Double]("tv") == 1.0)
    // hand case: counts (the:1, cat:1), ref (the:6, cat:3, dog:3); N=2, M=12
    // terms: |1*12-6*2|=0, |1*12-3*2|=6, |0-3*2|=6 -> 12; tv=12/(2*2*12)=0.25
    val hand = Seq((0L, "the", 1L), (0L, "cat", 1L)).toDF("w", "token", "cnt")
    val r3 = StreamingDrift.totalVariationByWindow(hand, Seq("w"), ref).head()
    assert(r3.getAs[Long]("tv_scaled") == 12L)
    assert(r3.getAs[Double]("tv") == 0.25)
  }

  test("tv_scaled is exact past long-multiplication range (decimal terms)") {
    // token masses ~3e9: the cross-products c*M and r*N are ~1e19 > 2^63,
    // where long arithmetic would throw (ANSI) or wrap (ansi=false) — the
    // decimal(38,0) terms keep them exact. counts(the:2e9, cat:1e9),
    // ref(the:3e9, cat:3e9); N=3e9, M=6e9;
    // terms |2e9*6e9 - 3e9*3e9| = 3e18 and |1e9*6e9 - 3e9*3e9| = 3e18;
    // sum = 6e18 still fits BIGINT; tv = 6e18 / (2*3e9*6e9) = 1/6.
    val ref = Seq(("the", 3000000000L), ("cat", 3000000000L)).toDF("token", "cnt")
    val big = Seq((0L, "the", 2000000000L), (0L, "cat", 1000000000L))
      .toDF("w", "token", "cnt")
    val r = StreamingDrift.totalVariationByWindow(big, Seq("w"), ref).head()
    assert(r.getAs[Long]("tv_scaled") == 6000000000000000000L)
    assert(math.abs(r.getAs[Double]("tv") - 1.0 / 6.0) < 1e-12)
  }

  test("tv_scaled beyond BIGINT fails fast instead of returning garbage") {
    // intermediate terms ~8.5e18 each are fine in decimal, but the sum
    // crosses 2^63 — the exact-BIGINT output contract is unmeetable and the
    // readout must raise, not wrap or null out
    val ref = Seq(("the", 3000000000L), ("dog", 3000000000L)).toDF("token", "cnt")
    val big = Seq((0L, "cat", 3000000000L)).toDF("w", "token", "cnt")
    val e = intercept[Exception] {
      StreamingDrift.totalVariationByWindow(big, Seq("w"), ref).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("exceeds BIGINT")))
  }

  test("unbounded reference is rejected before the broadcast grid") {
    val ref = (0 until 3000).map(i => (s"tok$i", 1L)).toDF("token", "cnt")
    val counts = Seq((0L, "tok1", 5L)).toDF("w", "token", "cnt")
    val e = intercept[IllegalArgumentException] {
      StreamingDrift.totalVariationByWindow(counts, Seq("w"), ref,
        maxReferenceTokens = 1000)
    }
    assert(e.getMessage.contains("distinct tokens"))
    // at or under the cap it runs
    assert(StreamingDrift.totalVariationByWindow(counts, Seq("w"), ref,
      maxReferenceTokens = 3000).count() == 1L)
  }

  test("guards: empty/duplicate vocab and oov collisions fail fast") {
    val df = Seq((ts(1L), "x")).toDF("ts", "text")
    intercept[IllegalArgumentException] {
      StreamingDrift.tokenCountsByWindow(df, col("text"), "ts", "1 minute",
        "0 seconds", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      StreamingDrift.tokenCountsByWindow(df, col("text"), "ts", "1 minute",
        "0 seconds", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      StreamingDrift.tokenCountsByWindow(df, col("text"), "ts", "1 minute",
        "0 seconds", Seq("a", "<oov>"))
    }
  }
}
