package graft

import graft.group.GroupedIterator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

case class Val(id: Int, seq: Int, value: Double)

class OperatorsSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // --------------------------------------------------------------------------
  // GroupedIterator (pure Scala, no Spark)
  // --------------------------------------------------------------------------

  test("GroupedIterator slices sorted pairs into groups") {
    val it = new GroupedIterator[Int, String](
      Iterator((1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e")).buffered)
    val got = it.map { case (k, vs) => k -> vs.toList }.toList
    assert(got === List(1 -> List("a", "b"), 2 -> List("c"), 3 -> List("d", "e")))
  }

  test("GroupedIterator auto-drains unconsumed groups") {
    val it = new GroupedIterator[Int, String](
      Iterator((1, "a"), (1, "b"), (2, "c")).buffered)
    val keys = it.map(_._1).toList // never consumes the value iterators
    assert(keys === List(1, 2))
  }

  test("GroupedIterator handles partially consumed groups and repeated hasNext") {
    val it = new GroupedIterator[Int, String](
      Iterator((1, "a"), (1, "b"), (1, "c"), (2, "d")).buffered)
    val (k1, vs1) = it.next()
    assert(k1 === 1 && vs1.next() === "a")
    assert(it.hasNext && it.hasNext) // idempotent, drains rest of group 1
    val (k2, vs2) = it.next()
    assert(k2 === 2 && vs2.toList === List("d"))
    assert(!it.hasNext)
  }

  test("GroupedIterator null-key group") {
    val it = new GroupedIterator[java.lang.Integer, String](
      Iterator((null.asInstanceOf[java.lang.Integer], "a"),
               (null.asInstanceOf[java.lang.Integer], "b")).buffered)(
      Ordering.by((i: java.lang.Integer) => i.intValue()))
    val got = it.map { case (k, vs) => (k, vs.size) }.toList
    assert(got === List((null, 2)))
  }

  // --------------------------------------------------------------------------
  // sorted groups on Spark
  // --------------------------------------------------------------------------

  lazy val vals = Seq(
    Val(1, 3, 1.3), Val(1, 1, 1.1), Val(1, 2, 1.2),
    Val(2, 1, 2.1), Val(2, 2, 2.2),
    Val(3, 1, 3.1)
  ).toDS().repartition(3)

  test("groupBySorted iterates groups in seq order") {
    val got = vals.groupBySorted[Int]($"id")($"seq")
      .flatMapSortedGroups { (id, it) => it.map(v => (id, v.seq, v.value)) }
      .collect().toList.sorted
    assert(got === List(
      (1, 1, 1.1), (1, 2, 1.2), (1, 3, 1.3),
      (2, 1, 2.1), (2, 2, 2.2),
      (3, 1, 3.1)))
    // order within each group must be by seq: verify first element per group
    val firsts = vals.groupBySorted[Int]($"id")($"seq")
      .flatMapSortedGroups { (id, it) => Iterator.single(id -> it.next().seq) }
      .collect().toMap
    assert(firsts === Map(1 -> 1, 2 -> 1, 3 -> 1))
  }

  test("groupBySorted with explicit partitions and desc order") {
    val got = vals.groupBySorted[Int](2)($"id")($"seq".desc)
      .flatMapSortedGroups { (id, it) => Iterator.single(id -> it.next().seq) }
      .collect().toMap
    assert(got === Map(1 -> 3, 2 -> 2, 3 -> 1))
  }

  test("groupByKeySorted lambda variant with reverse") {
    val got = vals.groupByKeySorted[Int, Int](v => v.id)(v => v.seq, reverse = true)
      .flatMapSortedGroups { (id, it) => Iterator.single(id -> it.next().seq) }
      .collect().toMap
    assert(got === Map(1 -> 3, 2 -> 2, 3 -> 1))
  }

  test("flatMapSortedGroups stateful variant") {
    val got = vals.groupBySorted[Int]($"id")($"seq")
      .flatMapSortedGroups[StringBuilder, (Int, String)](k => new StringBuilder(k.toString)) {
        (sb, v) => Iterator.single(v.id -> sb.append("-").append(v.seq).toString)
      }
      .collect().toList
    assert(got.filter(_._1 == 1).map(_._2).sorted === List("1-1", "1-1-2", "1-1-2-3"))
  }

  test("groupByKey by column") {
    // Dataset's own lambda groupByKey shadows the extension in overload
    // resolution; apply the extension explicitly (same as the reference's
    // documented caveat for column-based groupByKey).
    val counts = ExtendedDataset(vals).groupByKey[Int]($"id").count().collect().toMap
    assert(counts === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  // --------------------------------------------------------------------------
  // row numbers
  // --------------------------------------------------------------------------

  test("withRowNumbers assigns contiguous global row numbers in order") {
    val df = spark.range(0, 1000).toDF("id").repartition(7)
      .withColumn("neg", -$"id")
    val result = df.withRowNumbers($"neg")
    assert(result.columns.toSeq === Seq("id", "neg", "row_number"))
    // ordered by neg => id descending => row_number == 1000 - id
    val violations = result.filter($"row_number" =!= lit(1000) - $"id").count()
    assert(violations === 0)
    assert(result.count() === 1000)
  }

  test("withRowNumbers without order keeps current order and numbers 1..N") {
    val df = spark.range(0, 100).toDF("id")
    val result = df.withRowNumbers()
    val rns = result.select($"row_number").as[Long].collect().sorted
    assert(rns.toSeq === (1L to 100L))
  }

  test("withRowNumbers survives EMPTY partitions between non-empty ones") {
    // input partitions 0,3,6 carry data; 1,2,4,5,7 are empty. The no-order
    // path pins these pids directly, so the offsets join must carry the
    // cumulative count across the gaps (a pid+1 equi-join over only
    // non-empty partitions restarts numbering after each gap).
    val pairs = spark.sparkContext.parallelize(0L until 100L).map(i => (i, i))
    val spread = pairs.partitionBy(new org.apache.spark.Partitioner {
      def numPartitions = 8
      def getPartition(key: Any) = (key.asInstanceOf[Long] % 3).toInt * 3
    }).values
    val df = spark.createDataset(spread).toDF("id")
    assert(df.rdd.getNumPartitions == 8)
    val rns = df.withRowNumbers().select($"row_number").as[Long].collect().sorted
    assert(rns.toSeq === (1L to 100L))
    // the dense offsets frame covers every pid up to the max OBSERVED one,
    // including empty gap partitions (trailing empties carry no rows, so
    // nothing there needs an offset); derived in-plan, no .rdd job
    val pids = graft.agg.PrefixSum.densePids(df.withColumn("pid",
        org.apache.spark.sql.functions.spark_partition_id()), "pid")
      .select($"pid").as[Int].collect().sorted
    assert(pids.toSeq === (0 to 6))
  }

  test("withRowNumbers custom column name and unpersist handle") {
    val handle = UnpersistHandle()
    val df = spark.range(0, 10).toDF("id")
    val result = df.withRowNumbers("rn", StorageLevel.MEMORY_AND_DISK, handle, $"id")
    assert(result.select($"rn").as[Long].collect().sorted.toSeq === (1L to 10L))
    handle.unpersist(blocking = true)
  }

  test("withRowNumbers rejects StorageLevel.NONE") {
    val df = spark.range(0, 10).toDF("id")
    intercept[IllegalArgumentException] {
      RowNumbers.withRowNumbers(df, storageLevel = StorageLevel.NONE)
    }
  }

  // --------------------------------------------------------------------------
  // histogram
  // --------------------------------------------------------------------------

  test("histogram buckets values per group") {
    val df = Seq(
      ("a", 1), ("a", 5), ("a", 15), ("a", 150),
      ("b", 20), ("b", 30)
    ).toDF("g", "v")
    val result = df.histogram(Seq(10, 100), $"v", $"g")
    assert(result.columns.toSeq === Seq("g", "≤10", "≤100", ">100"))
    val rows = result.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows === Map("a" -> ((2L, 1L, 1L)), "b" -> ((0L, 2L, 0L))))
  }

  test("histogram without aggregate columns is a global aggregation") {
    val df = Seq(1, 2, 3, 11, 12, 101).toDF("v")
    val row = df.histogram(Seq(10, 100), $"v").collect().head
    assert(row === Row(3L, 2L, 1L))
  }

  test("histogram validates thresholds") {
    val df = Seq(1).toDF("v")
    intercept[IllegalArgumentException] { df.histogram(Seq.empty[Int], $"v") }
    intercept[IllegalArgumentException] { df.histogram(Seq(1, 1), $"v") }
    intercept[IllegalArgumentException] { df.histogram(Seq(2, 1), $"v") }
  }

  // --------------------------------------------------------------------------
  // partitioned write
  // --------------------------------------------------------------------------

  test("writePartitionedBy produces one dir per partition value with sorted files") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-write").toString
    val df = Seq(
      (1, "a", 3), (1, "b", 1), (2, "c", 2), (2, "d", 4), (1, "e", 2)
    ).toDF("part", "name", "ord")
    df.writePartitionedBy(Seq($"part"), moreFileOrder = Seq($"ord"))
      .mode("overwrite").csv(dir)
    val dirs = Files.list(Paths.get(dir)).iterator()
    val partDirs = Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.startsWith("part=")).toList.sorted
    assert(partDirs === List("part=1", "part=2"))
    // rows within part=1 must be ordered by ord
    val back = spark.read.csv(s"$dir/part=1")
    val names = back.collect().map(_.getString(0)).toList
    assert(names === List("b", "e", "a"))
  }

  test("compactParquet sizes output files from footer metadata and keeps rows") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val frag = base + "/frag"
    val out = base + "/out"
    spark.range(0, 20000).select(col("id"), (col("id") * 3).as("v"))
      .repartition(32)
      .write.mode("overwrite").parquet(frag)
    val fragFiles = graft.parquet.ParquetMeta.parquetMetadata(spark, None, Seq(frag)).count()
    assert(fragFiles == 32L)
    val totalBytes = graft.parquet.ParquetMeta.parquetMetadata(spark, None, Seq(frag))
      .agg(sum(col("compressedBytes"))).head().getLong(0)
    // target ~half the data per file -> exactly 2 output files
    val n = graft.write.Compaction.compactParquet(spark, frag, out,
      targetFileBytes = (totalBytes + 1) / 2)
    assert(n == 2)
    val outMeta = graft.parquet.ParquetMeta.parquetMetadata(spark, None, Seq(out))
    assert(outMeta.count() == 2L)
    assert(outMeta.agg(sum(col("rows"))).head().getLong(0) == 20000L)
    // rows moved, never changed
    val got = spark.read.parquet(out).as[(Long, Long)].collect().toSet
    assert(got == (0L until 20000L).map(i => (i, i * 3)).toSet)
    // huge target collapses to one file; coalesce path agrees on content
    val out1 = base + "/one"
    assert(graft.write.Compaction.compactParquet(spark, frag, out1,
      targetFileBytes = Long.MaxValue / 2, shuffle = false) == 1)
    assert(spark.read.parquet(out1).count() == 20000L)
  }

  test("explainPairs emits exact matched runs along diagonals") {
    import spark.implicits._
    // shared run of 5 tokens at a=2..6, b=0..4; b repeats it again at 7..11
    val docs = Seq(
      (1L, "x1 x2 common run of five tokens tail1 tail2"),
      (2L, "common run of five tokens mid common run of five tokens")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("ida", "idb")
    val got = graft.dedup.Explain.explainPairs(
      docs, col("doc_id"), col("text"), pairs, col("ida"), col("idb"), k = 3)
      .select("a_start", "a_end", "b_start", "b_end", "match_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (2L, 6L, 0L, 4L, 5L),  // first occurrence in b
      (2L, 6L, 6L, 10L, 5L)  // second occurrence, different diagonal
    ), s"got $got")
    // only reviewed docs reach the shingle kernel: semi-join in the plan
    val plan = graft.dedup.Explain.explainPairs(
      docs, col("doc_id"), col("text"), pairs, col("ida"), col("idb"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    // disjoint docs explain to zero rows
    val none = graft.dedup.Explain.explainPairs(
      Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), pairs, col("ida"), col("idb"))
    assert(none.count() == 0)
    // duplicate pair rows (concatenated review feeds) must not fragment
    // the islands: same spans as the deduped list
    val dup = pairs.unionAll(pairs)
    val got2 = graft.dedup.Explain.explainPairs(
      docs, col("doc_id"), col("text"), dup, col("ida"), col("idb"), k = 3)
      .select("a_start", "a_end", "b_start", "b_end", "match_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got2 === got, s"duplicated pair list changed spans: $got2")
  }

  test("compactInPlace shrinks file count, keeps rows, preserves clustering") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cip").toString + "/d"
    spark.range(0, 10000).select((col("id") % 8).cast("int").as("cid"), col("id"))
      .repartition(24).write.parquet(dir)
    val (before, after) = graft.write.Compaction.compactInPlace(
      spark, dir, targetFileBytes = Long.MaxValue / 2, clusterCols = Seq("cid"))
    assert(before == 24 && after < before)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000L)
    assert(back.as[(Int, Long)].collect().toSet ==
      (0L until 10000L).map(i => ((i % 8).toInt, i)).toSet)
    // clustering preserved: each cid lives in exactly one file
    val spread = back
      .select(col("cid"), input_file_name().as("f")).distinct()
      .groupBy("cid").count().agg(max("count")).head().getLong(0)
    assert(spread == 1L, s"cid spread across $spread files")
    // second pass is a no-op-shaped rewrite (already compact), rows intact
    val (b2, a2) = graft.write.Compaction.compactInPlace(
      spark, dir, targetFileBytes = Long.MaxValue / 2, clusterCols = Seq("cid"))
    assert(b2 == after && a2 <= b2)
    assert(spark.read.parquet(dir).count() == 10000L)
  }

  test("compactInPlace fails fast on a hive-partitioned directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cip-part").toString + "/d"
    spark.range(0, 100).select((col("id") % 4).cast("int").as("p"), col("id"))
      .write.partitionBy("p").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      graft.write.Compaction.compactInPlace(spark, dir)
    }
    assert(e.getMessage.contains("FLAT") && e.getMessage.contains("p="))
    // nothing touched: the partitioned data reads back unchanged
    assert(spark.read.parquet(dir).count() == 100L)
  }

  test("compactDedupIndex keeps index answers identical") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta row ${i % 6} tail"))
      .toDF("doc_id", "text")
    val inc = (30L until 40L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta row ${i % 6} tail"))
      .toDF("doc_id", "text")
    val idx = graft.createTemporaryDir("cip-dedup")
    graft.dedup.DedupIndex.saveDedupIndex(docs, col("doc_id"), col("text"), idx)
    // a second batch makes small appended files worth compacting
    graft.dedup.DedupIndex.appendToDedupIndex(inc.limit(5), col("doc_id"), col("text"), idx)
    def pairs() = graft.dedup.DedupIndex.nearDupPairsAgainstIndex(
      inc, col("doc_id"), col("text"), idx, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val beforeAnswers = pairs()
    val stats = graft.write.Compaction.compactDedupIndex(spark, idx)
    assert(stats("buckets")._2 <= stats("buckets")._1)
    assert(pairs() == beforeAnswers)
  }

  test("writeBucketedBy co-buckets tables so their join plans with no shuffle") {
    import graft.write.BucketedWrite
    val facts = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
    val dims = spark.range(100).select($"id".as("k"), ($"id" % 7).as("w"))
    BucketedWrite.writeBucketedBy(facts, 4, Seq($"k"), Seq($"v"))
      .mode("overwrite").format("parquet").saveAsTable("graft_bucket_facts")
    BucketedWrite.writeBucketedBy(dims, 4, Seq($"k"))
      .mode("overwrite").format("parquet").saveAsTable("graft_bucket_dims")
    try {
      // force a non-broadcast join so only bucketing can delete the exchange
      val joined = spark.table("graft_bucket_facts")
        .hint("merge")
        .join(spark.table("graft_bucket_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected a shuffle-free bucketed join:\n$plan")
      assert(joined.count() === 100L)
      assert(joined.agg(sum($"v")).as[Long].head() === (0L until 100L).map(_ * 2).sum)
      // layout: one file per bucket (repartition aligned input with buckets)
      val loc = spark.sql("DESCRIBE TABLE EXTENDED graft_bucket_facts")
        .filter($"col_name" === "Location").select("data_type").as[String].head()
      val files = new java.io.File(new java.net.URI(loc)).listFiles()
        .filter(f => f.getName.startsWith("part-")).toList
      assert(files.size === 4, s"expected 4 bucket files, got ${files.map(_.getName)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_dims")
    }
  }

  test("writeBucketedBy validates arguments") {
    val df = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      graft.write.BucketedWrite.writeBucketedBy(df, 0, Seq($"k"))
    }
    intercept[IllegalArgumentException] {
      graft.write.BucketedWrite.writeBucketedBy(df, 4, Seq.empty)
    }
  }

  // --------------------------------------------------------------------------
  // session utilities
  // --------------------------------------------------------------------------

  test("withJobDescription sets and restores") {
    implicit val s = spark
    val sc = spark.sparkContext
    sc.setJobDescription("outer")
    withJobDescription("inner") {
      assert(sc.getLocalProperty("spark.job.description") === "inner")
    }
    assert(sc.getLocalProperty("spark.job.description") === "outer")
    withJobDescription("ignored", ifNotSet = true) {
      assert(sc.getLocalProperty("spark.job.description") === "outer")
    }
    appendJobDescription("extra") {
      assert(sc.getLocalProperty("spark.job.description") === "outer - extra")
    }
    sc.setJobDescription(null)
  }

  test("BandPlan: S-curve arithmetic and divisor-constrained planning") {
    import graft.dedup.BandPlan
    // closed forms at hand-checkable points
    assert(math.abs(BandPlan.thresholdOf(16, 8) - math.pow(1.0 / 16, 1.0 / 8)) < 1e-15)
    assert(BandPlan.collisionProbability(1.0, 16, 8) == 1.0)
    assert(BandPlan.collisionProbability(0.0, 16, 8) == 0.0)
    // one band of r rows: p = j^r exactly
    assert(math.abs(BandPlan.collisionProbability(0.5, 1, 4) - 0.0625) < 1e-15)
    // the repo's default banding (16 x 8): waterline ~0.707, J=0.8
    // near-certain, J=0.4 candidates rare — the documented 0.8 operating point
    val p8 = BandPlan.collisionProbability(0.8, 16, 8)
    val p4 = BandPlan.collisionProbability(0.4, 16, 8)
    assert(p8 > 0.93 && p4 < 0.05, s"p(0.8)=$p8 p(0.4)=$p4")
    // planner picks a waterline at-or-below target (false negatives are
    // unrecoverable; false candidates just cost verify work)
    val plan = BandPlan.planBands(128, 0.8)
    assert(plan.bands * plan.rowsPerBand == 128)
    assert(plan.threshold <= 0.8 + 1e-12, s"$plan")
    assert(plan.recallAtTarget > 0.9, s"$plan")
    assert(plan.candidateRateAtHalfTarget < 0.2, s"$plan")
    // monotone sanity: more rows per band -> higher waterline
    assert(BandPlan.thresholdOf(8, 16) > BandPlan.thresholdOf(16, 8))
    intercept[IllegalArgumentException] { BandPlan.planBands(1, 0.8) }
    intercept[IllegalArgumentException] { BandPlan.collisionProbability(1.5, 2, 2) }
  }
}
