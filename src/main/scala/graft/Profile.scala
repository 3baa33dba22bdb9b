package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for optimization work: times the shared
  * substrates (tokenizer training, pack, artifact IO, ANN training) in
  * isolation so bench deltas can be attributed. Not part of the driver
  * contract. Usage: runMain graft.Profile [sfDir] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println("docs rows: " + docs.count())

    // --- ByteBpe.train substrate (twice: cold + warm) ---
    for (i <- 1 to 2) {
      val model = time(s"ByteBpe.train(80) #$i") {
        graft.text.ByteBpe.train(docs, col("text"), numMerges = 80)
      }
      if (i == 2) {
        // split: the count pass vs the driver merge loop
        val counts = time("  bbpe count pass + collect") {
          docs.select(explode(graft.functions.vectors.byte_bpe_encode(
              coalesce(col("text"), lit("")), IndexedSeq.empty)).as("w"))
            .groupBy(col("w")).agg(count(lit(1)).as("c"))
            .filter(col("c") >= 1 && length(col("w")) >= 2)
            .orderBy(col("c").desc, col("w"))
            .limit(1 << 20)
            .collect()
            .map(r => (graft.functions.ByteBpeKernels.fromDisplay(r.getString(0)),
              r.getLong(1)))
        }
        println("  distinct pretokens: " + counts.length +
          ", total syms: " + counts.map(_._1.length.toLong).sum)
        time("  bbpe trainFromCounts(80)") {
          graft.text.Bpe.trainFromCounts(counts, 80)
        }
        // encode pass over the corpus with the trained model
        time("  bbpe encodeIds pass (noop)") {
          docs.select(graft.text.ByteBpe.encodeIds(
              coalesce(col("text"), lit("")), model).as("ids"))
            .write.format("noop").mode("overwrite").save()
        }
      }
    }

    // --- packTokenIds substrate ---
    {
      val model = graft.text.ByteBpe.train(docs, col("text"), numMerges = 80)
      val sep = graft.text.ByteBpe.vocabSize(model)
      for (i <- 1 to 2) time(s"packTokenIds (noop) #$i") {
        graft.text.Packing.packTokenIds(docs,
          graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model),
          Seq(col("doc_id")), capacity = 512, sepId = sep)
          .write.format("noop").mode("overwrite").save()
      }
      val tok = graft.text.TokenizerArtifact.Tokenizer(model, Seq("<|endoftext|>"))
      val shardDir = graft.createTemporaryDir("prof-shards")
      time("saveShards (64KB target)") {
        graft.text.Shards.saveShards(docs,
          graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model),
          Seq(col("doc_id")), capacity = 512, sepId = sep, dir = shardDir,
          tokenizer = Some(tok), targetFileBytes = 64L * 1024)
      }
      time("verifyShards") {
        graft.text.Shards.verifyShards(spark, shardDir).collect()
      }
      time("unpackShards (noop)") {
        graft.text.Shards.unpackShards(spark, shardDir)
          .write.format("noop").mode("overwrite").save()
      }
      val shardDir2 = graft.createTemporaryDir("prof-shards2")
      time("saveShards (default target)") {
        graft.text.Shards.saveShards(docs.filter(col("doc_id") < 250),
          graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model),
          Seq(col("doc_id")), capacity = 512, sepId = sep, dir = shardDir2,
          tokenizer = Some(tok))
      }
      time("appendShards") {
        graft.text.Shards.appendShards(docs.filter(col("doc_id") >= 250),
          graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model),
          Seq(col("doc_id")), shardDir2)
      }
    }

    // --- streaming harness floor: phases of one simple gate-shaped replay ---
    for (i <- 1 to 2) {
      val root = java.nio.file.Files.createTempDirectory("prof_stream").toString
      val staged = docs.select(col("doc_id"), col("text"),
        (col("doc_id") % 5).cast("int").as("__b"))
      val schema = time(s"stream: writeOrderedBatches #$i") {
        graft.streaming.StreamHarness.writeOrderedBatches(
          staged.drop("__b"), (col("doc_id") % 5).cast("int"), 5, s"$root/in")
      }
      val stream = graft.streaming.StreamHarness.readOrderedBatches(
        spark, s"$root/in", schema)
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val sink = try {
        time(s"stream: drainToParquet (dedup op) #$i") {
          graft.streaming.StreamHarness.drainToParquet(
            graft.streaming.StreamingDedup.dropDuplicateTexts(stream, col("text")),
            s"$root/sink", s"$root/ck")
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      time(s"stream: sink readback count #$i") { sink.count() }
    }

    // --- unpack A/B: old per-token plan vs new per-segment plan ---
    {
      val model = graft.text.ByteBpe.train(docs, col("text"), numMerges = 80)
      val sep = graft.text.ByteBpe.vocabSize(model)
      val packed = graft.text.Packing.packTokenIds(docs,
        graft.text.ByteBpe.encodeIds(coalesce(col("text"), lit("")), model),
        Seq(col("doc_id")), capacity = 512, sepId = sep)
        .localCheckpoint(true)
      println("packed seqs: " + packed.count())

      def oldUnpack(): Unit = {
        val perSeq = packed.select(col("seq_id"),
          size(filter(col("ids"), i => i === sep)).cast("long").as("__nsep"))
        val offsets = graft.agg.PrefixSum.withRunningTotal(perSeq, col("__nsep"),
          Seq(col("seq_id")), "__sepsBefore", exclusive = true)
          .select(col("seq_id"), col("__sepsBefore"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("seq_id")).orderBy(col("__pos"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        packed
          .select(col("seq_id"), posexplode(col("ids")).as(Seq("__pos", "__id")))
          .join(offsets, "seq_id")
          .withColumn("__docIdx", col("__sepsBefore") +
            coalesce(sum(when(col("__id") === sep, 1L)).over(w), lit(0L)))
          .filter(col("__id") =!= sep)
          .withColumn("__gpos", col("seq_id") * 512 + col("__pos"))
          .groupBy(col("__docIdx").as("doc_idx"))
          .agg(transform(
            array_sort(collect_list(struct(col("__gpos"), col("__id")))),
            x => x.getField("__id")).as("ids"))
          .select(col("doc_idx"), col("ids"))
          .write.format("noop").mode("overwrite").save()
      }
      def newUnpack(): Unit =
        graft.text.Packing.unpackTokenIds(packed, 512, sep)
          .write.format("noop").mode("overwrite").save()
      for (i <- 1 to 3) {
        time(s"unpack OLD per-token #$i") { oldUnpack() }
        time(s"unpack NEW per-segment #$i") { newUnpack() }
      }
    }

    // --- ANN training substrate ---
    {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      println("emb rows: " + emb.count())
      for (i <- 1 to 2) {
        time(s"trainIvf(16, 3it) #$i") {
          graft.ann.Ann.trainIvf(emb, col("vec_id"), col("embedding"),
            k = 16, iterations = 3)
        }
        time(s"trainPq(8x16, 3it) #$i") {
          graft.ann.Pq.trainPq(emb, col("vec_id"), col("embedding"),
            dim = 64, m = 8, ksub = 16, iterations = 3)
        }
      }
      // trainPq sub-step timing (replicated internals)
      {
        val subdim = 8; val m = 8; val ksub = 16
        val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val seeds = time("  pq seeds collect") {
          base.orderBy(col("id")).limit(ksub)
            .select("v").collect().map(_.getSeq[Float](0).toArray)
        }
        var codebooks: Array[Array[Array[Float]]] =
          Array.tabulate(m, ksub) { (s, c) =>
            java.util.Arrays.copyOfRange(seeds(c), s * subdim, (s + 1) * subdim)
          }
        for (it <- 1 to 3) {
          val means = time(s"  pq iteration $it") {
            base
              .select(graft.functions.vectors.pq_encode_ints(col("v"), codebooks).as("codes"),
                posexplode(col("v")).as(Seq("i", "x")))
              .select((col("i") / subdim).cast("int").as("sub"),
                (col("i") % subdim).as("within"),
                get(col("codes"), (col("i") / subdim).cast("int")).as("code"),
                col("x"))
              .groupBy(col("sub"), col("code"), col("within"))
              .agg(avg(col("x")).as("mean"))
              .collect()
          }
          val next = codebooks.map(_.map(_.clone()))
          means.foreach { r =>
            next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
          }
          codebooks = next
        }
        base.unpersist(blocking = false)
      }
      val ivf = graft.ann.Ann.trainIvf(emb, col("vec_id"), col("embedding"),
        k = 16, iterations = 3)
      val pqi = graft.ann.Pq.trainPq(emb, col("vec_id"), col("embedding"),
        dim = 64, m = 8, ksub = 16, iterations = 3)
      val idx = graft.createTemporaryDir("prof-ann-index")
      time("saveAnnIndex") {
        graft.ann.Pq.saveAnnIndex(emb, col("vec_id"), col("embedding"),
          ivf, pqi, idx)
      }
      time("appendToAnnIndex") {
        graft.ann.Pq.appendToAnnIndex(
          emb.filter(col("vec_id") % 2 === 1).limit(100),
          col("vec_id"), col("embedding"), idx)
      }
      time("ivfPqTopKIndexed query (noop)") {
        graft.ann.Pq.ivfPqTopKIndexed(
          emb.filter(col("vec_id") < 20), col("vec_id"), col("embedding"),
          idx, k = 3, nprobe = 3, refine = 8)
          .write.format("noop").mode("overwrite").save()
      }
    }

    spark.stop()
  }
}
