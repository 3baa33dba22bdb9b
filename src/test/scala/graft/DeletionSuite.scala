package graft

import graft.privacy.Deletion
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DeletionSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def writeCorpus(dir: String, nFiles: Int): Unit =
    spark.range(100).select(col("id"), (col("id") * 10).as("payload"))
      .repartition(nFiles).write.parquet(dir)

  private def listDataFiles(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.getName, s.getModificationTime)).toMap
  }

  test("scrub deletes exactly the doomed rows and touches only their files") {
    val dir = java.nio.file.Files.createTempDirectory("scrub-basic").toString + "/d"
    writeCorpus(dir, 10)
    val before = listDataFiles(dir)
    val doomed = Seq(3L, 57L, 99L).toDF("bad")
    val stats = Deletion.scrubParquetById(
      spark, dir, "id", doomed, col("bad"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 97)
    assert(back.filter(col("id").isin(3L, 57L, 99L)).count() == 0)
    // survivors of the victim files kept their payloads
    assert(back.filter(col("payload") =!= col("id") * 10).count() == 0)
    assert(stats.rowsDeleted == 3 && stats.filesTotal == 10)
    // untouched files: same names, same mtimes
    val after = listDataFiles(dir)
    val untouched = before.keys.toSet
      .intersect(after.keys.toSet)
    assert(untouched.forall(f => before(f) == after(f)))
    assert(before.size - untouched.size == stats.filesRewritten)
    assert(stats.newFiles.forall(f => new Path(f).getName.startsWith("scrub-")))
  }

  test("ids absent from the corpus are a no-op: zero rewrites") {
    val dir = java.nio.file.Files.createTempDirectory("scrub-noop").toString + "/d"
    writeCorpus(dir, 4)
    val before = listDataFiles(dir)
    val stats = Deletion.scrubParquetById(
      spark, dir, "id", Seq(12345L).toDF("bad"), col("bad"))
    assert(stats.filesRewritten == 0 && stats.rowsDeleted == 0)
    assert(listDataFiles(dir) == before)
  }

  test("touched-file cap fails fast instead of a silent full rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("scrub-cap").toString + "/d"
    writeCorpus(dir, 10)
    val e = intercept[IllegalArgumentException] {
      Deletion.scrubParquetById(spark, dir, "id",
        spark.range(100).toDF("bad"), col("bad"), maxTouchedFiles = 3)
    }
    assert(e.getMessage.contains("rebuild"))
  }

  test("crash recovery: roll forward past the marker, roll back before it") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("scrub-crash").toString + "/d"
    writeCorpus(dir, 4)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())

    // simulate a crash AFTER the marker: fresh scrub file present, one old
    // file recorded for deletion but still on disk
    val victim = fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).head.getPath
    val survivors = spark.read.parquet(victim.toString).filter(col("id") =!= -1L)
    val tmpDir = new Path(p, "_scrub_tmp_deadbeef")
    survivors.write.parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).filter(_.getPath.getName.startsWith("part-")).head.getPath
    require(fs.rename(part, new Path(p, s"scrub-deadbeef-${part.getName}")))
    val out = fs.create(new Path(p, "_graft_pending_deletes"), false)
    out.write(s"uuid:deadbeef\n$victim".getBytes("UTF-8")); out.close()
    // next scrub call repairs first: victim deleted, marker gone, rows intact
    val st = Deletion.scrubParquetById(spark, dir, "id",
      Seq(-77L).toDF("bad"), col("bad"))
    assert(!fs.exists(victim) && !fs.exists(new Path(p, "_graft_pending_deletes")))
    assert(spark.read.parquet(dir).count() == 100)
    assert(st.rowsDeleted == 0)

    // simulate a crash BEFORE the marker: partial renamed copy + tmp left
    val dir2 = java.nio.file.Files.createTempDirectory("scrub-crash2").toString + "/d"
    writeCorpus(dir2, 4)
    val p2 = new Path(dir2)
    val victim2 = fs.listStatus(p2).filter(_.getPath.getName.startsWith("part-")).head.getPath
    val tmp2 = new Path(p2, "_scrub_tmp_cafebabe")
    spark.read.parquet(victim2.toString).write.parquet(tmp2.toString)
    val part2 = fs.listStatus(tmp2).filter(_.getPath.getName.startsWith("part-")).head.getPath
    require(fs.rename(part2, new Path(p2, s"scrub-cafebabe-${part2.getName}")))
    // rollback: duplicate copy dropped, old files intact, count unchanged
    Deletion.scrubParquetById(spark, dir2, "id", Seq(-77L).toDF("bad"), col("bad"))
    assert(!fs.exists(tmp2))
    assert(fs.listStatus(p2).count(_.getPath.getName.startsWith("scrub-")) == 0)
    assert(spark.read.parquet(dir2).count() == 100)
  }

  test("crash after old-file deletes: forwarded tmp + marker roll FORWARD, no row lost") {
    // the late-crash window: old files already deleted, fresh files
    // published, the publishing run's tmp dir still present, marker still
    // present (the marker is removed LAST by protocol). Recovery must
    // treat the fresh files as authoritative — a rollback here would
    // delete them after the old rows are already gone.
    val dir = java.nio.file.Files.createTempDirectory("scrub-crash3").toString + "/d"
    writeCorpus(dir, 4)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val victim = fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).head.getPath
    val tmpDir = new Path(p, "_scrub_tmp_feedface")
    spark.read.parquet(victim.toString).write.parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).filter(_.getPath.getName.startsWith("part-")).head.getPath
    val published = new Path(p, s"scrub-feedface-${part.getName}")
    // publish = COPY here (not rename) so the tmp dir keeps its part file,
    // exactly as after step 2 of the protocol
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, published, false,
      spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(p, "_graft_pending_deletes"), false)
    out.write(s"uuid:feedface\n$victim".getBytes("UTF-8")); out.close()
    require(fs.delete(victim, false)) // step 4 already ran for the old file
    assert(graft.write.SwapFiles.recover(fs, p))
    assert(fs.exists(published), "roll-forward must keep the published file")
    assert(!fs.exists(tmpDir) && !fs.exists(new Path(p, "_graft_pending_deletes")))
    assert(spark.read.parquet(dir).count() == 100)
    assert(spark.read.parquet(dir).filter(col("payload") =!= col("id") * 10).count() == 0)
  }

  test("recover removes a stale _resized sizing-rewrite scratch dir") {
    // crash window: Shards' append-path resizeIfOffTarget wrote (part of)
    // dataDir/_resized and died before its own cleanup — the scratch is
    // invisible to readers but must not accumulate across crashed runs
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("resized-crash").toString + "/d"
    writeCorpus(dir, 2)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val resized = new Path(p, "_resized")
    fs.mkdirs(resized)
    val out = fs.create(new Path(resized, "part-00000-dead.parquet"), false)
    out.write(Array[Byte](1, 2, 3)); out.close()
    assert(graft.write.SwapFiles.recover(fs, p))
    assert(!fs.exists(resized), "stale _resized must be removed by recover")
    assert(spark.read.parquet(dir).count() == 100) // data untouched
    assert(!graft.write.SwapFiles.recover(fs, p))  // second run: nothing left
  }

  test("scrubbed dedup index answers exactly like one built on the filtered reference") {
    val docs = (0L until 40L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta row ${i % 8} tail"))
      .toDF("doc_id", "text")
    val ref = docs.filter(col("doc_id") < 30)
    val inc = docs.filter(col("doc_id") >= 30)
    val doomed = Seq(2L, 10L, 18L, 26L).toDF("bad") // same residue mod 8 as 34
    val full = graft.createTemporaryDir("scrub-dedup-full")
    val clean = graft.createTemporaryDir("scrub-dedup-clean")
    graft.dedup.DedupIndex.saveDedupIndex(ref, col("doc_id"), col("text"), full)
    graft.dedup.DedupIndex.saveDedupIndex(
      ref.join(doomed, col("doc_id") === col("bad"), "left_anti"),
      col("doc_id"), col("text"), clean)
    val stats = Deletion.scrubDedupIndex(spark, full, doomed, col("bad"))
    assert(stats.rowsDeleted > 0)
    def pairs(path: String) = graft.dedup.DedupIndex.nearDupPairsAgainstIndex(
      inc, col("doc_id"), col("text"), path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(full) === pairs(clean))
    assert(!pairs(full).exists { case (_, b) => Set(2L, 10L, 18L, 26L)(b) })
  }

  test("scrubbed ANN index answers exactly like one saved on the filtered corpus") {
    val rng = new scala.util.Random(7)
    val vecs = (0L until 64L).map { i =>
      (i, Array.fill(16)(rng.nextFloat() * 2 - 1).toSeq)
    }.toDF("id", "vec")
    val ivf = graft.ann.Ann.trainIvf(vecs, col("id"), col("vec"), k = 4, iterations = 2)
    val pqi = graft.ann.Pq.trainPq(vecs, col("id"), col("vec"),
      dim = 16, m = 4, ksub = 8, iterations = 2)
    val doomed = Seq(1L, 5L, 9L, 13L).toDF("bad")
    val full = graft.createTemporaryDir("scrub-ann-full")
    val clean = graft.createTemporaryDir("scrub-ann-clean")
    graft.ann.Pq.saveAnnIndex(vecs, col("id"), col("vec"), ivf, pqi, full)
    graft.ann.Pq.saveAnnIndex(
      vecs.join(doomed, col("id") === col("bad"), "left_anti"),
      col("id"), col("vec"), ivf, pqi, clean)
    val stats = Deletion.scrubAnnIndex(spark, full, doomed, col("bad"))
    assert(stats.rowsDeleted == 8) // 4 ids x (enc + vectors)
    val queries = vecs.filter(col("id") < 6)
    def topk(path: String) = graft.ann.Pq.ivfPqTopKIndexed(
      queries, col("id"), col("vec"), path, k = 3, nprobe = 2, refine = 4)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val scrubbed = topk(full)
    assert(scrubbed === topk(clean))
    assert(!scrubbed.exists { case (_, _, n) => Set(1L, 5L, 9L, 13L)(n) })
  }
}
