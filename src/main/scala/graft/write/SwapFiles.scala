package graft.write

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/**
 * Crash-safe file swap for in-place rewrites (deletion scrub, compaction):
 * publish a temp directory's part files into a data directory and delete a
 * recorded list of old files, such that a crash at ANY point is repaired
 * by the next run with no row ever lost or duplicated.
 *
 * Protocol (single maintainer per directory — these are maintenance ops,
 * not a concurrent-writer format):
 *
 *  1. fresh parts land in `_<op>_tmp_<uuid>/` (underscore dirs are
 *     invisible to parquet readers);
 *  2. each part renames to `<prefix>-<uuid>-<part>` in the data dir;
 *  3. a `_graft_pending_deletes` marker is written listing the old files
 *     — ONLY from this point are the fresh files authoritative;
 *  4. old files delete (each checked), the tmp dir is removed, the
 *     marker is removed LAST — so any crash after step 3 leaves the
 *     marker in place and is repaired by idempotent roll-forward,
 *     never mistaken for a pre-publish crash.
 *
 * Recovery on the next run ([[recover]], called by every swap first):
 *  - marker present → the fresh files are authoritative: ROLL FORWARD
 *    (finish the recorded deletes, drop marker, drop tmp dirs);
 *  - no marker but `_<op>_tmp_*` dirs exist → a crash during write or
 *    rename: the old files are untouched and authoritative, so ROLL BACK
 *    (delete the partially renamed `<prefix>-<uuid>-*` files and the tmp
 *    dirs — their rows still live in the old files).
 *
 * Readers between steps 2 and 4 can transiently see duplicate rows of the
 * rewritten files; both index consumers tolerate that (the ANN re-rank
 * collapses per-(query, neighbor); dedup candidates deduplicate before
 * the Jaccard verify), and the window closes with the deletes.
 */
private[graft] object SwapFiles {

  private val Marker = "_graft_pending_deletes"

  private def markerPath(dir: Path) = new Path(dir, Marker)

  /** Repair an interrupted swap; returns true if anything was repaired. */
  def recover(fs: FileSystem, dir: Path): Boolean = {
    val mp = markerPath(dir)
    var repaired = false
    var forwardedUuid: Option[String] = None
    if (fs.exists(mp)) {
      // roll forward: fresh files are authoritative, finish the deletes.
      // Line 1 records the publishing run's uuid so its tmp leftovers are
      // NOT mistaken for a pre-publish crash and rolled back below.
      val in = fs.open(mp)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      require(lines.headOption.exists(_.startsWith("uuid:")),
        s"corrupt marker $mp: ${lines.headOption}")
      forwardedUuid = Some(lines.head.stripPrefix("uuid:"))
      lines.tail.filter(_.nonEmpty).foreach { f =>
        val p = new Path(f)
        require(!fs.exists(p) || fs.delete(p, false),
          s"recovery could not delete $p")
      }
      // the forwarded run's tmp leftovers must go BEFORE the marker: a
      // crash after the marker is gone but with its tmp still present
      // would look like a pre-publish crash and roll back the published
      // files whose old rows were already deleted. Roll-forward is
      // idempotent, so crashing anywhere before the marker delete just
      // re-runs this branch.
      fs.listStatus(dir)
        .filter(s => s.isDirectory &&
          s.getPath.getName.endsWith(s"_tmp_${forwardedUuid.get}"))
        .foreach(t => require(fs.delete(t.getPath, true),
          s"could not remove forwarded tmp ${t.getPath}"))
      require(fs.delete(mp, false), s"could not remove marker $mp")
      repaired = true
    }
    // a leftover tmp NOT covered by the marker means a crash before
    // publish: roll back that run's partial renames (its rows still live
    // in the old files). The forwarded run's tmp just gets cleaned up.
    fs.listStatus(dir)
      .filter(s => s.isDirectory && s.getPath.getName.contains("_tmp_"))
      .foreach { t =>
        val uuid = t.getPath.getName.split("_tmp_").last
        if (!forwardedUuid.contains(uuid)) {
          fs.listStatus(dir)
            .filter(s => s.isFile && s.getPath.getName.contains(s"-$uuid-"))
            .foreach { s =>
              require(fs.delete(s.getPath, false),
                s"rollback could not delete ${s.getPath}")
            }
        }
        require(fs.delete(t.getPath, true), s"could not remove tmp ${t.getPath}")
        repaired = true
      }
    // a stale `_resized` (the sizing rewrite's scratch dir, e.g.
    // graft.text.Shards.resizeIfOffTarget) is ALWAYS disposable: a
    // completed rewrite removes it last, so its presence means the crash
    // hit mid-rewrite and the source files remain authoritative.
    // Underscore-prefixed dirs are invisible to readers, but repeated
    // crashes would otherwise accumulate garbage with no recovery owner.
    val resized = new Path(dir, "_resized")
    if (fs.exists(resized)) {
      require(fs.delete(resized, true), s"could not remove stale $resized")
      repaired = true
    }
    repaired
  }

  /**
   * Publish `tmp`'s part files into `dir` as `<prefix>-<uuid>-<part>` and
   * delete `oldFiles`. Every delete is CHECKED — a false return (the
   * HDFS/S3A "did not happen" signal) aborts loudly rather than reporting
   * a rewrite that left old rows in place. Returns the published paths.
   */
  def publishAndDelete(fs: FileSystem, dir: Path, tmp: Path, prefix: String,
                       uuid: String, oldFiles: Seq[Path]): Seq[String] = {
    val renamed =
      try {
        fs.listStatus(tmp)
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .map { s =>
            val dest = new Path(dir, s"$prefix-$uuid-${s.getPath.getName}")
            require(fs.rename(s.getPath, dest),
              s"rename ${s.getPath} -> $dest failed")
            dest.toString
          }.toSeq
      } catch {
        case e: Throwable =>
          // rename-phase failure: old files are still authoritative — roll
          // back the partial publish so the directory is exactly as before
          fs.listStatus(dir)
            .filter(s => s.isFile && s.getPath.getName.startsWith(s"$prefix-$uuid-"))
            .foreach(s => fs.delete(s.getPath, false))
          fs.delete(tmp, true)
          throw e
      }
    val mp = markerPath(dir)
    val out = fs.create(mp, false)
    try out.write((s"uuid:$uuid" +: oldFiles.map(_.toString))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    oldFiles.foreach { p =>
      require(!fs.exists(p) || fs.delete(p, false),
        s"could not delete $p — rerun to recover (marker $mp records it)")
    }
    // tmp dir BEFORE marker: a crash between the two must leave the
    // marker (→ idempotent roll-forward), never an uncovered tmp dir
    // (→ rollback would delete the published files after the old rows
    // are already gone).
    fs.delete(tmp, true)
    require(fs.delete(mp, false), s"could not remove marker $mp")
    renamed
  }
}
