package graft.join

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Record linkage — "are these two records the same real-world entity?" —
 * the classic two-stage blocking + verification shape (Fellegi-Sunter
 * lineage; the entity-resolution pass every multi-source ingest needs
 * before per-entity dedup can even be framed):
 *
 *  1. BLOCK: each side keys by the 4-char American Soundex of the name
 *     ([[graft.functions.vectors.soundex4]] — phonetically equal names
 *     collide, so "Jon"/"John" and "Smith"/"Smyth" meet without a cross
 *     join); candidates come from a plain hash equi-join on the code.
 *  2. VERIFY: every candidate scores with exact fixed-point Jaro-Winkler
 *     ([[graft.functions.vectors.jaro_winkler_fp]] — `floor(jw · 2^20)`
 *     in pure integer arithmetic, so the accept/reject decision replays
 *     bit-for-bit on any engine) and survives at `score_fp >= minScoreFp`.
 *
 * Scale shape: the only corpus-sized exchange is the equi-join on the
 * 4-char block code; both kernels are codegen'd per-row projections. A
 * degenerate block (every record coded the same — e.g. synthetic
 * "Customer#NNN" names) would turn the join quadratic, so the candidate
 * volume per block is counted first (two tiny per-code aggregates) and the
 * call FAILS FAST above `maxBlockPairs` — an oversized block means the
 * blocking key is inadequate for this data, not that more compute is
 * needed.
 */
object Linkage {

  /** 2^20-scaled default threshold: floor(0.92 * 2^20). */
  val DefaultMinScoreFp: Long = (0.92 * (1L << 20)).toLong

  /**
   * Soundex-blocked Jaro-Winkler linkage between `left` and `right`.
   * Output: `(id_a, id_b, score_fp)`, one row per accepted candidate.
   */
  def linkRecords(left: DataFrame, right: DataFrame,
                  idLeft: Column, nameLeft: Column,
                  idRight: Column, nameRight: Column,
                  minScoreFp: Long = DefaultMinScoreFp,
                  maxBlockPairs: Long = 10L * 1000 * 1000,
                  leftHandle: graft.UnpersistHandle = graft.UnpersistHandle.Noop,
                  rightHandle: graft.UnpersistHandle = graft.UnpersistHandle.Noop): DataFrame = {
    // persisted: the keyed projections (and their per-row soundex pass)
    // feed BOTH the block-size probe and the candidate join — without the
    // persist each side would be scanned and coded twice. Handles follow
    // the Dedup two-handle convention for caller-controlled release.
    val l = left
      .select(idLeft.cast("long").as("id_a"), nameLeft.as("__name_a"))
      .filter(col("__name_a").isNotNull)
      .withColumn("__blk", vectors.soundex4(col("__name_a")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    leftHandle.setDataFrame(l)
    val r = right
      .select(idRight.cast("long").as("id_b"), nameRight.as("__name_b"))
      .filter(col("__name_b").isNotNull)
      .withColumn("__blk", vectors.soundex4(col("__name_b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rightHandle.setDataFrame(r)
    val worst = l.groupBy(col("__blk")).count().withColumnRenamed("count", "nl")
      .join(r.groupBy(col("__blk")).count().withColumnRenamed("count", "nr"), "__blk")
      .select(max(col("nl") * col("nr")).as("pairs"))
      .head()
    val worstPairs = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(worstPairs <= maxBlockPairs,
      s"largest soundex block yields $worstPairs candidate pairs " +
        s"(> maxBlockPairs=$maxBlockPairs) — the phonetic key does not " +
        "discriminate this data; pre-split the block (e.g. add a second " +
        "blocking column) or raise the cap deliberately")
    l.join(r, "__blk")
      .withColumn("score_fp", vectors.jaro_winkler_fp(col("__name_a"), col("__name_b")))
      .filter(col("score_fp") >= minScoreFp)
      .select(col("id_a"), col("id_b"), col("score_fp"))
  }
}
