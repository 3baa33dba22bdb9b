package graft.text

import graft.functions.vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Repeated-span detection and removal — exact substring-level dedup at
 * token granularity (the "dedup the span, keep the document" pass of
 * training-data pipelines, complementing the whole-document near-dup
 * family): a k-token window is DUPLICATED when its exact token string
 * occurs at least `minCount` times corpus-wide (across documents and
 * within one document); a token is COVERED when any duplicated window
 * contains it; removal drops covered tokens and keeps the rest in order.
 *
 * Scale shape, stage by stage:
 *  - windows come from the single-pass shingle kernel; the count shuffle
 *    carries a 16-hex-char md5 prefix per window (engine-portable hash —
 *    the oracle makes the same duplicate decision byte for byte), never
 *    the window text;
 *  - duplicated-window positions come from a hash-partitioned semi-join
 *    (no driver set, no broadcast of unbounded state);
 *  - coverage is a per-document interval union computed with the
 *    sessionize island pattern (one keyed sort: prev-max-end, island ids,
 *    per-island min/max) — O(dup windows) rows, not O(tokens);
 *  - only removal materializes per-token rows, and only for covered
 *    islands (`sequence` explode bounded by document length).
 */
object SpanDedup {

  /** (doc_id, pos, h): every k-token window with its portable hash. */
  private def windows(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame =
    docs
      .select(id.as("doc_id"),
        posexplode(vectors.word_shingles_all(text, k)).as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos"), substring(md5(col("win")), 1, 16).as("h"))

  /** (doc_id, pos) of windows whose hash occurs >= minCount times corpus-wide.
    * With `keepFirst` the CANONICAL occurrence of each window — smallest
    * (doc_id, pos) — is exempted, so one copy of every duplicated span
    * survives removal (the keep-one rule of suffix-array training-data
    * dedup, Lee et al. 2021); without it every occurrence is marked. Both
    * paths exchange on the 16-hex window hash with partial (map-side)
    * aggregation — no per-key Window, so hot window strings never
    * concentrate into one task. */
  private def duplicatedWindows(w: DataFrame, minCount: Int,
                                keepFirst: Boolean = false): DataFrame = {
    if (!keepFirst) {
      val dup = w.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
        .select(col("h"))
      w.join(dup, Seq("h"), "left_semi").select(col("doc_id"), col("pos"))
    } else {
      // skew-safe winner selection: a Window.partitionBy(h) would gather
      // every occurrence of a hot window (think boilerplate headers
      // repeated billions of times) into one task; min(struct) + count is
      // map-side combined, so the exchange carries one row per (h,
      // partition) and the canonical pick never concentrates a key.
      val canon = w.groupBy(col("h"))
        .agg(count(lit(1)).as("cnt"),
          min(struct(col("doc_id"), col("pos"))).as("first"))
        .filter(col("cnt") >= minCount)
        .select(col("h"), col("first"))
      w.join(canon, Seq("h"))
        .filter(col("doc_id") =!= col("first.doc_id") ||
          col("pos") =!= col("first.pos"))
        .select(col("doc_id"), col("pos"))
    }
  }

  /** Merged covered intervals per doc: (doc_id, start, end) inclusive token
    * indices — the union of [pos, pos+k-1] over duplicated windows. */
  private def islands(dupw: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    dupw
      .withColumn("prev_max_end", max(col("pos") + (k - 1)).over(prev))
      .withColumn("new_island",
        when(col("prev_max_end").isNull || col("pos") > col("prev_max_end") + 1, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("start"), max(col("pos") + (k - 1)).as("end"))
      .select(col("doc_id"), col("start"), col("end"))
  }

  /**
   * Per-document duplicated-span report:
   * `(doc_id, n_tokens, dup_windows, covered_tokens)` — window count with
   * positions, and the union length of their k-token covers. Documents with
   * no duplicated window report zeros.
   */
  def repeatedSpanStats(docs: DataFrame, id: Column, text: Column,
                        k: Int, minCount: Int = 2): DataFrame = {
    val base = docs.select(id.as("doc_id"),
      size(vectors.tokenize_ascii(text)).cast("long").as("n_tokens"))
    val w = windows(docs, id, text, k)
    val dupw = duplicatedWindows(w, minCount)
    val perDoc = dupw.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_windows"))
    val covered = islands(dupw, k).groupBy(col("doc_id"))
      .agg(sum(col("end") - col("start") + 1).as("covered_tokens"))
    base
      .join(perDoc, Seq("doc_id"), "left_outer")
      .join(covered, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
  }

  /**
   * Remove covered spans: `(doc_id, clean_text, removed_tokens)` with
   * `clean_text` the uncovered tokens joined by single spaces, in original
   * order (normalized to the tokenizer's lowercase form — removal is a
   * token-stream operation, like sequence packing). Documents shorter than
   * `k` tokens or with no duplicated window pass through whole.
   *
   * The rebuild never shuffles tokens: each document's (few) covered
   * intervals collapse to one array joined back by doc id — a
   * O(docs-with-dups)-row exchange — and the uncovered tokens are selected
   * by an indexed higher-order `filter` over the in-row token array
   * (O(tokens × islands) work per doc, all narrow).
   *
   * `keepFirst = true` applies the keep-one rule of suffix-array
   * training-data dedup (Lee et al. 2021): the canonical occurrence of
   * each duplicated window — smallest (doc_id, pos) — is NOT marked, so a
   * copy of every duplicated span survives in its first document instead
   * of the span vanishing from the corpus entirely. (As in the original
   * algorithm, a canonical window can still fall inside the cover of a
   * DIFFERENT overlapping duplicated window whose canonical copy lives
   * elsewhere — the guarantee is per window string, not per island.)
   */
  def removeRepeatedSpans(docs: DataFrame, id: Column, text: Column,
                          k: Int, minCount: Int = 2,
                          keepFirst: Boolean = false): DataFrame = {
    val toks = docs.select(id.as("doc_id"), vectors.tokenize_ascii(text).as("toks"))
    val dupw = duplicatedWindows(windows(docs, id, text, k), minCount, keepFirst)
    val ivs = islands(dupw, k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start"), col("end"))).as("ivs"))
    toks
      .join(ivs, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("toks"),
        when(col("ivs").isNull, col("toks")).otherwise(
          zip_with(col("toks"),
            sequence(lit(0L), size(col("toks")).cast("long") - 1),
            (tok, i) => when(
              exists(col("ivs"), iv =>
                i >= iv.getField("start") && i <= iv.getField("end")),
              lit(null)).otherwise(tok))).as("kept"))
      .select(col("doc_id"),
        array_join(filter(col("kept"), _.isNotNull), " ").as("clean_text"),
        (size(col("toks")) - size(filter(col("kept"), _.isNotNull)))
          .cast("long").as("removed_tokens"))
  }
}
