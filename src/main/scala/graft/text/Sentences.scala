package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Sentence segmentation + sentence-aware chunking — the RAG/embedding
 * upgrade over [[TextFunctions]]' fixed token windows (P16): retrieval
 * chunks that never split a sentence embed and cite far better than
 * mid-sentence cuts.
 *
 * Both steps are deterministic Column algebra over one fixed RE2-safe
 * pattern, so any engine replays them exactly:
 *
 *  - *Sentences*: maximal runs of non-terminator text followed by a
 *    `[.!?]+` terminator run (trailing whitespace consumed), plus a final
 *    unterminated fragment; each sentence trimmed, empties dropped
 *    (whitespace-only and punctuation-only input yields no sentences). A
 *    deliberately simple newswire-grade rule — no abbreviation list
 *    (documented; "Dr. Smith" splits), which keeps the rule portable.
 *  - *Chunks*: sentence i (0-based) goes to
 *    `chunk = (tokens of sentences 0..i-1) div tokenBudget` — the
 *    BUDGET-LINE rule: break exactly when the running whitespace-token
 *    count crosses a multiple of the budget. Chunks never split a
 *    sentence, sizes hover around the budget (one long sentence may
 *    overshoot — it still gets its own chunk rather than being cut), and
 *    unlike greedy packing the assignment is a pure function of the
 *    cumulative count — window-free, order-stable, SQL-replayable.
 *
 * Scale shape: everything is a narrow per-row projection (the per-row
 * cumulative sums are O(sentences²) inside one row — tens of sentences,
 * never corpus-sized) followed by one explode; no shuffle, streaming-legal.
 */
object Sentences {

  /** RE2-safe sentence pattern (no lookbehind — portable to RE2 engines). */
  val SentencePattern: String = "[^.!?]+[.!?]+\\s*|[^.!?]+$"

  /** `array<string>` of trimmed, non-empty sentences. */
  def splitSentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit(SentencePattern), lit(0)),
        s => trim(s)),
      s => length(s) > 0)

  /** Whitespace-token count of a trimmed sentence. */
  private def tokCount(s: Column): Column =
    when(length(s) === 0, lit(0)).otherwise(size(split(s, "\\s+")))

  /**
   * One row per chunk: `(idName, chunk_id, n_sentences, n_tokens,
   * chunk_text)` — sentences joined by a single space, chunk ids dense
   * from 0 per document.
   *
   * @param idName output name for the document-id column (default `id`;
   *   pass the caller's own column name to keep it — the default would
   *   otherwise silently rename it). Must not collide with the four fixed
   *   output columns.
   */
  def chunkBySentences(df: DataFrame, id: Column, text: Column,
                       tokenBudget: Int, idName: String = "id"): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be positive: $tokenBudget")
    require(!Set("chunk_id", "n_sentences", "n_tokens", "chunk_text")
        .contains(idName),
      s"idName '$idName' collides with a fixed output column")
    val p = graft.functions.distinctPrefixFor(df.columns.toSeq :+ idName)
    val sentsCol = p + "sents"
    val chunksCol = p + "chunks"
    val withSents = df.select(id.as(idName), splitSentences(text).as(sentsCol))
    // per sentence i: (sentence, chunk = tokens-before div budget)
    val assigned = withSents.withColumn(chunksCol,
      transform(col(sentsCol), (s, i) =>
        struct(
          s.as("s"),
          (aggregate(slice(col(sentsCol), lit(1), i), lit(0L),
            (acc, x) => acc + tokCount(x)) / tokenBudget)
            .cast("long").as("chunk"))))
    // regroup by chunk id inside the row, then explode
    assigned
      .select(col(idName), col(chunksCol))
      .withColumn("__chunk", explode(
        transform(
          sequence(lit(0L),
            coalesce(try_element_at(col(chunksCol), lit(-1)).getField("chunk"), lit(-1L))),
          cid => struct(
            cid.as("chunk_id"),
            filter(col(chunksCol), e => e.getField("chunk") === cid)
              .as("members")))))
      .where(size(col("__chunk").getField("members")) > 0)
      .select(col(idName),
        col("__chunk").getField("chunk_id").as("chunk_id"),
        size(col("__chunk").getField("members")).as("n_sentences"),
        aggregate(col("__chunk").getField("members"), lit(0L),
          (acc, e) => acc + tokCount(e.getField("s"))).as("n_tokens"),
        array_join(transform(col("__chunk").getField("members"),
          e => e.getField("s")), " ").as("chunk_text"))
  }
}
