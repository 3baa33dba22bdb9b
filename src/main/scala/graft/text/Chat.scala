package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Chat-transcript operations for instruction/dialog corpora — the format
 * checks and context-window trimming every SFT/RLHF data pipeline runs
 * before an example reaches a trainer.
 *
 * Wire format (fully specified, engine-portable): one turn per line,
 * `role: content` with role ∈ {system, user, assistant, tool} and the
 * single separator `": "`; a line that does not match keeps role `''`
 * (the invalid marker — [[chatStats]] surfaces it, nothing is silently
 * dropped). No continuation lines: the parse is per-line
 * `regexp_extract` + a 1-based offset substring, so DuckDB replays it
 * with the identical pattern and arithmetic.
 *
 * Scale shape: [[parseTurns]] is narrow per-row Column algebra (split +
 * transform — no explode, no shuffle, streaming-legal). [[chatStats]]
 * and [[truncateToBudget]] explode to one row per turn and use windows
 * partitioned BY CONVERSATION — bounded by transcript length, never
 * corpus-sized — and the stats explode feeds a map-side-combined
 * re-aggregation.
 */
object Chat {

  val Roles: Seq[String] = Seq("system", "user", "assistant", "tool")

  private val RolePattern = "^(system|user|assistant|tool): "

  /** `array<struct<role, content>>` from a transcript; role `''` marks an
    * unparseable line (content = the raw line). Pure per-row algebra. */
  def parseTurns(text: Column): Column =
    transform(split(text, "\n"), l => {
      val role = regexp_extract(l, RolePattern, 1)
      struct(role.as("role"),
        when(role =!= "", l.substr(length(role) + lit(3), length(l)))
          .otherwise(l).as("content"))
    })

  /** One row per (conversation, turn): `(id, turn_idx, role, content,
    * n_tokens)`; `n_tokens` = whitespace-separated pieces of content. */
  def explodeTurns(df: DataFrame, id: Column, text: Column): DataFrame =
    // a NULL transcript must not vanish from the audit (posexplode of a
    // null array emits nothing): it reads as one empty line — role '',
    // content '' — so chatStats reports it as one invalid turn
    df.select(id.as("id"),
        posexplode(split(coalesce(text, lit("")), "\n")).as(Seq("turn_idx", "__l")))
      .withColumn("role", regexp_extract(col("__l"), RolePattern, 1))
      .withColumn("content",
        when(col("role") =!= "",
          col("__l").substr(length(col("role")) + lit(3), length(col("__l"))))
          .otherwise(col("__l")))
      .withColumn("n_tokens",
        size(expr("regexp_extract_all(content, '\\\\S+', 0)")).cast("long"))
      .select(col("id"), col("turn_idx").cast("long").as("turn_idx"),
        col("role"), col("content"), col("n_tokens"))

  /**
   * Per-conversation format audit: `(id, n_turns, n_user, n_assistant,
   * n_invalid, alternation_ok)`. `alternation_ok` = the strict SFT
   * contract: no invalid lines, no `tool` turns, at most one `system`
   * turn and only at index 0, and the remaining roles alternate
   * `user, assistant, user, …` starting with `user`.
   */
  def chatStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val turns = explodeTurns(df, id, text)
      .withColumn("__has_sys",
        max(when(col("turn_idx") === 0 && col("role") === "system", 1)
          .otherwise(0)).over(Window.partitionBy(col("id"))))
      .withColumn("__core_idx", col("turn_idx") - col("__has_sys"))
    turns
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_turns"),
        count(when(col("role") === "user", 1)).as("n_user"),
        count(when(col("role") === "assistant", 1)).as("n_assistant"),
        count(when(col("role") === "", 1)).as("n_invalid"),
        (count(when(col("role") === "", 1)) === 0 &&
          count(when(col("role") === "tool", 1)) === 0 &&
          count(when(col("role") === "system" && col("turn_idx") > 0, 1)) === 0 &&
          count(when(col("role").isin("user", "assistant") &&
            ((col("__core_idx") % 2 === 0 && col("role") =!= "user") ||
              (col("__core_idx") % 2 === 1 && col("role") =!= "assistant")),
            1)) === 0).as("alternation_ok"))
  }

  /**
   * Context-window trimming: keep the LAST turns whose token total fits
   * `budget`, never splitting a turn, and ALWAYS keep a leading `system`
   * turn (the standard system pin — its tokens charge the budget first).
   * Output: one row per turn `(id, turn_idx, role, n_tokens, kept)`.
   *
   * Token counts are non-negative, so suffix sums grow monotonically
   * toward the front: the kept set is exactly `suffix_sum <= budget −
   * system_tokens` — ONE framed window per conversation, no iterative
   * fold, and DuckDB replays the same frame.
   */
  def truncateToBudget(df: DataFrame, id: Column, text: Column,
                       budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val turns = explodeTurns(df, id, text)
    val byConv = Window.partitionBy(col("id"))
    val suffix = Window.partitionBy(col("id")).orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("__sys_tokens",
        max(when(col("turn_idx") === 0 && col("role") === "system",
          col("n_tokens"))).over(byConv))
      .withColumn("__suffix", sum(col("n_tokens")).over(suffix))
      .withColumn("kept",
        when(col("turn_idx") === 0 && col("role") === "system", lit(true))
          .otherwise(col("__suffix") <=
            lit(budget) - coalesce(col("__sys_tokens"), lit(0L))))
      .select(col("id"), col("turn_idx"), col("role"), col("n_tokens"), col("kept"))
  }
}
