package graft.privacy

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * k-anonymity / l-diversity curation — the privacy step regex PII
 * redaction ([[graft.text.Redact]]) cannot cover: redaction removes
 * values that LOOK sensitive, while re-identification risk lives in
 * COMBINATIONS of innocuous quasi-identifiers (Sweeney 2002: 87% of the
 * US population is unique on {zip, birth date, sex}). A training corpus
 * carrying user metadata columns (locale, client, coarse geo, ...) leaks
 * membership for every rare combination it ships.
 *
 * Definitions (all exact, engine-replayable arithmetic):
 *  - a quasi-identifier COMBO is the tuple of the chosen columns, nulls
 *    compared as values (standard GROUP BY semantics);
 *  - k-ANONYMITY holds for a row iff its combo occurs >= k times;
 *  - l-DIVERSITY (distinct-l, Machanavajjhala et al. 2007) holds for a
 *    combo iff its rows carry >= l DISTINCT values of the sensitive
 *    column.
 *
 * Scale shape:
 *  - [[suppressRareRows]]/[[rareRows]] run ONE hash exchange on the
 *    quasi-columns and a whole-partition window count — no second scan,
 *    no join, no driver collection; the per-group state is one long.
 *  - [[kAnonymityReport]]/[[lDiversityReport]] are single
 *    map-side-combined aggregations (l-diversity's count_distinct expands
 *    to the standard two-phase partial-distinct plan).
 *  - Suppression composes with [[graft.sample.Sampling]] budgets and the
 *    curation report ops; at 100 TB the quasi-combo count is corpus-sized
 *    in the worst case, which is exactly why nothing here broadcasts or
 *    collects the combo table.
 */
object Anonymity {

  private def comboCols(quasiCols: Seq[String]): Seq[Column] =
    quasiCols.map(col)

  /** One row per quasi-identifier combination:
    * `(quasiCols…, combo_rows, k_anonymous)`. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1: $k")
    df.groupBy(comboCols(quasiCols): _*)
      .agg(count(lit(1)).as("combo_rows"))
      .withColumn("k_anonymous", col("combo_rows") >= k)
  }

  /** One row per combination with the sensitive-column diversity:
    * `(quasiCols…, combo_rows, distinct_sensitive, l_diverse)`. */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitive: Column, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1: $l")
    df.groupBy(comboCols(quasiCols): _*)
      .agg(count(lit(1)).as("combo_rows"),
        count_distinct(sensitive).as("distinct_sensitive"))
      .withColumn("l_diverse", col("distinct_sensitive") >= l)
  }

  /** The rows whose combo meets the k threshold, original schema — the
    * safe-to-train channel. One exchange (window count over the
    * quasi-columns), no join, no second scan. */
  def suppressRareRows(df: DataFrame, quasiCols: Seq[String],
                       k: Int): DataFrame =
    withComboCount(df, quasiCols, k, keep = true)

  /** The suppressed complement — rows in combos occurring < k times (the
    * channel a reviewer inspects, the twin of the quarantine contract in
    * [[graft.sources.Jsonl]]). */
  def rareRows(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    withComboCount(df, quasiCols, k, keep = false)

  private def withComboCount(df: DataFrame, quasiCols: Seq[String], k: Int,
                             keep: Boolean): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1: $k")
    val cnt = graft.functions.distinctPrefixFor(df.columns.toSeq) + "cnt"
    val w = Window.partitionBy(comboCols(quasiCols): _*)
    val counted = df.withColumn(cnt, count(lit(1)).over(w))
    val kept = if (keep) counted.filter(col(cnt) >= k)
               else counted.filter(col(cnt) < k)
    kept.drop(cnt)
  }
}
