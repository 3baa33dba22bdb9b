package graft.events

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Event sessionization: group each entity's event stream into sessions
 * separated by inactivity gaps — the standard step for assembling
 * interaction logs into conversation/episode training examples.
 *
 * Plan shape: one hash shuffle on the key + one partition-local sort, then
 * two running window passes (lag to flag gap starts, running sum to number
 * them) over the SAME window frame — Spark evaluates both in a single
 * WindowExec without re-sorting. No state, no driver involvement; scales
 * with partitions like any keyed window. Hot keys (one entity with an
 * enormous event log) land on one partition — the same caveat as any
 * per-entity ordered computation.
 */
object Sessionize {

  /**
   * Number each row's session within its `key`: 1 for the first session,
   * incremented whenever the gap since the previous event exceeds `gap`
   * (strictly). `gap` uses the timestamp type's difference algebra — a long
   * delta for numeric timestamps, an INTERVAL for timestamp columns.
   *
   * Rows with equal (key, ts) always land in the same session, so the
   * numbering is deterministic even when the sort order among ties is not.
   */
  def withSessionIndex(
      df: DataFrame, key: Column, ts: Column, gap: Column,
      sessionColumn: String = "session_idx"): DataFrame = {
    val p = graft.functions.distinctPrefixFor(df.columns.toSeq)
    val isNew = p + "new"
    val w = Window.partitionBy(key).orderBy(ts)
    val prev = lag(ts, 1).over(w)
    df.withColumn(isNew,
        when(prev.isNull || (ts - prev) > gap, 1L).otherwise(0L))
      .withColumn(sessionColumn,
        sum(col(isNew)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop(isNew)
  }

  /** Per-session aggregate: (key, session_idx, n_events, first/last ts). */
  def sessionBounds(
      df: DataFrame, key: Column, ts: Column, gap: Column): DataFrame = {
    val p = graft.functions.distinctPrefixFor(df.columns.toSeq)
    val k = p + "k"
    val t = p + "t"
    withSessionIndex(df.select(key.as(k), ts.as(t)), col(k), col(t), gap)
      .groupBy(col(k).as("key"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(t)).as("session_start"), max(col(t)).as("session_end"))
  }
}
