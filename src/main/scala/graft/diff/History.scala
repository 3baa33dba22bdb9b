package graft.diff

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Snapshot history build — the type-2 slowly-changing-dimension merge: a
 * stack of point-in-time snapshots collapses into one row per (id,
 * contiguous run of versions with identical attributes), carrying
 * `valid_from` (first version of the run), `valid_to` (the version at
 * which the row was replaced or deleted; null = still current) and
 * `is_current`. The temporal capstone of the diff family: [[Diff.diff]]
 * answers "what changed between two snapshots", this answers "what was
 * true when" across ALL of them — and [[History.snapshotAt]] inverts it,
 * reconstructing any input snapshot exactly (the round-trip is the
 * correctness gate). Same query surface as the reference's diff family
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/diff/Diff.scala)
 * extended along the version axis.
 *
 * Semantics, fully specified:
 *  - versions = the distinct values of `versionCol`, ordered ascending;
 *    any orderable type (int, date, timestamp, string).
 *  - a run BREAKS when an attribute differs from the previous version
 *    (null-safe: null == null, IS DISTINCT FROM otherwise) or when the id
 *    was ABSENT at the previous version (a delete + re-insert yields two
 *    runs even with identical attributes — reappearance is a new validity
 *    period, the standard SCD2 reading).
 *  - `valid_to` is EXCLUSIVE: the version where the row stopped holding
 *    (the snapshot that replaced or dropped it); null iff the run reaches
 *    the latest version. A row valid at exactly one version v (replaced
 *    at the next version w) has valid_from = v, valid_to = w.
 *  - input rows must be unique per (version, idCols) — the snapshot
 *    contract. Duplicate keys make "the row at version v" ill-defined;
 *    the result then depends on which duplicate wins a window, so callers
 *    holding raw CDC feeds should dedup first.
 *
 * Scale shape: ONE corpus-sized hash exchange on the id columns — both
 * windows and the run aggregation share the partitioning (per-id windows
 * hold at most #versions rows, bounded by construction), plan-pinned in
 * HistorySuite. The version dimension is enumerated ONCE with a
 * column-pruned distinct scan and collected (#versions is bounded by the
 * number of snapshots ever taken — require-capped at 2^20), then every
 * version→index and index→version lookup is a broadcast of that local
 * table: no repeated corpus scans, no corpus-sized sort. At 100 TB × 365
 * snapshots the work is one column scan plus the one id-partitioned pass.
 */
object History {

  private val Vi = "__graft_vi"
  private val Run = "__graft_run"

  /** The ordered version dimension as a LOCAL broadcastable table:
    * (version value, 0-based index). One column-pruned distinct scan. */
  private def versionIndex(snapshots: DataFrame, versionCol: String): DataFrame = {
    val spark = snapshots.sparkSession
    // limit BEFORE the collect: the cap must fire without materializing an
    // unbounded version dimension on the driver (a mis-pointed version
    // column — say a timestamp with per-row precision — would otherwise
    // pull the whole column back before the require can reject it)
    val versions = snapshots.select(col(versionCol)).distinct()
      .orderBy(col(versionCol)).limit((1 << 20) + 1).collect()
    require(versions.length <= (1 << 20),
      s"more than ${1 << 20} distinct versions — not a snapshot stack")
    // a null version would silently vanish in the equi-join back (its rows
    // dropped from the history with no error) — fail fast instead
    require(versions.forall(!_.isNullAt(0)),
      s"null $versionCol value — every snapshot row needs a version")
    val field = snapshots.schema(versionCol)
    val rows = versions.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), i.toLong)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        field.copy(name = versionCol),
        org.apache.spark.sql.types.StructField(
          Vi, org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /**
   * Build the history table. Output columns: `idCols`, then `attrCols`
   * (default: every other column), then `valid_from`, `valid_to` (both in
   * `versionCol`'s type; valid_to null = current), `is_current`.
   */
  def fromSnapshots(snapshots: DataFrame, versionCol: String,
                    idCols: Seq[String],
                    attrCols: Seq[String] = Seq.empty): DataFrame = {
    require(idCols.nonEmpty, "need at least one id column")
    val attrs =
      if (attrCols.nonEmpty) attrCols
      else snapshots.columns.toSeq.filterNot(c =>
        c == versionCol || idCols.contains(c))
    val reserved = Seq("valid_from", "valid_to", "is_current", Vi, Run)
    val clash = (idCols ++ attrs).filter(reserved.contains)
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with output columns")

    val vs = versionIndex(snapshots, versionCol)
    val base = snapshots.join(broadcast(vs), Seq(versionCol))

    val w = Window.partitionBy(idCols.map(col): _*).orderBy(col(Vi))
    val gap = lag(col(Vi), 1).over(w).isNull ||
      lag(col(Vi), 1).over(w) =!= col(Vi) - 1
    val attrChanged = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val runs = base
      .withColumn(Run,
        sum(when(gap || attrChanged, 1L).otherwise(0L)).over(w))

    val aggs = max(col(Vi)).as("__to_vi") +:
      attrs.map(a => min_by(col(a), col(Vi)).as(a))
    val grouped = runs
      .groupBy((idCols :+ Run).map(col): _*)
      .agg(min(col(Vi)).as("__from_vi"), aggs: _*)

    val vFrom = vs.select(col(versionCol).as("valid_from"), col(Vi).as("__from_vi"))
    val vTo = vs.select(col(versionCol).as("valid_to"), (col(Vi) - 1).as("__to_vi"))
    grouped
      .join(broadcast(vFrom), Seq("__from_vi"))
      .join(broadcast(vTo), Seq("__to_vi"), "left_outer")
      .select((idCols ++ attrs).map(col) ++ Seq(
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /**
   * INCREMENTAL history maintenance: extend an existing history with one
   * new snapshot WITHOUT rebuilding from the full stack — at 100 TB × 365
   * vintages the daily update must touch one snapshot plus the current
   * rows, not every snapshot ever taken. The contract is exact
   * equivalence: `applySnapshot(fromSnapshots(stack), s, v) ==
   * fromSnapshots(stack + s@v)` row for row (sbt randomized model pin;
   * the driver gate replays the full rebuild as the oracle).
   *
   * Rules (the fromSnapshots run semantics, restated incrementally):
   * a current row whose id holds identical attrs in the snapshot stays
   * current; different attrs close it at `version` (exclusive) and open a
   * fresh current run; an id absent from the snapshot closes; a snapshot
   * id that is not current opens a new run (delete + re-insert = two
   * runs); non-current rows pass through untouched. `version` must be
   * strictly after every version in the history (checked with one
   * column-pruned scan — applying an old vintage would corrupt validity).
   *
   * Scale shape: ONE hash exchange on the id columns (the full-outer join
   * of the history's CURRENT slice with the snapshot); the closed-history
   * slice passes through with no shuffle.
   */
  def applySnapshot(history: DataFrame, snapshot: DataFrame, version: Any,
                    versionCol: String, idCols: Seq[String],
                    attrCols: Seq[String] = Seq.empty): DataFrame = {
    require(idCols.nonEmpty, "need at least one id column")
    val v: Column = version match {
      case c: Column => c
      case other => lit(other)
    }
    val attrs =
      if (attrCols.nonEmpty) attrCols
      else snapshot.columns.toSeq.filterNot(c =>
        c == versionCol || idCols.contains(c))
    val histCols = (idCols ++ attrs) ++ Seq("valid_from", "valid_to", "is_current")
    require(histCols.forall(history.columns.contains),
      s"history is missing ${histCols.filterNot(history.columns.contains).mkString(", ")}")
    val stale = history
      .where(col("valid_from") >= v ||
        (col("valid_to").isNotNull && col("valid_to") >= v))
      .select(idCols.head).limit(1).count()
    require(stale == 0,
      s"version $version is not strictly after every version already in the history")

    val toType = history.schema("valid_to").dataType
    val cur = history.where(col("is_current"))
      .select((idCols ++ attrs).map(col) :+ col("valid_from") :+
        lit(true).as("__in_h"): _*)
    val snap = snapshot.select(idCols.map(col) ++
      attrs.map(a => col(a).as(s"__n_$a")) :+ lit(true).as("__in_s"): _*)
    val j = cur.join(snap, idCols, "full_outer")
    val same = attrs.map(a => col(a) <=> col(s"__n_$a"))
      .reduceOption(_ && _).getOrElse(lit(true))

    val stillCurrent = j.where(col("__in_h") && col("__in_s") && same)
      .select((idCols ++ attrs).map(col) ++ Seq(col("valid_from"),
        lit(null).cast(toType).as("valid_to"), lit(true).as("is_current")): _*)
    val closed = j.where(col("__in_h") && (col("__in_s").isNull || !same))
      .select((idCols ++ attrs).map(col) ++ Seq(col("valid_from"),
        v.cast(toType).as("valid_to"), lit(false).as("is_current")): _*)
    val opened = j.where(col("__in_s") && (col("__in_h").isNull || !same))
      .select(idCols.map(col) ++ attrs.map(a => col(s"__n_$a").as(a)) ++ Seq(
        v.cast(toType).as("valid_from"),
        lit(null).cast(toType).as("valid_to"), lit(true).as("is_current")): _*)
    val untouched = history.where(!col("is_current"))
      .select(histCols.map(col): _*)

    untouched
      .unionByName(stillCurrent)
      .unionByName(closed)
      .unionByName(opened)
  }

  /**
   * Reconstruct the snapshot at `version` from a history table: the rows
   * with `valid_from <= version < valid_to` (valid_to null = +inf),
   * restoring `versionCol`. Exact inverse of [[fromSnapshots]] for any
   * version value present in the input stack; a version BETWEEN snapshot
   * versions reads as of the latest snapshot at or before it. A plain
   * filter — partition-prunable when the history is stored partitioned by
   * validity, no shuffle.
   */
  def snapshotAt[T](history: DataFrame, version: T, versionCol: String): DataFrame = {
    // a Column passes through (the py4j bridge routes date/timestamp
    // versions as lit() Columns — raw java.time values have no Literal)
    val v: Column = version match {
      case c: Column => c
      case other => lit(other)
    }
    history
      .where(col("valid_from") <= v &&
        (col("valid_to").isNull || col("valid_to") > v))
      .withColumn(versionCol, v)
      .drop("valid_from", "valid_to", "is_current")
  }
}
