package graft.agg

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Key-skew diagnostics — the pre-flight check before committing a join or
 * aggregation key at scale: the heaviest keys, their row counts, and each
 * key's share of the table. A key with share 0.3 means one reducer owns 30%
 * of the shuffle — reach for [[graft.join.Joins.saltedJoin]], the as-of
 * `timeBucket` path, or AQE skew handling BEFORE the job dies, not after.
 *
 * Scale shape: one map-side-combined `groupBy(key).count` (the shuffle
 * carries distinct keys, not rows), a 1-row broadcast total, and a
 * TakeOrderedAndProject top-k — no global sort, no driver iteration. The
 * share division is one IEEE double op from exact BIGINT counts, so the
 * report is bit-identical across engines and partitionings.
 */
object Skew {

  /** Top-k heaviest values of `key`: `(key, cnt, share, rank)`, ranked by
    * `(cnt desc, key asc NULLS LAST)` — deterministic under ties. The
    * NULLS LAST is load-bearing: Spark's plain `asc` sorts nulls FIRST
    * while most SQL engines (DuckDB, Postgres) default to NULLS LAST, so a
    * null key tying with a real key at the top-k boundary would otherwise
    * report a different key set per engine. Null keys report as
    * one `(null)` row by design: every null lands in the same reducer of a
    * groupBy (and silently vanishes from an inner join), so a heavy null
    * key is exactly the kind of surprise this report exists to surface. */
  def keySkewReport(df: DataFrame, key: Column, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val counts = df.select(key.as("key")).groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .orderBy(col("cnt").desc, col("key").asc_nulls_last)
      .limit(k)
      .withColumn("share", col("cnt").cast("double") / col("__total").cast("double"))
      // the window sees at most k survivors (post-limit) — constant
      // partition key documents the single-partition intent and silences
      // WindowExec's "No Partition Defined" warning
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0))
          .orderBy(col("cnt").desc, col("key").asc_nulls_last)))
      .select(col("key"), col("cnt"), col("share"), col("rank"))
  }
}
