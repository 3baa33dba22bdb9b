package graft

import graft.diff._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that is implemented gets an entry in
  * [[queries]]; where the semantics are ANSI-SQL-expressible an equivalent
  * DuckDB oracle query lives in [[oracleSql]] (same column names — the
  * driver's compare sorts columns by name before hashing).
  *
  * Numeric policy for oracle parity: aggregates over doubles are computed on
  * DECIMAL(18,2) casts (exact, order-independent) and cast back to DOUBLE, so
  * Spark's and DuckDB's summation order cannot produce differing floats.
  */
/** Typed row for the sorted-group query (top-level for TypeTag derivation). */
case class CustOrder(o_custkey: Long, o_orderkey: Long,
                     o_orderdate: java.sql.Timestamp, o_totalprice: Double)

object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("diff_orders")(spark, "/root/testdata/sf0.001")

  // --- diff fixtures: two deterministic variants of `orders` -----------------
  // left:  orders except keys divisible by 3, projected to 4 columns
  // right: orders except keys divisible by 5, totalprice bumped for keys % 7 == 0
  private def diffLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .filter(col("o_orderkey") % 3 =!= 0)

  private def diffRight(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .filter(col("o_orderkey") % 5 =!= 0)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O-agg baseline: TPC-H Q1-flavor pricing summary over lineitem
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2)))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // O1 diff: default ColumnByColumn mode
    "diff_orders" -> ((s, dir) =>
      diffLeft(s, dir).diff(diffRight(s, dir), "o_orderkey")),

    // O6 diff modes: LeftSide projection
    "diff_orders_leftside" -> ((s, dir) =>
      diffLeft(s, dir).diff(diffRight(s, dir),
        DiffOptions.default.withDiffMode(DiffMode.LeftSide), "o_orderkey")),

    // O7 sparse mode
    "diff_orders_sparse" -> ((s, dir) =>
      diffLeft(s, dir).diff(diffRight(s, dir),
        DiffOptions.default.withSparseMode(true), "o_orderkey")),

    // O4 change column
    "diff_orders_changes" -> ((s, dir) =>
      diffLeft(s, dir).diff(diffRight(s, dir),
        DiffOptions.default.withChangeColumn("changed"), "o_orderkey")
        .withColumn("changed",
          when(col("changed").isNull, lit(null)).otherwise(concat_ws(",", col("changed"))))),

    // O13 epsilon comparator: totalprice bump of +10 within relative epsilon
    "diff_orders_epsilon" -> ((s, dir) =>
      diffLeft(s, dir).diff(diffRight(s, dir),
        DiffOptions.default.withComparator(
          DiffComparators.epsilon(0.001).asRelative().asInclusive(), "o_totalprice"),
        "o_orderkey")),

    // O23 global row numbers: 3-phase plan, no single-partition window
    "row_numbers" -> ((s, dir) =>
      RowNumbers.withRowNumbers(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        order = Seq(col("o_orderkey")))
        .withColumn("row_number", col("row_number").cast("long"))),

    // O22 histogram: single-pass bucket counts per group
    "histogram_totalprice" -> ((s, dir) =>
      t(s, dir, "orders")
        .histogram(Seq(100000, 200000, 300000, 400000), col("o_totalprice"), col("o_orderstatus"))),

    // O19/O21 sorted-group iteration: per-customer running order totals
    "group_sorted_running" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .as[CustOrder]
        .groupBySorted[Long]($"o_custkey")($"o_orderdate", $"o_orderkey")
        .flatMapSortedGroups { (cust, orders) =>
          var rn = 0L
          var running = java.math.BigDecimal.ZERO
          orders.map { o =>
            rn += 1
            running = running.add(
              new java.math.BigDecimal(o.o_totalprice).setScale(2, java.math.RoundingMode.HALF_UP))
            (cust, o.o_orderkey, rn, running.doubleValue)
          }
        }.toDF("o_custkey", "o_orderkey", "rn", "running_total")
    }),

    // O27 parquet row-group scan (oracle: DuckDB parquet_metadata())
    "parquet_blocks" -> ((s, dir) =>
      graft.parquet.ParquetMeta.parquetBlocks(s, None, Seq(s"$dir/lineitem.parquet"))
        .select(col("block"), col("rows"), col("columns").cast("long").as("columns"),
          col("compressedBytes"), col("uncompressedBytes"), col("values"), col("nulls"))),

    // O25 parquet footer facts (no SQL oracle: rows-only check)
    "parquet_metadata_scan" -> ((s, dir) =>
      graft.parquet.ParquetMeta.parquetMetadata(s, None, Seq(s"$dir/lineitem.parquet"))
        .drop("keyValues")),

    // O26 parquet schema scan (rows-only)
    "parquet_schema_scan" -> ((s, dir) =>
      graft.parquet.ParquetMeta.parquetSchema(s, None, Seq(s"$dir/lineitem.parquet"))),

    // O29 Spark split planning scan (rows-only; depends on maxPartitionBytes)
    "parquet_partitions_scan" -> ((s, dir) =>
      graft.parquet.ParquetMeta.parquetPartitions(s, None, Seq(s"$dir/lineitem.parquet")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val diffLeftSql =
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0"
    val diffRightSql =
      "SELECT o_orderkey, o_custkey, o_orderstatus, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 5 <> 0"
    def diffCte = s"WITH l AS ($diffLeftSql), r AS ($diffRightSql)"
    val changed =
      "l.o_custkey IS DISTINCT FROM r.o_custkey OR " +
        "l.o_orderstatus IS DISTINCT FROM r.o_orderstatus OR " +
        "l.o_totalprice IS DISTINCT FROM r.o_totalprice"
    val action =
      "CASE WHEN l.o_orderkey IS NULL THEN 'I' WHEN r.o_orderkey IS NULL THEN 'D' " +
        s"WHEN $changed THEN 'C' ELSE 'N' END AS diff"

    Map(
      "q1_pricing_summary" ->
        ("SELECT l_returnflag, l_linestatus, " +
          "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, " +
          "COUNT(*) AS count_order " +
          "FROM lineitem GROUP BY l_returnflag, l_linestatus"),

      "diff_orders" ->
        (s"$diffCte SELECT $action, " +
          "COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey, " +
          "l.o_custkey AS left_o_custkey, r.o_custkey AS right_o_custkey, " +
          "l.o_orderstatus AS left_o_orderstatus, r.o_orderstatus AS right_o_orderstatus, " +
          "l.o_totalprice AS left_o_totalprice, r.o_totalprice AS right_o_totalprice " +
          "FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey"),

      "diff_orders_leftside" ->
        (s"$diffCte SELECT $action, " +
          "COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey, " +
          "l.o_custkey AS o_custkey, l.o_orderstatus AS o_orderstatus, l.o_totalprice AS o_totalprice " +
          "FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey"),

      "diff_orders_sparse" ->
        (s"$diffCte SELECT $action, " +
          "COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey, " +
          "CASE WHEN l.o_custkey IS DISTINCT FROM r.o_custkey THEN l.o_custkey END AS left_o_custkey, " +
          "CASE WHEN l.o_custkey IS DISTINCT FROM r.o_custkey THEN r.o_custkey END AS right_o_custkey, " +
          "CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus THEN l.o_orderstatus END AS left_o_orderstatus, " +
          "CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus THEN r.o_orderstatus END AS right_o_orderstatus, " +
          "CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice THEN l.o_totalprice END AS left_o_totalprice, " +
          "CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice THEN r.o_totalprice END AS right_o_totalprice " +
          "FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey"),

      "diff_orders_changes" ->
        (s"$diffCte SELECT $action, " +
          "CASE WHEN l.o_orderkey IS NULL OR r.o_orderkey IS NULL THEN NULL ELSE " +
          "rtrim(concat(" +
          "CASE WHEN l.o_custkey IS DISTINCT FROM r.o_custkey THEN 'o_custkey,' ELSE '' END, " +
          "CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus THEN 'o_orderstatus,' ELSE '' END, " +
          "CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice THEN 'o_totalprice,' ELSE '' END), ',') END AS changed, " +
          "COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey, " +
          "l.o_custkey AS left_o_custkey, r.o_custkey AS right_o_custkey, " +
          "l.o_orderstatus AS left_o_orderstatus, r.o_orderstatus AS right_o_orderstatus, " +
          "l.o_totalprice AS left_o_totalprice, r.o_totalprice AS right_o_totalprice " +
          "FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey"),

      "diff_orders_epsilon" ->
        (s"$diffCte SELECT CASE WHEN l.o_orderkey IS NULL THEN 'I' WHEN r.o_orderkey IS NULL THEN 'D' " +
          "WHEN l.o_custkey IS DISTINCT FROM r.o_custkey OR l.o_orderstatus IS DISTINCT FROM r.o_orderstatus " +
          "OR NOT (ABS(l.o_totalprice - r.o_totalprice) <= 0.001 * GREATEST(ABS(l.o_totalprice), ABS(r.o_totalprice))) " +
          "THEN 'C' ELSE 'N' END AS diff, " +
          "COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey, " +
          "l.o_custkey AS left_o_custkey, r.o_custkey AS right_o_custkey, " +
          "l.o_orderstatus AS left_o_orderstatus, r.o_orderstatus AS right_o_orderstatus, " +
          "l.o_totalprice AS left_o_totalprice, r.o_totalprice AS right_o_totalprice " +
          "FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey"),

      "row_numbers" ->
        ("SELECT o_orderkey, o_totalprice, " +
          "CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS row_number FROM orders"),

      "histogram_totalprice" ->
        ("SELECT o_orderstatus, " +
          "COUNT(*) FILTER (WHERE o_totalprice <= 100000) AS \"≤100000\", " +
          "COUNT(*) FILTER (WHERE o_totalprice > 100000 AND o_totalprice <= 200000) AS \"≤200000\", " +
          "COUNT(*) FILTER (WHERE o_totalprice > 200000 AND o_totalprice <= 300000) AS \"≤300000\", " +
          "COUNT(*) FILTER (WHERE o_totalprice > 300000 AND o_totalprice <= 400000) AS \"≤400000\", " +
          "COUNT(*) FILTER (WHERE o_totalprice > 400000) AS \">400000\" " +
          "FROM orders GROUP BY o_orderstatus"),

      "group_sorted_running" ->
        ("SELECT o_custkey, o_orderkey, CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total " +
          "FROM orders " +
          "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)"),

      // t2 correctness runs at sf0.01 (TESTDATA.md), so the oracle reads the
      // sf0.01 file directly — DuckDB has no table-level footer introspection.
      "parquet_blocks" ->
        ("SELECT CAST(row_group_id + 1 AS BIGINT) AS block, row_group_num_rows AS rows, " +
          "row_group_num_columns AS columns, " +
          "CAST(SUM(total_compressed_size) AS BIGINT) AS \"compressedBytes\", " +
          "CAST(SUM(total_uncompressed_size) AS BIGINT) AS \"uncompressedBytes\", " +
          "CAST(SUM(num_values) AS BIGINT) AS \"values\", " +
          "CAST(SUM(stats_null_count) AS BIGINT) AS nulls " +
          "FROM parquet_metadata('/root/testdata/sf0.01/lineitem.parquet') " +
          "GROUP BY row_group_id, row_group_num_rows, row_group_num_columns")
    )
  }
}
