import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * A tour of the graft library's flagship surface on the bundled test data.
 * Run: `sbt "run /root/testdata/sf0.001"` (any sf dir works).
 */
object GraftExample {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-example")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val documents = spark.read.parquet(s"$dir/documents.parquet")

    // 1. Dataset diff: schema-checked row-level comparison with an action
    //    column (N/I/D/C) — the library's reference-parity flagship.
    import graft.diff.Diff
    val left = orders.limit(1000)
    val right = left
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 100 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    println("== diff actions ==")
    Diff.of(left, right, "o_orderkey")
      .groupBy("diff").count().orderBy("diff").show()

    // 2. Global row numbers without a single-partition window.
    import graft._
    println("== row numbers (first 5 by totalprice) ==")
    orders.withRowNumbers(col("o_totalprice").desc)
      .select("row_number", "o_orderkey", "o_totalprice").show(5)

    // 3. Value histogram with explicit thresholds.
    println("== totalprice histogram ==")
    orders.histogram(Seq(50000.0, 150000.0, 300000.0), col("o_totalprice"))
      .show()

    // 4. LLM-pipeline surface: exact + MinHash near-duplicate detection
    //    over the documents table.
    import graft.dedup.Dedup
    println("== near-duplicate pairs (MinHash banding, jaccard >= 0.8) ==")
    val pairs = Dedup.nearDupPairsMinHash(
      documents, col("doc_id"), col("text"), threshold = 0.8)
    println(s"pairs found: ${pairs.count()}")

    // 5. Text quality stats in one fused kernel pass:
    //    [n_tokens, distinct_tokens, total_token_chars, stopword_count].
    import graft.text.TextFunctions
    println("== token stats (first 3 docs) ==")
    documents
      .select(col("doc_id"), TextFunctions.tokenStatsAscii(col("text")).as("s"))
      .select(col("doc_id"),
        col("s").getItem(0).as("n_tokens"),
        (col("s").getItem(2).cast("double") / col("s").getItem(0)).as("avg_token_len"),
        (col("s").getItem(3).cast("double") / col("s").getItem(0)).as("stopword_ratio"))
      .show(3)

    spark.stop()
  }
}
