package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: prints the formatted physical plan of flagship queries so
  * plan regressions (lost pushdown, surprise shuffles, missing broadcasts)
  * are visible. Usage: runMain graft.Plans [sfDir] [query...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("diff_orders", "dedup_minhash_pairs", "ann_brute_topk", "row_numbers", "q1_pricing_summary")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
