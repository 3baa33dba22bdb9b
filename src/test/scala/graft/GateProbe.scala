package graft.tools

import graft.SparkTestSession

object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import java.util.Locale
    for (name <- args) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      val n = df.count()
      println(String.format(Locale.ROOT, "GATE %s rows=%d sec=%.1f",
        name, Long.box(n), Double.box((System.nanoTime() - t0) / 1e9)))
    }
    spark.stop()
  }
}
