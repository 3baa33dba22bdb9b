package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Histogram: per-group bucket counts for ascending thresholds t1..tn,
 * producing columns `≤t1`, `≤t2`, …, `>tn` (disjoint buckets:
 * `≤t2` counts values in (t1, t2]).
 *
 * Single aggregation pass — `sum(when(cond, 1))` per bucket inside one
 * hash aggregate (partial map-side combine applies), instead of the
 * reference's withColumn-per-bucket + groupBy
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/Histogram.scala:46-67).
 * Same output schema and error behavior.
 */
object Histogram {

  def of[T: Ordering](
      df: DataFrame,
      thresholds: Seq[T],
      valueColumn: Column,
      aggregateColumns: Column*): DataFrame = {
    val ord = implicitly[Ordering[T]]
    require(thresholds.nonEmpty, "Thresholds must not be empty")
    require(thresholds.distinct.length == thresholds.length,
      s"Thresholds must not contain duplicates: ${thresholds.mkString(", ")}")
    require(thresholds.sliding(2).forall {
      case Seq(a, b) => ord.lt(a, b)
      case _ => true
    }, s"Thresholds must be in ascending order: ${thresholds.mkString(", ")}")

    val buckets: Seq[Column] = thresholds.zipWithIndex.map { case (t, i) =>
      val cond =
        if (i == 0) valueColumn <= lit(t)
        else valueColumn > lit(thresholds(i - 1)) && valueColumn <= lit(t)
      sum(when(cond, 1L).otherwise(0L)).as(s"≤$t")
    } :+ sum(when(valueColumn > lit(thresholds.last), 1L).otherwise(0L)).as(s">${thresholds.last}")

    if (aggregateColumns.isEmpty) df.agg(buckets.head, buckets.tail: _*)
    else df.groupBy(aggregateColumns: _*).agg(buckets.head, buckets.tail: _*)
  }
}
