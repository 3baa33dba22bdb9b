package graft.diff

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Column-level schema drift between two snapshot vintages — the first
 * question after a [[SnapshotDiff]] or a failed union of daily exports:
 * WHAT changed shape? One row per column seen on either side:
 * `(column, status, left_type, right_type)`, status ∈ added | removed |
 * type_changed | unchanged.
 *
 * Identity is the top-level column NAME (the union/evolution notion);
 * types compare as their full SQL strings, so a nested-field change
 * surfaces as `type_changed` on its root column. The directory variant
 * reads ONLY the parquet footer schema — no data IO at any snapshot size.
 */
object SchemaDiff {

  def schemaDiff(spark: SparkSession, left: StructType,
                 right: StructType): DataFrame = {
    val l = left.fields.map(f => f.name -> f.dataType.sql).toMap
    val r = right.fields.map(f => f.name -> f.dataType.sql).toMap
    val names = (left.fieldNames ++ right.fieldNames).distinct
    val rows = names.toSeq.map { n =>
      val status = (l.get(n), r.get(n)) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "type_changed"
      }
      (n, status, l.get(n).orNull, r.get(n).orNull)
    }
    import spark.implicits._
    rows.toDF("column", "status", "left_type", "right_type")
  }

  /** Drift between two parquet directories — footer schemas only. */
  def schemaDiffDirs(spark: SparkSession, leftDir: String,
                     rightDir: String): DataFrame =
    schemaDiff(spark, spark.read.parquet(leftDir).schema,
      spark.read.parquet(rightDir).schema)
}
