package graft

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/**
 * Implicit diff surface on `Dataset[T]`:
 * {{{
 *   import graft.diff._
 *   left.diff(right, "id")
 *   left.diff(right, options, "id")
 *   left.diffAs[DiffRow](right, "id")
 *   left.diffWith(right, "id")   // Dataset[(String, T, T)]
 * }}}
 * (reference surface: /root/reference/src/main/scala/uk/co/gresearch/spark/diff/package.scala:26-377)
 */
package object diff {

  implicit class DatasetDiff[T](private val ds: Dataset[T]) extends AnyVal {

    def diff(other: Dataset[T], idColumns: String*): DataFrame =
      Diff.default.diff(ds, other, idColumns: _*)

    def diff(other: Dataset[T], idColumns: Seq[String], ignoreColumns: Seq[String]): DataFrame =
      Diff.default.diff(ds, other, idColumns, ignoreColumns)

    def diff(other: Dataset[T], options: DiffOptions, idColumns: String*): DataFrame =
      new Differ(options).diff(ds, other, idColumns: _*)

    def diff(other: Dataset[T], options: DiffOptions,
             idColumns: Seq[String], ignoreColumns: Seq[String]): DataFrame =
      new Differ(options).diff(ds, other, idColumns, ignoreColumns)

    def diffAs[V: Encoder](other: Dataset[T], idColumns: String*): Dataset[V] =
      Diff.default.diffAs[T, T, V](ds, other, idColumns)

    def diffAs[V: Encoder](other: Dataset[T],
                           idColumns: Seq[String], ignoreColumns: Seq[String]): Dataset[V] =
      Diff.default.diffAs[T, T, V](ds, other, idColumns, ignoreColumns)

    def diffAs[V: Encoder](other: Dataset[T], options: DiffOptions, idColumns: String*): Dataset[V] =
      new Differ(options).diffAs[T, T, V](ds, other, idColumns)

    def diffAs[V: Encoder](other: Dataset[T], options: DiffOptions,
                           idColumns: Seq[String], ignoreColumns: Seq[String]): Dataset[V] =
      new Differ(options).diffAs[T, T, V](ds, other, idColumns, ignoreColumns)

    def diffWith(other: Dataset[T], idColumns: String*): Dataset[(String, T, T)] =
      Diff.default.diffWith(ds, other, idColumns)

    def diffWith(other: Dataset[T],
                 idColumns: Seq[String], ignoreColumns: Seq[String]): Dataset[(String, T, T)] =
      Diff.default.diffWith(ds, other, idColumns, ignoreColumns)

    def diffWith(other: Dataset[T], options: DiffOptions, idColumns: String*): Dataset[(String, T, T)] =
      new Differ(options).diffWith(ds, other, idColumns)

    def diffWith(other: Dataset[T], options: DiffOptions,
                 idColumns: Seq[String], ignoreColumns: Seq[String]): Dataset[(String, T, T)] =
      new Differ(options).diffWith(ds, other, idColumns, ignoreColumns)
  }
}
