package graft.group

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}

/**
 * Sorted-group iteration: group a Dataset by key columns and iterate each
 * group's values in a guaranteed order, streaming (one pass, no group
 * materialization).
 *
 * Plan shape (scale-critical): one hash `repartition` on the group columns +
 * executor-local `sortWithinPartitions` — no global sort, no single-partition
 * stage. Groups larger than memory spill via Spark's external sorter.
 * Clean-room re-implementation of the reference semantics
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/group/package.scala:80-193).
 */
class SortedGroupByDataset[K: Ordering, V] private[group] (ds: Dataset[(K, V)]) extends Serializable {

  /** For each group: `func(key, sortedIterator)`. The iterator is single-pass;
    * unconsumed remainders are auto-drained when moving to the next group. */
  def flatMapSortedGroups[W: Encoder](func: (K, Iterator[V]) => IterableOnce[W]): Dataset[W] =
    ds.mapPartitions { it =>
      new GroupedIterator[K, V](it.buffered).flatMap { case (k, vs) => func(k, vs).iterator }
    }

  /** Stateful variant: `s` builds per-group state from the key, `func` folds
    * each value with that state. */
  def flatMapSortedGroups[S, W: Encoder](s: K => S)(func: (S, V) => IterableOnce[W]): Dataset[W] =
    flatMapSortedGroups[W] { (key, it) =>
      val state = s(key)
      it.flatMap(v => func(state, v))
    }

  /** The underlying sorted `(key, value)` dataset. */
  def toDS: Dataset[(K, V)] = ds
}

object SortedGroupByDataset {

  /** Column-expression grouping (keeps partitioning visible to Catalyst). */
  def apply[K: Ordering : Encoder, V](
      ds: Dataset[V],
      groupColumns: Seq[Column],
      orderColumns: Seq[Column],
      partitions: Option[Int]): SortedGroupByDataset[K, V] = {
    implicit val valueEncoder: Encoder[V] = ds.encoder
    val key = (if (groupColumns.length == 1) groupColumns.head else struct(groupColumns: _*)).as("k")
    val partitioned = partitions
      .map(n => ds.repartition(n, groupColumns: _*))
      .getOrElse(ds.repartition(groupColumns: _*))
    val sorted = partitioned
      .sortWithinPartitions(groupColumns ++ orderColumns: _*)
      .select(key.as[K], struct(col("*")).as("v").as[V])
    new SortedGroupByDataset[K, V](sorted)
  }

  /** Lambda grouping: materializes `(key, order, value)` tuples first. */
  def apply[K: Ordering : Encoder, O: Encoder, V](
      ds: Dataset[V],
      key: V => K,
      order: V => O,
      partitions: Option[Int],
      reverse: Boolean): SortedGroupByDataset[K, V] = {
    implicit val valueEncoder: Encoder[V] = ds.encoder
    implicit val tupleEncoder: Encoder[(K, O, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[O]], valueEncoder)
    implicit val kvEncoder: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], valueEncoder)
    val keyed = ds.map(v => (key(v), order(v), v))
    val partitioned = partitions
      .map(n => keyed.repartition(n, col("_1")))
      .getOrElse(keyed.repartition(col("_1")))
    val orderCol = if (reverse) col("_2").desc else col("_2")
    val sorted = partitioned
      .sortWithinPartitions(col("_1"), orderCol)
      .select(col("_1").as[K], col("_3").as[V])
    new SortedGroupByDataset[K, V](sorted)
  }
}

/**
 * Slices a key-sorted `(K, V)` iterator into per-key group iterators.
 * Key-change detection uses `Ordering[K].equiv` with null handling
 * (null == null). Unconsumed groups are drained automatically; repeated
 * `hasNext` is safe. (reference: group/package.scala:152-193)
 */
private[graft] class GroupedIterator[K, V](iter: BufferedIterator[(K, V)])(implicit ord: Ordering[K])
    extends Iterator[(K, Iterator[V])] {

  private var currentGroup: GroupIterator[K, V] = _

  override def hasNext: Boolean = {
    if (currentGroup != null) {
      currentGroup.drain()
      currentGroup = null
    }
    iter.hasNext
  }

  override def next(): (K, Iterator[V]) = {
    if (!hasNext) throw new NoSuchElementException("next on empty iterator")
    val key = iter.head._1
    currentGroup = new GroupIterator[K, V](key, iter)
    (key, currentGroup)
  }
}

private[graft] class GroupIterator[K, V](key: K, iter: BufferedIterator[(K, V)])(implicit ord: Ordering[K])
    extends Iterator[V] {

  private def keyEquiv(a: K, b: K): Boolean =
    if (a == null && b == null) true
    else if (a == null || b == null) false
    else ord.equiv(a, b)

  private def headInGroup: Boolean = iter.hasNext && keyEquiv(iter.head._1, key)

  override def hasNext: Boolean = headInGroup

  override def next(): V = {
    if (!headInGroup) throw new NoSuchElementException("next on empty iterator")
    iter.next()._2
  }

  private[group] def drain(): Unit = while (headInGroup) iter.next()
}
