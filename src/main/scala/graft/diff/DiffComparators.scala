package graft.diff

import graft.diff.comparator._
import org.apache.spark.sql.types.DataType

import java.time.Duration

/**
 * Factory methods for the built-in diff comparators.
 * (reference surface: /root/reference/src/main/scala/uk/co/gresearch/spark/diff/DiffComparators.scala)
 */
object DiffComparators {
  /** The null-safe-equality default (`left <=> right`). */
  def default(): DiffComparator = DefaultDiffComparator

  /** Null-safe equality. */
  def nullSafeEqual(): DiffComparator = NullSafeEqualDiffComparator

  /** Numeric epsilon comparator (relative + inclusive by default). */
  def epsilon(epsilon: Double): EpsilonDiffComparator = EpsilonDiffComparator(epsilon)

  /** String comparator; whitespace-agnostic when requested. */
  def string(whitespaceAgnostic: Boolean = true): StringDiffComparator =
    StringDiffComparator(whitespaceAgnostic)

  /** Date/timestamp comparator within a duration (inclusive by default). */
  def duration(duration: Duration): DurationDiffComparator = DurationDiffComparator(duration)

  /** Map comparator; key order insensitive by default. The diff operator
    * specializes it with the column's key/value types (codegen path); see
    * [[comparator.MapDiffComparator]]. */
  def map[K, V](keyOrderSensitive: Boolean = false): MapDiffComparator =
    MapDiffComparator(keyOrderSensitive)

  /** Map comparator pre-typed to a concrete key/value type — uses the
    * codegen'd [[comparator.MapEquiv]] path even outside the diff operator. */
  def map(keyType: DataType, valueType: DataType, keyOrderSensitive: Boolean): MapDiffComparator =
    MapDiffComparator(keyOrderSensitive).typed(keyType, valueType)

  /** Lift a `math.Equiv[T]` into a codegen'd Catalyst comparator. */
  def equiv[T](equiv: math.Equiv[T]): EquivDiffComparator[T] = EquivDiffComparator(equiv)

  /** Same, restricted to one input type. */
  def equiv[T](equiv: math.Equiv[T], inputType: DataType): EquivDiffComparator[T] =
    EquivDiffComparator(equiv, Some(inputType))
}
