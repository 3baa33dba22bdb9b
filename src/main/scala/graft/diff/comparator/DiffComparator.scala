package graft.diff.comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType}

/**
 * Pluggable per-column equality for the diff operator.
 *
 * A comparator turns a pair of columns into a boolean "equivalent" Column
 * expression. Resolution order (column name -> data type -> default) lives in
 * [[graft.diff.DiffOptions.comparatorFor]].
 *
 * Re-derived from the reference comparator framework
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/diff/comparator/DiffComparator.scala:21-23).
 */
trait DiffComparator {
  def equiv(left: Column, right: Column): Column
}

/** Comparator tied to a specific Spark input type (used by typed equiv comparators). */
trait TypedDiffComparator extends DiffComparator {
  def inputType: DataType
}

/**
 * Default comparator: Spark's null-safe equality `left <=> right`
 * (null == null is true, null == value is false).
 * (reference: NullSafeEqualDiffComparator.scala:21-23)
 */
case object NullSafeEqualDiffComparator extends DiffComparator {
  override def equiv(left: Column, right: Column): Column = left <=> right
}

case object DefaultDiffComparator extends DiffComparator {
  override def equiv(left: Column, right: Column): Column =
    NullSafeEqualDiffComparator.equiv(left, right)
}

/**
 * Numeric equality within an epsilon: absolute (`|l-r| <= eps`) or relative
 * (`|l-r| <= eps * greatest(|l|,|r|)`), inclusive or exclusive bound.
 * Nulls: both null == equal, one null == not equal.
 * (reference: EpsilonDiffComparator.scala:22-44)
 */
case class EpsilonDiffComparator(epsilon: Double, relative: Boolean = true, inclusive: Boolean = true)
    extends DiffComparator {
  def asAbsolute(): EpsilonDiffComparator = copy(relative = false)
  def asRelative(): EpsilonDiffComparator = copy(relative = true)
  def asInclusive(): EpsilonDiffComparator = copy(inclusive = true)
  def asExclusive(): EpsilonDiffComparator = copy(inclusive = false)

  override def equiv(left: Column, right: Column): Column = {
    val threshold =
      if (relative) lit(epsilon) * greatest(abs(left), abs(right))
      else lit(epsilon)
    val delta = abs(left - right)
    val inRange = if (inclusive) delta <= threshold else delta < threshold
    left.isNull && right.isNull || left.isNotNull && right.isNotNull && inRange
  }
}

/**
 * String equality, optionally whitespace-agnostic: both sides are trimmed and
 * internal whitespace runs collapsed to a single space before comparing.
 * Built from codegen'd built-ins (`regexp_replace` + `trim`) rather than a
 * custom UTF8String expression.
 * (reference semantics: WhitespaceDiffComparator.scala:20-29)
 */
case class StringDiffComparator(whitespaceAgnostic: Boolean = false) extends DiffComparator {
  // Collapse runs first, then trim: Spark's trim strips ASCII spaces only, so
  // leading/trailing tabs/newlines must be collapsed to spaces before trimming
  // (matches the reference's UTF8String.trimAll semantics).
  private def normalize(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))
  override def equiv(left: Column, right: Column): Column =
    if (whitespaceAgnostic) normalize(left) <=> normalize(right)
    else left <=> right
}

/**
 * Date/Timestamp equality within a duration: `|l - r| <= duration`
 * (timestamp subtraction yields a day-time interval, compared against an
 * interval literal). Nulls: both null == equal.
 * (reference: DurationDiffComparator.scala:38-60)
 */
case class DurationDiffComparator(duration: java.time.Duration, inclusive: Boolean = true)
    extends DiffComparator {
  def asInclusive(): DurationDiffComparator = copy(inclusive = true)
  def asExclusive(): DurationDiffComparator = copy(inclusive = false)

  override def equiv(left: Column, right: Column): Column = {
    val l = left.cast("timestamp")
    val r = right.cast("timestamp")
    val delta = abs(l - r)
    val inRange = if (inclusive) delta <= lit(duration) else delta < lit(duration)
    left.isNull && right.isNull || left.isNotNull && right.isNotNull && inRange
  }
}

/**
 * Map equality (maps are not comparable with `<=>` in Spark). Two maps are
 * equivalent when they have the same keys (as a sequence when
 * `keyOrderSensitive`, as a set otherwise) and null-safe-equal values per key.
 * (reference semantics: MapDiffComparator.scala:26-83)
 *
 * Hot path: when `keyType`/`valueType` are known (the diff operator fills
 * them in from the column's schema via [[graft.diff.DiffOptions.comparatorFor]]),
 * the comparison runs as a single [[MapEquiv]] call inside whole-stage codegen
 * — one hash-indexed pass over both maps per row. Without the types (direct
 * Column use on an unresolved column) it falls back to higher-order built-ins,
 * which Spark evaluates interpreted per entry — correct but ~3-4x slower.
 */
case class MapDiffComparator(
    keyOrderSensitive: Boolean = false,
    keyType: Option[DataType] = None,
    valueType: Option[DataType] = None) extends DiffComparator {

  /** Specialize to a concrete map type, enabling the codegen'd equiv path. */
  def typed(kt: DataType, vt: DataType): MapDiffComparator =
    copy(keyType = Some(kt), valueType = Some(vt))

  override def equiv(left: Column, right: Column): Column = (keyType, valueType) match {
    case (Some(kt), Some(vt)) =>
      EquivDiffComparator[MapData](MapEquiv(kt, vt, keyOrderSensitive), Some(MapType(kt, vt)))
        .equiv(left, right)
    case _ => hofEquiv(left, right)
  }

  // Interpreted fallback from higher-order built-ins. Relies on And
  // short-circuiting to keep ANSI element_at from throwing on a missing key
  // (keysOk is checked first); the typed path has no such fragility.
  private def hofEquiv(left: Column, right: Column): Column = {
    val keysOk =
      if (keyOrderSensitive) map_keys(left) <=> map_keys(right)
      else size(left) === size(right) &&
        forall(map_keys(left), k => map_contains_key(right, k))
    val valuesOk = forall(
      map_entries(left),
      e => element_at(right, e.getField("key")) <=> e.getField("value"))
    left.isNull && right.isNull ||
      left.isNotNull && right.isNotNull && keysOk && valuesOk
  }
}

/**
 * `math.Equiv` over Catalyst [[MapData]]: same size, same keys (positional
 * when `keyOrderSensitive`, hash-indexed set match otherwise), null-safe-equal
 * values per key. Runs inside codegen via [[EquivDiffComparator]].
 *
 * Key and value equality use the JVM `equals` of the Catalyst representation
 * (UTF8String, boxed primitives, Decimal, UnsafeArrayData...), normalized
 * where that diverges from SQL equality: `Array[Byte]` wrapped for content
 * equality, signed zeros collapsed — same contract as the reference's map
 * equiv (MapDiffComparator.scala:30-61).
 */
private[graft] case class MapEquiv(
    keyType: DataType, valueType: DataType, keyOrderSensitive: Boolean)
  extends math.Equiv[MapData] {

  // Equality of raw Catalyst values must match Spark's comparison semantics:
  // NaN equals NaN and -0.0 equals 0.0 (nan-safe compare), binary compares by
  // content. No single JVM equality gives all three — Scala `==` on boxed
  // numerics unboxes to primitive `==` (NaN != NaN), Java `.equals` keeps NaN
  // but splits signed zeros, and Array[Byte] is identity under both. So:
  // normalize (wrap bytes, collapse -0.0 to 0.0) and compare with Java
  // `.equals` — this also gives HashMap indexing the right hashCode.
  private def normalize(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case d: java.lang.Double if d.doubleValue() == 0.0d => java.lang.Double.valueOf(0.0d)
    case other => other
  }

  private def keysEqual(l: Any, r: Any): Boolean =
    normalize(l).equals(normalize(r))

  private def valuesEqual(lVals: ArrayData, i: Int, rVals: ArrayData, j: Int): Boolean = {
    val lNull = lVals.isNullAt(i)
    val rNull = rVals.isNullAt(j)
    if (lNull || rNull) lNull && rNull
    else normalize(lVals.get(i, valueType)).equals(normalize(rVals.get(j, valueType)))
  }

  override def equiv(left: MapData, right: MapData): Boolean = {
    val n = left.numElements()
    if (n != right.numElements()) return false
    val lKeys = left.keyArray()
    val rKeys = right.keyArray()
    val lVals = left.valueArray()
    val rVals = right.valueArray()
    if (keyOrderSensitive) {
      var i = 0
      while (i < n) {
        if (!keysEqual(lKeys.get(i, keyType), rKeys.get(i, keyType)) ||
            !valuesEqual(lVals, i, rVals, i)) return false
        i += 1
      }
      true
    } else {
      // index the right map once; map keys are unique and non-null in Spark
      val rIndex = new java.util.HashMap[Any, Integer](n * 2)
      var j = 0
      while (j < n) { rIndex.put(normalize(rKeys.get(j, keyType)), j); j += 1 }
      var i = 0
      while (i < n) {
        val at = rIndex.get(normalize(lKeys.get(i, keyType)))
        if (at == null || !valuesEqual(lVals, i, rVals, at)) return false
        i += 1
      }
      true
    }
  }
}
