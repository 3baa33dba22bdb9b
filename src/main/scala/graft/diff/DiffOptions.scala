package graft.diff

import graft.diff.DiffMode.DiffMode
import graft.diff.comparator.{DiffComparator, MapDiffComparator}
import org.apache.spark.sql.types.{DataType, MapType, StructField}

/**
 * Configuration of the diff operator: output column names, diff action
 * values, output layout ([[DiffMode]]), sparse mode, and per-column /
 * per-type comparators.
 *
 * Invariants are checked eagerly on construction, mirroring the reference
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/diff/DiffOptions.scala:150-163).
 */
case class DiffOptions(
    diffColumn: String = "diff",
    leftColumnPrefix: String = "left",
    rightColumnPrefix: String = "right",
    insertDiffValue: String = "I",
    changeDiffValue: String = "C",
    deleteDiffValue: String = "D",
    nochangeDiffValue: String = "N",
    changeColumn: Option[String] = None,
    diffMode: DiffMode = DiffMode.Default,
    sparseMode: Boolean = false,
    defaultComparator: DiffComparator = DiffComparators.default(),
    dataTypeComparators: Map[DataType, DiffComparator] = Map.empty,
    columnNameComparators: Map[String, DiffComparator] = Map.empty) {

  require(leftColumnPrefix.nonEmpty, "Left column prefix must not be empty")
  require(rightColumnPrefix.nonEmpty, "Right column prefix must not be empty")
  require(leftColumnPrefix != rightColumnPrefix,
    s"Left and right column prefix must be distinct: $leftColumnPrefix")

  private val diffValues = Seq(insertDiffValue, changeDiffValue, deleteDiffValue, nochangeDiffValue)
  require(diffValues.distinct.length == diffValues.length,
    s"Diff values must be distinct: $diffValues")

  require(!changeColumn.contains(diffColumn),
    s"Change column name must be different to diff column: $diffColumn")

  def withDiffColumn(name: String): DiffOptions = copy(diffColumn = name)
  def withLeftColumnPrefix(prefix: String): DiffOptions = copy(leftColumnPrefix = prefix)
  def withRightColumnPrefix(prefix: String): DiffOptions = copy(rightColumnPrefix = prefix)
  def withInsertDiffValue(value: String): DiffOptions = copy(insertDiffValue = value)
  def withChangeDiffValue(value: String): DiffOptions = copy(changeDiffValue = value)
  def withDeleteDiffValue(value: String): DiffOptions = copy(deleteDiffValue = value)
  def withNochangeDiffValue(value: String): DiffOptions = copy(nochangeDiffValue = value)
  def withChangeColumn(name: String): DiffOptions = copy(changeColumn = Some(name))
  def withoutChangeColumn(): DiffOptions = copy(changeColumn = None)
  def withDiffMode(mode: DiffMode): DiffOptions = copy(diffMode = mode)
  def withSparseMode(sparse: Boolean): DiffOptions = copy(sparseMode = sparse)

  def withDefaultComparator(comparator: DiffComparator): DiffOptions =
    copy(defaultComparator = comparator)

  /** Register a comparator for one or more data types; rejects re-registration. */
  def withComparator(comparator: DiffComparator, dataType: DataType, dataTypes: DataType*): DiffOptions = {
    val types = dataType +: dataTypes
    val existing = types.filter(dataTypeComparators.contains)
    require(existing.isEmpty,
      s"A comparator for data type${if (existing.length > 1) "s" else ""} " +
        s"${existing.map(_.sql).mkString(", ")} exists already.")
    copy(dataTypeComparators = dataTypeComparators ++ types.map(_ -> comparator))
  }

  /** Register a comparator for one or more column names; rejects re-registration. */
  def withComparator(comparator: DiffComparator, columnName: String, columnNames: String*): DiffOptions = {
    val names = columnName +: columnNames
    val existing = names.filter(columnNameComparators.contains)
    require(existing.isEmpty,
      s"A comparator for column name${if (existing.length > 1) "s" else ""} " +
        s"${existing.mkString(", ")} exists already.")
    copy(columnNameComparators = columnNameComparators ++ names.map(_ -> comparator))
  }

  /**
   * Resolve the comparator for a column: name match first (honoring the
   * session's case sensitivity), then data type, then the default.
   * (reference: DiffOptions.scala:473-477)
   *
   * Case-insensitive name resolution is deterministic: when two configured
   * names match the same column ignoring case, resolution fails loudly
   * instead of depending on hash-map iteration order.
   *
   * An untyped [[MapDiffComparator]] is specialized here with the column's
   * actual key/value types, switching it onto its codegen'd equiv path.
   */
  def comparatorFor(column: StructField, caseSensitive: Boolean = true): DiffComparator = {
    val byName =
      if (caseSensitive) columnNameComparators.get(column.name)
      else {
        val matches = columnNameComparators.filter(_._1.equalsIgnoreCase(column.name))
        require(matches.size <= 1,
          s"Column name comparators ${matches.keys.toSeq.sorted.mkString(", ")} " +
            s"all match column '${column.name}' case-insensitively; " +
            "rename the comparators or enable spark.sql.caseSensitive.")
        matches.headOption.map(_._2)
      }
    val resolved = byName
      .orElse(dataTypeComparators.get(column.dataType))
      .getOrElse(defaultComparator)
    resolved match {
      case m: MapDiffComparator if m.keyType.isEmpty =>
        column.dataType match {
          case MapType(kt, vt, _) => m.typed(kt, vt)
          case _ => resolved
        }
      case _ => resolved
    }
  }
}

object DiffOptions {
  val default: DiffOptions = DiffOptions()
}
