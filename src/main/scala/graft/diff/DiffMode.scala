package graft.diff

/**
 * Output layout of the diff result
 * (reference: /root/reference/src/main/scala/uk/co/gresearch/spark/diff/DiffOptions.scala:36-72).
 *
 *  - ColumnByColumn: left/right value columns interleaved per source column
 *  - SideBySide: all left-prefixed value columns, then all right-prefixed
 *  - LeftSide / RightSide: un-prefixed value columns from one side only
 */
object DiffMode extends Enumeration {
  type DiffMode = Value
  val ColumnByColumn, SideBySide, LeftSide, RightSide = Value

  /** The default mode. */
  def Default: DiffMode = ColumnByColumn

  def withNameOption(name: String): Option[DiffMode] =
    values.find(_.toString.equalsIgnoreCase(name))
}
