package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Scalar / aggregate helper functions (SURVEY.md §2.2, F1-F9).
 *
 * All are pure Column algebra (codegen'd built-ins) or driver-side string
 * helpers; no UDFs. Semantics re-derived from the reference
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/package.scala and
 * scala-spark-3.5/uk/co/gresearch/spark/Backticks.scala), clean-room.
 */
package object functions {

  // --------------------------------------------------------------------------
  // Column-name helpers (driver-side, pure Scala)
  // --------------------------------------------------------------------------

  private val simpleName = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  /**
   * Quote column-name parts with backticks where needed and join with `.`.
   * A part is quoted unless it matches `[a-zA-Z_][a-zA-Z0-9_]*`; embedded
   * backticks are escaped by doubling. (reference: Backticks.scala:23-66)
   */
  def backticks(string: String, strings: String*): String =
    (string +: strings).map { part =>
      if (simpleName.pattern.matcher(part).matches() && !part.contains("`")) part
      else "`" + part.replace("`", "``") + "`"
    }.mkString(".")

  /**
   * A column-name prefix of `_`s guaranteed not to collide with any existing
   * column: one more underscore than the longest run of leading underscores
   * found in `existing`. (reference: package.scala:42-46)
   */
  def distinctPrefixFor(existing: Seq[String]): String =
    "_" * (existing.map(_.takeWhile(_ == '_').length).reduceOption(_ max _).getOrElse(0) + 1)

  // --------------------------------------------------------------------------
  // Aggregates
  // --------------------------------------------------------------------------

  /** Aggregate: number of rows where `e` is null. (reference: package.scala:111) */
  def count_null(e: Column): Column = count(when(e.isNull, lit(1)))

  // --------------------------------------------------------------------------
  // .Net ticks codecs (100ns units since 0001-01-01T00:00:00Z)
  // (reference: package.scala:113-409)
  // --------------------------------------------------------------------------

  /** .Net ticks at the Unix epoch 1970-01-01T00:00:00Z. */
  val DotNetTicksOfUnixEpoch: Long = 621355968000000000L
  /** Ticks per second (tick = 100ns). */
  val DotNetTicksPerSecond: Long = 10000000L
  /** Largest tick value whose epoch-nanos representation fits in a Long. */
  val MaxDotNetTicksForNanos: Long = 713589688368547758L

  /**
   * .Net ticks -> TimestampType (microsecond precision; the trailing 100ns
   * digit is truncated toward past, matching the reference package.scala:141-167).
   */
  def dotNetTicksToTimestamp(ticks: Column): Column =
    dotNetTicksToUnixEpoch(ticks).cast(TimestampType)

  def dotNetTicksToTimestamp(ticksColumnName: String): Column =
    dotNetTicksToTimestamp(col(ticksColumnName))

  /**
   * .Net ticks -> Unix epoch seconds as Decimal(29,9) keeping full 100ns
   * precision (the quotient's natural scale is already 9; the cast pins the
   * exact reference output type). (reference: package.scala:189-212)
   */
  def dotNetTicksToUnixEpoch(ticks: Column): Column =
    ((ticks.cast(DecimalType(19, 0)) - DotNetTicksOfUnixEpoch) / DotNetTicksPerSecond)
      .cast(DecimalType(29, 9))

  def dotNetTicksToUnixEpoch(ticksColumnName: String): Column =
    dotNetTicksToUnixEpoch(col(ticksColumnName))

  /**
   * .Net ticks -> Unix epoch nanoseconds as Long; null when the value would
   * overflow Long (ticks > [[MaxDotNetTicksForNanos]]).
   * (reference: package.scala:234-261)
   */
  def dotNetTicksToUnixEpochNanos(ticks: Column): Column =
    when(ticks <= MaxDotNetTicksForNanos,
      (ticks.cast(LongType) - DotNetTicksOfUnixEpoch) * 100)

  def dotNetTicksToUnixEpochNanos(ticksColumnName: String): Column =
    dotNetTicksToUnixEpochNanos(col(ticksColumnName))

  /**
   * TimestampType -> .Net ticks. Uses the public `unix_micros` (Spark >= 3.1)
   * instead of the internal `UnixMicros` expression the reference bridges to
   * (reference: package.scala:282-304).
   */
  def timestampToDotNetTicks(timestamp: Column): Column =
    unix_micros(timestamp) * 10 + DotNetTicksOfUnixEpoch

  def timestampToDotNetTicks(timestampColumnName: String): Column =
    timestampToDotNetTicks(col(timestampColumnName))

  /**
   * Numeric Unix epoch seconds -> .Net ticks (Decimal(19,7) intermediary keeps
   * 100ns resolution; must NOT be applied to TimestampType).
   * (reference: package.scala:327-352, 408-409)
   */
  def unixEpochToDotNetTicks(unixSeconds: Column): Column =
    (unixSeconds.cast(DecimalType(19, 7)) * DotNetTicksPerSecond + DotNetTicksOfUnixEpoch)
      .cast(LongType)

  def unixEpochToDotNetTicks(unixSecondsColumnName: String): Column =
    unixEpochToDotNetTicks(col(unixSecondsColumnName))

  /**
   * Unix epoch nanoseconds -> .Net ticks, flooring to 100ns resolution.
   * (reference: package.scala:377-406)
   */
  def unixEpochNanosToDotNetTicks(unixNanos: Column): Column =
    floor(unixNanos.cast(DecimalType(21, 0)) / 100).cast(DecimalType(19, 0))
      .cast(LongType) + DotNetTicksOfUnixEpoch

  def unixEpochNanosToDotNetTicks(unixNanosColumnName: String): Column =
    unixEpochNanosToDotNetTicks(col(unixNanosColumnName))
}
