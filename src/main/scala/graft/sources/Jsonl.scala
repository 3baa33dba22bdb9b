package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Validated JSONL ingest with a quarantine channel — the front door of a
 * crawl/log pipeline. `spark.read.json` in its default mode silently turns
 * malformed rows into all-null rows (or drops them in DROPMALFORMED);
 * a 100 TB ingest needs the opposite: every input line either parses
 * against the DECLARED schema or lands, verbatim, in a quarantine table a
 * human can inspect — no silent loss, no schema inference drift.
 *
 * Mechanics: the file is read as plain text lines and parsed with
 * `from_json` in PERMISSIVE mode with an explicit corrupt-record column —
 * the parse is one narrow codegen'd projection (streaming-legal: the same
 * call works on `readStream.text`), and filtering on the corrupt column
 * works reliably here because the raw line is a real column of the text
 * scan (the documented limitation of filtering `_corrupt_record` on a
 * direct `spark.read.json` does not apply).
 *
 * Corrupt means: syntactically invalid JSON, or a value that cannot be
 * converted to the declared field type (Spark then nulls the field AND
 * flags the record — pinned in JsonlSuite). Missing fields are null, extra
 * fields are ignored — both clean, standard JSONL evolution semantics.
 *
 * Scale shape: parse + split are narrow (no shuffle, no state); the good
 * and quarantine channels are two filters over the same scan — Spark reads
 * the text twice unless the caller persists, and both passes are pure
 * scan+project (the usual trade; at 100 TB quarantine is typically wired
 * to a counter via `Dataset.observe` plus a sampled sink, both narrow).
 */
object Jsonl {

  val CorruptColumn = "_corrupt_record"

  /** Parse a line column against `schema`: the schema's fields expanded
    * plus `_corrupt_record` (null for clean rows, the verbatim line
    * otherwise). One narrow codegen'd projection. */
  def parseLines(df: DataFrame, line: Column, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptColumn),
      s"schema must not already contain $CorruptColumn")
    val withCorrupt = schema.add(CorruptColumn, StringType, nullable = true)
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptColumn)
    df.withColumn("__parsed", from_json(line, withCorrupt, opts))
      .select(
        (schema.fieldNames.map(f => col(s"__parsed.`$f`").as(f)) :+
          col(s"__parsed.`$CorruptColumn`").as(CorruptColumn)): _*)
  }

  /** Read a JSONL path, parsed and flagged: declared fields +
    * `_corrupt_record`. */
  def readValidated(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    parseLines(spark.read.text(path), col("value"), schema)

  /** The clean channel: rows that parsed fully, corrupt column dropped. */
  def good(parsed: DataFrame): DataFrame =
    parsed.where(col(CorruptColumn).isNull).drop(CorruptColumn)

  /** The quarantine channel: the verbatim offending lines. */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.where(col(CorruptColumn).isNotNull)
      .select(col(CorruptColumn).as("line"))
}

/**
 * The CSV twin of [[Jsonl]] — same contract, same channels: every line
 * either parses against the DECLARED schema or lands verbatim in
 * quarantine (`from_csv` PERMISSIVE + explicit corrupt-record column; a
 * type-mismatched field flags the record, and — CSV being positional —
 * so does an arity mismatch: a line with missing trailing fields is
 * malformed here where the JSONL channel would null absent keys; both
 * behaviors sbt-pinned). `options` passes the usual CSV dialect knobs
 * (`sep`, `quote`, ...); `header` handling is the caller's (a header
 * line quarantines under a typed schema — filter it first).
 */
object Csvl {

  val CorruptColumn: String = Jsonl.CorruptColumn

  /** Parse a CSV line column against `schema`: fields + `_corrupt_record`
    * (null for clean rows). One narrow projection, streaming-legal. */
  def parseLines(df: DataFrame, line: Column, schema: StructType,
                 options: Map[String, String] = Map.empty): DataFrame = {
    require(!schema.fieldNames.contains(CorruptColumn),
      s"schema must not already contain $CorruptColumn")
    val withCorrupt = schema.add(CorruptColumn, StringType, nullable = true)
    val opts = options ++ Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptColumn)
    df.withColumn("__parsed", from_csv(line, withCorrupt, opts))
      .select(
        (schema.fieldNames.map(f => col(s"__parsed.`$f`").as(f)) :+
          col(s"__parsed.`$CorruptColumn`").as(CorruptColumn)): _*)
  }

  /** Read a CSV path, parsed and flagged. */
  def readValidated(spark: SparkSession, path: String, schema: StructType,
                    options: Map[String, String] = Map.empty): DataFrame =
    parseLines(spark.read.text(path), col("value"), schema, options)

  /** The clean channel. */
  def good(parsed: DataFrame): DataFrame = Jsonl.good(parsed)

  /** The quarantine channel. */
  def quarantine(parsed: DataFrame): DataFrame = Jsonl.quarantine(parsed)
}
