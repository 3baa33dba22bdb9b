package graft.app

import graft.diff._
import graft.fluent.Fluent._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * End-to-end diff application: read left/right from any Spark format (or
 * Hive tables), diff with full options, optionally filter on action values
 * or aggregate per-action statistics, write out.
 *
 * Hand-rolled argument parser (no external CLI dependency), same option
 * surface as the reference app
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/diff/App.scala:24-330).
 *
 * Usage: DiffApp [options] <left> <right> <output>
 */
object DiffApp {

  case class Config(
      left: String = null,
      right: String = null,
      output: String = null,
      format: String = "parquet",
      leftFormat: Option[String] = None,
      rightFormat: Option[String] = None,
      outputFormat: Option[String] = None,
      leftSchema: Option[String] = None,
      rightSchema: Option[String] = None,
      leftOptions: Map[String, String] = Map.empty,
      rightOptions: Map[String, String] = Map.empty,
      outputOptions: Map[String, String] = Map.empty,
      hive: Boolean = false,
      outputHive: Boolean = false,
      saveMode: SaveMode = SaveMode.ErrorIfExists,
      ids: Seq[String] = Seq.empty,
      ignore: Seq[String] = Seq.empty,
      filter: Seq[String] = Seq.empty,
      statistics: Boolean = false,
      options: DiffOptions = DiffOptions.default)

  def usage: String =
    """usage: DiffApp [options] <left> <right> <output>
      |  --format F | --left-format F | --right-format F | --output-format F
      |  --left-schema DDL | --right-schema DDL
      |  --left-option K=V | --right-option K=V | --output-option K=V  (repeatable)
      |  --hive                read left/right as table names
      |  --output-hive         write output with saveAsTable
      |  --save-mode MODE      append|overwrite|ignore|error (default error)
      |  --id COL              id column (repeatable; default: all columns)
      |  --ignore COL          ignored column (repeatable)
      |  --filter ACTION       keep only these diff actions (repeatable)
      |  --statistics          output per-action counts instead of rows
      |  --diff-column NAME | --left-prefix P | --right-prefix P
      |  --insert-value V | --change-value V | --delete-value V | --nochange-value V
      |  --change-column NAME | --mode columnbycolumn|sidebyside|leftside|rightside
      |  --sparse""".stripMargin

  private def kv(s: String): (String, String) = {
    val i = s.indexOf('=')
    require(i > 0, s"Expected K=V, got: $s")
    (s.take(i), s.drop(i + 1))
  }

  def parse(args: Seq[String]): Config = {
    var c = Config()
    var positional = Vector.empty[String]
    var rest = args.toList
    while (rest.nonEmpty) {
      rest = rest match {
        case "--format" :: v :: t => c = c.copy(format = v); t
        case "--left-format" :: v :: t => c = c.copy(leftFormat = Some(v)); t
        case "--right-format" :: v :: t => c = c.copy(rightFormat = Some(v)); t
        case "--output-format" :: v :: t => c = c.copy(outputFormat = Some(v)); t
        case "--left-schema" :: v :: t => c = c.copy(leftSchema = Some(v)); t
        case "--right-schema" :: v :: t => c = c.copy(rightSchema = Some(v)); t
        case "--left-option" :: v :: t => c = c.copy(leftOptions = c.leftOptions + kv(v)); t
        case "--right-option" :: v :: t => c = c.copy(rightOptions = c.rightOptions + kv(v)); t
        case "--output-option" :: v :: t => c = c.copy(outputOptions = c.outputOptions + kv(v)); t
        case "--hive" :: t => c = c.copy(hive = true); t
        case "--output-hive" :: t => c = c.copy(outputHive = true); t
        case "--save-mode" :: v :: t =>
          c = c.copy(saveMode = v.toLowerCase match {
            case "append" => SaveMode.Append
            case "overwrite" => SaveMode.Overwrite
            case "ignore" => SaveMode.Ignore
            case _ => SaveMode.ErrorIfExists
          }); t
        case "--id" :: v :: t => c = c.copy(ids = c.ids :+ v); t
        case "--ignore" :: v :: t => c = c.copy(ignore = c.ignore :+ v); t
        case "--filter" :: v :: t => c = c.copy(filter = c.filter :+ v); t
        case "--statistics" :: t => c = c.copy(statistics = true); t
        case "--diff-column" :: v :: t => c = c.copy(options = c.options.withDiffColumn(v)); t
        case "--left-prefix" :: v :: t => c = c.copy(options = c.options.withLeftColumnPrefix(v)); t
        case "--right-prefix" :: v :: t => c = c.copy(options = c.options.withRightColumnPrefix(v)); t
        case "--insert-value" :: v :: t => c = c.copy(options = c.options.withInsertDiffValue(v)); t
        case "--change-value" :: v :: t => c = c.copy(options = c.options.withChangeDiffValue(v)); t
        case "--delete-value" :: v :: t => c = c.copy(options = c.options.withDeleteDiffValue(v)); t
        case "--nochange-value" :: v :: t => c = c.copy(options = c.options.withNochangeDiffValue(v)); t
        case "--change-column" :: v :: t => c = c.copy(options = c.options.withChangeColumn(v)); t
        case "--mode" :: v :: t =>
          val mode = DiffMode.withNameOption(v).getOrElse(
            throw new IllegalArgumentException(s"Unknown diff mode: $v"))
          c = c.copy(options = c.options.withDiffMode(mode)); t
        case "--sparse" :: t => c = c.copy(options = c.options.withSparseMode(true)); t
        case ("--help" | "-h") :: _ => throw new IllegalArgumentException(usage)
        case a :: t if a.startsWith("--") => throw new IllegalArgumentException(s"Unknown option: $a\n$usage")
        case a :: t => positional = positional :+ a; t
        case Nil => Nil
      }
    }
    require(positional.length == 3, s"Expected <left> <right> <output>, got: ${positional.mkString(" ")}\n$usage")
    c.copy(left = positional(0), right = positional(1), output = positional(2))
  }

  private def read(spark: SparkSession, path: String, format: String,
                   schema: Option[String], options: Map[String, String], hive: Boolean): DataFrame =
    if (hive) spark.table(path)
    else spark.read.format(format).options(options)
      .when(schema.isDefined).call(_.schema(schema.get))
      .load(path)

  def run(spark: SparkSession, c: Config): Unit = {
    val left = read(spark, c.left, c.leftFormat.getOrElse(c.format), c.leftSchema, c.leftOptions, c.hive)
    val right = read(spark, c.right, c.rightFormat.getOrElse(c.format), c.rightSchema, c.rightOptions, c.hive)

    val diffed = new Differ(c.options).diff(left, right, c.ids, c.ignore)
      .when(c.filter.nonEmpty).call(_.where(col(c.options.diffColumn).isInCollection(c.filter)))
      .when(c.statistics).call(_.groupBy(col(c.options.diffColumn)).count().orderBy(col(c.options.diffColumn)))

    val writer = diffed.write
      .format(c.outputFormat.getOrElse(c.format))
      .options(c.outputOptions)
      .mode(c.saveMode)
    if (c.outputHive) writer.saveAsTable(c.output) else writer.save(c.output)
  }

  def main(args: Array[String]): Unit = {
    val config = parse(args.toSeq)
    val spark = SparkSession.builder()
      .appName("graft-diff-app")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    try run(spark, config) finally spark.stop()
  }
}
