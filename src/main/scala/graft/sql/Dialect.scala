package graft.sql

import graft.core.{DDF, DDFManager}
import org.apache.spark.sql.types._

/** Front-end for the reference's SQL dialect (reference: flink
  * SqlSupport.scala grammar; SqlHandler.scala:29-31 dispatch). Three
  * statement forms:
  *
  *   CREATE TABLE t (col type, …)            — empty schema-only DDF
  *   LOAD '<path>' [DELIMITED BY '<c>'] [WITH NULL '<s>']
  *        [WITH EMPTY '<s>'] [NO DEFAULTS] INTO t
  *   SELECT …                                — any Spark-SQL SELECT
  *
  * Design stance (SURVEY §4.3): no hand-rolled expression grammar — the
  * reference's whole parse→validate→plan pipeline (SqlHandler.scala:64-104)
  * collapses into `spark.sql`, which gives correct AND/OR precedence
  * (the reference left-folds without precedence, SqlSupport.scala:372-387 —
  * a bug we deliberately do not reproduce, SURVEY §7.1), subqueries,
  * HAVING, DISTINCT and the full function library as a superset.
  */
object Dialect {

  private val CreateRe =
    """(?is)\s*create\s+table\s+(\w+)\s*\((.*)\)\s*;?\s*""".r
  private val LoadRe =
    ("""(?is)\s*load\s+'([^']+)'""" +
      """(?:\s+delimited\s+by\s+'([^']*)')?""" +
      """(?:\s+with\s+null\s+'([^']*)')?""" +
      """(?:\s+with\s+empty\s+'([^']*)')?""" +
      """(?:\s+with\s+timestamp\s+format\s+'([^']*)')?""" +
      """(\s+no\s+defaults)?""" +
      """\s+into\s+(\w+)\s*;?\s*""").r

  def run(manager: DDFManager, command: String): DDF = command match {
    case CreateRe(name, colsSpec) =>
      manager.createTable(name, parseSchema(colsSpec))
    case LoadRe(path, delim, nullStr, emptyStr, tsFmt, noDefaults, table) =>
      load(manager, path, Option(delim), Option(nullStr), Option(emptyStr),
        Option(tsFmt), noDefaults != null, table)
    case select =>
      manager.register(manager.spark.sql(select))
  }

  /** DDL column types accepted by the reference grammar
    * (SqlSupport.scala:212-213). BIGINT maps to a true LongType — the
    * reference collapsed it to Double (Column2RowTypeInfo.scala:29), a
    * quirk we fix (SURVEY §1.3).
    */
  def sqlType(t: String): DataType = t.trim.toLowerCase match {
    case "varchar" | "string"        => StringType
    case "int" | "integer"           => IntegerType
    case "long" | "bigint"           => LongType
    case "float"                     => FloatType
    case "double"                    => DoubleType
    case "date"                      => DateType
    case "timestamp"                 => TimestampType
    case "boolean" | "bool"          => BooleanType
    case other => throw new IllegalArgumentException(s"Unsupported column type '$other'")
  }

  def parseSchema(colsSpec: String): StructType =
    StructType(colsSpec.split(",").toIndexedSeq.map { c =>
      val parts = c.trim.split("\\s+", 2)
      require(parts.length == 2, s"Bad column spec '$c'")
      StructField(parts(0), sqlType(parts(1)))
    })

  /** Per-type fill defaults used when a LOAD runs without NO DEFAULTS
    * (reference: RepresentationHandler.scala:115-137 substitutes typed
    * defaults for unparseable/null cells).
    */
  private def defaultFor(dt: DataType): Option[Any] = dt match {
    case IntegerType | LongType   => Some(0L)
    case FloatType | DoubleType   => Some(0.0)
    case BooleanType              => Some(false)
    case StringType               => Some("")
    case _                        => None // timestamps/dates stay null
  }

  /** Cell semantics are reference-exact (RepresentationHandler.scala:
    * 115-137 `parser`): STRING columns take the raw cell VERBATIM (an
    * empty cell is "" — never null, never the null string); other types
    * null-match against the null/empty strings then parse, yielding null
    * (NO DEFAULTS) or a typed default on failure. Implemented by reading
    * every column as a raw string and projecting per-column `try_cast`s —
    * one codegen'd projection, no row-level parser.
    */
  private def load(
      manager: DDFManager,
      path: String,
      delim: Option[String],
      nullStr: Option[String],
      emptyStr: Option[String],
      tsFmt: Option[String],
      noDefaults: Boolean,
      table: String
  ): DDF = {
    import org.apache.spark.sql.functions._
    val target = manager.getDDFByName(table)
    val rawSchema = StructType(target.schema.fields.map(f => StructField(f.name, StringType)))
    val raw = manager.spark.read
      .schema(rawSchema)
      .option("sep", delim.getOrElse(","))
      // "" is Spark's DEFAULT nullValue — empty cells arrive as NULL
      // and the per-column semantics below repair them (string columns
      // coalesce back to ""; other types take the null branch). Pinned
      // explicitly so a Spark default change can't alter LOAD semantics.
      .option("nullValue", "")
      .csv(path)
    val nullLit = nullStr.getOrElse("NA")
    val cols = target.schema.fields.map { f =>
      val c = col(f.name)
      f.dataType match {
        case StringType => coalesce(c, lit("")).as(f.name)
        case dt =>
          // the emptyStr comparison only matters under an explicit WITH
          // EMPTY sentinel: without one, empty cells are already NULL at
          // read time and the isNull branch catches them
          val emptyCond = emptyStr.map(e => c === e).getOrElse(lit(false))
          val cleaned = when(c === nullLit || emptyCond || c.isNull, lit(null))
            .otherwise(trim(c))
          val parsed = dt match {
            // WITH TIMESTAMP FORMAT '<fmt>' overrides; otherwise try the
            // pinned reference format, then Spark's generic parse — the
            // reference used default-locale SimpleDateFormat()
            // (RepresentationHandler.scala:132), so a non-pinned format
            // should degrade to a best-effort parse, not a silent null
            case TimestampType => tsFmt match {
              case Some(f) => try_to_timestamp(cleaned, lit(f))
              case None => coalesce(
                try_to_timestamp(cleaned, lit("yyyy-MM-dd HH:mm:ss")),
                cleaned.try_cast(TimestampType))
            }
            case DateType      => cleaned.try_cast(DateType)
            case other         => cleaned.try_cast(other)
          }
          val withDefault =
            if (noDefaults) parsed
            else defaultFor(dt).map(d => coalesce(parsed, lit(d).cast(dt))).getOrElse(parsed)
          withDefault.as(f.name)
      }
    }
    val typed = raw.select(cols.toIndexedSeq: _*)
    manager.register(typed, table)
  }
}
