package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON string column) extraction.
  *
  * The reference ingests JSON only as whole-file JSONL sources
  * (mirrored by `DDFManager.loadJson`); a curation pipeline also needs
  * the other shape — a JSON STRING COLUMN riding on an otherwise
  * structured table (event properties, API payloads, model metadata).
  *
  * Scale stance: `extractJson` with an explicit schema is the
  * production path — one Jackson parse per row inside whole-stage
  * codegen, no shuffle, no inference job; unparseable rows yield NULL
  * structs (tolerant by default, count them with `isnull`). Schema
  * inference (`inferJsonSchema`) runs a separate Spark job over a
  * bounded sample and belongs at development/registration time, never
  * per-query — the inferred schema should be persisted and passed to
  * `extractJson` thereafter.
  */
object Semistructured {

  /** Parse `jsonCol` into a typed struct column `outCol` using an
    * EXPLICIT schema. Rows that fail to parse get a NULL struct.
    */
  def extractJson(df: DataFrame, jsonCol: String, schema: StructType,
                  outCol: String = "json"): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), schema))

  /** Ad-hoc JSONPath extraction (returns strings; exploration only —
    * prefer [[extractJson]] with a schema for repeated access).
    */
  def jsonPath(df: DataFrame, jsonCol: String, path: String,
               outCol: String): DataFrame =
    df.withColumn(outCol, get_json_object(col(jsonCol), path))

  /** Project dotted paths out of a struct column as top-level columns
    * (`m.et` → column `m_et`) — the step after [[extractJson]] that
    * turns a parsed payload into flat relational columns. Plain
    * `GetStructField` chains inside codegen: no shuffle, and Catalyst's
    * JSON-expression optimization prunes the UNREFERENCED parts of the
    * parse schema out of `from_json` itself (plan-pinned in ScaleSpec),
    * so extracting two fields of a 200-field payload parses two fields.
    */
  def selectPaths(df: DataFrame, structCol: String, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "selectPaths: need at least one path")
    val names = paths.map(_.replace('.', '_'))
    // dots→underscores can collide ("a.b_c" and "a_b.c" → "a_b_c"), and
    // withColumn would silently overwrite — refuse instead
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty,
      s"selectPaths: derived column names collide: ${dups.mkString(", ")}")
    val clobbered = names.filter(df.columns.contains)
    require(clobbered.isEmpty,
      s"selectPaths: derived names clobber existing columns: ${clobbered.mkString(", ")}")
    paths.zip(names).foldLeft(df) { case (d, (p, n)) =>
      d.withColumn(n, col(s"$structCol.$p"))
    }
  }

  /** Explode a (possibly nested) array path into one row per element.
    * `outer = true` keeps rows whose array is NULL/empty (element NULL)
    * — the tolerant twin, matching [[extractJson]]'s null-on-parse-fail
    * stance. Generator in codegen; row count scales with total element
    * count, never with a shuffle.
    */
  def explodeArray(df: DataFrame, arrayPath: String, outCol: String,
                   outer: Boolean = false): DataFrame =
    df.withColumn(outCol,
      if (outer) explode_outer(col(arrayPath)) else explode(col(arrayPath)))

  /** Infer the schema of a JSON string column from a bounded sample —
    * a distributed `spark.read.json` over the first `sampleN` non-null
    * values. Run once at registration time and persist the result; the
    * sample bound keeps the inference job O(sampleN) regardless of
    * table size.
    */
  def inferJsonSchema(df: DataFrame, jsonCol: String,
                      sampleN: Int = 1000): StructType = {
    require(sampleN > 0, s"sampleN must be positive, got $sampleN")
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol).cast("string").as("j"))
      .na.drop().limit(sampleN).as[String]
    spark.read.json(sample).schema
  }
}
