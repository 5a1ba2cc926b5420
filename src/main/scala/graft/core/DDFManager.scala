package graft.core

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.collection.concurrent.TrieMap
import java.util.concurrent.atomic.AtomicLong

/** Result of `sql(...)`: rows rendered as tab-joined strings
  * (reference: flink SqlHandler.scala:217-248 `SqlResult`).
  */
final case class SqlResult(schema: StructType, rows: Seq[String])

/** The engine entry point: owns the SparkSession and the name → DDF
  * catalog (reference: FlinkDDFManager.scala:19; registry usage at
  * SqlHandler.scala:34,66,154). Unlike the reference there is no
  * handler-composition or representation graph — a `DataFrame` is the one
  * representation, and Catalyst is the optimizer.
  */
final class DDFManager(val spark: SparkSession) {

  private val registry = TrieMap.empty[String, DDF]
  private val nameSeq = new AtomicLong(0)

  /** Generated names follow the reference's `tbl<suffix>` convention
    * (reference: AggregationHandler.scala:87-88) but are sequential, not
    * random — deterministic runs matter more than opacity.
    */
  def freshName(): String = s"tbl_${nameSeq.incrementAndGet()}"

  def register(df: DataFrame, name: String = null): DDF = {
    val n = Option(name).getOrElse(freshName())
    val ddf = new DDF(this, df, n)
    df.createOrReplaceTempView(n)
    registry.put(n, ddf)
    ddf
  }

  private[core] def rename(oldName: String, newName: String): Unit =
    registry.remove(oldName).foreach(d => registry.put(newName, d))

  def getDDFByName(name: String): DDF =
    registry.getOrElse(name, throw new IllegalArgumentException(s"No DDF named '$name'"))
  def getOrNull(name: String): DDF = registry.get(name).orNull
  def listDDFs(): Seq[String] = registry.keys.toSeq.sorted
  def removeDDF(name: String): Unit = {
    registry.remove(name)
    spark.catalog.dropTempView(name)
  }

  // ---- SQL front-door (dialect: CREATE / LOAD / SELECT, @this) ----

  /** Execute a dialect statement, returning tab-joined string rows
    * (reference: SqlHandler.scala:217-248).
    */
  def sql(command: String): SqlResult = {
    val ddf = sql2ddf(command)
    SqlResult(ddf.schema, ddf.collectStrings())
  }

  /** Execute a dialect statement, returning a registered DDF
    * (reference: SqlHandler.scala:64-104).
    */
  def sql2ddf(command: String): DDF = graft.sql.Dialect.run(this, command)

  /** `@this` substitution for DDF-scoped SQL (reference: ddf-core
    * TableNameReplacer, wired at SqlHandler.scala:169-175).
    */
  def sql2ddf(command: String, self: DDF): DDF =
    sql2ddf(command.replace("@this", self.name))
  def sql(command: String, self: DDF): SqlResult =
    sql(command.replace("@this", self.name))

  // ---- ingestion ----

  /** Read a delimited text file, inferring the schema from a 5-row sample
    * and auto-naming columns V1..Vn (reference: FlinkDDFManager.scala:
    * 30-92; inference regexes utils/Utils.java:97-150). Spark-first: the
    * sampling + per-column vote is delegated to Spark's CSV reader; the
    * V1..Vn naming and all-null→string defaulting match the reference.
    */
  def loadFile(path: String, sep: String = ","): DDF = {
    val inferred = spark.read
      .option("sep", sep)
      .option("inferSchema", "true")
      .option("nullValue", "NA")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)
    val renamed = inferred.toDF(inferred.columns.indices.map(i => s"V${i + 1}"): _*)
    register(renamed)
  }

  /** Read a parquet table and register it under `name`. */
  def loadParquet(path: String, name: String): DDF =
    register(spark.read.parquet(path), name)

  /** Declared-schema empty table (reference: SqlHandler.scala:54-61). */
  def createTable(name: String, schema: StructType): DDF =
    register(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema), name)

  // ---- persistence (SURVEY S4) ----

  /** Persist a DDF as parquet under a runtime dir; returns the path. */
  def persist(ddf: DDF, rootDir: String): String = {
    val path = s"$rootDir/${ddf.name}"
    ddf.df.write.mode("overwrite").parquet(path)
    path
  }
  def unpersist(path: String, name: String): DDF = loadParquet(path, name)
}

object DDFManager {
  /** Build a scale-ready local session: AQE on, 32 shuffle partitions for
    * local[32] (the cluster deployment overrides via spark-submit conf).
    */
  def localSession(cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def apply(spark: SparkSession): DDFManager = new DDFManager(spark)
}
