package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Factor (R-style categorical) metadata for a column: ordered distinct
  * levels and their counts. Mirrors the reference's mutable column
  * classing (reference: flink/src/main/scala/io/ddf/flink/content/
  * SchemaHandler.scala:17-75) but stored as a sidecar map on the DDF
  * wrapper instead of a handler-graph — a plain `DataFrame` is the single
  * physical representation here.
  */
final case class FactorInfo(levels: Seq[String], counts: Map[String, Long])

/** A named, schema'd distributed table — the reference's DDF abstraction
  * (reference: flink/src/main/java/io/ddf/flink/FlinkDDF.java:10)
  * rebuilt as a thin wrapper over a Spark `DataFrame`.
  *
  * All compute delegates to operator modules in `graft.operators` /
  * `graft.stats`; this class only carries identity (name), the frame, and
  * the one genuinely stateful part of the reference: factor metadata and
  * the 2-step groupBy column stash (reference: AggregationHandler.scala:
  * 203-226).
  */
final class DDF(
    val manager: DDFManager,
    @volatile private var _df: DataFrame,
    @volatile private var _name: String
) {
  private val factors = TrieMap.empty[String, FactorInfo]
  /** Grouping columns stashed by the 2-step groupBy flow (SURVEY A6). */
  @volatile var pendingGroupCols: Seq[String] = Nil
  @volatile var isMutable: Boolean = false

  def df: DataFrame = _df
  def name: String = _name
  def spark: SparkSession = manager.spark

  def schema = _df.schema
  def columnNames: Seq[String] = _df.columns.toSeq
  def numColumns: Int = _df.columns.length
  def numRows: Long = _df.count()

  /** Re-register under a new name (reference: FlinkDDFManager.scala:112-115). */
  def setName(newName: String): this.type = {
    manager.rename(_name, newName)
    _name = newName
    _df.createOrReplaceTempView(newName)
    this
  }

  /** In-place update when mutable, else produce a fresh registered DDF
    * (reference: core MutabilityHandler semantics, DemoSpec.scala:48-51).
    */
  private[graft] def updateOrDerive(newDf: DataFrame): DDF =
    if (isMutable) {
      _df = newDf
      newDf.createOrReplaceTempView(_name)
      this
    } else manager.register(newDf)

  /** Always derive a new registered DDF regardless of mutability. */
  private[graft] def derive(newDf: DataFrame): DDF = manager.register(newDf)

  // ---- factor metadata (SURVEY §2.5 T9 / §1.4) ----
  def setAsFactor(col: String): Unit = {
    val rows = _df.groupBy(col).count().collect()
    val counts = rows.map(r => Option(r.get(0)).map(_.toString).getOrElse("null") -> r.getLong(1)).toMap
    factors.put(col, FactorInfo(counts.keys.toSeq.sorted, counts))
  }
  def setFactorInfo(col: String, info: FactorInfo): Unit = factors.put(col, info)
  def factorInfo(col: String): Option[FactorInfo] = factors.get(col)
  def factorColumns: Seq[String] = factors.keys.toSeq.sorted
  def isFactor(col: String): Boolean = factors.contains(col)

  /** Duplicate the DDF including factor metadata
    * (reference: FlinkDDF.java:21-27 — `select * from name` + metadata copy).
    */
  def copy(): DDF = {
    val out = manager.register(_df.select(col("*")))
    factors.foreach { case (c, fi) => out.setFactorInfo(c, fi) }
    out
  }

  /** Tab-joined string rows (reference: SqlHandler.scala:243-246). */
  def collectStrings(): Seq[String] =
    _df.collect().toSeq.map(rowToTabString)

  private def rowToTabString(r: Row): String =
    (0 until r.length).map(i => Option(r.get(i)).map(_.toString).getOrElse("null")).mkString("\t")
}
