package graft

import graft.core.DDFManager
import graft.operators._
import graft.stats.Stats
import java.nio.file.{Files, Paths}

/** End-to-end chain in the reference's DemoSpec style (reference:
  * flink/src/test/scala/io/ddf/flink/DemoSpec.scala:12-63):
  * create → load → project → sql-filter → groupBy → top → summary →
  * fiveNum → binning → scale → dropNA → kmeans → rename.
  */
class DialectSpec extends SparkTestBase {

  private def fixtureCsv: String = {
    val dir = Files.createDirectories(Paths.get("target/test-fixtures"))
    val p = dir.resolve("airline_like.csv")
    val rng = new scala.util.Random(7)
    val rows = (1 to 60).map { i =>
      val year = 2008 + (i % 3)
      val month = 1 + (i % 12)
      val delay = if (i % 10 == 0) "NA" else (rng.nextInt(120) - 20).toString
      val dist = 100 + rng.nextInt(2000)
      s"$year,$month,$delay,$dist"
    }
    Files.writeString(p, rows.mkString("\n"))
    p.toAbsolutePath.toString
  }

  test("demo chain: create→load→sql→groupBy→top→summary→binning→scale→dropNA→rename") {
    val m = DDFManager(spark)
    m.sql2ddf("create table flights (year int, month int, delay int, distance int)")
    val ddf = m.sql2ddf(s"load '$fixtureCsv' no defaults into flights")
    assert(ddf.numRows == 60)

    // SQL over the catalog name and @this
    val filtered = m.sql2ddf("select year, month, delay, distance from flights where distance > 500")
    assert(filtered.numRows > 0 && filtered.numColumns == 4)

    val grouped = Aggregations.groupBy(ddf, Seq("year"), Seq("n=count(*)", "avg_delay=avg(delay)"))
    assert(grouped.numRows == 3)

    val top2 = Views.top(grouped, 2, "n", ascending = false)
    assert(top2.numRows == 2)

    val summ = Stats.summary(m.sql2ddf("select delay, distance from @this", ddf))
    val delaySumm = summ.find(_.column == "delay").get
    assert(delaySumm.naCount == 6 && delaySumm.count == 54)

    val fn = Stats.fiveNum(ddf, "distance", exact = true)
    assert(fn.min >= 100 && fn.max <= 2100 && fn.q1 <= fn.median && fn.median <= fn.q3)

    val binned = Binning.binningEqualFreq(ddf.copy(), "distance", 3,
      includeLowest = true, exact = true)
    assert(binned.factorInfo("distance").get.levels.size == 3)

    val scaled = Transforms.scaleMinMax(ddf.copy(), Seq("distance"))
    val mx = scaled.df.agg(org.apache.spark.sql.functions.max("distance")).first().getDouble(0)
    assert(mx == 1.0)

    val clean = MissingData.dropNARows(ddf.copy(), how = "any")
    assert(clean.numRows == 54)

    clean.setName("flights_clean")
    assert(m.getDDFByName("flights_clean").numRows == 54)
  }

  test("scalar function surface: substr 2-arg to end, cast, abs (reference §2.9)") {
    val m = DDFManager(spark)
    import spark.implicits._
    m.register(Seq(("hello world", -5, "123")).toDF("s", "i", "n"), "scalar_t")
    val r = m.sql("select substring(s, 7) as tail, abs(i) as ai, cast(n as int) as ni from scalar_t")
    assert(r.rows.head == "world\t5\t123")
  }

  test("sql limit and order by (reference O1/O2)") {
    val m = DDFManager(spark)
    import spark.implicits._
    m.register((1 to 20).map(i => (i, 20 - i)).toDF("a", "b"), "lim_t")
    val r = m.sql2ddf("select a, b from lim_t order by b desc limit 3")
    assert(r.df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("LOAD timestamp: pinned format, generic fallback, WITH TIMESTAMP FORMAT") {
    val m = DDFManager(spark)
    val dir = Files.createDirectories(Paths.get("target/test-fixtures"))
    val p = dir.resolve("ts_load.csv")
    // row 1: pinned reference format; row 2: ISO-8601 'T' (generic parse
    // fallback); row 3: custom format only WITH TIMESTAMP FORMAT can read
    Files.writeString(p,
      "1,2020-01-02 03:04:05\n2,2020-01-02T03:04:06\n3,02/01/2020 03:04\n")
    m.sql2ddf("create table ts_t (id int, ts timestamp)")
    val d1 = m.sql2ddf(s"load '${p.toAbsolutePath}' no defaults into ts_t")
    val parsed = d1.df.orderBy("id").collect().map(r => r.isNullAt(1))
    assert(parsed.toSeq == Seq(false, false, true)) // custom format nulls without override
    m.sql2ddf("create table ts_t2 (id int, ts timestamp)")
    val d2 = m.sql2ddf(
      s"load '${p.toAbsolutePath}' with timestamp format 'dd/MM/yyyy HH:mm' no defaults into ts_t2")
    val p2 = d2.df.orderBy("id").collect().map(r => r.isNullAt(1))
    assert(p2.toSeq == Seq(true, true, false)) // only the custom-format row parses
  }

  test("aggregateOnColumn golden (reference AggregationHandlerSpec: max == 2010)") {
    val m = DDFManager(spark)
    m.sql2ddf("create table years (V1 int)")
    import spark.implicits._
    val ddf = m.register(Seq(2008, 2009, 2010, 2008).toDF("V1"), "years")
    assert(Aggregations.aggregateOnColumn(ddf, "max", "V1").asInstanceOf[Int] == 2010)
  }

  test("SQL CUBE / GROUPING SETS pass through the dialect to Spark SQL") {
    import spark.implicits._
    val m = DDFManager(spark)
    m.register(Seq(("x", "p", 1L), ("x", "q", 2L), ("y", "p", 3L))
      .toDF("a", "b", "v"), "cube_sql_t")
    val c = m.sql2ddf(
      "SELECT a, b, count(*) AS n FROM cube_sql_t GROUP BY CUBE (a, b)")
    assert(c.numRows == 8, "3 leaves + 2 + 2 subtotals + grand total")
    val g = m.sql2ddf(
      "SELECT a, sum(v) AS s FROM cube_sql_t GROUP BY GROUPING SETS ((a), ())")
    assert(g.numRows == 3)
  }

  test("SQL HAVING and ntile/percent_rank windows pass through the dialect") {
    import spark.implicits._
    val m = DDFManager(spark)
    m.register(Seq(("x", 1), ("x", 2), ("y", 3), ("y", 4), ("y", 5), ("z", 6))
      .toDF("g", "v"), "having_t")
    val h = m.sql2ddf(
      "SELECT g, count(*) AS n FROM having_t GROUP BY g HAVING count(*) >= 2")
    assert(h.df.collect().map(_.getString(0)).toSet == Set("x", "y"))
    val w = m.sql2ddf(
      """SELECT g, v, ntile(2) OVER (ORDER BY v) AS bucket,
        |  percent_rank() OVER (ORDER BY v) AS pr
        |FROM having_t""".stripMargin)
    val rows = w.df.orderBy("v").collect()
    assert(rows.head.getInt(2) == 1 && rows.last.getInt(2) == 2)
    assert(rows.head.getDouble(3) == 0.0 && rows.last.getDouble(3) == 1.0)
  }
}
