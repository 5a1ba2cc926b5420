package graft

import graft.pipeline.Warc
import org.apache.spark.sql.functions._

/** WARC record extraction (r17): record splitting, header
  * case-insensitivity, block/HTTP-body boundaries, the loud failure
  * modes, and the scan-local plan shape.
  */
class WarcSpec extends SparkTestBase {
  private val crlf = "\r\n"
  private def rec(headers: Seq[(String, String)], block: String): String =
    "WARC/1.0" + crlf +
      headers.map { case (k, v) => s"$k: $v" }.mkString("", crlf, crlf) +
      crlf + block + crlf + crlf

  test("records: split, 0-based rec_no, case-folded header names, NULL absences") {
    import spark.implicits._
    val file =
      rec(Seq("WARC-Type" -> "warcinfo", "Content-Type" -> "application/warc-fields"),
        "software: test") +
      rec(Seq("warc-type" -> "response", "WARC-Target-URI" -> "https://h/p"),
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html$crlf$crlf<p>b</p>")
    val out = Warc.records(Seq((1L, file)).toDF("id", "warc"), "warc", "id")
      .orderBy("rec_no").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("rec_no") == 0L &&
      out(0).getAs[String]("warc_type") == "warcinfo" &&
      out(0).getAs[String]("target_uri") == null &&
      out(0).getAs[String]("block") == "software: test")
    assert(out(1).getAs[String]("warc_type") == "response" &&
      out(1).getAs[String]("target_uri") == "https://h/p")
    assert(out(1).getAs[String]("block").endsWith("<p>b</p>"))
  }

  test("htmlResponses: only text/html responses; HTTP envelope stripped; preamble dropped") {
    import spark.implicits._
    val file = "garbage preamble\r\n" + // non-record junk before the first marker
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://h/a"),
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html; charset=utf-8$crlf$crlf<html>A</html>") +
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://h/b"),
        s"HTTP/1.1 200 OK${crlf}Content-Type: application/pdf$crlf$crlf%PDF") +
      rec(Seq("WARC-Type" -> "request", "WARC-Target-URI" -> "https://h/a"),
        s"GET /a HTTP/1.1$crlf$crlf")
    val out = Warc.htmlResponses(Seq((7L, file)).toDF("id", "warc"), "warc", "id")
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("url") == "https://h/a")
    assert(out(0).getAs[String]("html") == "<html>A</html>")
    assert(out(0).getAs[Long]("rec_no") == 0L) // preamble is not a record
  }

  test("loud failure: a block without a blank line keeps everything as block") {
    import spark.implicits._
    val file = "WARC/1.0" + crlf + "WARC-Type: metadata" + crlf + "no blank line here"
    val out = Warc.records(Seq((1L, file)).toDF("id", "warc"), "warc", "id").collect()
    assert(out.length == 1)
    // header strip found no \r\n\r\n -> the record text survives as block
    assert(out(0).getAs[String]("block").contains("no blank line here"))
  }

  test("httpStatusCol/httpHeaderCol: status line, header values, non-HTTP NULLs (r17)") {
    import spark.implicits._
    val blocks = Seq(
      s"HTTP/1.1 301 Moved Permanently${crlf}Location: /new${crlf}Content-Type: text/html$crlf$crlf<p>moved</p>",
      s"HTTP/2 404 Not Found$crlf$crlf<p>nope</p>",
      "software: test") // warcinfo block — not an HTTP response
      .zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "block")
    val out = blocks.select(col("id"),
        Warc.httpStatusCol(col("block")).as("status"),
        Warc.httpHeaderCol(col("block"), "location").as("loc"))
      .orderBy("id").collect()
    assert(out(0).getAs[Int]("status") == 301 &&
      out(0).getAs[String]("loc") == "/new")
    assert(out(1).getAs[Int]("status") == 404 &&
      out(1).getAs[String]("loc") == null)
    assert(out(2).isNullAt(1) && out(2).getAs[String]("loc") == null)
  }

  test("htmlResponses: carries the HTTP status (r17 — the WET 200-cut key)") {
    import spark.implicits._
    val file =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://h/ok"),
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html$crlf$crlf<p>ok</p>") +
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://h/gone"),
        s"HTTP/1.1 404 Not Found${crlf}Content-Type: text/html$crlf$crlf<p>404 page</p>")
    val out = Warc.htmlResponses(Seq((1L, file)).toDF("id", "warc"), "warc", "id")
      .orderBy("rec_no").collect()
    assert(out.length == 2) // content-type routing unchanged: both are html
    assert(out(0).getAs[Int]("status") == 200 &&
      out(1).getAs[Int]("status") == 404)
    assert(out(0).getAs[String]("html") == "<p>ok</p>")
  }

  test("plan: the explode is scan-local — no Exchange, no Window") {
    import spark.implicits._
    val df = spark.range(100).select(col("id"),
      concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://h/"),
        col("id").cast("string"),
        lit("\r\nContent-Type: application/http\r\n\r\nHTTP/1.1 200 OK\r\n" +
          "Content-Type: text/html\r\n\r\n<p>x</p>\r\n\r\n")).as("warc"))
    val out = Warc.htmlResponses(df, "warc", "id")
    assert(out.count() == 100)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"WARC extraction must stay in its scan partition:\n$plan")
  }
}
