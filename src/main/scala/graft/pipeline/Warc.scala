package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record extraction — the step BEFORE
  * [[HtmlExtract]]: public web-crawl corpora (Common Crawl and its
  * descendants) arrive as WARC files, each a concatenation of records
  * (`WARC/1.0` + named headers + blank line + block), where a
  * `response` record's block is an HTTP response whose body is the
  * HTML everything downstream wants. The reference engine predates
  * this use case (no comparable surface in `/root/reference/flink`).
  *
  * Same design discipline as [[HtmlExtract]]: pure per-row expression
  * chains (split + posexplode + anchored regex extracts), evaluated
  * scan-local under whole-stage codegen — zero shuffles, zero UDFs,
  * safe over 100 TB of crawl shards. And the same honesty about
  * format edge cases: this is a TEXT contract over well-formed
  * records — a `WARC/1.0\r\n` sequence inside a payload would split a
  * record early (real WARC prevents this via Content-Length, which a
  * streaming text splitter deliberately does not depend on; the
  * failure mode is a mis-split record, never a crash). Gzip'd WARCs
  * must be decompressed upstream (the storage layer's job).
  */
object Warc {

  private def hdr(rec: Column, name: String): Column = {
    val v = regexp_extract(rec, s"(?im)^$name:[ \\t]*([^\\r\\n]*)", 1)
    when(trim(v) === "", lit(null).cast("string")).otherwise(trim(v))
  }

  /** Explode each WARC FILE (one text value per row) into its records:
    * output `(<idCol>, rec_no, warc_type, target_uri, content_type,
    * block)` with `rec_no` the record's 0-based position in the file,
    * header names matched case-insensitively and values trimmed
    * (missing → NULL), and `block` the record's content block with the
    * inter-record CRLF padding stripped.
    *
    * `rec_no` derives from the split position directly (everything
    * before the first `WARC/1.0` marker — normally the empty string —
    * is discarded as non-record preamble), so the explode stays in its
    * scan partition: no window, no shuffle.
    */
  def records(df: DataFrame, fileCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(coalesce(col(fileCol), lit("")), "WARC/1\\.0\\r\\n"))
          .as(Seq("__p", "rec")))
      .filter(col("__p") >= 1)
      .select(col(idCol), (col("__p") - 1).cast("long").as("rec_no"),
        hdr(col("rec"), "WARC-Type").as("warc_type"),
        hdr(col("rec"), "WARC-Target-URI").as("target_uri"),
        hdr(col("rec"), "Content-Type").as("content_type"),
        regexp_replace(
          regexp_replace(col("rec"), "(?s)^.*?\\r\\n\\r\\n", ""),
          "(\\r\\n)+$", "").as("block"))

  /** The HTTP body of a response record's block: status line + headers
    * dropped at the first blank line. NULL in, NULL out.
    */
  def httpBodyCol(block: Column): Column =
    regexp_replace(block, "(?s)^.*?\\r\\n\\r\\n", "")

  /** The HTTP status code of a response record's block (the first
    * line's `HTTP/x.y NNN`); NULL when the block is not an HTTP
    * response. Feeds the 200-only WET cut and
    * [[UrlCuration.resolveRedirects]] (3xx Location edges).
    */
  def httpStatusCol(block: Column): Column = {
    val s = regexp_extract(block, "^HTTP/[0-9.]+[ \\t]+([0-9]{3})", 1)
    when(s === "", lit(null).cast("int")).otherwise(s.cast("int"))
  }

  /** A named HTTP response header's value (case-insensitive field
    * name, value trimmed, missing → NULL) — `Location` for redirect
    * edges, `Content-Type` for media routing.
    */
  def httpHeaderCol(block: Column, name: String): Column = hdr(
    regexp_extract(block, "(?s)^(.*?)\\r\\n\\r\\n", 1), name)

  /** WARC files → (id, rec_no, url, status, html) rows ready for
    * [[HtmlExtract]]: the `response` records whose HTTP Content-Type
    * is text/html, with the HTTP envelope stripped and the status code
    * kept (a WET cut filters to 200; redirect bodies are server
    * boilerplate). The (id, rec_no) pair stays unique per input row
    * even when a crawl revisits a URL.
    */
  def htmlResponses(df: DataFrame, fileCol: String, idCol: String): DataFrame =
    records(df, fileCol, idCol)
      .filter(lower(col("warc_type")) === "response" &&
        col("block").rlike("(?is)^.*?\\r\\n\\r\\n") &&
        regexp_extract(col("block"),
          "(?im)^Content-Type:[ \\t]*([^\\r\\n;]*)", 1).rlike("(?i)text/html"))
      .select(col(idCol), col("rec_no"), col("target_uri").as("url"),
        httpStatusCol(col("block")).as("status"),
        httpBodyCol(col("block")).as("html"))
}
