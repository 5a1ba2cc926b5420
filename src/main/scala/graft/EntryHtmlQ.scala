package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — HTML/markup extraction rows (ht01-ht03). Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryHtmlQ {

  val qs: Seq[Q] = Seq(
    Q("ht01_html_to_text",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticHtml.as("html"))
        pipeline.HtmlExtract.htmlToText(docs, "html", "text_extracted")
          .select("doc_id", "text_extracted")
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckHtmlRaw AS html FROM documents),
              |$duckHtmlTextCtes
              |SELECT doc_id, text_extracted FROM e ORDER BY doc_id""".stripMargin)),

    Q("ht02_link_extract",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"),
            syntheticHtml.as("html"))
        docs.select(col("doc_id"), col("src_url"),
            explode(pipeline.HtmlExtract.hrefsCol(col("html"))).as("href"))
          .withColumn("resolved",
            pipeline.HtmlExtract.resolveHrefCol(col("src_url"), col("href")))
          .orderBy("doc_id", "href")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckBaseUrlRaw AS src_url,
              |    $duckHtmlRaw AS html FROM documents),
              |$duckLinkCtes
              |SELECT doc_id, src_url, href, resolved FROM r
              |ORDER BY doc_id, href""".stripMargin)),

    Q("ht03_crawl_extract_build",
      (s, d) => {
        val m = mgr(s, d)
        // the composed front-of-pipeline build extending w03: raw HTML →
        // link extraction → resolution → canonical URL (IPv6/garbage
        // quarantined to NULL and dropped) → one key-only dedup shuffle →
        // registered domain (broadcast suffix probes) → per-domain cap of
        // the 3 most-linked canonical URLs, payload never under a window
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"),
            syntheticHtml.as("html"))
        val links = pipeline.HtmlExtract.linkExtract(docs, "html", "src_url")
        val canon = links
          .select(pipeline.UrlCuration.urlNormalizeCol(col("resolved")).as("url_norm"))
          .filter(col("url_norm").isNotNull)
          .groupBy("url_norm").agg(count(lit(1)).as("n_links"))
        val withDom = pipeline.UrlCuration.registeredDomain(
          canon.withColumn("host", pipeline.UrlCuration.hostOf(col("url_norm"))),
          "host", wSuffixes)
        Views.budgetSelectByGroup(withDom.withColumn("__cost", lit(1L)),
            "registered_domain",
            Seq(col("n_links").desc, col("url_norm").asc), "__cost",
            budgets = Map.empty, defaultBudget = 3L)
          .select("url_norm", "registered_domain", "n_links")
          .orderBy("registered_domain", "url_norm")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckBaseUrlRaw AS src_url,
              |    $duckHtmlRaw AS html FROM documents),
              |$duckLinkCtes,
              |u2 AS (SELECT resolved AS url FROM r WHERE resolved IS NOT NULL),
              |${duckUrlNormCtesFrom("u2")},
              |g AS (SELECT url_norm, count(*)::BIGINT AS n_links FROM p5
              |  WHERE url_norm IS NOT NULL GROUP BY url_norm),
              |h AS (SELECT url_norm, n_links, ${duckHostExprOf("url_norm")} AS host
              |  FROM g),
              |$duckRegDomainCtes,
              |cap AS (SELECT url_norm, registered_domain, n_links,
              |    row_number() OVER (PARTITION BY registered_domain
              |      ORDER BY n_links DESC, url_norm) AS rn
              |  FROM d3)
              |SELECT url_norm, registered_domain, n_links FROM cap WHERE rn <= 3
              |ORDER BY registered_domain, url_norm""".stripMargin))
  )
}
