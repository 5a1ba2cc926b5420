package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — HTML/markup extraction rows (ht01-ht08). Split from SparkEntry.scala by family
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
        // r17 planted rows (verdict ask #3): eight docs exercising the
        // RFC 3986 seams the organic corpus lacks — `../`/`./` hrefs,
        // a RELATIVE `<base href>` that itself needs dot removal, a
        // query-only href, an absolute href with dot segments, and a
        // data-href decoy the [\s"'] boundary must NOT extract
        val planted = m.getDDFByName("documents").df.filter(col("doc_id") < 8)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(lit("https://plant-"), (col("doc_id") % 4).cast("string"),
              lit(".example.com/a/b/c.html?s=2")).as("src_url"),
            concat(lit("<html><head>"),
              when(col("doc_id") % 2 === 0, lit("<base href=\"../up/\">"))
                .otherwise(lit("")),
              lit("</head><body><a href=\"../x/"),
              (col("doc_id") % 3).cast("string"),
              lit("\">u</a><a href=\"./same/p\">s</a><a href=\"?only=1\">q</a>"),
              lit("<a data-href=\"/decoy\">d</a><a href=\"/abs/../z\">z</a>"),
              lit("<a href=\"https://ext.example.org/p/../q/./r\">e</a>"),
              lit("</body></html>")).as("html"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"),
            syntheticHtml.as("html"))
          .unionByName(planted)
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
              |    $duckHtmlRaw AS html FROM documents
              |  UNION ALL
              |  SELECT doc_id + 2000000 AS doc_id,
              |    'https://plant-' || (doc_id % 4)::VARCHAR ||
              |      '.example.com/a/b/c.html?s=2' AS src_url,
              |    '<html><head>' ||
              |      CASE WHEN doc_id % 2 = 0 THEN '<base href="../up/">'
              |        ELSE '' END ||
              |      '</head><body><a href="../x/' || (doc_id % 3)::VARCHAR ||
              |      '">u</a><a href="./same/p">s</a><a href="?only=1">q</a>' ||
              |      '<a data-href="/decoy">d</a><a href="/abs/../z">z</a>' ||
              |      '<a href="https://ext.example.org/p/../q/./r">e</a>' ||
              |      '</body></html>' AS html
              |  FROM documents WHERE doc_id < 8),
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
              |ORDER BY registered_domain, url_norm""".stripMargin)),

    Q("ht04_html_metadata",
      (s, d) => {
        val m = mgr(s, d)
        // head-metadata extraction (r16): title, meta description, the
        // page's self-declared canonical target, and the canonical-aware
        // dedup key — rel=canonical resolved against the fetched URL
        // (falling back to it), then canonicalized by urlNormalize. The
        // key collapses session/tracking variants the URL normalizer
        // alone cannot see; all four columns are pure expression chains.
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"),
            syntheticHtmlMeta.as("html"))
        docs.select(col("doc_id"),
            pipeline.HtmlExtract.titleOf(col("html")).as("title"),
            pipeline.HtmlExtract.metaContent(col("html"), "description")
              .as("meta_description"),
            pipeline.HtmlExtract.canonicalHref(col("html")).as("canonical_href"),
            pipeline.UrlCuration.urlNormalizeCol(
              pipeline.HtmlExtract.canonicalizedUrl(col("src_url"), col("html")))
              .as("dedup_key"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u0 AS (SELECT doc_id, $duckBaseUrlRaw AS src_url,
              |    $duckHtmlMetaRaw AS html FROM documents),
              |m AS (SELECT doc_id, src_url,
              |    $duckTitleExpr AS title,
              |    ${duckAttrExpr("meta", "name", "description", "content")}
              |      AS meta_description,
              |    ${duckAttrExpr("link", "rel", "canonical", "href")}
              |      AS canonical_href
              |  FROM u0),
              |rb AS (SELECT *, trim(canonical_href) AS th FROM m),
              |rc AS (SELECT *, ${duckResolveCase("src_url", "th")} AS r0 FROM rb),
              |${duckRemoveDotsCtes("rc", "r0", "rr", "resolved", "cz")},
              |u2 AS (SELECT doc_id, title, meta_description, canonical_href,
              |    coalesce(resolved, src_url) AS url FROM rr),
              |${duckUrlNormCtesFrom("u2")}
              |SELECT doc_id, title, meta_description, canonical_href,
              |  url_norm AS dedup_key
              |FROM p5 ORDER BY doc_id""".stripMargin)),

    Q("ht05_frontier_expand",
      (s, d) => {
        val m = mgr(s, d)
        // the crawl loop's expansion step: extract outlinks from the
        // crawled pages, canonicalize, and anti-join against the crawled
        // set's canonical keys — only genuinely NEW urls enter the
        // frontier. Each doc links one already-crawled page (doc id+1's
        // base URL — provably crawled, the base is a function of id%15)
        // and one novel URL, so the anti-join must remove exactly half
        // the candidate volume. Scale shape: one key-only groupBy on
        // the canonical URL + one anti-join on the same key; payloads
        // never shuffle.
        val id = col("doc_id")
        // r17: id%7==3 docs declare a <base href> (their relative links
        // re-root), id%5==2 docs emit a `../` link — both seams
        // oracle-pinned through the same anti-join
        val html = concat(
          lit("<html><head>"),
          when(id % 7 === 3, concat(lit("<base href=\"https://rebase-"),
            (id % 6).cast("string"), lit(".example.org/d/e/\">")))
            .otherwise(lit("")),
          lit("</head><body><a href=\""), baseUrlOf(id + 1),
          lit("\">k</a><a href=\"https://new-"), (id % 50).cast("string"),
          lit(".example.org/n/"), (id % 7).cast("string"),
          lit("?utm_source=x&id="), (id % 11).cast("string"),
          lit("\">n</a>"),
          when(id % 5 === 2, concat(lit("<a href=\"../up/"),
            (id % 9).cast("string"), lit("\">r</a>"))).otherwise(lit("")),
          lit("</body></html>"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"), html.as("html"))
        val links = pipeline.HtmlExtract.linkExtract(docs, "html", "src_url")
        val cand = links
          .select(pipeline.UrlCuration.urlNormalizeCol(col("resolved")).as("url_norm"))
          .filter(col("url_norm").isNotNull)
          .groupBy("url_norm").agg(count(lit(1)).as("n_refs"))
        val crawled = docs
          .select(pipeline.UrlCuration.urlNormalizeCol(col("src_url")).as("__ck"))
          .filter(col("__ck").isNotNull).distinct()
        cand.join(crawled, col("url_norm") === col("__ck"), "left_anti")
          .orderBy("url_norm")
      },
      Some(s"""WITH u AS (SELECT doc_id, ${duckBaseUrlRawOf("doc_id")} AS src_url,
              |    '<html><head>' ||
              |    CASE WHEN doc_id % 7 = 3 THEN '<base href="https://rebase-' ||
              |      (doc_id % 6)::VARCHAR || '.example.org/d/e/">'
              |      ELSE '' END ||
              |    '</head><body><a href="' || (${duckBaseUrlRawOf("(doc_id + 1)")}) ||
              |    '">k</a><a href="https://new-' || (doc_id % 50)::VARCHAR ||
              |    '.example.org/n/' || (doc_id % 7)::VARCHAR ||
              |    '?utm_source=x&id=' || (doc_id % 11)::VARCHAR ||
              |    '">n</a>' ||
              |    CASE WHEN doc_id % 5 = 2 THEN '<a href="../up/' ||
              |      (doc_id % 9)::VARCHAR || '">r</a>'
              |      ELSE '' END ||
              |    '</body></html>' AS html
              |  FROM documents),
              |$duckLinkCtes,
              |u2 AS (SELECT resolved AS url FROM r WHERE resolved IS NOT NULL),
              |${duckUrlNormCtesFrom("u2")},
              |cand AS (SELECT url_norm, count(*)::BIGINT AS n_refs FROM p5
              |  WHERE url_norm IS NOT NULL GROUP BY url_norm),
              |cw AS (SELECT ${duckBaseUrlRawOf("doc_id")} AS url FROM documents),
              |${duckUrlNormCtesFrom("cw", "k")},
              |crawled AS (SELECT DISTINCT url_norm AS ck FROM k5
              |  WHERE url_norm IS NOT NULL)
              |SELECT url_norm, n_refs FROM cand
              |WHERE url_norm NOT IN (SELECT ck FROM crawled)
              |ORDER BY url_norm""".stripMargin)),

    Q("ht06_anchor_text",
      (s, d) => {
        val m = mgr(s, d)
        // anchor-text extraction (r16): what linking pages CALL their
        // targets — the link-graph signal for retrieval/quality scoring.
        // hrefs and element bodies come from one pattern with two
        // capture groups (arrays align), bodies get the htmlToText
        // treatment scoped to the anchor. DuckDB zips via parallel
        // unnest of the two capture arrays.
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticHtml.as("html"))
        docs.select(col("doc_id"),
            explode(pipeline.HtmlExtract.anchorsCol(col("html"))).as("__a"))
          .select(col("doc_id"), col("__a.href").as("href"),
            col("__a.anchor_text").as("anchor_text"))
          .orderBy("doc_id", "href")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckHtmlRaw AS html FROM documents),
              |l AS (SELECT doc_id,
              |    regexp_extract_all(html,
              |      '(?is)<a\\b[^>]*[\\s"'']href\\s*=\\s*("[^"]*"|''[^'']*''|[^\\s>]+)[^>]*>(.*?)</a',
              |      1) AS hs,
              |    regexp_extract_all(html,
              |      '(?is)<a\\b[^>]*[\\s"'']href\\s*=\\s*("[^"]*"|''[^'']*''|[^\\s>]+)[^>]*>(.*?)</a',
              |      2) AS ts
              |  FROM u),
              |x AS (SELECT doc_id, unnest(hs) AS h0, unnest(ts) AS t0 FROM l),
              |y AS (SELECT doc_id,
              |    replace(regexp_replace(regexp_replace(h0, '^["'']', ''),
              |      '["'']$$', ''), '&amp;', '&') AS href,
              |    trim(regexp_replace(${duckDecodeEnt(
                      "regexp_replace(t0, '<[/!A-Za-z][^>]*>', ' ', 'g')")},
              |      '[\\s\\x{00A0}]+', ' ', 'g')) AS anchor_text
              |  FROM x)
              |SELECT doc_id, href, anchor_text FROM y
              |ORDER BY doc_id, href""".stripMargin)),

    Q("ht07_crawl_admission",
      (s, d) => {
        val m = mgr(s, d)
        // page-level admission signals (r16): the author-declared
        // language and the meta-robots directives, with the standard
        // admission predicate (noindex/none drops the page; policy
        // lives in the query, the extractors stay mechanism). Variants
        // cover both attribute orders, all quoting forms, messy
        // spacing/case in the directive list, and full absence.
        val id = col("doc_id")
        val html = concat(lit("<html"),
          when(id % 5 === 0, " lang=\"en\"><meta name=\"robots\" content=\"index, follow\">")
            .when(id % 5 === 1, " lang='DE'><meta content='noindex' name='robots'>")
            .when(id % 5 === 2, " lang=fr><meta name=robots content=\"NOINDEX , nofollow ,\">")
            .when(id % 5 === 3, "><p>neither</p>")
            .otherwise(" lang=\"en-US\"><meta name=\"robots\" content=\"none\">"),
          lit("<body>b</body></html>"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), html.as("html"))
        val rb = pipeline.HtmlExtract.metaRobotsCol(col("html"))
        docs.select(col("doc_id"),
            pipeline.HtmlExtract.htmlLangCol(col("html")).as("lang"),
            array_join(rb, ",").as("robots_csv"),
            (!array_contains(rb, "noindex") && !array_contains(rb, "none"))
              .as("admitted"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, '<html' ||
              |    CASE WHEN doc_id % 5 = 0
              |      THEN ' lang="en"><meta name="robots" content="index, follow">'
              |    WHEN doc_id % 5 = 1
              |      THEN ' lang=''DE''><meta content=''noindex'' name=''robots''>'
              |    WHEN doc_id % 5 = 2
              |      THEN ' lang=fr><meta name=robots content="NOINDEX , nofollow ,">'
              |    WHEN doc_id % 5 = 3 THEN '><p>neither</p>'
              |    ELSE ' lang="en-US"><meta name="robots" content="none">' END ||
              |    '<body>b</body></html>' AS html FROM documents),
              |m AS (SELECT doc_id,
              |    nullif(lower(regexp_replace(regexp_replace(regexp_extract(html,
              |      '(?is)<html\\b[^>]*\\blang\\s*=\\s*("[^"]*"|''[^'']*''|[^\\s>]+)',
              |      1), '^["'']', ''), '["'']$$', '')), '') AS lang,
              |    list_filter(list_transform(string_split(coalesce(
              |      ${duckAttrExpr("meta", "name", "robots", "content")}, ''), ','),
              |      x -> trim(lower(x))), x -> x <> '') AS rb
              |  FROM u)
              |SELECT doc_id, lang,
              |  coalesce(array_to_string(rb, ','), '') AS robots_csv,
              |  NOT (list_contains(rb, 'noindex') OR list_contains(rb, 'none'))
              |    AS admitted
              |FROM m ORDER BY doc_id""".stripMargin)),

    Q("ht08_sitemap_ingest",
      (s, d) => {
        val m = mgr(s, d)
        // crawl seeding (r16): sitemap <loc> targets extracted (XML
        // &amp; decoded — the synth escapes the query-string ampersands
        // like a real sitemap must), canonicalized, and counted into
        // seed groups — the same frontier shape link extraction feeds.
        val id = col("doc_id")
        def esc(u: Column) = replace(u, lit("&"), lit("&amp;"))
        val xml = concat(lit("<urlset><url><loc> "),
          esc(syntheticUrlOf((id * 11 + 2) % 391, 12)),
          lit(" </loc></url><url><loc>"),
          esc(syntheticUrlOf((id * 17 + 7) % 391, 12)),
          lit("</loc></url></urlset>"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), xml.as("xml"))
        docs.select(explode(
            pipeline.HtmlExtract.sitemapLocsCol(col("xml"))).as("loc"))
          .select(pipeline.UrlCuration.urlNormalizeCol(col("loc")).as("url_norm"))
          .filter(col("url_norm").isNotNull)
          .groupBy("url_norm").agg(count(lit(1)).as("n_seeds"))
          .orderBy("url_norm")
      },
      Some(s"""WITH u0 AS (SELECT doc_id, '<urlset><url><loc> ' ||
              |    replace((${duckUrlRawOf("((doc_id * 11 + 2) % 391)", 12)}),
              |      '&', '&amp;') ||
              |    ' </loc></url><url><loc>' ||
              |    replace((${duckUrlRawOf("((doc_id * 17 + 7) % 391)", 12)}),
              |      '&', '&amp;') ||
              |    '</loc></url></urlset>' AS xml FROM documents),
              |l AS (SELECT unnest(regexp_extract_all(xml,
              |    '(?is)<loc[^>]*>\\s*(.*?)\\s*</loc', 1)) AS u1 FROM u0),
              |u2 AS (SELECT replace(u1, '&amp;', '&') AS url FROM l),
              |${duckUrlNormCtesFrom("u2")}
              |SELECT url_norm, count(*)::BIGINT AS n_seeds FROM p5
              |WHERE url_norm IS NOT NULL GROUP BY url_norm
              |ORDER BY url_norm""".stripMargin)),

    Q("ht09_warc_ingest",
      (s, d) => {
        val m = mgr(s, d)
        // WARC front door (r17): each doc carries a 3-record WARC file
        // (request + response + metadata); the response's HTTP body is
        // the page. id%5==0 responses are text/plain and must NOT
        // ingest; the response record's WARC-Type header is lowercase
        // (field names case-fold); titles carry an entity. Pipeline:
        // Warc.htmlResponses → titleOf + htmlToText — the same
        // extraction every crawled page gets.
        val id = col("doc_id")
        val url = syntheticBaseUrl
        val html = concat(lit("<html><head><title>W"), (id % 7).cast("string"),
          lit(" &amp; co</title></head><body><p>doc "), id.cast("string"),
          lit(" body</p></body></html>"))
        val file = concat(
          lit("WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: "), url,
          lit("\r\nContent-Type: application/http;msgtype=request\r\n\r\n" +
            "GET / HTTP/1.1\r\nHost: h\r\n\r\n\r\n\r\n"),
          lit("WARC/1.0\r\nwarc-type: response\r\nWARC-Target-URI: "), url,
          lit("\r\nContent-Type: application/http;msgtype=response\r\n\r\n" +
            "HTTP/1.1 200 OK\r\n"),
          when(id % 5 === 0, lit("Content-Type: text/plain\r\n"))
            .otherwise(lit("Content-Type: text/html; charset=utf-8\r\n")),
          lit("\r\n"), html, lit("\r\n\r\n"),
          lit("WARC/1.0\r\nWARC-Type: metadata\r\n" +
            "Content-Type: application/warc-fields\r\n\r\nfetchTimeMs: 12\r\n\r\n"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), file.as("warc"))
        val resp = pipeline.Warc.htmlResponses(docs, "warc", "doc_id")
        resp.select(col("doc_id"), col("rec_no"), col("url"),
            pipeline.HtmlExtract.titleOf(col("html")).as("title"),
            pipeline.HtmlExtract.htmlToTextCol(col("html")).as("text_extracted"))
          .orderBy("doc_id")
      },
      Some(s"""WITH f AS (SELECT doc_id, $duckBaseUrlRaw AS url0,
              |    '<html><head><title>W' || (doc_id % 7)::VARCHAR ||
              |    ' &amp; co</title></head><body><p>doc ' || doc_id::VARCHAR ||
              |    ' body</p></body></html>' AS html0 FROM documents),
              |wf AS (SELECT doc_id,
              |    'WARC/1.0' || chr(13) || chr(10) ||
              |    'WARC-Type: request' || chr(13) || chr(10) ||
              |    'WARC-Target-URI: ' || url0 || chr(13) || chr(10) ||
              |    'Content-Type: application/http;msgtype=request' ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    'GET / HTTP/1.1' || chr(13) || chr(10) ||
              |    'Host: h' || chr(13) || chr(10) || chr(13) || chr(10) ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    'WARC/1.0' || chr(13) || chr(10) ||
              |    'warc-type: response' || chr(13) || chr(10) ||
              |    'WARC-Target-URI: ' || url0 || chr(13) || chr(10) ||
              |    'Content-Type: application/http;msgtype=response' ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    'HTTP/1.1 200 OK' || chr(13) || chr(10) ||
              |    CASE WHEN doc_id % 5 = 0 THEN 'Content-Type: text/plain'
              |      ELSE 'Content-Type: text/html; charset=utf-8' END ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    html0 || chr(13) || chr(10) || chr(13) || chr(10) ||
              |    'WARC/1.0' || chr(13) || chr(10) ||
              |    'WARC-Type: metadata' || chr(13) || chr(10) ||
              |    'Content-Type: application/warc-fields' ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    'fetchTimeMs: 12' || chr(13) || chr(10) || chr(13) || chr(10)
              |      AS warc
              |  FROM f),
              |p AS (SELECT doc_id,
              |    unnest(generate_series(1, len(string_split(warc,
              |      'WARC/1.0' || chr(13) || chr(10))))) AS pp,
              |    unnest(string_split(warc, 'WARC/1.0' || chr(13) || chr(10)))
              |      AS rec
              |  FROM wf),
              |rr AS (SELECT doc_id, (pp - 2)::BIGINT AS rec_no, rec FROM p
              |  WHERE pp >= 2),
              |hx AS (SELECT doc_id, rec_no,
              |    nullif(trim(regexp_extract(rec,
              |      '(?im)^WARC-Type:[ \\t]*([^\\r\\n]*)', 1)), '') AS warc_type,
              |    nullif(trim(regexp_extract(rec,
              |      '(?im)^WARC-Target-URI:[ \\t]*([^\\r\\n]*)', 1)), '')
              |      AS target_uri,
              |    regexp_replace(regexp_replace(rec,
              |      '(?s)^.*?\\r\\n\\r\\n', ''), '(\\r\\n)+$$', '') AS block
              |  FROM rr),
              |u AS (SELECT doc_id, rec_no, target_uri AS url,
              |    regexp_replace(block, '(?s)^.*?\\r\\n\\r\\n', '') AS html
              |  FROM hx WHERE lower(warc_type) = 'response'
              |    AND regexp_matches(block, '(?is)^.*?\\r\\n\\r\\n')
              |    AND regexp_matches(regexp_extract(block,
              |      '(?im)^Content-Type:[ \\t]*([^\\r\\n;]*)', 1), '(?i)text/html')),
              |$duckHtmlTextCtes
              |SELECT doc_id, rec_no, url, $duckTitleExpr AS title,
              |  text_extracted
              |FROM e ORDER BY doc_id""".stripMargin)),

    Q("ht10_wet_build",
      (s, d) => {
        val m = mgr(s, d)
        // the WET cut (r17): WARC response records → the text-extract
        // sidecar a crawl publishes — (url_norm, lang, text, n_tokens)
        // for every 200 text/html response. Two planted exclusion
        // regimes ride the same corpus: id%7==2 responses are 404s
        // (status cut — redirect/error bodies are server boilerplate)
        // and id%5==0 are text/plain (media routing); id%3 varies the
        // lang declaration across both quote forms and absence. The
        // whole path — record split, status extract, envelope strip,
        // tag strip, entity decode, URL canonicalization, token count —
        // is per-row expression work, scan-local at 100 TB.
        val id = col("doc_id")
        val url = syntheticBaseUrl
        val html = concat(lit("<html"),
          when(id % 3 === 0, lit(" lang=\"en\""))
            .when(id % 3 === 1, lit(" lang='DE'")).otherwise(lit("")),
          lit("><head><title>W"), (id % 9).cast("string"),
          lit("</title></head><body><p>doc "), id.cast("string"),
          lit(" body has words, words &amp; punctuation.</p></body></html>"))
        val file = concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
          lit("\r\nContent-Type: application/http;msgtype=response\r\n\r\n"),
          when(id % 7 === 2, lit("HTTP/1.1 404 Not Found\r\n"))
            .otherwise(lit("HTTP/1.1 200 OK\r\n")),
          when(id % 5 === 0, lit("Content-Type: text/plain\r\n"))
            .otherwise(lit("Content-Type: text/html; charset=utf-8\r\n")),
          lit("\r\n"), html, lit("\r\n\r\n"),
          lit("WARC/1.0\r\nWARC-Type: metadata\r\n" +
            "Content-Type: application/warc-fields\r\n\r\nfetchTimeMs: 9\r\n\r\n"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), file.as("warc"))
        pipeline.Warc.htmlResponses(docs, "warc", "doc_id")
          .filter(col("status") === 200)
          .withColumn("text_extracted",
            pipeline.HtmlExtract.htmlToTextCol(col("html")))
          .select(col("doc_id"),
            pipeline.UrlCuration.urlNormalizeCol(col("url")).as("url_norm"),
            pipeline.HtmlExtract.htmlLangCol(col("html")).as("lang"),
            col("text_extracted"),
            pipeline.TextAnalysis.tokenCount("text_extracted").as("n_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""WITH f AS (SELECT doc_id, $duckBaseUrlRaw AS url0,
              |    '<html' ||
              |    CASE WHEN doc_id % 3 = 0 THEN ' lang="en"'
              |      WHEN doc_id % 3 = 1 THEN ' lang=''DE''' ELSE '' END ||
              |    '><head><title>W' || (doc_id % 9)::VARCHAR ||
              |    '</title></head><body><p>doc ' || doc_id::VARCHAR ||
              |    ' body has words, words &amp; punctuation.</p></body></html>'
              |      AS html0 FROM documents),
              |wf AS (SELECT doc_id,
              |    'WARC/1.0' || chr(13) || chr(10) ||
              |    'WARC-Type: response' || chr(13) || chr(10) ||
              |    'WARC-Target-URI: ' || url0 || chr(13) || chr(10) ||
              |    'Content-Type: application/http;msgtype=response' ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    CASE WHEN doc_id % 7 = 2 THEN 'HTTP/1.1 404 Not Found'
              |      ELSE 'HTTP/1.1 200 OK' END || chr(13) || chr(10) ||
              |    CASE WHEN doc_id % 5 = 0 THEN 'Content-Type: text/plain'
              |      ELSE 'Content-Type: text/html; charset=utf-8' END ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    html0 || chr(13) || chr(10) || chr(13) || chr(10) ||
              |    'WARC/1.0' || chr(13) || chr(10) ||
              |    'WARC-Type: metadata' || chr(13) || chr(10) ||
              |    'Content-Type: application/warc-fields' ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    'fetchTimeMs: 9' || chr(13) || chr(10) || chr(13) || chr(10)
              |      AS warc
              |  FROM f),
              |p AS (SELECT doc_id,
              |    unnest(generate_series(1, len(string_split(warc,
              |      'WARC/1.0' || chr(13) || chr(10))))) AS pp,
              |    unnest(string_split(warc, 'WARC/1.0' || chr(13) || chr(10)))
              |      AS rec
              |  FROM wf),
              |rr AS (SELECT doc_id, rec FROM p WHERE pp >= 2),
              |hx AS (SELECT doc_id,
              |    nullif(trim(regexp_extract(rec,
              |      '(?im)^WARC-Type:[ \\t]*([^\\r\\n]*)', 1)), '') AS warc_type,
              |    nullif(trim(regexp_extract(rec,
              |      '(?im)^WARC-Target-URI:[ \\t]*([^\\r\\n]*)', 1)), '')
              |      AS target_uri,
              |    regexp_replace(regexp_replace(rec,
              |      '(?s)^.*?\\r\\n\\r\\n', ''), '(\\r\\n)+$$', '') AS block
              |  FROM rr),
              |u AS (SELECT doc_id, target_uri AS url,
              |    regexp_replace(block, '(?s)^.*?\\r\\n\\r\\n', '') AS html
              |  FROM hx WHERE lower(warc_type) = 'response'
              |    AND regexp_matches(block, '(?is)^.*?\\r\\n\\r\\n')
              |    AND regexp_matches(regexp_extract(block,
              |      '(?im)^Content-Type:[ \\t]*([^\\r\\n;]*)', 1), '(?i)text/html')
              |    AND regexp_extract(block,
              |      '^HTTP/[0-9.]+ ([0-9]{3})', 1) = '200'),
              |$duckHtmlTextCtes,
              |u2 AS (SELECT doc_id, html, text_extracted, url FROM e),
              |${duckUrlNormCtesFrom("u2")}
              |SELECT doc_id, url_norm,
              |  nullif(lower(regexp_replace(regexp_replace(regexp_extract(html,
              |    '(?is)<html\\b[^>]*\\blang\\s*=\\s*("[^"]*"|''[^'']*''|[^\\s>]+)',
              |    1), '^["'']', ''), '["'']$$', '')), '') AS lang,
              |  text_extracted, ${duckTokenCount("text_extracted")} AS n_tokens
              |FROM p5 ORDER BY doc_id""".stripMargin)),

    Q("ht11_main_content",
      (s, d) => {
        val m = mgr(s, d)
        // main-content extraction (r17): the Boilerpipe-class block +
        // link-density cut over pages that carry the full chrome mix —
        // nav link lists, a sub-threshold heading, the prose body, a
        // "Tiny." fragment, per-regime extras (id%4==1 a low-density
        // inline-anchor paragraph that must SURVIVE, id%4==2 a long
        // related-articles link list that must DROP on density despite
        // passing minChars), and a link-heavy footer. The oracle
        // replays the whole lambda chain in DuckDB (NULL-vs-'' seam:
        // DuckDB's array_to_string([]) is NULL where Spark's
        // array_join is '' — coalesced at both spots).
        val id = col("doc_id")
        val html = concat(
          lit("<html><head><title>T</title><style>p{m:1}</style></head>" +
            "<body><nav><ul><li><a href=\"/\">Home</a></li>" +
            "<li><a href=\"/about\">About section</a></li></ul></nav>" +
            "<div class=\"content\"><h1>Head "), (id % 9).cast("string"),
          lit("</h1><p>"), substring(col("text"), 1, 80),
          lit(" tail words to pass the threshold.</p><p>Tiny.</p>"),
          when(id % 4 === 1, lit("<p>See <a href=\"/ref\">the reference" +
            "</a> for additional context and detail here.</p>"))
            .otherwise(lit("")),
          when(id % 4 === 2, lit("<div><a href=\"/r/1\">Related article " +
            "one</a> · <a href=\"/r/2\">Related article two</a> · " +
            "<a href=\"/r/3\">Related article three</a></div>"))
            .otherwise(lit("")),
          lit("</div><footer>© 2024 Example Corp · <a href=\"/tos\">Terms " +
            "of Service</a> · <a href=\"/priv\">Privacy Policy and " +
            "Cookies</a></footer></body></html>"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), html.as("html"))
        docs.select(col("doc_id"),
            pipeline.HtmlExtract.mainContentCol(col("html")).as("main_text"))
          .withColumn("n_chars", length(col("main_text")).cast("long"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u0 AS (SELECT doc_id,
              |    '<html><head><title>T</title><style>p{m:1}</style></head>' ||
              |    '<body><nav><ul><li><a href="/">Home</a></li>' ||
              |    '<li><a href="/about">About section</a></li></ul></nav>' ||
              |    '<div class="content"><h1>Head ' || (doc_id % 9)::VARCHAR ||
              |    '</h1><p>' || substr(text, 1, 80) ||
              |    ' tail words to pass the threshold.</p><p>Tiny.</p>' ||
              |    CASE WHEN doc_id % 4 = 1 THEN '<p>See <a href="/ref">the ' ||
              |      'reference</a> for additional context and detail here.</p>'
              |      ELSE '' END ||
              |    CASE WHEN doc_id % 4 = 2 THEN '<div><a href="/r/1">Related ' ||
              |      'article one</a> · <a href="/r/2">Related article two</a> ' ||
              |      '· <a href="/r/3">Related article three</a></div>'
              |      ELSE '' END ||
              |    '</div><footer>© 2024 Example Corp · <a href="/tos">Terms ' ||
              |    'of Service</a> · <a href="/priv">Privacy Policy and ' ||
              |    'Cookies</a></footer></body></html>' AS html
              |  FROM documents),
              |c1 AS (SELECT doc_id, regexp_replace(regexp_replace(
              |    regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'),
              |    '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
              |    '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g') AS ch
              |  FROM u0),
              |fr AS (SELECT doc_id, string_split_regex(ch,
              |    '(?i)</?(?:div|p|h[1-6]|li|td|th|tr|table|ul|ol|dl|dt|dd|' ||
              |    'article|section|header|footer|nav|aside|main|figure|' ||
              |    'figcaption|blockquote|pre|form|fieldset|br|hr)\\b[^>]*>')
              |      AS fl FROM c1),
              |sc AS (SELECT doc_id, list_transform(fl, x -> struct_pack(
              |    t := trim(regexp_replace(${duckDecodeEnt(
                      "regexp_replace(x, '<[/!A-Za-z][^>]*>', ' ', 'g')")},
              |      '[\\s\\x{00A0}]+', ' ', 'g')),
              |    a := trim(regexp_replace(${duckDecodeEnt(
                      "regexp_replace(coalesce(array_to_string(" +
                        "regexp_extract_all(x, '(?is)<a\\b[^>]*>(.*?)</a', 1)," +
                        " ' '), ''), '<[/!A-Za-z][^>]*>', ' ', 'g')")},
              |      '[\\s\\x{00A0}]+', ' ', 'g')))) AS sl
              |  FROM fr),
              |kp AS (SELECT doc_id, list_filter(sl, s ->
              |    length(s.t) >= 20 AND
              |    length(s.a) <= 0.33 * length(s.t)) AS kl FROM sc)
              |SELECT doc_id,
              |  coalesce(array_to_string(list_transform(kl, s -> s.t), ' '),
              |    '') AS main_text,
              |  length(coalesce(array_to_string(list_transform(kl, s -> s.t),
              |    ' '), ''))::BIGINT AS n_chars
              |FROM kp ORDER BY doc_id""".stripMargin)),

    Q("ht12_crawl_cycle_build",
      (s, d) => {
        val m = mgr(s, d)
        // the crawl-cycle capstone (r17): one full turn of the loop —
        // WARC responses → 200/text-html cut → main-content QUALITY
        // gate (pages whose extracted prose is under 40 chars
        // contribute no links: id%6==4 thin pages and id%7==2 404s
        // both drop) → link extraction from the survivors → canonical
        // keys → anti-join against the crawled set (every page links
        // one already-crawled neighbor that must vanish) → per-host
        // politeness schedule, top 3 slots per host at 500 ms. Every
        // stage reuses an oracle-pinned mechanism (ht10 record split,
        // ht11 density gate, ht02/ht05 link chain, w11 schedule); the
        // oracle stacks all of them in one WITH.
        val id = col("doc_id")
        val body = when(id % 6 === 4, lit("Too short."))
          .otherwise(concat(lit("Paragraph for doc "), id.cast("string"),
            lit(" with enough visible characters to clear the " +
              "main-content gate easily.")))
        val html = concat(
          lit("<html><head><title>P</title></head><body>" +
            "<nav><a href=\"/h\">Home</a></nav><p>"),
          body,
          lit("</p><a href=\""), syntheticUrlOf((id * 7 + 3) % 391, 12),
          lit("\">x</a><a href=\""), baseUrlOf(id + 1),
          lit("\">k</a><a href=\"/rel/"), (id % 20).cast("string"),
          lit("\">r</a><footer><a href=\"/t\">Terms</a></footer>" +
            "</body></html>"))
        val warc = concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
          syntheticBaseUrl,
          lit("\r\nContent-Type: application/http;msgtype=response\r\n\r\n"),
          when(id % 7 === 2, lit("HTTP/1.1 404 Not Found\r\n"))
            .otherwise(lit("HTTP/1.1 200 OK\r\n")),
          lit("Content-Type: text/html; charset=utf-8\r\n\r\n"),
          html, lit("\r\n\r\n"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), warc.as("warc"))
        val resp = pipeline.Warc.htmlResponses(docs, "warc", "doc_id")
          .filter(col("status") === 200)
        val kept = resp.filter(
            length(pipeline.HtmlExtract.mainContentCol(col("html"))) >= 40)
          .select(col("url").as("src_url"), col("html"))
        val links = pipeline.HtmlExtract.linkExtract(kept, "html", "src_url")
        val cand = links
          .select(pipeline.UrlCuration.urlNormalizeCol(col("resolved"))
            .as("url_norm"))
          .filter(col("url_norm").isNotNull)
          .groupBy("url_norm").agg(count(lit(1)).as("n_refs"))
        val crawled = m.getDDFByName("documents").df
          .select(pipeline.UrlCuration.urlNormalizeCol(syntheticBaseUrl)
            .as("__ck"))
          .filter(col("__ck").isNotNull).distinct()
        val fresh = cand.join(crawled, col("url_norm") === col("__ck"),
          "left_anti")
        pipeline.UrlCuration.frontierSchedule(fresh, "url_norm", "n_refs",
            crawlDelayMs = 500L, maxPerHost = 3)
          .orderBy("host", "slot")
      },
      Some(s"""WITH f AS (SELECT doc_id, $duckBaseUrlRaw AS url0,
              |    '<html><head><title>P</title></head><body>' ||
              |    '<nav><a href="/h">Home</a></nav><p>' ||
              |    CASE WHEN doc_id % 6 = 4 THEN 'Too short.'
              |      ELSE 'Paragraph for doc ' || doc_id::VARCHAR ||
              |        ' with enough visible characters to clear the ' ||
              |        'main-content gate easily.' END ||
              |    '</p><a href="' ||
              |    (${duckUrlRawOf("((doc_id * 7 + 3) % 391)", 12)}) ||
              |    '">x</a><a href="' ||
              |    (${duckBaseUrlRawOf("(doc_id + 1)")}) ||
              |    '">k</a><a href="/rel/' || (doc_id % 20)::VARCHAR ||
              |    '">r</a><footer><a href="/t">Terms</a></footer>' ||
              |    '</body></html>' AS html0
              |  FROM documents),
              |wf AS (SELECT doc_id,
              |    'WARC/1.0' || chr(13) || chr(10) ||
              |    'WARC-Type: response' || chr(13) || chr(10) ||
              |    'WARC-Target-URI: ' || url0 || chr(13) || chr(10) ||
              |    'Content-Type: application/http;msgtype=response' ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    CASE WHEN doc_id % 7 = 2 THEN 'HTTP/1.1 404 Not Found'
              |      ELSE 'HTTP/1.1 200 OK' END || chr(13) || chr(10) ||
              |    'Content-Type: text/html; charset=utf-8' ||
              |    chr(13) || chr(10) || chr(13) || chr(10) ||
              |    html0 || chr(13) || chr(10) || chr(13) || chr(10) AS warc
              |  FROM f),
              |sp AS (SELECT doc_id,
              |    unnest(generate_series(1, len(string_split(warc,
              |      'WARC/1.0' || chr(13) || chr(10))))) AS pp,
              |    unnest(string_split(warc, 'WARC/1.0' || chr(13) || chr(10)))
              |      AS rec
              |  FROM wf),
              |hx AS (SELECT doc_id,
              |    nullif(trim(regexp_extract(rec,
              |      '(?im)^WARC-Type:[ \\t]*([^\\r\\n]*)', 1)), '') AS warc_type,
              |    nullif(trim(regexp_extract(rec,
              |      '(?im)^WARC-Target-URI:[ \\t]*([^\\r\\n]*)', 1)), '')
              |      AS target_uri,
              |    regexp_replace(regexp_replace(rec,
              |      '(?s)^.*?\\r\\n\\r\\n', ''), '(\\r\\n)+$$', '') AS block
              |  FROM sp WHERE pp >= 2),
              |rsp AS (SELECT doc_id, target_uri AS src_url,
              |    regexp_replace(block, '(?s)^.*?\\r\\n\\r\\n', '') AS html
              |  FROM hx WHERE lower(warc_type) = 'response'
              |    AND regexp_matches(block, '(?is)^.*?\\r\\n\\r\\n')
              |    AND regexp_matches(regexp_extract(block,
              |      '(?im)^Content-Type:[ \\t]*([^\\r\\n;]*)', 1), '(?i)text/html')
              |    AND regexp_extract(block,
              |      '^HTTP/[0-9.]+ ([0-9]{3})', 1) = '200'),
              |c1 AS (SELECT doc_id, src_url, html, regexp_replace(
              |    regexp_replace(regexp_replace(html,
              |    '(?s)<!--.*?-->', ' ', 'g'),
              |    '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
              |    '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g') AS ch
              |  FROM rsp),
              |fr AS (SELECT doc_id, src_url, html, string_split_regex(ch,
              |    '(?i)</?(?:div|p|h[1-6]|li|td|th|tr|table|ul|ol|dl|dt|dd|' ||
              |    'article|section|header|footer|nav|aside|main|figure|' ||
              |    'figcaption|blockquote|pre|form|fieldset|br|hr)\\b[^>]*>')
              |      AS fl FROM c1),
              |sc AS (SELECT doc_id, src_url, html, list_transform(fl,
              |    x -> struct_pack(
              |    t := trim(regexp_replace(${duckDecodeEnt(
                      "regexp_replace(x, '<[/!A-Za-z][^>]*>', ' ', 'g')")},
              |      '[\\s\\x{00A0}]+', ' ', 'g')),
              |    a := trim(regexp_replace(${duckDecodeEnt(
                      "regexp_replace(coalesce(array_to_string(" +
                        "regexp_extract_all(x, '(?is)<a\\b[^>]*>(.*?)</a', 1)," +
                        " ' '), ''), '<[/!A-Za-z][^>]*>', ' ', 'g')")},
              |      '[\\s\\x{00A0}]+', ' ', 'g')))) AS sl
              |  FROM fr),
              |kp AS (SELECT doc_id, src_url, html, list_filter(sl, s ->
              |    length(s.t) >= 20 AND
              |    length(s.a) <= 0.33 * length(s.t)) AS kl FROM sc),
              |u AS MATERIALIZED (SELECT doc_id, src_url, html FROM kp
              |  WHERE length(coalesce(array_to_string(
              |    list_transform(kl, s -> s.t), ' '), '')) >= 40),
              |$duckLinkCtes,
              |u3 AS (SELECT resolved AS url FROM r WHERE resolved IS NOT NULL),
              |${duckUrlNormCtesFrom("u3", "n")},
              |cand AS (SELECT url_norm, count(*)::BIGINT AS n_refs FROM n5
              |  WHERE url_norm IS NOT NULL GROUP BY url_norm),
              |cw AS (SELECT ${duckBaseUrlRawOf("doc_id")} AS url
              |  FROM documents),
              |${duckUrlNormCtesFrom("cw", "k")},
              |crawled AS (SELECT DISTINCT url_norm AS ck FROM k5
              |  WHERE url_norm IS NOT NULL),
              |fresh AS (SELECT url_norm, n_refs FROM cand
              |  WHERE url_norm NOT IN (SELECT ck FROM crawled)),
              |h2 AS (SELECT url_norm, n_refs,
              |    ${duckHostExprOf("url_norm")} AS host FROM fresh),
              |rkq AS (SELECT host, url_norm, n_refs,
              |    row_number() OVER (PARTITION BY host
              |      ORDER BY n_refs DESC, url_norm) AS rn
              |  FROM h2 WHERE host IS NOT NULL AND host <> '')
              |SELECT host, url_norm AS url, n_refs::DOUBLE AS priority,
              |  (rn - 1)::BIGINT AS slot,
              |  ((rn - 1) * 500)::BIGINT AS scheduled_ms
              |FROM rkq WHERE rn <= 3 ORDER BY host, slot""".stripMargin)),

    Q("ht13_anchor_index",
      (s, d) => {
        val m = mgr(s, d)
        // the anchor-text index (r17): what the web CALLS each target —
        // ht06's pairs resolved, canonicalized, and aggregated into the
        // bag-of-anchors retrieval document. 97-way external targets +
        // (host,path)-keyed relative targets give ~5-8 anchors per
        // target, so the 7-pair cap BITES on some targets while the
        // counts stay uncapped; fragment-only and empty-text anchors
        // drop. The oracle replays extraction, resolution, the
        // rank-capped doc (string_agg ORDER BY = the heap's sort), and
        // both counts.
        val id = col("doc_id")
        val html = concat(
          lit("<html><body><a href=\""),
          syntheticUrlOf((id * 7 + 3) % 97, 12),
          lit("\">anchor <b>one</b> "), (id % 13).cast("string"),
          lit("</a><a href='/rel/"), (id % 20).cast("string"),
          lit("'>second &amp; text "), (id % 11).cast("string"),
          lit("</a><a href=\"#top\">skip</a><a href=\"/empty/"),
          (id % 5).cast("string"), lit("\"></a></body></html>"))
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"),
            html.as("html"))
        pipeline.HtmlExtract.anchorTextIndex(docs, "html", "src_url",
            maxAnchorsPerTarget = 7)
          .orderBy("target")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckBaseUrlRaw AS src_url,
              |    '<html><body><a href="' ||
              |    (${duckUrlRawOf("((doc_id * 7 + 3) % 97)", 12)}) ||
              |    '">anchor <b>one</b> ' || (doc_id % 13)::VARCHAR ||
              |    '</a><a href=''/rel/' || (doc_id % 20)::VARCHAR ||
              |    '''>second &amp; text ' || (doc_id % 11)::VARCHAR ||
              |    '</a><a href="#top">skip</a><a href="/empty/' ||
              |    (doc_id % 5)::VARCHAR || '"></a></body></html>' AS html
              |  FROM documents),
              |l AS (SELECT src_url,
              |    regexp_extract_all(html,
              |      '(?is)<a\\b[^>]*[\\s"'']href\\s*=\\s*("[^"]*"|''[^'']*''|[^\\s>]+)[^>]*>(.*?)</a',
              |      1) AS hs,
              |    regexp_extract_all(html,
              |      '(?is)<a\\b[^>]*[\\s"'']href\\s*=\\s*("[^"]*"|''[^'']*''|[^\\s>]+)[^>]*>(.*?)</a',
              |      2) AS ts
              |  FROM u),
              |x AS (SELECT src_url, unnest(hs) AS h0, unnest(ts) AS t0 FROM l),
              |y AS (SELECT src_url,
              |    replace(regexp_replace(regexp_replace(h0, '^["'']', ''),
              |      '["'']$$', ''), '&amp;', '&') AS href,
              |    trim(regexp_replace(${duckDecodeEnt(
                      "regexp_replace(t0, '<[/!A-Za-z][^>]*>', ' ', 'g')")},
              |      '[\\s\\x{00A0}]+', ' ', 'g')) AS anchor_text
              |  FROM x),
              |rb AS (SELECT src_url, anchor_text, trim(href) AS th FROM y),
              |rc AS (SELECT *, ${duckResolveCase("src_url", "th")} AS r0
              |  FROM rb),
              |${duckRemoveDotsCtes("rc", "r0", "rz2", "resolved", "az")},
              |u2 AS (SELECT src_url, anchor_text, resolved AS url FROM rz2
              |  WHERE resolved IS NOT NULL),
              |${duckUrlNormCtesFrom("u2")},
              |pairs AS (SELECT url_norm AS target, src_url, anchor_text
              |  FROM p5 WHERE url_norm IS NOT NULL AND anchor_text <> ''),
              |st AS (SELECT target, count(*)::BIGINT AS n_anchors,
              |    count(DISTINCT src_url)::BIGINT AS n_sources
              |  FROM pairs GROUP BY 1),
              |cp AS (SELECT target, src_url, anchor_text,
              |    row_number() OVER (PARTITION BY target
              |      ORDER BY src_url, anchor_text) AS rn
              |  FROM pairs),
              |dd AS (SELECT target, string_agg(anchor_text,
              |    ' ' ORDER BY src_url, anchor_text) AS anchor_doc
              |  FROM cp WHERE rn <= 7 GROUP BY 1)
              |SELECT st.target, st.n_anchors, st.n_sources, dd.anchor_doc
              |FROM st JOIN dd USING (target) ORDER BY st.target""".stripMargin))
  )
}
