package graft

import graft.pipeline.HtmlExtract
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def toText(htmls: String*): Seq[Option[String]] =
    htmls.toDF("html")
      .select(HtmlExtract.htmlToTextCol(col("html")).as("t"))
      .collect().toSeq.map(r => Option(r.getString(0)))

  test("htmlToText: scripts/styles/comments dropped, tags stripped, entities decoded, ws collapsed") {
    val html =
      """<!DOCTYPE html><html><head><title>T &amp; Co</title>
        |<style>body { color: red; }</style>
        |<script type="text/javascript">var x = "<p>not text</p>";</script></head>
        |<body><!-- a > comment --><h1>Hello&nbsp;World</h1>
        |<p class="big">A &lt;tag&gt; &#38; more&#160;text &amp;lt; stays</p>
        |</body></html>""".stripMargin
    assert(toText(html) ==
      Seq(Some("T & Co Hello World A <tag> & more text &lt; stays")))
  }

  test("htmlToText: loud failure modes — unclosed script survives as text; stray < passes through") {
    assert(toText("<p>a</p><script>var x = 1;<p>b</p>") ==
      Seq(Some("a var x = 1; b")),
      "unclosed script falls through to tag stripping, code text survives")
    assert(toText("<p>1 < 2 and done</p>") == Seq(Some("1 < 2 and done")),
      "a stray '<' with no closing '>' is text, not a swallowed suffix")
    assert(toText("<SCRIPT>x</SCRIPT  >k<STYLE a=b>y</style>z") == Seq(Some("k z")),
      "case-insensitive close tags, trailing space in close tag ok")
  }

  test("htmlToText: double-escaped entities decode one level only; NULL in, NULL out") {
    assert(toText("&amp;amp; &amp;#60; &#38;gt;") ==
      Seq(Some("&amp; &#60; &gt;")),
      "ampersand decodes LAST: double-escapes yield the literal entity text")
    assert(Seq(Option.empty[String]).toDF("html")
      .select(HtmlExtract.htmlToTextCol(col("html")).as("t"))
      .collect()(0).isNullAt(0))
  }

  test("hrefsCol: quoted/unquoted forms, document order, &amp; decoded in attr") {
    val html = """<a href="https://Ex.COM/a?x=1&amp;y=2">1</a>
                 |<A HREF='/rel/path'>2</A> <a id=3 href=page.html>3</a>
                 |<a href="#frag">4</a> <a name="no-href">skip</a>""".stripMargin
    val hrefs = Seq(html).toDF("html")
      .select(HtmlExtract.hrefsCol(col("html")).as("h"))
      .collect()(0).getSeq[String](0)
    assert(hrefs == Seq("https://Ex.COM/a?x=1&y=2", "/rel/path", "page.html", "#frag"))
  }

  test("resolveHref: the RFC 3986 merge cases") {
    val cases = Seq(
      // (base, href, expected)
      ("https://h.com/dir/page?q=1#f", "https://other.org/x", Some("https://other.org/x")),
      ("https://h.com/dir/page", "//cdn.com/x.js", Some("https://cdn.com/x.js")),
      ("HTTP://h.com:8080/dir/page", "/root.html", Some("HTTP://h.com:8080/root.html")),
      ("https://h.com/dir/page", "sub/x.html", Some("https://h.com/dir/sub/x.html")),
      ("https://h.com", "a.html", Some("https://h.com/a.html")),
      ("https://h.com/dir/page?drop=me", "rel", Some("https://h.com/dir/rel")),
      ("https://h.com/d/", "x", Some("https://h.com/d/x")),
      ("https://h.com/d/p", "", None),
      ("https://h.com/d/p", "#top", None),
      ("https://h.com/d/p", "mailto:a@b.c", None),
      ("https://h.com/d/p", "javascript:void(0)", None),
      ("not-a-url", "rel/x", None),
      ("not-a-url", "https://abs.org/x", Some("https://abs.org/x")))
    val got = cases.map { case (b, h, _) => (b, h) }.toDF("base", "href")
      .select(HtmlExtract.resolveHrefCol(col("base"), col("href")).as("r"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(got == cases.map(_._3))
  }

  test("resolveHref r17: dot segments, query-only refs, <base href> chain") {
    val cases = Seq(
      // dot-segment removal (RFC 3986 §5.2.4) after the merge
      ("https://h.com/a/b/c", "../x", Some("https://h.com/a/x")),
      ("https://h.com/a/b/c", "./x", Some("https://h.com/a/b/x")),
      ("https://h.com/a/b/", "../../x", Some("https://h.com/x")),
      ("https://h.com/a/", "../../../x", Some("https://h.com/x")), // above root clamps
      ("https://h.com/a/b/c", "..", Some("https://h.com/a/")),
      ("https://h.com/a/b/c", ".", Some("https://h.com/a/b/")),
      ("https://h.com/a/b/c", "d/./e/../f", Some("https://h.com/a/b/d/f")),
      // dots in the query survive verbatim
      ("https://h.com/a/b", "x?next=../up", Some("https://h.com/a/x?next=../up")),
      // absolute hrefs get dot removal too
      ("https://h.com/", "https://o.org/p/../q/./r", Some("https://o.org/q/r")),
      // query-only ref keeps the FULL base path (r16 advice)
      ("http://h/a/b?old=1", "?q=1", Some("http://h/a/b?q=1")),
      ("https://h.com", "?q=1", Some("https://h.com?q=1")),
      // dotted segments that are NOT dot segments survive
      ("https://h.com/a/", "..x/.y/z", Some("https://h.com/a/..x/.y/z")))
    val got = cases.map { case (b, h, _) => (b, h) }.toDF("base", "href")
      .select(HtmlExtract.resolveHrefCol(col("base"), col("href")).as("r"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    got.zip(cases).foreach { case (g, (b, h, e)) =>
      assert(g == e, s"resolve($b, $h): got $g, want $e")
    }
  }

  test("r17: base href re-roots relative links; data-href is not a link") {
    val df = Seq(
      (1L, "https://h.com/a/b/c.html",
        """<html><head><base href="../up/"></head><body>""" +
          """<a href="x">1</a><a data-href="/decoy">d</a>""" +
          """<a href="?q=2">2</a></body></html>"""),
      (2L, "https://h.com/a/", """<a xlink:href="/no">n</a><a href="y">2</a>""")
    ).toDF("id", "url", "html")
    val out = HtmlExtract.linkExtract(df, "html", "url")
      .orderBy("href").collect().toSeq
      .map(r => (r.getString(1), Option(r.getString(2))))
    assert(out == Seq(
      // base ../up/ resolves to https://h.com/a/up/; links hang off it
      ("?q=2", Some("https://h.com/a/up/?q=2")),
      ("x", Some("https://h.com/a/up/x")),
      ("y", Some("https://h.com/a/y"))),
      s"got $out")
    // effectiveBaseUrl falls back to the fetched URL without a base tag
    val eb = df.filter(col("id") === 2)
      .select(HtmlExtract.effectiveBaseUrl(col("url"), col("html")))
      .head().getString(0)
    assert(eb == "https://h.com/a/")
  }

  test("linkExtract: (src_url, href, resolved) rows; link-less docs drop; unresolvable rows keep NULL") {
    val df = Seq(
      (1L, "https://h.com/a/", """<a href="x.html">1</a><a href="mailto:z@q.r">m</a>"""),
      (2L, "https://h.com/b", "<p>no links</p>")).toDF("id", "url", "html")
    val out = HtmlExtract.linkExtract(df, "html", "url")
      .orderBy("href").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(out == Seq(
      ("https://h.com/a/", "mailto:z@q.r", None),
      ("https://h.com/a/", "x.html", Some("https://h.com/a/x.html"))))
  }

  test("titleOf / metaContent / canonicalHref: both attr orders, quote forms, NULL when absent") {
    val html =
      """<html><head><title> Page &amp; Title  42 </title>
        |<meta name="description" content="A &amp; B desc">
        |<meta content='order-flipped' name='keywords'>
        |<link rel=canonical href="https://Ex.COM/canon?a=1&amp;b=2">
        |</head><body><title>second ignored</title></body></html>""".stripMargin
    val r = Seq(html).toDF("html").select(
      HtmlExtract.titleOf(col("html")).as("t"),
      HtmlExtract.metaContent(col("html"), "description").as("d"),
      HtmlExtract.metaContent(col("html"), "keywords").as("k"),
      HtmlExtract.metaContent(col("html"), "absent").as("a"),
      HtmlExtract.canonicalHref(col("html")).as("c")).collect()(0)
    assert(r.getString(0) == "Page & Title 42")
    assert(r.getString(1) == "A & B desc")
    assert(r.getString(2) == "order-flipped", "content-before-name order")
    assert(r.isNullAt(3))
    assert(r.getString(4) == "https://Ex.COM/canon?a=1&b=2")
    val none = Seq("<html><head></head></html>").toDF("html").select(
      HtmlExtract.titleOf(col("html")).as("t"),
      HtmlExtract.canonicalHref(col("html")).as("c")).collect()(0)
    assert(none.isNullAt(0) && none.isNullAt(1))
  }

  test("canonicalizedUrl: declared canonical wins, relative resolves, junk falls back to fetched") {
    val cases = Seq(
      ("https://m.ex.com/p?sid=9", """<link rel="canonical" href="https://ex.com/p">""",
        "https://ex.com/p"),
      ("https://ex.com/dir/p", """<link rel="canonical" href="../p">""",
        "https://ex.com/p"), // dot segments removed since r17
      ("https://ex.com/a/b", """<link rel="canonical" href="/clean">""",
        "https://ex.com/clean"),
      ("https://ex.com/a", "<p>no canonical</p>", "https://ex.com/a"),
      ("https://ex.com/a", """<link rel="canonical" href="#self">""",
        "https://ex.com/a"))
    val got = cases.map { case (u, h, _) => (u, h) }.toDF("url", "html")
      .select(HtmlExtract.canonicalizedUrl(col("url"), col("html")).as("c"))
      .collect().toSeq.map(_.getString(0))
    assert(got == cases.map(_._3))
  }

  test("anchorsCol: (href, text) pairs align; inner tags strip; unclosed anchors drop") {
    val html = """<a href="/a">click <b>here</b></a>
                 |<a id=2 href='/b'>B &amp; C</a>
                 |<a href=/c>  spaced   text </a>
                 |<a href="/unclosed">no close tag""".stripMargin
    val rows = Seq(html).toDF("html")
      .select(HtmlExtract.anchorsCol(col("html")).as("a")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows == Seq(("/a", "click here"), ("/b", "B & C"), ("/c", "spaced text")),
      s"got $rows")
    val ext = HtmlExtract.anchorExtract(
      Seq(("https://h.com/", html)).toDF("url", "html"), "html", "url")
    assert(ext.columns.toSeq == Seq("src_url", "href", "anchor_text"))
    assert(ext.count() == 3)
  }

  test("htmlLangCol / metaRobotsCol / sitemapLocsCol: declared lang, directives, loc targets") {
    val r = Seq(
      ("""<html LANG="en-US"><head><meta name="robots" content=" NOINDEX , nofollow ,">""", 0),
      ("""<html lang=fr><meta content='none' name='robots'>""", 1),
      ("""<html><p>neither</p>""", 2)).toDF("html", "i")
      .select(col("i"), HtmlExtract.htmlLangCol(col("html")).as("l"),
        HtmlExtract.metaRobotsCol(col("html")).as("rb"))
      .collect().map(x => x.getInt(0) ->
        (Option(x.getString(1)), x.getSeq[String](2))).toMap
    assert(r(0) == (Some("en-us"), Seq("noindex", "nofollow")),
      "case-folded lang; directives trimmed/lowercased, empties dropped")
    assert(r(1) == (Some("fr"), Seq("none")), "both attr orders, unquoted lang")
    assert(r(2) == (None, Seq()), "absent tag -> NULL lang, empty directives")
    val locs = Seq(
      """<urlset><url><loc> https://a.com/x?p=1&amp;q=2 </loc></url>
        |<url><loc>https://b.org/y</loc></url></urlset>""".stripMargin)
      .toDF("xml").select(HtmlExtract.sitemapLocsCol(col("xml")).as("l"))
      .collect()(0).getSeq[String](0)
    assert(locs == Seq("https://a.com/x?p=1&q=2", "https://b.org/y"))
  }

  test("mainContentCol: nav/footer chrome drops, body prose survives (r17)") {
    import spark.implicits._
    val page =
      "<html><head><title>T</title><style>p{color:red}</style></head><body>" +
        "<nav><ul><li><a href=\"/\">Home</a></li>" +
        "<li><a href=\"/about\">About us</a></li></ul></nav>" +
        "<div class=\"content\"><h1>Short head</h1>" +
        "<p>The first real paragraph carries enough visible characters to pass.</p>" +
        "<p>Tiny.</p>" +
        "<p>See <a href=\"/ref\">the reference</a> for more detail on this subject.</p>" +
        "</div><footer>© 2024 Example Corp · " +
        "<a href=\"/tos\">Terms of Service</a> · " +
        "<a href=\"/priv\">Privacy Policy and Cookie Preferences</a></footer>" +
        "</body></html>"
    val out = Seq(page).toDF("html")
      .select(HtmlExtract.mainContentCol(col("html")).as("m"))
      .collect()(0).getString(0)
    // kept: the two long low-density paragraphs. Dropped: nav items and
    // "Short head"/"Tiny." (minChars), the footer (link density ~0.6)
    assert(out ==
      "The first real paragraph carries enough visible characters to pass. " +
        "See the reference for more detail on this subject.", s"got: $out")
    // a link LIST long enough to pass minChars still drops on density
    val linkList = "<div>" + (1 to 8).map(i =>
      s"""<a href="/s/$i">Related article number $i</a>""").mkString(" · ") +
      "</div>"
    val m2 = Seq(linkList).toDF("html")
      .select(HtmlExtract.mainContentCol(col("html")).as("m"))
      .collect()(0).getString(0)
    assert(m2 == "", s"pure link list must drop on density, got: $m2")
    // NULL html -> NULL
    val m3 = Seq(Option.empty[String]).toDF("html")
      .select(HtmlExtract.mainContentCol(col("html")).as("m")).collect()(0)
    assert(m3.isNullAt(0))
  }

  test("anchorTextIndex: target-keyed anchor docs, counts, cap, drops (r17)") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.com/1",
        """<a href="https://t.com/x">Target <b>One</b></a><a href="#f">frag</a>"""),
      ("https://b.com/2",
        """<a href="https://t.com/x">great page</a><a href="https://t.com/x">again</a>"""),
      ("https://c.com/3",
        """<a href="/local">rel text</a><a href="https://t.com/x"></a>"""))
      .toDF("url", "html")
    val out = pipeline.HtmlExtract.anchorTextIndex(pages, "html", "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // fragment-only and empty-text anchors drop; counts cover all kept
    // pairs; the doc is (src, text)-sorted
    assert(out("https://t.com/x") ==
      ((3L, 2L, "Target One again great page")), s"got ${out.get("https://t.com/x")}")
    assert(out("https://c.com/local") == ((1L, 1L, "rel text")))
    // the cap bounds the DOC but never the counts
    val capped = pipeline.HtmlExtract.anchorTextIndex(pages, "html", "url",
        maxAnchorsPerTarget = 2)
      .filter(col("target") === "https://t.com/x").collect()(0)
    assert(capped.getLong(1) == 3L && capped.getString(3) == "Target One again",
      s"got $capped")
  }

  test("plan pins: extraction is shuffle-free; linkExtract has no Exchange") {
    val docs = spark.range(200).select(col("id"),
      concat(lit("<html><body><p>t"), col("id"),
        lit("</p><a href=\"/l/"), col("id") % 7,
        lit("\">x</a></body></html>")).as("html"),
      concat(lit("https://s"), col("id") % 5, lit(".com/d/p")).as("url"))
    val p1 = HtmlExtract.htmlToText(docs, "html")
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"htmlToText must not shuffle:\n$p1")
    val p2 = HtmlExtract.linkExtract(docs, "html", "url")
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"linkExtract must not shuffle:\n$p2")
    // r17: main-content extraction is per-row too — interpreted HOFs,
    // but still scan-local (no Exchange, no Window)
    val p3 = docs.select(HtmlExtract.mainContentCol(col("html")).as("m"))
      .queryExecution.executedPlan.toString
    assert(!p3.contains("Exchange") && !p3.contains("Window"),
      s"mainContentCol must stay in its scan partition:\n$p3")
  }
}
