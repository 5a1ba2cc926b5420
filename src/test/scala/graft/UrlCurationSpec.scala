package graft

import graft.pipeline.UrlCuration
import org.apache.spark.sql.functions._

class UrlCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(urls: String*): Seq[Option[String]] =
    urls.toDF("url")
      .select(UrlCuration.urlNormalizeCol(col("url")).as("n"))
      .collect().toSeq.map(r => Option(r.getString(0)))

  test("urlNormalize: case, ports, fragments, tracking params, empty path") {
    assert(norm("HTTPS://WWW.Example.COM:443/Path/A?x=1#frag") ==
      Seq(Some("https://www.example.com/Path/A?x=1")),
      "scheme+host lowercase, default port stripped, PATH CASE KEPT, fragment dropped")
    assert(norm("http://a.org:8080") == Seq(Some("http://a.org:8080/")),
      "non-default port kept; empty path becomes /")
    assert(norm("http://a.org:80/x") == Seq(Some("http://a.org/x")),
      "http default port 80 stripped")
    assert(norm("https://a.org:80/x") == Seq(Some("https://a.org:80/x")),
      "port 80 is NOT default for https — kept")
    assert(norm("https://h.io?utm_source=f&id=3&utm_campaign=c&gclid=z&b=2") ==
      Seq(Some("https://h.io/?id=3&b=2")),
      "tracking params stripped, survivors keep their original order")
    assert(norm("https://h.io/p?utm_source=x") == Seq(Some("https://h.io/p")),
      "fully-stripped query drops the '?'")
    assert(norm("https://h.io/p?ref") == Seq(Some("https://h.io/p")),
      "valueless tracking param (name-only) is stripped too")
    assert(norm("https://h.io/p?refresh=1") == Seq(Some("https://h.io/p?refresh=1")),
      "'ref' matches the whole name only — 'refresh' survives")
    assert(norm("  https://h.io/p  ") == Seq(Some("https://h.io/p")),
      "surrounding whitespace trimmed")
  }

  test("urlNormalize: non-absolute and empty-host inputs yield NULL") {
    assert(norm("not a url", "/relative/path", "example.com/no-scheme",
      "http:///nohost") == Seq(None, None, None, None))
    assert(Seq(Option.empty[String]).toDF("url")
      .select(UrlCuration.urlNormalizeCol(col("url")).as("n"))
      .collect()(0).isNullAt(0), "NULL in, NULL out")
  }

  test("hostOf mirrors the normalizer's host contract") {
    val h = Seq("HTTPS://WWW.Ex.COM:443/p", "no-scheme.com/x", "http://h.io?q=1")
      .toDF("url").select(UrlCuration.hostOf(col("url")).as("h"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(h == Seq(Some("www.ex.com"), None, Some("h.io")))
  }

  test("robotsRegexCol: wildcards, trailing-$ anchor, metacharacters literal") {
    val rx = Seq("/dir/", "/*.html$", "/a+b(c)?", "/x$y", "/p$")
      .toDF("p").select(UrlCuration.robotsRegexCol(col("p")).as("r"))
      .collect().toSeq.map(_.getString(0))
    assert(rx == Seq(
      "^/dir/",
      "^/.*\\.html$",
      "^/a\\+b\\(c\\)\\?",
      "^/x\\$y", // mid-pattern $ is literal
      "^/p$"))
  }

  test("robotsPathOf: path+query target, fragment dropped, empty path -> /") {
    val p = Seq("https://h.com/a/b?x=1#f", "https://h.com", "https://h.com?q=1",
      "no-scheme/x").toDF("url")
      .select(UrlCuration.robotsPathOf(col("url")).as("p"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(p == Seq(Some("/a/b?x=1"), Some("/"), Some("/?q=1"), None))
  }

  test("robotsFilter: longest match wins, allow wins ties, defaults, non-URLs dropped") {
    val rules = Seq(
      ("h.com", "disallow", "/private/"),
      ("h.com", "allow", "/private/ok.html$"),
      ("h.com", "disallow", "/*.tmp$"),
      ("strict.org", "disallow", "/"),
      ("strict.org", "allow", "/pub/")).toDF("host", "rule", "pattern")
    val urls = Seq(
      (1L, "https://h.com/private/secret"),      // disallowed by /private/
      (2L, "https://h.com/private/ok.html"),     // longer allow wins
      (3L, "https://h.com/private/ok.html?x=1"), // $ anchor fails -> /private/ applies
      (4L, "https://h.com/open/a.tmp"),          // wildcard disallow
      (5L, "https://h.com/open/page"),           // no match -> default allow
      (6L, "https://H.COM/PRIVATE/x"),           // host case-folds; PATH is case-sensitive -> kept
      (7L, "https://strict.org/anything"),       // blanket disallow
      (8L, "https://strict.org/pub/x"),          // carve-out allow
      (9L, "https://norules.net/x"),             // host without rules -> default
      (10L, "not a url")                         // quarantined
    ).toDF("id", "url")
    val kept = UrlCuration.robotsFilter(urls, "url", rules)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 5L, 6L, 8L, 9L), s"got $kept")
    // strict default: unmatched URLs drop instead
    val strict = UrlCuration.robotsFilter(urls, "url", rules, defaultAllow = false)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(strict == Set(2L, 8L), s"got $strict")
    // plan: the rule side broadcasts; no full-width shuffle of the corpus
    val plan = UrlCuration.robotsFilter(urls, "url", rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"rules must broadcast:\n$plan")
  }

  test("bracketed IPv6 authorities are quarantined to NULL, not host '['") {
    // r16 advice fix: '^([^:]*)' over '[::1]:8080' would yield host '['
    // — a non-NULL garbage key merging ALL IPv6-host URLs that share a
    // path/query into one dedup group. Both extractors must NULL them.
    val urls = Seq("https://[::1]:8080/x?a=1", "http://[2001:db8::1]/y",
      "https://[fe80::1]", "https://ok.com/x")
    assert(norm(urls: _*) ==
      Seq(None, None, None, Some("https://ok.com/x")))
    val h = urls.toDF("url").select(UrlCuration.hostOf(col("url")).as("h"))
      .collect().toSeq.map(r => Option(r.getString(0)))
    assert(h == Seq(None, None, None, Some("ok.com")))
  }

  test("registeredDomain: longest suffix rule wins; default '*' rule; bare suffix -> NULL") {
    val sfx = Seq("com", "uk", "co.uk", "github.io", "io")
    val hosts = Seq(
      "a.b.Example.COM",   // com -> example.com
      "x.co.uk",           // co.uk beats uk -> x.co.uk (host == reg domain)
      "deep.x.co.uk",      // -> x.co.uk
      "user.github.io",    // github.io beats io -> user.github.io
      "co.uk",             // bare suffix -> NULL
      "single",            // default '*' rule, no preceding label -> NULL
      "a.single",          // default '*' rule -> a.single
      ""                   // empty host -> NULL
    ).toDF("host")
    val out = UrlCuration.registeredDomain(hosts, "host", sfx)
      .select("host", "registered_domain", "registered_domain_suffix")
      .collect().toSeq.map(r =>
        (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(out == Seq(
      ("a.b.Example.COM", Some("example.com"), Some("com")),
      ("x.co.uk", Some("x.co.uk"), Some("co.uk")),
      ("deep.x.co.uk", Some("x.co.uk"), Some("co.uk")),
      ("user.github.io", Some("user.github.io"), Some("github.io")),
      ("co.uk", None, Some("co.uk")),
      ("single", None, Some("single")),
      ("a.single", Some("a.single"), Some("single")),
      ("", None, Some(""))))
  }

  test("registeredDomain: wildcard and exception rules (full PSL algorithm)") {
    val rules = Seq("com", "uk", "co.uk", "ck", "*.ck", "!www.ck")
    val hosts = Seq(
      "a.b.Site-1.CK",   // *.ck -> suffix site-1.ck, registered b.site-1.ck
      "Site-1.ck",       // wildcard consumes the whole host -> NULL
      "WWW.CK",          // exception prevails over *.ck: suffix ck, registered www.ck
      "sub.www.ck",      // trailing 'www.ck' matches the exception too
      "x.co.uk",         // exact rules unaffected
      "ck"               // bare suffix -> NULL
    ).toDF("host")
    val out = UrlCuration.registeredDomain(hosts, "host", rules)
      .select("host", "registered_domain", "registered_domain_suffix")
      .collect().toSeq.map(r =>
        (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(out == Seq(
      ("a.b.Site-1.CK", Some("b.site-1.ck"), Some("site-1.ck")),
      ("Site-1.ck", None, Some("site-1.ck")),
      ("WWW.CK", Some("www.ck"), Some("ck")),
      ("sub.www.ck", Some("www.ck"), Some("ck")),
      ("x.co.uk", Some("x.co.uk"), Some("co.uk")),
      ("ck", None, Some("ck"))))
  }

  test("registeredDomain rejects malformed rules and empty rule lists") {
    val df = Seq("a.com").toDF("host")
    intercept[IllegalArgumentException] {
      UrlCuration.registeredDomain(df, "host", Nil)
    }
    intercept[IllegalArgumentException] { // '*' only as a leading '*.'
      UrlCuration.registeredDomain(df, "host", Seq("a.*.b"))
    }
    intercept[IllegalArgumentException] { // 1-label exception would negate '*'
      UrlCuration.registeredDomain(df, "host", Seq("!ck"))
    }
    intercept[IllegalArgumentException] { // empty label
      UrlCuration.registeredDomain(df, "host", Seq("a..b"))
    }
  }

  test("urlDedup: raw spellings of one resource collapse; non-URLs excluded") {
    val docs = Seq(
      (1L, "https://A.com/x?utm_source=f"),
      (2L, "HTTPS://a.COM:443/x#frag"),    // same resource as 1
      (3L, "https://a.com/x?id=1"),        // different (query survives)
      (4L, "garbage")                      // not a URL -> excluded
    ).toDF("id", "url")
    val out = UrlCuration.urlDedup(docs, "url", "id").orderBy("url_norm")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out == Seq(
      ("https://a.com/x", 1L, 2L),
      ("https://a.com/x?id=1", 3L, 1L)))
  }

  test("incrementalUrlDedup: batch collapses in-batch, probes the index, excludes non-URLs") {
    val index = Seq("https://a.com/x").toDF("url")
      .select(org.apache.spark.sql.functions.md5(
        UrlCuration.urlNormalizeCol(col("url"))).as("fingerprint"))
    val batch = Seq(
      (1L, "HTTPS://A.com/x#top"),        // already indexed -> dropped
      (2L, "https://b.org/y?utm_source=f"),
      (3L, "https://B.ORG/y"),            // in-batch dup of 2 -> collapses
      (4L, "garbage")                     // non-URL -> excluded, not grouped
    ).toDF("id", "url")
    val out = UrlCuration.incrementalUrlDedup(batch, index, "url", "id")
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L))
    // empty index: every canonical resource survives once
    val empty = index.limit(0)
    val all = UrlCuration.incrementalUrlDedup(batch, empty, "url", "id")
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L))
  }

  test("plan pins: normalize is shuffle-free; suffix lookup is broadcast-only; dedup is one key shuffle") {
    val docs = spark.range(20000L).select(col("id"),
      concat(lit("https://Sub."), (col("id") % 37).cast("string"),
        lit(".Example.COM/p/"), (col("id") % 101).cast("string"),
        lit("?utm_source=x&id="), (col("id") % 53).cast("string")).as("url"))

    val normed = UrlCuration.urlNormalize(docs, "url")
    normed.collect()
    val nPlan = normed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!nPlan.contains("Exchange"),
      s"urlNormalize is a row-local expression — zero shuffles:\n$nPlan")

    val dom = UrlCuration.registeredDomain(
      normed.withColumn("host", UrlCuration.hostOf(col("url"))), "host")
    dom.collect()
    val dPlan = dom.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(dPlan.contains("BroadcastHashJoin"),
      s"suffix rules probe as broadcast joins:\n$dPlan")
    assert(!dPlan.contains("Exchange hashpartitioning") &&
      !dPlan.contains("SortMergeJoin"),
      s"the host column never shuffles for the suffix lookup:\n$dPlan")

    val dd = UrlCuration.urlDedup(docs, "url", "id")
    dd.collect()
    val gPlan = dd.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(gPlan).size == 1,
      s"urlDedup shuffles ONLY the canonical-url group key, once:\n$gPlan")
  }

  test("robotsParse: RFC 9309 group selection — longest matching token wins, ties merge") {
    import spark.implicits._
    val body =
      """# fleet policy
        |User-agent: other-bot
        |Disallow: /
        |
        |User-agent: graftbot-img
        |Disallow: /raw/ # inline comment
        |Allow: /raw/thumbs/
        |
        |User-agent: graftbot
        |Disallow: /slow/
        |
        |User-agent: *
        |Disallow: /$
        |Sitemap: https://h/sm.xml
        |noise without colon
        |Disallow:
        |""".stripMargin
    def parsed(agent: String): Set[(String, String, String)] =
      UrlCuration.robotsParse(Seq(("H.example.com", body)).toDF("host", "body"),
        "host", "body", agent)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // exact token beats the prefix group and the star group; host lowercases;
    // the inline comment strips; the empty-pattern Disallow emits nothing
    assert(parsed("graftbot-img") == Set(
      ("h.example.com", "disallow", "/raw/"),
      ("h.example.com", "allow", "/raw/thumbs/")))
    // prefix match: agent "graftbot-img2" matches "graftbot-img" (12) over
    // "graftbot" (8); agent "graftbot" matches only the 8-token group
    assert(parsed("graftbot") == Set(("h.example.com", "disallow", "/slow/")))
    // unknown agent falls to the * group; its empty Disallow drops
    assert(parsed("unrelated-crawler") == Set(("h.example.com", "disallow", "/$")))
    // two groups tied at max specificity MERGE (two User-agent: lines in
    // a row already share a group; a split tie merges via the best-join)
    val tied =
      """User-agent: abcd
        |Disallow: /one/
        |User-agent: abcz
        |Disallow: /two/
        |""".stripMargin
    assert(UrlCuration.robotsParse(Seq(("h", tied)).toDF("host", "body"),
        "host", "body", agent = "abc-something-else").collect().isEmpty)
    val merged = UrlCuration.robotsParse(Seq(("h", tied.replace("abcz", "abc-"))).toDF("host", "body"),
      "host", "body", agent = "abcd-x")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    // "abcd" (4) and "abc-" (4) both match agent "abcd-x"? "abc-" is not a
    // prefix of "abcd-x" — only "abcd" matches; no merge here
    assert(merged == Set(("disallow", "/one/")))
    // a genuine tie: tokens "abcd" and "abce" vs agent where both match is
    // impossible for distinct same-length prefixes — pin the CONSECUTIVE
    // UA-line merge instead (one group, two tokens)
    val consec =
      """User-agent: graftbot
        |User-agent: extra-bot
        |Disallow: /shared/
        |""".stripMargin
    assert(UrlCuration.robotsParse(Seq(("h", consec)).toDF("host", "body"),
        "host", "body", agent = "extra-bot/2.1")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet ==
      Set(("disallow", "/shared/")))
    // rules BEFORE any User-agent line attach to no group and drop
    val orphan = "Disallow: /early/\nUser-agent: *\nAllow: /ok/\n"
    assert(UrlCuration.robotsParse(Seq(("h", orphan)).toDF("host", "body"),
        "host", "body", agent = "x")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet ==
      Set(("allow", "/ok/")))
  }

  test("frontierSchedule: per-host rank, cap, delay offsets, quarantine (r17)") {
    val frontier = Seq(
      ("https://a.com/p1", 5.0), ("https://a.com/p2", 9.0),
      ("https://a.com/p3", 9.0), // priority tie → url ASC breaks it
      ("https://a.com/p4", 1.0), // rank 4 > maxPerHost → next cycle
      ("https://B.com/q", 2.0), // host case-folds
      ("not a url", 99.0) // NULL host → quarantined
    ).toDF("url", "prio")
    val out = UrlCuration.frontierSchedule(frontier, "url", "prio",
        crawlDelayMs = 500L, maxPerHost = 3)
      .orderBy("host", "slot").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a.com", "https://a.com/p2", 0L, 0L),
      ("a.com", "https://a.com/p3", 1L, 500L),
      ("a.com", "https://a.com/p1", 2L, 1000L),
      ("b.com", "https://B.com/q", 0L, 0L)), s"got ${out.toSeq}")
    // NULL priority schedules at 0.0 (not dropped)
    val np = UrlCuration.frontierSchedule(
        Seq(("https://c.com/x", Option.empty[Double]),
          ("https://c.com/y", Some(1.0))).toDF("url", "prio"),
        "url", "prio", 100L, 10).orderBy("slot").collect()
    assert(np.length == 2 && np(1).getString(1) == "https://c.com/x" &&
      np(1).getDouble(2) == 0.0)
  }

  test("frontierSchedule plan: bounded-heap aggregate, never a frontier-wide Window") {
    val big = spark.range(2000).select(
      concat(lit("https://h"), (col("id") % 7).cast("string"),
        lit(".example.com/p/"), col("id").cast("string")).as("url"),
      (col("id") % 13).cast("double").as("prio"))
    val out = UrlCuration.frontierSchedule(big, "url", "prio", 250L, 5)
    assert(out.count() == 35)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Window"),
      s"frontier ranking must ride the bounded-heap aggregate, not a window:\n$plan")
    assert(plan.contains("partial_bounded_top_k"),
      s"expected the BoundedTopK partial aggregate in:\n$plan")
  }

  test("resolveRedirects: chains, relative Location, loops, hop bound (r17)") {
    val log = Seq(
      // a -> b -> c (c terminal): one absolute edge, one 308
      ("https://h.com/a", 301, "https://h.com/b"),
      ("https://h.com/b", 308, "https://h.com/c"),
      ("https://h.com/c", 200, null.asInstanceOf[String]),
      // relative Location with dot segments resolves against the source
      ("https://h.com/d/e", 302, "../up/x"),
      // self-loop never terminates
      ("https://h.com/loop", 307, "https://h.com/loop"),
      // 200 with a Location-shaped header is NOT an edge
      ("https://h.com/plain", 200, "https://h.com/elsewhere"))
      .toDF("url", "status", "location")
    val out = UrlCuration.resolveRedirects(log, "url", "status", "location",
        maxHops = 3)
      .collect().map(r =>
        r.getString(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out("https://h.com/a") == (("https://h.com/c", 2L, true)))
    assert(out("https://h.com/b") == (("https://h.com/c", 1L, true)))
    assert(out("https://h.com/c") == (("https://h.com/c", 0L, true)))
    assert(out("https://h.com/d/e") == (("https://h.com/up/x", 1L, true)))
    assert(out("https://h.com/loop") == (("https://h.com/loop", 3L, false)))
    assert(out("https://h.com/plain") == (("https://h.com/plain", 0L, true)))
    // a re-crawled URL with diverging targets keeps the least target
    val dup = Seq(("https://h.com/r", 301, "https://h.com/z2"),
      ("https://h.com/r", 301, "https://h.com/z1")).toDF("url", "status", "location")
    val d = UrlCuration.resolveRedirects(dup, "url", "status", "location", 2)
      .collect()
    assert(d.length == 1 && d(0).getString(1) == "https://h.com/z1")
  }

  test("revisitSchedule: CGM estimator, clamps, never-changed and single-fetch (r17)") {
    val t0 = 1700000000.0
    val hist = (
      // changes every fetch: x = n = 4, interval 100 s
      (0 to 4).map(i => ("https://h/fast", t0 + i * 100, s"f$i")) ++
      // never changes: x = 0
      (0 to 4).map(i => ("https://h/still", t0 + i * 100, "same")) ++
      // one change in 4 intervals
      (0 to 4).map(i => ("https://h/slow", t0 + i * 100, if (i < 3) "a" else "b")) ++
      Seq(("https://h/once", t0, "x"))
    ).toDF("url", "ts", "hash")
    val out = UrlCuration.revisitSchedule(hist, "url", "ts", "hash",
        minIntervalS = 40.0, maxIntervalS = 10000.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def cgm(n: Int, x: Int, ibar: Double) =
      -math.log((n - x + 0.5) / (n + 0.5)) / ibar
    val fast = out("https://h/fast")
    assert(fast._1 == 5L && fast._2 == 4L)
    assert(math.abs(fast._3 - cgm(4, 4, 100.0)) < 1e-12)
    // 1/λ ≈ 45.5 s, inside [40, 10000] — unclamped
    assert(math.abs(fast._4 - 1.0 / cgm(4, 4, 100.0)) < 1e-9)
    val slow = out("https://h/slow")
    assert(slow._2 == 1L && math.abs(slow._3 - cgm(4, 1, 100.0)) < 1e-12)
    // x=0 -> λ=0 -> max clamp; single fetch -> max clamp with n_fetches=1
    assert(out("https://h/still") == ((5L, 0L, 0.0, 10000.0)))
    assert(out("https://h/once") == ((1L, 0L, 0.0, 10000.0)))
    // min clamp: sub-second intervals with constant change
    val rapid = (0 to 4).map(i => ("https://h/rapid", t0 + i * 0.5, s"r$i"))
      .toDF("url", "ts", "hash")
    val rv = UrlCuration.revisitSchedule(rapid, "url", "ts", "hash", 40.0, 10000.0)
      .collect()(0).getDouble(4)
    assert(rv == 40.0, s"expected min clamp, got $rv")
    // tied timestamps order by hash, not shuffle arrival: (t0,"b"),
    // (t0,"a"), (t0+100,"a") always reads a,b,a -> two changes
    val tied = Seq(("https://h/tie", t0, "b"), ("https://h/tie", t0, "a"),
      ("https://h/tie", t0 + 100, "a")).toDF("url", "ts", "hash")
    val tr = UrlCuration.revisitSchedule(tied, "url", "ts", "hash", 40.0, 10000.0)
      .collect()(0)
    assert(tr.getLong(2) == 2L, s"tie order must be hash-deterministic, got $tr")
  }

  test("robotsCrawlDelays + per-host frontier delays (r17)") {
    val body =
      """User-agent: other-bot
        |Crawl-delay: 99
        |Disallow: /
        |
        |User-agent: graftbot
        |Crawl-delay: 1.5 # seconds
        |Disallow: /tmp/
        |
        |User-agent: *
        |Crawl-delay: 7
        |""".stripMargin
    val d = UrlCuration.robotsCrawlDelays(
        Seq(("A.example.com", body), ("b.example.com", "User-agent: *\nCrawl-delay: fast\n"))
          .toDF("host", "body"), "host", "body", agent = "graftbot-img")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the selected (prefix) group's delay wins — never other-bot's 99
    // or the star group's 7; unparseable values drop the host entirely
    assert(d == Map("a.example.com" -> 1.5), s"got $d")
    // the schedule overload spaces each host by ITS budget
    val delays = Seq(("a.example.com", 2.0)).toDF("host", "crawl_delay_s")
    val frontier = Seq(("https://a.example.com/1", 9.0),
      ("https://a.example.com/2", 5.0), ("https://nodelay.com/x", 1.0))
      .toDF("url", "prio")
    val out = UrlCuration.frontierSchedule(frontier, "url", "prio",
        delays, defaultDelayMs = 500L, maxPerHost = 10)
      .orderBy("host", "slot").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("https://a.example.com/1", 0L, 0L),
      ("https://a.example.com/2", 1L, 2000L),
      ("https://nodelay.com/x", 0L, 0L)), s"got ${out.toSeq}")
  }

  test("robotsSitemaps: host-wide extraction regardless of group position (r17)") {
    import spark.implicits._
    val body =
      """Sitemap: https://H/before-any-group.xml
        |User-agent: bot-a
        |Disallow: /x/
        |sitemap: https://H/Inside-A-Group.xml # mirror
        |User-agent: *
        |SITEMAP: https://H/upper.xml
        |Sitemap:
        |noise line
        |""".stripMargin
    val out = UrlCuration.robotsSitemaps(
        Seq(("Crawl.Example.COM", body)).toDF("host", "body"), "host", "body")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // sitemap lines are NOT group-scoped; field name case-folds, the
    // URL's case is preserved; inline comments strip; empty values drop
    assert(out == Set(
      ("crawl.example.com", "https://H/before-any-group.xml"),
      ("crawl.example.com", "https://H/Inside-A-Group.xml"),
      ("crawl.example.com", "https://H/upper.xml")), s"got $out")
    // and robotsParse IGNORES sitemap lines entirely (no rule rows,
    // no group breaks: the rule after the mid-group sitemap still
    // belongs to bot-a's group)
    val rules = UrlCuration.robotsParse(
        Seq(("h", "User-agent: bot-a\nSitemap: https://h/s.xml\nDisallow: /y/\n"))
          .toDF("host", "body"), "host", "body", agent = "bot-a")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(rules == Set(("disallow", "/y/")))
  }
}
