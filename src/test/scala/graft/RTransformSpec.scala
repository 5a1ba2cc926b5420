package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sql.RTransform

/** R-semantics pins for the compiled transform expression sub-language
  * ([[graft.sql.RTransform]]): every case here is a documented base-R
  * behavior that a naive SQL translation would get WRONG (sign-of-divisor
  * modulo, banker's rounding, NA-propagating ifelse, non-sequential
  * transform() scoping, int-vs-double literal typing, 1-based inclusive
  * substr, never-NA %in%).
  */
class RTransformSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](expr: String, cols: (String, Any)*): Any = {
    val df = spark.sql("SELECT " + cols.map { case (n, v) =>
      v match {
        case s: String => s"'$s' AS $n"
        case null => s"CAST(NULL AS DOUBLE) AS $n"
        case d: Double => s"CAST($d AS DOUBLE) AS $n"
        case i: Long => s"CAST($i AS BIGINT) AS $n"
        case i: Int => s"CAST($i AS INT) AS $n"
        case b: Boolean => s"$b AS $n"
      }
    }.mkString(", "))
    val out = RTransform.transform(df, s"__r = $expr")
    out.select("__r").head().get(0)
  }

  test("reference shape: int / int is double division (V5 / V7)") {
    val df = Seq((5L, 2L)).toDF("V5", "V7")
    val out = RTransform.transform(df, "newcol = V5 / V7")
    assert(out.schema("newcol").dataType == DoubleType)
    assert(out.head().getDouble(2) == 2.5)
    assert(out.columns.toSeq == Seq("V5", "V7", "newcol"), "new column appends")
  }

  test("base-R transform scoping: every RHS sees the ORIGINAL frame") {
    val df = Seq((10L, 1L)).toDF("a", "b")
    // dplyr mutate would give c2 = (b+1)+1 = 3; base R transform gives
    // c2 = old a + 1 = 11 — the reference runs base R transform().
    // (double results: the literal 1 is R numeric, so int + 1 is double)
    val out = RTransform.transform(df, "a = b + 1, c2 = a + 1")
    val r = out.head()
    assert(r.getDouble(out.columns.indexOf("a")) == 2.0)
    assert(r.getDouble(out.columns.indexOf("c2")) == 11.0)
    assert(out.columns.toSeq == Seq("a", "b", "c2"), "replaced in place, new appended")
  }

  test("%% is R's sign-of-divisor modulo and stays integral") {
    assert(one("a %% b", "a" -> -7L, "b" -> 3L) == 2L)
    assert(one("a %% b", "a" -> 7L, "b" -> -3L) == -2L)
    assert(one("a %% b", "a" -> 7L, "b" -> 3L) == 1L)
    val df = Seq((-7L, 3L)).toDF("a", "b")
    assert(RTransform.transform(df, "m = a %% b").schema("m").dataType == LongType)
  }

  test("%/% is floor division") {
    assert(one("a %/% b", "a" -> -7L, "b" -> 2L) == -4L)
    assert(one("a %/% b", "a" -> 7L, "b" -> 2L) == 3L)
    assert(one("a %/% b", "a" -> -7.0, "b" -> 2L) == -3.5.floor)
  }

  test("^ binds tighter than unary minus and is right-associative") {
    assert(one("-a^2", "a" -> 2L) == -4.0)   // R: -(2^2)
    assert(one("(-a)^2", "a" -> 2L) == 4.0)
    assert(one("a^3^2", "a" -> 2L) == 512.0) // R: 2^(3^2)
    assert(one("a^-1", "a" -> 2L) == 0.5)    // unary on the exponent
  }

  test("round is banker's (half to even), like R") {
    assert(one("round(a)", "a" -> 0.5) == 0.0)
    assert(one("round(a)", "a" -> 1.5) == 2.0)
    assert(one("round(a)", "a" -> 2.5) == 2.0)
    assert(one("round(a, 1)", "a" -> 0.25) == 0.2)
    assert(one("round(a, digits = 1)", "a" -> 0.35) == 0.4) // 0.35 binary ≈ .3500000000000000088
  }

  test("ifelse propagates an NA condition (Spark's bare otherwise would not)") {
    assert(one("ifelse(a > 0, 'pos', 'neg')", "a" -> null) == null)
    assert(one("ifelse(a > 0, 'pos', 'neg')", "a" -> 3.0) == "pos")
    assert(one("ifelse(a > 0, 'pos', 'neg')", "a" -> -3.0) == "neg")
  }

  test("substr is 1-based and stop-inclusive; clips past the end") {
    assert(one("substr(s, 2, 4)", "s" -> "abcdef") == "bcd")
    assert(one("substr(s, 2, 99)", "s" -> "abcdef") == "bcdef")
    assert(one("substr(s, 4, 2)", "s" -> "abcdef") == "")
  }

  test("%in% never returns NA; paste renders NA as the string 'NA'") {
    assert(one("a %in% c(1, 2, 3)", "a" -> null) == false)
    assert(one("a %in% c(1, 2, 3)", "a" -> 2.0) == true)
    assert(one("a %in% c('x', 'y')", "a" -> "z") == false)
    assert(one("paste(s, a, sep = '-')", "s" -> "v", "a" -> null) == "v-NA")
    assert(one("paste0(s, 'x')", "s" -> "v") == "vx")
    assert(one("paste(s, 'x')", "s" -> "v") == "v x")
  }

  test("grepl takes (pattern, x); gsub translates R backrefs") {
    assert(one("grepl('^ab', s)", "s" -> "abc") == true)
    assert(one("grepl('^ab', s)", "s" -> "xabc") == false)
    assert(one("gsub('(a+)', '<\\\\1>', s)", "s" -> "baad") == "b<aa>d")
    assert(one("gsub('a', '$', s)", "s" -> "abc") == "$bc", "literal $ escaped for Java")
  }

  test("literal typing: 2 is double, 2L is integer (R semantics)") {
    val df = Seq((3L, 4L)).toDF("x", "y")
    val out = RTransform.transform(df,
      "d = x + 2, i = x + 2L, p = x * y, q = x + TRUE")
    assert(out.schema("d").dataType == DoubleType)
    assert(out.schema("i").dataType == LongType)
    assert(out.schema("p").dataType == LongType, "int*int stays integral")
    assert(out.schema("q").dataType == LongType, "R: TRUE + 1 == 2")
    val r = out.head()
    assert(r.getDouble(out.columns.indexOf("d")) == 5.0)
    assert(r.getLong(out.columns.indexOf("i")) == 5L)
    assert(r.getLong(out.columns.indexOf("q")) == 4L)
  }

  test("precedence: comparison binds tighter than !, & tighter than |") {
    // R parses !a == b as !(a == b)
    assert(one("!a == b", "a" -> 1L, "b" -> 2L) == true)
    assert(one("a > 0 & b > 0 | a > 10", "a" -> 1L, "b" -> -1L) == false)
    assert(one("1 + 2 * 3", "a" -> 0L) == 7.0)
    assert(one("TRUE || FALSE && FALSE", "a" -> 0L) == true) // && binds tighter
  }

  test("math and string functions with R semantics") {
    assert(one("log(a, base = 2)", "a" -> 8.0) == 3.0)
    assert(one("log(a, 2)", "a" -> 8.0) == 3.0)
    assert(one("as.integer(a)", "a" -> -2.7) == -2L, "R truncates toward zero")
    // r14 review: coercion failures are NA (R warns, never errors) — not
    // the ANSI CAST_INVALID_INPUT the plain cast threw on one bad cell
    assert(one("as.numeric(s)", "s" -> "abc") == null, "as.numeric('abc') is NA")
    assert(one("as.numeric(s)", "s" -> "2.5") == 2.5)
    assert(one("as.integer(s)", "s" -> "2.5") == 2L, "R parses via double then truncates")
    assert(one("as.integer(s)", "s" -> "abc") == null, "as.integer('abc') is NA")
    assert(one("is.na(as.integer(a / b))", "a" -> 0.0, "b" -> 0.0) == true,
      "as.integer(NaN) is NA, not an ANSI error")
    assert(one("trunc(a)", "a" -> -2.7) == -2.0)
    assert(one("ceiling(a)", "a" -> 2.1) == 3.0)
    assert(one("is.na(a)", "a" -> null) == true)
    assert(one("is.na(a / b)", "a" -> 0.0, "b" -> 0.0) == true, "R: is.na(NaN) is TRUE")
    assert(one("pmax(a, b, 10)", "a" -> 3L, "b" -> 7L) == 10.0)
    assert(one("nchar(s)", "s" -> "abc") == 3)
    assert(one("toupper(s)", "s" -> "ab") == "AB")
    assert(one("trimws(s)", "s" -> " ab ") == "ab")
    assert(one("startsWith(s, 'ab')", "s" -> "abc") == true)
    assert(one("sqrt(abs(a))", "a" -> -9L) == 3.0)
    assert(one("NA", "a" -> 0L) == null)
    assert(one("ifelse(a > 0, Inf, NaN)", "a" -> 1.0) == Double.PositiveInfinity)
  }

  test("errors name the problem: unknown column/function, duplicates, syntax") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e1 = intercept[IllegalArgumentException](RTransform.transform(df, "x = nope + 1"))
    assert(e1.getMessage.contains("unknown column 'nope'"))
    val e2 = intercept[IllegalArgumentException](RTransform.transform(df, "x = frobnicate(a)"))
    assert(e2.getMessage.contains("unsupported function 'frobnicate'"))
    val e3 = intercept[IllegalArgumentException](RTransform.transform(df, "x = a + 1, x = a + 2"))
    assert(e3.getMessage.contains("duplicate"))
    val e4 = intercept[IllegalArgumentException](RTransform.transform(df, "x = a +"))
    assert(e4.getMessage.contains("position"))
    val e5 = intercept[IllegalArgumentException](RTransform.transform(df, "x = a %foo% b"))
    assert(e5.getMessage.contains("%foo%"))
  }

  test("named arg disambiguation: f(x = 1) vs comparison inside args") {
    // sep = '-' is a named arg; a == b inside ifelse is a comparison
    assert(one("paste(s, ifelse(a == b, 'eq', 'ne'), sep = '-')",
      "s" -> "v", "a" -> 1L, "b" -> 1L) == "v-eq")
  }

  test("mapReduceR: the reference's keyval idiom compiles to a grouped aggregation") {
    val df = Seq(("a", 2L), ("a", 5L), ("b", 3L), ("b", 7L), ("b", 1L))
      .toDF("g", "v")
    val out = RTransform.mapReduceR(df,
      "function(part) { keyval(key=part$g, val=part$v) }",
      "function(key, vv) { keyval.row(key=key, val=sum(vv)) }")
    assert(out.columns.toSeq == Seq("key", "val"), "reference column names")
    assert(out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 7L, "b" -> 11L))
    // arithmetic over several aggregates, vv inside an aggregate's arg
    val stats = RTransform.mapReduceR(df,
      "function(part) keyval(key=part$g, val=part$v)", // braces optional
      "function(key, vv) keyval.row(key=key, val=sum(vv * vv) / length(vv) - mean(vv))")
    val got = stats.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == (4.0 + 25.0) / 2 - 3.5)
    assert(got("b") == (9.0 + 49.0 + 1.0) / 3 - 11.0 / 3)
    // a computed map key and value
    val comp = RTransform.mapReduceR(df,
      "function(p) keyval(key=toupper(p$g), val=p$v * 10L)", // 10L: R's bare 10 is double
      "function(k, xs) keyval.row(key=k, val=max(xs))")
    assert(comp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("A" -> 50L, "B" -> 70L))
  }

  test("mapReduceR: one partial-aggregated hash shuffle; idiom limits error clearly") {
    val df = Seq(("a", 2L)).toDF("g", "v")
    val out = RTransform.mapReduceR(df,
      "function(part) keyval(key=part$g, val=part$v)",
      "function(key, vv) keyval.row(key=key, val=sum(vv))")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("Window"))
    assert("(?s)HashAggregate.*partial_sum|partial".r.findFirstIn(plan).isDefined,
      s"expected map-side partial aggregation in:\n$plan")
    val e1 = intercept[IllegalArgumentException](RTransform.mapReduceR(df,
      "function(part) keyval(key=part$g, val=part$v)",
      "function(key, vv) keyval.row(key=key, val=vv + 1)"))
    assert(e1.getMessage.contains("inside an aggregate"))
    val e2 = intercept[IllegalArgumentException](RTransform.mapReduceR(df,
      "function(part) part$v",
      "function(key, vv) keyval.row(key=key, val=sum(vv))"))
    assert(e2.getMessage.contains("keyval"))
    val e3 = intercept[IllegalArgumentException](RTransform.mapReduceR(df,
      "function(part) keyval(key=part$g, val=part$v)",
      "function(key, vv) keyval.row(key=key, val=sum(part$v))"))
    assert(e3.getMessage.contains("$-access"))
  }

  test("the whole plan is one codegen'd projection — no UDF, no exchange") {
    val df = Seq((5L, 2L, "ab")).toDF("x", "y", "s")
    val out = RTransform.transform(df,
      "r = x / y, m = x %% y, f = ifelse(x > y, toupper(s), s)")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Exchange"))
    val analyzed = out.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("scalaudf"), s"got UDF in:\n$analyzed")
  }
}
