package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for RFC 3986 reference resolution (r17,
  * verdict ask #3).
  *
  * Rationale: the pure-`Column` formulation of resolve + dot-segment
  * removal references its big subtrees many times — the branch CASE
  * reads the href ~9×, and the dot-segment fixpoint reads its input
  * ~5× — so wrapping an extracted column (`canonicalHref(html)`,
  * `baseHrefCol(html)`) multiplies the extraction tree ~45× and stacks
  * eleven regex layers on each copy. Catalyst analysis crawls and the
  * generated code nears the Janino cliff (measured: the ht-family
  * verify subset went from ~3 min to stalled when the chain landed as
  * Columns). Here each child is evaluated ONCE and the passes run as
  * precompiled `java.util.regex` replaceAll loops — the same engine
  * Spark's own `regexp_replace` uses, so the semantics match the
  * documented pattern chain (and its DuckDB transliteration in
  * `EntryShared.duckRemoveDotsCtes`/`duckResolveCase`) exactly; all
  * patterns are RE2-safe and none of the inputs may contain newlines
  * that could expose Java-vs-RE2 `$` differences (hrefs with embedded
  * newlines resolve to keys consistently within the engine either way).
  */
object UrlResolve {
  /** Max `<seg>/../` cancellation passes — mirrors
    * `HtmlExtract.dotSegmentBound` (the single source of truth; asserted
    * equal there). Deeper paths keep residual `../` textually, the
    * consistent-keys fallback.
    */
  val dotSegmentBound = 8

  private val originP = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")
  private val schemeP = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")
  private val anySchemeP = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*:")
  private val httpP = Pattern.compile("^(?i)https?://")
  private val originOnlyP = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/]*$")
  private val lastSegP = Pattern.compile("/[^/]*$")
  private val dotRunP = Pattern.compile("/(\\./)+")
  private val trailDotP = Pattern.compile("/\\.$")
  private val parentP = Pattern.compile("/(\\.\\.[^/]+|\\.[^./][^/]*|[^./][^/]*)/\\.\\.(/|$)")
  private val leadParentP = Pattern.compile("^(/\\.\\.)+(/|$)")

  /** Spark's `trim(col)` strips U+0020 only — NOT Java's `String.trim`,
    * which also strips control chars.
    */
  private def sparkTrim(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private def originOf(url: String): String = {
    val m = originP.matcher(url)
    if (m.find()) m.group(1) else ""
  }

  /** RFC 3986 §5.2.4 over the path of an absolute URL; origin-less
    * strings pass through. Pass order and patterns are 1:1 with the
    * documented Column/DuckDB chain: `./` runs → trailing `/.` →
    * [[dotSegmentBound]] parent-pair passes → leading `/..`;
    * query/fragment split off first and re-attached verbatim.
    */
  def removeDotSegments(url: String): String = {
    val origin = originOf(url)
    if (origin.isEmpty) return url
    val rest = url.substring(origin.length)
    var cut = rest.length
    var i = 0
    while (i < rest.length && cut == rest.length) {
      val c = rest.charAt(i)
      if (c == '?' || c == '#') cut = i
      i += 1
    }
    var p = rest.substring(0, cut)
    val tail = rest.substring(cut)
    p = dotRunP.matcher(p).replaceAll("/")
    p = trailDotP.matcher(p).replaceAll("/")
    var pass = 0
    while (pass < dotSegmentBound) {
      p = parentP.matcher(p).replaceAll("/")
      pass += 1
    }
    p = leadParentP.matcher(p).replaceAll("/")
    origin + p + tail
  }

  /** The resolve branch chain (see `HtmlExtract.resolveHrefCol`'s
    * scaladoc for the contract); returns null for NULL-semantics
    * branches (fragment-only, non-web scheme, origin-less base).
    */
  def resolve(base: String, href: String): String = {
    val h = sparkTrim(href)
    if (h.isEmpty || h.charAt(0) == '#') return null
    if (anySchemeP.matcher(h).find())
      return if (httpP.matcher(h).find()) removeDotSegments(h) else null
    val origin = originOf(base)
    if (origin.isEmpty) return null
    val stripped = {
      var cut = base.length
      var i = 0
      while (i < base.length && cut == base.length) {
        val c = base.charAt(i)
        if (c == '?' || c == '#') cut = i
        i += 1
      }
      base.substring(0, cut)
    }
    val merged =
      if (h.startsWith("//")) {
        val sm = schemeP.matcher(base)
        val scheme = if (sm.find()) sm.group(1).toLowerCase(java.util.Locale.ROOT) else ""
        scheme + ":" + h
      } else if (h.charAt(0) == '/') origin + h
      else if (h.charAt(0) == '?') stripped + h
      else {
        val dir =
          if (originOnlyP.matcher(stripped).find()) stripped + "/"
          else lastSegP.matcher(stripped).replaceAll("/")
        dir + h
      }
    removeDotSegments(merged)
  }
}

/** `remove_dot_segments(url)` as a native expression — child evaluated
  * once, precompiled patterns, codegen via a static call.
  */
case class RemoveDotSegments(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "remove_dot_segments"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UrlResolve.removeDotSegments(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UrlResolve.removeDotSegments($u.toString()));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RemoveDotSegments =
    copy(child = newChild)
}

/** `resolve_href(base, href)` as a native expression: the full RFC 3986
  * merge + dot-segment removal with both children evaluated once. NULL
  * base/href, fragment-only or empty hrefs, non-web schemes, and
  * origin-less bases all yield NULL — identical to the documented
  * branch chain and its DuckDB transliteration.
  */
case class ResolveHref(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "resolve_href"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(b: Any, h: Any): Any = {
    val r = UrlResolve.resolve(
      b.asInstanceOf[UTF8String].toString, h.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => {
      val r = ctx.freshName("r")
      s"""String $r = graft.functions.UrlResolve.resolve($b.toString(), $h.toString());
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($r);
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveHref =
    copy(left = l, right = r)
}
