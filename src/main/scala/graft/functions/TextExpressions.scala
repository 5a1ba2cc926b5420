package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the shingling hot path.
  *
  * Rationale (same as VectorExpressions, measured the other way around):
  * the composable formulations — Dedup.shingleExpr's zip_with fold and
  * TextAnalysis.ngramsOf — are higher-order-function chains that run
  * INTERPRETED (lambda dispatch per element, an intermediate array per
  * fold level). Shingling is the single most expensive expression in the
  * dedup/decontamination pipelines (it touches every byte of every
  * document), so it deserves the same treatment as the vector math: one
  * tight loop, one output allocation, inside whole-stage codegen.
  *
  * Both expressions are DROP-IN equivalents of the HOF formulations —
  * byte-identical output arrays (order included) — pinned by
  * TextExprSpec's equivalence properties, so the DuckDB oracles that
  * replicate the SQL formulations stay valid unchanged.
  */
object TextExpressions {

  /** Shared normalize+tokenize: EXACTLY
    * `split(trim(regexp_replace(lower(text), '\s+', ' ')), ' ')` —
    * UTF8String.toLowerCase (Spark's Lower), Java-regex whitespace
    * collapse (Spark's RegExpReplace), space-only trim (Spark's
    * StringTrim), limit -1 split (Spark's StringSplit).
    */
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def normTokens(text: UTF8String): Array[String] = {
    // compiled-once pattern (RegExpReplace caches its pattern too) and an
    // index trim of ' ' only (StringTrim semantics) — no extra
    // String<->UTF8String round-trips on the per-document hot path
    val collapsed = WS.matcher(text.toLowerCase.toString).replaceAll(" ")
    var s = 0; var e = collapsed.length
    while (s < e && collapsed.charAt(s) == ' ') s += 1
    while (e > s && collapsed.charAt(e - 1) == ' ') e -= 1
    collapsed.substring(s, e).split(" ", -1)
  }

  /** Interpreted twin of [[WordShingles]]'s loop — also called from
    * generated code.
    */
  def computeShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = normTokens(text)
    val out =
      if (toks.length < n) Array(toks.mkString(" "))
      else {
        // first-occurrence-order distinct, like array_distinct
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        val sb = new java.lang.StringBuilder
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          seen.add(sb.toString); i += 1
        }
        seen.toArray(new Array[String](seen.size))
      }
    new GenericArrayData(out.map(UTF8String.fromString(_): AnyRef))
  }

  /** Interpreted twin of [[TokenNgrams]]'s loop — also called from
    * generated code. Windows containing a NULL element are skipped
    * (concat null-propagation in the HOF formulation).
    */
  def computeNgrams(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new java.util.ArrayList[AnyRef](len - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      var hasNull = false
      while (j < n && !hasNull) {
        if (toks.isNullAt(i + j)) hasNull = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
        }
        j += 1
      }
      if (!hasNull) out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Distinct word n-gram shingles of a raw text column — the native,
  * codegen'd equivalent of `Dedup.shingleExpr` (normalize, tokenize,
  * window, first-occurrence distinct; fewer than n tokens collapse to
  * one whole-text shingle; n <= 1 yields distinct tokens).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  // n == 1 needs no special case: windows of width 1 ARE the distinct
  // tokens (computeShingles' length-<-n branch can only fire for n >= 2,
  // since the tokenizer never returns an empty array)
  override def nullSafeEval(input: Any): Any =
    TextExpressions.computeShingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.computeShingles($c, $n);")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Rolling polynomial hash of a string's codepoints — the native,
  * codegen'd equivalent of the portable mod-prime char fold
  * (`aggregate(split(s, ''), 0L, (acc, ch) -> pmod(acc·mult + ascii(ch),
  * prime))`): acc is always < prime (≤ 2^30 for the primes in use) and
  * mult ≤ a few hundred, so acc·mult + cp stays far below 2^63 — no
  * overflow, and floorMod matches pmod. Iterates CODEPOINTS, matching
  * `split('')` (codepoint-aware) + `ascii` (first-codepoint value).
  *
  * This removes the "interpreted HOF — prefer xxhash64 at scale" caveat
  * from the portable dedup paths: cross-engine-reproducible hashing now
  * runs at codegen speed too.
  */
case class PolyHash(child: Expression, mult: Long, prime: Long) extends UnaryExpression {
  require(prime > 0 && mult > 0, s"mult/prime must be positive, got $mult/$prime")
  require(prime <= (1L << 31) && mult <= 1024,
    s"mult*prime must stay far below 2^63 (got $mult * $prime)")

  override def prettyName: String = "poly_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], mult, prime)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.compute($c, ${mult}L, ${prime}L);")

  override protected def withNewChildInternal(c: Expression): PolyHash =
    copy(child = c)
}

object PolyHash {
  /** Also called from generated code. */
  def compute(s: UTF8String, mult: Long, prime: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = java.lang.Math.floorMod(acc * mult + cp, prime)
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Word n-gram MULTISET over a token array — the native, codegen'd
  * equivalent of `TextAnalysis.ngramsOf` (duplicates kept, order
  * preserved, fewer than n tokens → empty, windows with NULL elements
  * skipped).
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"ngram width must be >= 2, got $n")

  override def prettyName: String = "token_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.computeNgrams(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.computeNgrams($c, $n);")

  override protected def withNewChildInternal(c: Expression): TokenNgrams =
    copy(child = c)
}
