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
/** Word → language-membership bitmask over the SORTED language codes of
  * a stopword table; one hash probe per token classifies it for every
  * language at once (see [[StopwordLangId]]). Top-level class (not
  * nested in the companion) so its binary name is `$`-free — it appears
  * verbatim in generated Java as the reference-object cast type.
  */
final class LangTable(val langs: Array[String],
                      val masks: java.util.HashMap[UTF8String, Integer])
  extends Serializable

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

  def buildLangTable(stopwords: Seq[(String, Seq[String])]): LangTable = {
    val langs = stopwords.map(_._1).sorted.toArray
    require(langs.length <= 32, s"at most 32 languages per table, got ${langs.length}")
    val masks = new java.util.HashMap[UTF8String, Integer]()
    val byLang = stopwords.toMap
    langs.zipWithIndex.foreach { case (l, i) =>
      byLang(l).foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = masks.get(k)
        masks.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    new LangTable(langs, masks)
  }

  private val UND = UTF8String.fromString("und")

  /** Interpreted twin of [[StopwordLangId]]'s loop — also called from
    * generated code. Semantics are EXACTLY TextAnalysis.langIdOf's HOF
    * chain: per language score = stopword hits / max(#tokens, 1) as an
    * exactly-rounded IEEE division (so any engine computes the same
    * double), argmax replaces only on STRICTLY greater (ties keep the
    * earlier language in sorted-code order), best below minScore →
    * "und". NULL tokens count in the denominator (size(toks)) but can
    * match no stopword — same as array_contains(set, NULL) being dropped
    * by the HOF filter.
    */
  def computeLangId(toks: ArrayData, table: LangTable, minScore: Double): UTF8String = {
    val n = toks.numElements()
    val denom = math.max(n, 1).toDouble
    val hits = new Array[Int](table.langs.length)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val m = table.masks.get(toks.getUTF8String(i))
        if (m != null) {
          var v = m.intValue()
          while (v != 0) {
            hits(Integer.numberOfTrailingZeros(v)) += 1
            v &= v - 1
          }
        }
      }
      i += 1
    }
    var bestIdx = 0
    var bestScore = hits(0) / denom
    var l = 1
    while (l < hits.length) {
      val s = hits(l) / denom
      if (s > bestScore) { bestScore = s; bestIdx = l }
      l += 1
    }
    if (bestScore >= minScore) UTF8String.fromString(table.langs(bestIdx)) else UND
  }

  /** Interpreted twin of [[TopNgramCount]]'s loop — also called from
    * generated code. Max multiplicity of any n-gram of the token array
    * (0 when fewer than n tokens); windows containing a NULL element are
    * skipped, matching [[computeNgrams]].
    */
  def computeTopNgramCount(toks: ArrayData, n: Int): Long = {
    val len = toks.numElements()
    if (len < n) return 0L
    val counts = new java.util.HashMap[String, Long]()
    var mx = 0L
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
      if (!hasNull) {
        val c = counts.merge(sb.toString, 1L, (a, b) => a + b)
        if (c > mx) mx = c
      }
      i += 1
    }
    mx
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

  private val MinHashP = 1000000007L

  /** Also called from generated code. Returns null for an empty (or
    * all-null) array — see MinHashAffine's doc.
    */
  def computeMinHash(shingles: ArrayData, k: Int, portable: Boolean): GenericArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val s = shingles.getUTF8String(i)
        val h =
          if (portable) PolyHash.compute(s, 31L, MinHashP)
          else java.lang.Math.floorMod(
            org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L),
            MinHashP)
        var j = 0
        while (j < k) {
          val v = java.lang.Math.floorMod(
            h * (2L * j + 1) + (j * 1000003L + 12345L) % MinHashP, MinHashP)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** Also called from generated code — see [[SortedStructSum]].
    * keyTag: 0 = int, 1 = long, 2 = string. Returns a boxed Double
    * (null when any element or value is NULL, poisoning the fold the
    * way `acc + NULL` does).
    */
  def sortedStructSum(arr: ArrayData, keyTag: Int): java.lang.Double = {
    val n = arr.numElements()
    if (n == 0) return java.lang.Double.valueOf(0.0)
    val idx = new Array[Integer](n)
    val keyNull = new Array[Boolean](n)
    val vals = new Array[Double](n)
    val lkeys = if (keyTag <= 1) new Array[Long](n) else null
    val skeys = if (keyTag == 2) new Array[UTF8String](n) else null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null // null element ⇒ acc + NULL ⇒ NULL
      val row = arr.getStruct(i, 2)
      if (row.isNullAt(1)) return null // null value ⇒ NULL fold
      idx(i) = Integer.valueOf(i)
      vals(i) = row.getDouble(1)
      keyNull(i) = row.isNullAt(0)
      if (!keyNull(i)) {
        if (keyTag == 0) lkeys(i) = row.getInt(0)
        else if (keyTag == 1) lkeys(i) = row.getLong(0)
        else skeys(i) = row.getUTF8String(0)
      }
      i += 1
    }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val x = a.intValue; val y = b.intValue
        if (keyNull(x) || keyNull(y)) {
          if (keyNull(x) && keyNull(y))
            return java.lang.Double.compare(vals(x), vals(y))
          return if (keyNull(x)) -1 else 1 // nulls first, ascending
        }
        val kc =
          if (keyTag == 2) skeys(x).compareTo(skeys(y))
          else java.lang.Long.compare(lkeys(x), lkeys(y))
        if (kc != 0) kc else java.lang.Double.compare(vals(x), vals(y))
      }
    })
    var s = 0.0
    i = 0
    while (i < n) { s += vals(idx(i).intValue); i += 1 }
    java.lang.Double.valueOf(s)
  }

  /** Also called from generated code — see [[BucketTfPairs]]. One pass:
    * unigram folds, bigram-window folds ([[computeNgrams]] semantics:
    * NULL-containing windows skipped), counts per bucket, sorted output.
    *
    * Precondition (ADVICE r17): token elements must be NON-NULL (the
    * TokenTfPairs contract — tokensExpr never emits NULL elements).
    * NULL elements are SKIPPED here, whereas the exploded reference
    * shape (explode(concat(toks, ngrams)) → pmod(portableFold)) would
    * emit a NULL-bucket count row; the two shapes are bit-identical
    * only under the no-NULL-elements precondition.
    */
  def bucketTfPairs(toks: ArrayData, buckets: Int, mult: Long,
                    prime: Long): ArrayData = {
    val n = toks.numElements()
    val counts = new java.util.TreeMap[Integer, Long]()
    def add(h: Long): Unit = {
      val b = Integer.valueOf(java.lang.Math.floorMod(h, buckets.toLong).toInt)
      val prev = counts.get(b)
      counts.put(b, if (prev == null) 1L else prev.longValue() + 1L)
    }
    // The bigram feature's fold equals the unigram fold of token i−1
    // extended by ' ' and token i's code points (PolyHash is a running
    // fold), so each token is walked ONCE carrying two accumulators —
    // no "t1 t2" string is ever built. prevHash = −1 marks "no valid
    // left neighbor" (start of array, or a NULL element: NULL windows
    // are skipped per TokenNgrams). Hash values are in [0, prime) so
    // −1 is unreachable as a real fold value.
    var prevHash = -1L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) prevHash = -1L
      else {
        val str = toks.getUTF8String(i).toString
        var h = 0L
        var bg = if (prevHash >= 0L)
          java.lang.Math.floorMod(prevHash * mult + ' '.toInt, prime)
        else -1L
        var j = 0
        while (j < str.length) {
          val cp = str.codePointAt(j)
          h = java.lang.Math.floorMod(h * mult + cp, prime)
          if (bg >= 0L) bg = java.lang.Math.floorMod(bg * mult + cp, prime)
          j += Character.charCount(cp)
        }
        add(h)
        if (bg >= 0L) add(bg)
        prevHash = h
      }
      i += 1
    }
    val out = new Array[AnyRef](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.intValue(), e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Also called from generated code — see [[IntersectSize]]. Counts
    * |distinct(a) ∩ distinct(b)|, a NULL element being one value.
    */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String](Math.max(4, na * 2))
    var aHasNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true else setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[UTF8String](Math.max(4, nb * 2))
    var cnt = 0
    var bNullCounted = false
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) {
        if (aHasNull && !bNullCounted) { cnt += 1; bNullCounted = true }
      } else {
        val v = b.getUTF8String(i)
        if (setA.contains(v) && seenB.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  /** Also called from generated code — see [[TokenDictIds]]. UTF8String
    * keys probe without per-token String conversion; `getUTF8String`
    * views share the array's bytes, and UTF8String hashes/compares by
    * content.
    */
  def tokenDictIds(toks: ArrayData,
                   dict: java.util.HashMap[UTF8String, Integer],
                   oovId: Int): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) out(i) = oovId // tokensExpr never emits NULLs
      else {
        val t = dict.get(toks.getUTF8String(i))
        out(i) = if (t == null) oovId else t.intValue()
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Also called from generated code — see [[TokenTfPairs]]. */
  def tokenTfPairs(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val counts = new java.util.TreeMap[UTF8String, Long]()
    var nullTf = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) nullTf += 1L
      else {
        val t = toks.getUTF8String(i)
        val prev = counts.get(t)
        counts.put(t, if (prev == null) 1L else prev.longValue() + 1L)
      }
      i += 1
    }
    val out = new Array[AnyRef](counts.size() + (if (nullTf > 0) 1 else 0))
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue.longValue())
      j += 1
    }
    if (nullTf > 0)
      out(j) = org.apache.spark.sql.catalyst.InternalRow(null, nullTf)
    new GenericArrayData(out)
  }

  /** Also called from generated code — see [[BucketWeightSum]]. */
  def bucketWeightSum(pairs: ArrayData, lr: Array[Double]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = pairs.numElements()
    var nf = 0L
    var w = 0.0
    var i = 0
    while (i < n) {
      val row = pairs.getStruct(i, 2)
      val b = row.getInt(0)
      if (b >= 0 && b < lr.length && !java.lang.Double.isNaN(lr(b))) {
        val tf = row.getLong(1)
        nf += tf
        w += tf.toDouble * lr(b)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(nf, w)
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

/** Max multiplicity of any word n-gram of a token array — the native,
  * codegen'd replacement for the explode → groupBy(id, ngram) →
  * groupBy(id).max → join-back shape in repetition metrics. A
  * per-document statistic needs no shuffle at all: one pass, one local
  * hash map, output one long. Counts EXACT n-gram strings (the previous
  * shape counted xxhash64 values — collision-safe only probabilistically;
  * this is what the DuckDB oracle counts too).
  */
case class TopNgramCount(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def prettyName: String = "top_ngram_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.computeTopNgramCount(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.computeTopNgramCount($c, $n);")

  override protected def withNewChildInternal(c: Expression): TopNgramCount =
    copy(child = c)
}

/** Stopword-ratio language ID over a token array — the native, codegen'd
  * equivalent of `TextAnalysis.langIdOf` (byte-identical output, pinned
  * by TextExprSpec equivalence, so the DuckDB oracle replicas of the HOF
  * formulation stay valid unchanged).
  *
  * Rationale: the HOF formulation evaluates one interpreted
  * filter(array_contains) pass PER LANGUAGE (4 lambda-dispatch scans of
  * every token of every document — measured 1.55 s of t01's 2.05 s at
  * sf0.1). This is one scan with one hash probe per token that
  * classifies the token for every language at once via a membership
  * bitmask. Languages and minScore are plan-structural parameters
  * (equality/canonicalization work on them); the probe table is built
  * once per plan instance and shipped to generated code as a codegen
  * reference object.
  */
case class StopwordLangId(child: Expression,
                          stopwords: Seq[(String, Seq[String])],
                          minScore: Double) extends UnaryExpression {
  require(stopwords.nonEmpty, "stopword_lang_id: need at least one language")
  // fail at PLAN CONSTRUCTION, not at the first (possibly executor-side,
  // mid-job) evaluation of the lazy probe table
  require(stopwords.length <= 32,
    s"stopword_lang_id: membership bitmask is an Int (32 languages max), got ${stopwords.length}")

  @transient private lazy val table = TextExpressions.buildLangTable(stopwords)

  override def prettyName: String = "stopword_lang_id"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.computeLangId(input.asInstanceOf[ArrayData], table, minScore)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("langTable", table,
      classOf[LangTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.computeLangId(" +
        s"$c, $tableRef, ${minScore}D);")
  }

  override protected def withNewChildInternal(c: Expression): StopwordLangId =
    copy(child = c)
}

/** All k affine MinHash values of a shingle array in ONE pass — the
  * native, codegen'd equivalent of Dedup's explode → base-hash →
  * partial-aggregated-min shape (Dedup.affineMinhash): for each shingle,
  * H = base(s) mod p (base = xxhash64 seed 42, or the portable 31/1e9+7
  * char fold), then v_i = (H·(2i+1) + (i·1000003 + 12345) mod p) mod p,
  * minimized per i across the array. Identical arithmetic, identical
  * minima — the d07/d10 DuckDB oracle replicas are unaffected.
  *
  * Why a native expression and not the explode: the aggregate
  * formulation materializes one row PER (doc, shingle) and shuffles a
  * k-long map-side-combined row per doc; this loop reads the shingle
  * array the row already holds (WordShingles output) and emits the
  * signature in place — no exploded rows, no aggregation hash map, no
  * shuffle. (The old "nested HOF was 10+ minutes" caveat was about
  * INTERPRETED lambdas re-evaluating the shingle tree per reference —
  * a compiled loop over a materialized array has neither problem.)
  *
  * Empty arrays yield NULL (no shingles → no minima), matching the
  * explode path where such a doc simply has no signature row; callers
  * filter the nulls. NULL elements are skipped (WordShingles emits
  * none).
  */
case class MinHashAffine(child: Expression, k: Int, portable: Boolean)
    extends UnaryExpression {
  require(k >= 1 && k <= 512, s"k must be in [1, 512], got $k")

  override def prettyName: String = "minhash_affine"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.computeMinHash(input.asInstanceOf[ArrayData], k, portable)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.TextExpressions.computeMinHash($c, $k, $portable);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    code
  }

  override protected def withNewChildInternal(c: Expression): MinHashAffine =
    copy(child = c)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native, codegen'd
  * expression — the canonicalization step in front of exact/fuzzy text
  * dedup keys: visually-identical strings that differ only in combining
  * sequence ("e" + U+0301 vs precomposed "é") or compatibility forms
  * (ligatures, full-width digits under NFKC) must hash identically or
  * every downstream dedup silently under-merges. Spark has no built-in
  * for this; a Scala UDF would break whole-stage codegen on a path that
  * touches every byte of every document.
  *
  * The common case — already-normalized ASCII/NFC text — takes the
  * `Normalizer.isNormalized` fast path (one verification scan; the
  * java.text API needs a String view of the bytes, but no normalized
  * copy is built) and returns the input UTF8String unchanged.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(UnicodeNormalize.forms.contains(form),
    s"form must be one of ${UnicodeNormalize.forms.mkString("/")}, got '$form'")

  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeNormalize.compute($c, "$form");""")

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Also called from generated code. */
  def compute(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** Shannon entropy (bits) of a string's code-POINT distribution — the
  * classic compressibility/gibberish quality signal: repeated filler and
  * binary-ish junk sit low, random noise high, natural language in a
  * band between (a DataComp/CCNet-adjacent gate that needs no model).
  * One pass over the string per row, no shuffle, no allocation beyond
  * the per-row count map. Empty string → 0.0; surrogate pairs count as
  * ONE symbol (code points, not UTF-16 units — engine-portable).
  * Determinism: the per-symbol terms fold in ascending code-point order
  * (TreeMap), so the float sum is bit-stable across layouts.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_entropy"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
}

object CharEntropy {
  private val LOG2 = math.log(2.0)

  /** Also called from generated code. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0; var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp); n += 1
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * (math.log(p) / LOG2)
    }
    h
  }
}

/** Bit-stable ordered float fold, compiled: the sum of field 1 (double)
  * of an array<struct<key, double>> in ascending (key, value) struct
  * order — the native replacement for the interpreted
  * `aggregate(sort_array(collect_list(struct(k, v))), 0.0, acc + v)`
  * chain used by every "fold in key order so the float total is
  * bit-stable" site (Dsir weights, BM25/TF-IDF per-doc totals, the
  * unigram/bigram/NB log-prob scores). Both `sort_array` and a lambda
  * `aggregate` are CodegenFallback in Spark 4 — the per-group fold ran
  * INTERPRETED, megamorphic eval chain and all (the same expression
  * class the r17 a11 probe attributed: see SCALE.md "the int8 kernel
  * ran interpreted").
  *
  * Result-identical by construction:
  *   - `sort_array` ascending orders structs field-lexicographically
  *     with nulls first per field; summation only observes that order
  *     through float non-associativity, and the one ordering difference
  *     here (value ties broken by `Double.compare`, which splits ±0.0 /
  *     NaN where Spark's nan-safe compare ties them) cannot change a
  *     sum (x + ±0.0 and NaN-poisoning are order-blind).
  *   - a NULL element or NULL value poisons the fold to NULL exactly
  *     like `acc + NULL`.
  *   - an empty array returns the fold's 0.0 zero literal.
  */
case class SortedStructSum(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sorted_struct_sum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val keyTag: Int = child.dataType match {
    case ArrayType(st: StructType, _) => st.fields(0).dataType match {
      case IntegerType => 0
      case LongType => 1
      case StringType => 2
      case _ => -1
    }
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fields.length == 2 && st.fields(1).dataType == DoubleType &&
          (st.fields(0).dataType == IntegerType ||
            st.fields(0).dataType == LongType ||
            st.fields(0).dataType == StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<int|bigint|string, double>>, " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.sortedStructSum(input.asInstanceOf[ArrayData], keyTag)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ossResult")
      s"""java.lang.Double $r = graft.functions.TextExpressions.sortedStructSum($c, $keyTag);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $r.doubleValue();""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SortedStructSum =
    copy(child = c)
}

/** Per-document hashed unigram+bigram bucket term frequencies, compiled
  * — the native one-pass replacement for DSIR's
  * `explode(concat(toks, ngrams)) → pmod(portableFold(f), B) →
  * groupBy(id, bucket).count` shape: the per-(doc, bucket) aggregation
  * happens INSIDE the row (one local hash map), so the corpus never
  * shuffles token-level rows at all (guide §2.3/§2.4 — the per-doc tf
  * is a per-row statistic, not a distributed aggregate). Output:
  * array<struct<bucket int, tf bigint>> SORTED by bucket ascending —
  * the fold order every weight consumer needs. Bucket assignment is
  * bit-identical to the exploded shape: PolyHash (portableFold) of the
  * token / "t1 t2" bigram window (NULL-window skip per TokenNgrams),
  * floorMod into `buckets`. A NULL token array propagates NULL (the
  * exploded shape emits no rows for it; consumers coalesce), an empty
  * one yields the empty array.
  */
case class BucketTfPairs(child: Expression, buckets: Int,
                         mult: Long = 31L, prime: Long = 1000000007L)
    extends UnaryExpression {
  require(buckets > 0 && buckets <= (1 << 24),
    s"buckets must be in [1, 2^24], got $buckets")

  override def prettyName: String = "bucket_tf_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("bucket", IntegerType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.bucketTfPairs(input.asInstanceOf[ArrayData], buckets, mult, prime)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.bucketTfPairs(" +
        s"$c, $buckets, ${mult}L, ${prime}L);")

  override protected def withNewChildInternal(c: Expression): BucketTfPairs =
    copy(child = c)
}

/** Importance weight over a [[BucketTfPairs]] array, compiled: iterates
  * the (bucket, tf) pairs in their bucket-ascending array order and
  * returns struct(n_feats = Σ tf, weight = Σ tf · lr[bucket]) — the
  * per-row replacement for DSIR's broadcast-join + groupBy(id) +
  * ordered-fold stage. `lr` is the config-sized per-bucket log-ratio
  * table injected as a reference array (NaN = bucket absent, replicating
  * the inner join: absent buckets contribute to NEITHER sum — by
  * construction every raw-corpus bucket is present). Empty pairs →
  * (0, 0.0), the left-join + coalesce contract.
  */
case class BucketWeightSum(child: Expression,
                           lr: org.apache.spark.broadcast.Broadcast[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "bucket_weight_sum"
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fields.length == 2 && st.fields(0).dataType == IntegerType &&
          st.fields(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<int, bigint>>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.bucketWeightSum(input.asInstanceOf[ArrayData], lr.value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // r18 (ADVICE): the table rides a Broadcast handle — the reference
    // object serialized with every task binary is now a few bytes; the
    // buckets-sized double[] ships once per executor.
    val bcRef = ctx.addReferenceObj("lrBc", lr,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.bucketWeightSum(" +
        s"$c, (double[]) $bcRef.value());")
  }

  override protected def withNewChildInternal(c: Expression): BucketWeightSum =
    copy(child = c)
}

/** |distinct(a) ∩ distinct(b)| without materializing the intersection —
  * the native verify kernel for exact Jaccard over shingle sets
  * (`size(array_intersect(a, b))` builds the intersection ARRAY and
  * immediately discards everything but its length; the companion
  * `size(array_union)` is redundant entirely: for the distinct arrays
  * the shingler emits, |a ∪ b| = |a| + |b| − |a ∩ b|). One hash set
  * build over `a`, one de-duplicated probe pass over `b` — matching
  * array_intersect's distinct-result counting exactly, including a NULL
  * element counting as one value present on both sides.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "intersect_size"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string> columns, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextExpressions.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextExpressions.intersectSize($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
    copy(left = l, right = r)
}

/** Per-row element multiplicities of an array<string>, compiled:
  * array<struct<token string, tf bigint>> sorted by token (binary
  * UTF8String order; a NULL element — impossible from tokensExpr, kept
  * for exactness — counts into one trailing NULL-token pair). This is
  * `explode(arr) → groupBy(row, element).count` computed INSIDE the row:
  * the term-frequency stage's corpus-wide (id, token) exchange
  * disappears — downstream consumers explode the (few) distinct-element
  * pairs instead of shuffling every element occurrence (guide §2.3:
  * aggregate before you shuffle, here before ANY shuffle).
  */
/** Per-row vocabulary encoding: token array → int-id array via a
  * BROADCAST token→id dictionary (OOV → `oovId`). The per-row
  * replacement for encodeTokens' posexplode → vocab join →
  * groupBy(id) reassembly: the dictionary ships once per executor and
  * every document encodes inside its own row — the corpus never
  * shuffles token-level rows (r18, guide §2.3). Output order is the
  * document's own token order.
  */
case class TokenDictIds(child: Expression,
    dict: org.apache.spark.broadcast.Broadcast[java.util.HashMap[UTF8String, Integer]],
    oovId: Int) extends UnaryExpression {
  override def prettyName: String = "token_dict_ids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.tokenDictIds(input.asInstanceOf[ArrayData], dict.value, oovId)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("dictBc", dict,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.tokenDictIds(" +
        s"$c, (java.util.HashMap) $bcRef.value(), $oovId);")
  }

  override protected def withNewChildInternal(c: Expression): TokenDictIds =
    copy(child = c)
}

case class TokenTfPairs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_tf_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.tokenTfPairs(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextExpressions.tokenTfPairs($c);")

  override protected def withNewChildInternal(c: Expression): TokenTfPairs =
    copy(child = c)
}
