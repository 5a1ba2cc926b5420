package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the partition-filter (PassJoin-style) exact
  * edit-distance join (Li, Deng, Feng: "PASS-JOIN: a partition-based
  * method for similarity joins", public knowledge).
  *
  * Pigeonhole: split a string `s` into k+1 contiguous segments; any
  * string within edit distance k of `s` contains at least ONE segment
  * as an EXACT substring (≤ k edits cannot touch all k+1 segments),
  * shifted by at most k positions (each edit shifts downstream
  * positions by at most one). So candidates for ed ≤ k are exactly the
  * pairs where some segment of the SHORTER string appears in the longer
  * at a position within ±k of its home — an equi-join on
  * (shorter-length, segment-index, segment-content) between
  * [[EdSegments]] (index side: each string's own k+1 segments) and
  * [[EdSegmentProbes]] (probe side: every substring of the string that
  * could be such a segment of any length-compatible shorter partner).
  *
  * Segment scheme for length l into m = k+1 parts: the first
  * (m − l%m) segments have ⌊l/m⌋ code points, the rest ⌈l/m⌉ — any
  * fixed scheme works for completeness; both expressions share this
  * one. Strings shorter than k+1 code points own zero-length segments
  * (which would match everywhere) and are EXCLUDED here — the caller
  * routes them through an all-pairs short pool (a string of length
  * ≤ k pairs only with lengths ≤ 2k, a bounded pool).
  *
  * All positions/lengths are CODE POINTS — the unit Spark's
  * `levenshtein` (UTF8String.levenshteinDistance) edits in, so the
  * filter's completeness argument matches the verify exactly.
  */
object EditDistanceExpressions {
  private def segLen(base: Int, rem: Int, m: Int, i: Int): Int =
    base + (if (i >= m - rem) 1 else 0)
  private def segStart(base: Int, rem: Int, m: Int, i: Int): Int =
    i * base + math.max(0, i - (m - rem))

  /** Also called from generated code — see [[EdSegments]]. */
  def edSegments(str: UTF8String, k: Int): ArrayData = {
    val n = str.numChars()
    val m = k + 1
    if (n < m) return new GenericArrayData(Array.empty[Any])
    val base = n / m; val rem = n % m
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val p = segStart(base, rem, m, i)
      out(i) = new GenericInternalRow(Array[Any](
        i, str.substring(p, p + segLen(base, rem, m, i))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Also called from generated code — see [[EdSegmentProbes]]. */
  def edSegmentProbes(str: UTF8String, k: Int): ArrayData = {
    val n = str.numChars()
    val m = k + 1
    if (n < m) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var l = math.max(m, n - k) // candidate shorter-partner lengths
    while (l <= n) {
      val base = l / m; val rem = l % m
      var i = 0
      while (i < m) {
        val li = segLen(base, rem, m, i)
        val pi = segStart(base, rem, m, i)
        var j = math.max(0, pi - k)
        val jMax = math.min(n - li, pi + k)
        while (j <= jMax) {
          out += new GenericInternalRow(Array[Any](l, i, str.substring(j, j + li)))
          j += 1
        }
        i += 1
      }
      l += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** (i, segment) rows of the k+1-way segmentation — the partition
  * filter's INDEX side. Empty array for strings shorter than k+1 code
  * points (the caller's short pool owns those).
  */
case class EdSegments(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def prettyName: String = "ed_segments"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("i", IntegerType, nullable = false),
      StructField("g", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    EditDistanceExpressions.edSegments(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EditDistanceExpressions.edSegments($c, $k);")

  override protected def withNewChildInternal(c: Expression): EdSegments =
    copy(child = c)
}

/** (l, i, substring) rows enumerating every substring of this string
  * that could be segment `i` of a length-`l` shorter partner within
  * edit distance k (l ∈ [max(k+1, n−k), n], position within ±k of the
  * segment's home) — the partition filter's PROBE side. O(k³) rows per
  * string (≤ (k+1)²·(2k+1)), each a short slice.
  */
case class EdSegmentProbes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def prettyName: String = "ed_segment_probes"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("l", IntegerType, nullable = false),
      StructField("i", IntegerType, nullable = false),
      StructField("g", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    EditDistanceExpressions.edSegmentProbes(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EditDistanceExpressions.edSegmentProbes($c, $k);")

  override protected def withNewChildInternal(c: Expression): EdSegmentProbes =
    copy(child = c)
}
