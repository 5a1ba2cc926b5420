package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge

/** Column API over the native vector expressions. */
object VectorFunctions {
  def dot(u: Column, v: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(u), Bridge.expression(v)))

  def cosine(u: Column, v: Column): Column =
    Bridge.column(VectorCosine(Bridge.expression(u), Bridge.expression(v)))

  /** Native int8 quantization — see [[QuantizeInt8]]. */
  def quantizeInt8(v: Column): Column =
    Bridge.column(QuantizeInt8(Bridge.expression(v)))

  /** Fused cosine(u, dequantize(q8)) — see [[CosineDequantInt8]]. */
  def cosineDequantInt8(u: Column, q8: Column): Column =
    Bridge.column(CosineDequantInt8(Bridge.expression(u), Bridge.expression(q8)))

  /** Unicode normalization (default NFC) — the dedup-key canonicalizer
    * (see [[UnicodeNormalize]]).
    */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))

  /** Compiled bit-stable ordered fold over an array<struct<key, double>>
    * — the drop-in replacement for
    * `aggregate(sort_array(x), 0.0, (acc, e) => acc + e.getField(v))`
    * (see [[SortedStructSum]] for the result-identity argument).
    */
  def orderedStructSum(c: Column): Column =
    Bridge.column(SortedStructSum(Bridge.expression(c)))

  /** Per-doc hashed unigram+bigram bucket tfs, sorted by bucket — see
    * [[BucketTfPairs]].
    */
  def bucketTfPairs(toks: Column, buckets: Int): Column =
    Bridge.column(BucketTfPairs(Bridge.expression(toks), buckets))

  /** struct(n_feats, weight) from a [[bucketTfPairs]] array and a
    * BROADCAST per-bucket log-ratio array (NaN = absent) — see
    * [[BucketWeightSum]].
    */
  def bucketWeightSum(pairs: Column,
                      lr: org.apache.spark.broadcast.Broadcast[Array[Double]]): Column =
    Bridge.column(BucketWeightSum(Bridge.expression(pairs), lr))

  /** k+1-way segmentation rows (i, g) for the partition-filter edit
    * join — see [[EdSegments]].
    */
  def edSegments(str: Column, k: Int): Column =
    Bridge.column(EdSegments(Bridge.expression(str), k))

  /** Candidate-segment probe rows (l, i, g) for the partition-filter
    * edit join — see [[EdSegmentProbes]].
    */
  def edSegmentProbes(str: Column, k: Int): Column =
    Bridge.column(EdSegmentProbes(Bridge.expression(str), k))

  /** Token array → vocabulary-id array via a broadcast dictionary —
    * see [[TokenDictIds]].
    */
  def tokenDictIds(toks: Column,
      dict: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]],
      oovId: Int): Column =
    Bridge.column(TokenDictIds(Bridge.expression(toks), dict, oovId))

  /** |distinct(a) ∩ distinct(b)| without building the intersection array
    * — see [[IntersectSize]].
    */
  def intersectSize(a: Column, b: Column): Column =
    Bridge.column(IntersectSize(Bridge.expression(a), Bridge.expression(b)))

  /** Per-row element multiplicities, sorted by element — see
    * [[TokenTfPairs]].
    */
  def tokenTfPairs(toks: Column): Column =
    Bridge.column(TokenTfPairs(Bridge.expression(toks)))
}
