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
}
