package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge

/** Column API over the native vector expressions. */
object VectorFunctions {
  def dot(u: Column, v: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(u), Bridge.expression(v)))

  def cosine(u: Column, v: Column): Column =
    Bridge.column(VectorCosine(Bridge.expression(u), Bridge.expression(v)))

  /** Unicode normalization (default NFC) — the dedup-key canonicalizer
    * (see [[UnicodeNormalize]]).
    */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))
}
