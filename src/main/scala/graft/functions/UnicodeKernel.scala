package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel — a compiled StaticInvoke expression
  * (whole-stage codegen, no UDF boxing), same discipline as
  * [[XashKernel]]. NFC is the canonical composition every serious text
  * pipeline applies before hashing/dedup: visually-identical strings
  * with different combining-sequence encodings (e.g. e + U+0301 vs é)
  * otherwise hash apart and silently survive exact dedup.
  */
object UnicodeKernel {

  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else {
      val str = s.toString
      // fast path: NFC-normalized input (the overwhelming majority at
      // corpus scale) allocates nothing
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }

  def nfcCol(c: Column): Column = GraftColumnBridge.column(StaticInvoke(
    UnicodeKernel.getClass, StringType, "nfc",
    Seq(GraftColumnBridge.expression(c.cast("string")))))
}
