package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernel for the DSIR hashed-feature pass.
  *
  * The relational form — `explode(concat(words, zip_with(slice, slice,
  * concat_ws)))` followed by `conv(substring(md5(f),1,8),16,10) % B` —
  * pays an interpreted higher-order function (zip_with does not
  * codegen), materializes every bigram STRING, hex-encodes each
  * 16-byte md5 digest to 32 chars, substrings and then string-parses
  * the hex back to a number: five allocations per feature on the
  * corpus-scale path. This kernel emits the final bucket ids directly
  * — one md5 per feature, first 4 digest bytes as the unsigned int the
  * hex prefix encodes, mod `buckets` — bit-identical by construction
  * (first 8 hex digits ARE the first 4 bytes) and verified against the
  * relational form and the DuckDB oracle by DsirSpec / dsir_weights.
  *
  * Exact-parity notes: words come from Spark's `split(lower(text),
  * " ")`, which keeps trailing empty strings (Java's default split
  * drops them) — so `split(" ", -1)`; lowercasing goes through
  * UTF8String.toLowerCase, the Lower expression's own path.
  */
object DsirKernel {

  /** Bucket ids of the unigram+bigram features of `text`, in the
    * relational form's order (all unigrams, then all bigrams). Null
    * text → null (explode then emits nothing, like the column form).
    */
  def featureBuckets(s: UTF8String, buckets: Int): ArrayData = {
    if (s == null) return null
    val ws = s.toLowerCase.toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = ws.length
    val nBig = if (n > 1) n - 1 else 0
    val out = new Array[Long](n + nBig)
    def bucketOf(bytes: Array[Byte]): Long = {
      val d = md.digest(bytes)
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      u % buckets
    }
    var i = 0
    while (i < n) {
      out(i) = bucketOf(ws(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    i = 0
    while (i < nBig) {
      out(n + i) = bucketOf(
        (ws(i) + " " + ws(i + 1)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** featureBuckets(text, buckets) → array<long>, codegen'd. */
  def featureBucketsCol(c: Column, buckets: Int): Column =
    GraftColumnBridge.column(StaticInvoke(
      DsirKernel.getClass, ArrayType(LongType, containsNull = false), "featureBuckets",
      Seq(GraftColumnBridge.expression(c), Literal(buckets)), returnNullable = true))
}
