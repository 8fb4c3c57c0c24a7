package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd search-scoring kernel.
  *
  * BM25/TF-style scoring needs, per document, the length and the count
  * of each query term. Expressing that with `size(filter(split(...)))`
  * per term is a trap: higher-order functions are CodegenFallback, so
  * the projection leaves whole-stage codegen AND common-subexpression
  * elimination — the corpus gets re-tokenized once per term per row.
  * This kernel tokenizes once and returns `[doc_len, tf_0..tf_{m-1}]`
  * in a single compiled call.
  */
object SearchKernel {

  /** `[len(words), count(words == terms(0)), ...]` over
    * `lower(text).split(" ", -1)` — exactly Spark's
    * `split(lower(text), " ")` semantics (trailing empties kept).
    */
  def termStats(text: UTF8String, terms: ArrayData): ArrayData = {
    // UTF8String.toLowerCase == Spark's lower() (locale-independent),
    // unlike java.lang.String.toLowerCase
    val ws = (if (text == null) "" else text.toLowerCase.toString).split(" ", -1)
    val m = terms.numElements()
    val out = new Array[Double](m + 1)
    out(0) = ws.length.toDouble
    val ts = new Array[String](m)
    var j = 0
    while (j < m) { ts(j) = terms.getUTF8String(j).toString; j += 1 }
    var i = 0
    while (i < ws.length) {
      var k = 0
      while (k < m) {
        if (ws(i) == ts(k)) out(k + 1) += 1.0
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column form: (text, literal term list) → array<double>. */
  def termStatsCol(text: Column, terms: Seq[String]): Column =
    GraftColumnBridge.column(StaticInvoke(
      SearchKernel.getClass, ArrayType(DoubleType, containsNull = false), "termStats",
      Seq(GraftColumnBridge.expression(text),
        Literal.create(terms, ArrayType(StringType))),
      returnNullable = false))
}
