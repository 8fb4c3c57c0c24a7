package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Literal, Expression}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Codegen Morton-interleave kernel for the z-order layouts.
  *
  * Same discipline as [[XashKernel]]/[[VecKernel]]: a `StaticInvoke`
  * of a static method stays inside whole-stage codegen and reads the
  * broadcast bound arrays directly from their unsafe literal — no
  * boxed closure capture per row like the Scala UDF this replaces.
  * Z-ORDER rewrites are DATA-SIZED at 100 TB (every row of every
  * rewritten file passes through this), so the maintenance path
  * deserves the same no-UDF rule as the query paths.
  */
object ZOrderKernel {

  /** Morton interleave of the two values' quantile-bucket ranks: each
    * value binary-searches its sorted 255-bound array (insertion-point
    * semantics — equal values land in the upper bucket, matching
    * java.util.Arrays.binarySearch + 1), then the low 8 bits of both
    * ranks interleave. Nulls take bucket 0 — they sort first on the
    * curve, the same side NULLS FIRST puts them.
    */
  def morton(x: java.lang.Double, y: java.lang.Double,
             b1: ArrayData, b2: ArrayData): Int = {
    val a = if (x == null) 0 else bucket(b1, x.doubleValue())
    val b = if (y == null) 0 else bucket(b2, y.doubleValue())
    var r = 0
    var i = 0
    while (i < 8) {
      r |= (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))
      i += 1
    }
    r
  }

  private def bucket(bs: ArrayData, v: Double): Int = {
    var lo = 0
    var hi = bs.numElements() - 1
    var found = -1
    while (found < 0 && lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mv = bs.getDouble(mid)
      if (mv < v) lo = mid + 1
      else if (mv > v) hi = mid - 1
      else found = mid
    }
    if (found >= 0) found + 1 else lo
  }

  private def exprOf(c: Column): Expression = GraftColumnBridge.expression(c)

  /** morton(x, y) with the bound arrays as literals, codegen'd;
    * propagateNull off so nulls reach the kernel's bucket-0 rule.
    */
  def mortonCol(x: Column, y: Column, b1: Array[Double], b2: Array[Double]): Column =
    GraftColumnBridge.column(StaticInvoke(
      ZOrderKernel.getClass, IntegerType, "morton",
      Seq(exprOf(x), exprOf(y),
        Literal.create(b1, ArrayType(DoubleType, containsNull = false)),
        Literal.create(b2, ArrayType(DoubleType, containsNull = false))),
      propagateNull = false, returnNullable = false))
}
