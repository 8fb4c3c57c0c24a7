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

  // ---- N-dimensional variant (clustered-table OPTIMIZE, 1..4 cols) ----

  /** The value's quantile-bucket rank (null → bucket 0), one dimension
    * of the interleave below; same insertion-point semantics as
    * [[morton]].
    */
  def rank(x: java.lang.Double, bs: ArrayData): Int =
    if (x == null) 0 else bucket(bs, x.doubleValue())

  /** A string's FIRST-8-BYTES big-endian value as a double: preserves
    * lexicographic order on the prefix (unsigned byte compare IS
    * UTF-8 code-point order), so the numeric quantile machinery ranks
    * string columns with no separate string kernel or driver-side
    * sample pass — strings sharing an 8-byte prefix tie into the same
    * bucket, which a 255-bucket rank cannot distinguish anyway.
    * Null strings rank -∞: below every real value, so they take
    * bucket 0 / sort first — the SAME null side numeric columns get
    * (0.0 would be the sign-flipped range's midpoint, not its floor).
    */
  def prefixRank(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    if (s == null) return Double.NegativeInfinity
    val b = s.getBytes
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) (b(i) & 0xffL) else 0L)
      i += 1
    }
    // unsigned 64 → order-preserving double: flip the sign bit into a
    // signed long (order kept), then widen
    (v ^ Long.MinValue).toDouble
  }

  /** Bit-interleave of up to four 8-bit ranks (unused dimensions pass
    * 0 and contribute nothing): rank i's bit j lands at position
    * j*k + (k-1-i), so every dimension advances the curve at the same
    * granularity. Long-valued — 4 dims × 8 bits needs 32 unsigned
    * bits.
    */
  def interleave(k: Int, a: Int, b: Int, c: Int, d: Int): Long = {
    var r = 0L
    var j = 0
    while (j < 8) {
      r |= ((a >> j) & 1L) << (j * k + (k - 1))
      if (k > 1) r |= ((b >> j) & 1L) << (j * k + (k - 2))
      if (k > 2) r |= ((c >> j) & 1L) << (j * k + (k - 3))
      if (k > 3) r |= ((d >> j) & 1L) << (j * k + (k - 4))
      j += 1
    }
    r
  }

  /** rank(x) with the bound array as a literal, codegen'd. */
  def rankCol(x: Column, bounds: Array[Double]): Column =
    GraftColumnBridge.column(StaticInvoke(
      ZOrderKernel.getClass, IntegerType, "rank",
      Seq(exprOf(x),
        Literal.create(bounds, ArrayType(DoubleType, containsNull = false))),
      propagateNull = false, returnNullable = false))

  /** prefixRank(s), codegen'd (null → 0 = the curve's null side). */
  def prefixRankCol(s: Column): Column =
    GraftColumnBridge.column(StaticInvoke(
      ZOrderKernel.getClass, DoubleType, "prefixRank",
      Seq(exprOf(s)), propagateNull = false, returnNullable = false))

  /** interleave of 1..4 rank columns, codegen'd. */
  def interleaveCol(ranks: Seq[Column]): Column = {
    require(ranks.nonEmpty && ranks.size <= 4,
      s"interleaveCol takes 1..4 rank columns, got ${ranks.size}")
    val padded = ranks.map(exprOf) ++
      Seq.fill(4 - ranks.size)(Literal(0): Expression)
    GraftColumnBridge.column(StaticInvoke(
      ZOrderKernel.getClass, org.apache.spark.sql.types.LongType, "interleave",
      Literal(ranks.size) +: padded,
      propagateNull = false, returnNullable = false))
  }
}
