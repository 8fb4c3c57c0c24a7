package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Codegen-friendly float-vector kernels for the embedding operators.
  *
  * Same discipline as [[XashKernel]]: a `StaticInvoke` of a static method
  * stays inside whole-stage codegen and reads the unsafe array directly —
  * no catalyst→Scala row conversion, no boxed Seq[Float] per call like a
  * Scala UDF. The fold is sequential left-to-right, matching the DuckDB
  * oracle's list_sum order bit for bit.
  */
object VecKernel {

  /** Sequential-fold double dot product over two float arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  private def exprOf(c: Column) = GraftColumnBridge.expression(c)

  /** dot(a, b) over two array<float> columns, codegen'd. */
  def dotCol(a: Column, b: Column): Column = GraftColumnBridge.column(StaticInvoke(
    VecKernel.getClass, DoubleType, "dot",
    Seq(exprOf(a), exprOf(b)), returnNullable = false))

  /** Random-hyperplane LSH bucket: bit b is set when
    * dot(v, planes[b*dim .. b*dim+dim)) >= 0. One compiled loop over the
    * unsafe float array and the broadcast plane literal — the
    * `zip_with`/`aggregate` higher-order form this replaces interprets
    * a lambda per element per bit.
    */
  def lshBucket(v: ArrayData, planes: ArrayData, bits: Int, dim: Int): Long = {
    val n = math.min(dim, v.numElements())
    var out = 0L
    var b = 0
    while (b < bits) {
      val off = b * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getFloat(i).toDouble * planes.getDouble(off + i); i += 1 }
      if (s >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** LSH bucket of an array<float> column against flattened hyperplanes
    * (row-major, `bits` rows of `dim`), codegen'd.
    */
  def lshBucketCol(v: Column, planesFlat: Array[Double], bits: Int, dim: Int): Column = {
    import org.apache.spark.sql.functions.lit
    GraftColumnBridge.column(StaticInvoke(
      VecKernel.getClass, LongType, "lshBucket",
      Seq(exprOf(v), exprOf(lit(planesFlat)), exprOf(lit(bits)), exprOf(lit(dim))),
      returnNullable = false))
  }
}
