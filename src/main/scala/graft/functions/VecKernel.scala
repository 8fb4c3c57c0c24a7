package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.DoubleType

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
}
