package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly kernels for dedup candidate generation — the
  * [[XashKernel]] discipline applied to the shingle family: a Scala
  * UDF boxes a row per call and breaks whole-stage codegen exactly on
  * the corpus-scale paths (every near-dup operator's first projection);
  * `StaticInvoke` of these static methods stays inside the generated
  * loop.
  */
object DedupKernel {

  private val FnvOffset = -3750763034362895579L // FNV-1a 64 offset basis
  private val FnvPrime = 1099511628211L

  /** Distinct word n-gram shingle STRINGS, first-occurrence order;
    * empty when the text has fewer than n words.
    */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val ws = s.toString.split(' ')
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= ws.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j)); j += 1
      }
      out += sb.toString
      i += 1
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** 64-bit FNV hashes of the DISTINCT word n-gram shingles without
    * materializing the shingle strings: per-word FNV once, then an
    * FNV-fold per window (first-occurrence order).
    */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val ws = s.toString.split(' ')
    if (ws.length < n) return new GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = SimHash.fnv1a64(ws(i)); i += 1 }
    val out = new scala.collection.mutable.LinkedHashSet[Long]
    i = 0
    while (i <= ws.length - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = (h ^ wh(i + j)) * FnvPrime; j += 1 }
      out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Positional word n-gram hashes: element i is the FNV fold of words
    * [i, i+n) — every occurrence keeps its position (duplicate-SPAN
    * detection needs (gram, position), not the distinct set).
    */
  def posGramHashes(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Long])
    val ws = s.toString.split(' ')
    if (ws.length < n) return new GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = SimHash.fnv1a64(ws(i)); i += 1 }
    val out = new Array[Long](ws.length - n + 1)
    i = 0
    while (i <= ws.length - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = (h ^ wh(i + j)) * FnvPrime; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- Column wrappers --------------------------------------------------

  private def exprOf(c: Column) = GraftColumnBridge.expression(c)

  /** shingles(text, n) → array<string>, codegen'd. */
  def shinglesCol(c: Column, n: Int): Column = GraftColumnBridge.column(StaticInvoke(
    DedupKernel.getClass, ArrayType(StringType, containsNull = false), "shingles",
    Seq(exprOf(c), Literal(n)), returnNullable = false))

  /** shingleHashes(text, n) → array<long>, codegen'd. */
  def shingleHashesCol(c: Column, n: Int): Column = GraftColumnBridge.column(StaticInvoke(
    DedupKernel.getClass, ArrayType(LongType, containsNull = false), "shingleHashes",
    Seq(exprOf(c), Literal(n)), returnNullable = false))

  /** posGramHashes(text, n) → array<long>, codegen'd. */
  def posGramHashesCol(c: Column, n: Int): Column = GraftColumnBridge.column(StaticInvoke(
    DedupKernel.getClass, ArrayType(LongType, containsNull = false), "posGramHashes",
    Seq(exprOf(c), Literal(n)), returnNullable = false))
}
