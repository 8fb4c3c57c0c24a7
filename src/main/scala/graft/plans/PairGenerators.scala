package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** LAZY ordered-pair generators for the bucket-explode candidate
  * pattern (ngramJaccardPairs, columnPairSimilarity): each input row
  * carries one bucket's member array and streams its n·(n−1)/2 ordered
  * pairs straight out of Tungsten rows.
  *
  * The previous form was a typed Dataset `flatMap` with a hand-rolled
  * lazy iterator — correct and unbuffered, but it forced a
  * DeserializeToObject/SerializeFromObject pair around the stage:
  * every bucket deserialized to a boxed Scala Seq and every emitted
  * pair re-encoded, breaking whole-stage codegen on the corpus-scale
  * path. These generators read the ArrayData in place and emit
  * InternalRows; GenerateExec consumes the iterator lazily, so the
  * no-df²-buffering property (a hot bucket must never materialize its
  * pair set) is preserved exactly.
  *
  * Pair ORDER is pinned to the flatMap form: members sort ascending
  * (numeric id / java.lang.String order — NOT UTF8String binary order,
  * which diverges on supplementary characters) and pairs emit with
  * id_1 < id_2, so (min, max) assignment is byte-identical.
  */
case class SortedLongIntPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.length == 2 && s(0).dataType == LongType && s(1).dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SortedLongIntPairs needs array<struct<long,int>>, got ${other.simpleString}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_1", LongType, nullable = false),
    StructField("sz_1", IntegerType, nullable = false),
    StructField("id_2", LongType, nullable = false),
    StructField("sz_2", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    val szs = new Array[Int](n)
    var x = 0
    while (x < n) {
      val st = arr.getStruct(x, 2)
      ids(x) = st.getLong(0)
      szs(x) = st.getInt(1)
      x += 1
    }
    // co-sort by id ascending (buckets carry each id at most once —
    // one inverted-index row per (doc, shingle) — so ties cannot occur)
    val idx = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Long.compare(ids(a), ids(b)))
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      def hasNext: Boolean = i < n - 1
      def next(): InternalRow = {
        val a = idx(i).intValue
        val b = idx(j).intValue
        val r = new GenericInternalRow(4)
        r.setLong(0, ids(a)); r.setInt(1, szs(a))
        r.setLong(2, ids(b)); r.setInt(3, szs(b))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SortedLongIntPairs =
    copy(child = newChild)
}

case class SortedStringPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SortedStringPairs needs array<string>, got ${other.simpleString}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("col_1", StringType, nullable = true),
    StructField("col_2", StringType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    // java.lang.String ordering, matching the flatMap form's .sorted
    val ss = new Array[String](n)
    var x = 0
    while (x < n) { ss(x) = arr.getUTF8String(x).toString; x += 1 }
    java.util.Arrays.sort(ss.asInstanceOf[Array[AnyRef]])
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      def hasNext: Boolean = i < n - 1
      def next(): InternalRow = {
        val r = new GenericInternalRow(2)
        r.update(0, org.apache.spark.unsafe.types.UTF8String.fromString(ss(i)))
        r.update(1, org.apache.spark.unsafe.types.UTF8String.fromString(ss(j)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SortedStringPairs =
    copy(child = newChild)
}

object PairGenerators {
  /** Ordered (id, sz) pairs of an array<struct<long,int>> bucket. */
  def sortedLongIntPairsCol(c: Column): Column =
    GraftColumnBridge.column(SortedLongIntPairs(GraftColumnBridge.expression(c)))

  /** Ordered string pairs of an array<string> bucket. */
  def sortedStringPairsCol(c: Column): Column =
    GraftColumnBridge.column(SortedStringPairs(GraftColumnBridge.expression(c)))
}
