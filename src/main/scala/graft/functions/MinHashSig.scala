package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash-signature aggregate: folds a column of 64-bit
  * shingle hashes into the full k-permutation signature in ONE
  * aggregation buffer (`TypedImperativeAggregate[Array[Long]]`),
  * instead of k separate `min(xxhash64(i, g))` aggregate expressions.
  * Permutation i is seed-chained exactly like the built-in
  * `xxhash64(lit(i), g)` (XXH64 over the int then the long, seed 42),
  * so signatures are bit-identical to the expression form.
  *
  * Buffer is k longs — partial aggregation (map-side combine) and
  * merge are elementwise mins, associative and commutative, so the
  * shuffle carries one row of k longs per document however many
  * shingles a partition holds.
  */
case class MinHashSig(child: Expression, numHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val g = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        // = xxhash64(lit(i), g): int child then long child, seed 42
        val h = XXH64.hashLong(g, XXH64.hashInt(i, 42L))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Aggregate Column: MinHash signature (array of k longs) of a long
    * hash column.
    */
  def minhashSig(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(c), numHashes).toAggregateExpression())

  /** Per-row signature of an already-assembled shingle-hash array —
    * bit-identical to the aggregate (same seed chain), but computed
    * inside the row's projection: when the shingle set is a per-doc
    * array column there is NO reason to explode + shuffle + re-group
    * just to take k minima.
    */
  def sigOfArray(sh: org.apache.spark.sql.catalyst.util.ArrayData,
                 numHashes: Int): GenericArrayData = {
    val buf = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = sh.numElements()
    while (j < n) {
      val g = sh.getLong(j)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(g, XXH64.hashInt(i, 42L))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(buf)
  }

  /** Column form of [[sigOfArray]], codegen'd via StaticInvoke. */
  def sigOfArrayCol(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        MinHashSig.getClass, ArrayType(LongType, containsNull = false), "sigOfArray",
        Seq(GraftColumnBridge.expression(c),
          org.apache.spark.sql.catalyst.expressions.Literal(numHashes)),
        returnNullable = false))
}
