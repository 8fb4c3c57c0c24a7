package graft.ops

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates (DataSketches KLL + Theta) as native
  * Catalyst `TypedImperativeAggregate`s — the profile-once-query-many
  * primitives of a 100-TB lake:
  *
  *  - a KLL quantile sketch per group is a few KB that MERGES: sketch
  *    each day/partition once, answer any later quantile question by
  *    folding sketches — no second scan of the data, which is the
  *    difference between a catalog stats refresh and a lake rescan;
  *  - a Theta sketch per stratum answers DISTINCT-set algebra (union /
  *    intersection / difference) across N strata from one scan —
  *    exact pairwise vocabulary overlap would be N² distinct joins.
  *
  * Buffers ride partial aggregation (map-side combine) like any Spark
  * aggregate, so the shuffle carries one KB-sized sketch per group per
  * map task, never raw values. Theta results are a canonical function
  * of the distinct INPUT SET (the k smallest hashes survive, whatever
  * the order), so estimates are run-reproducible; KLL compaction is
  * randomized by design — exact below k values, error-bounded above,
  * reproducible only below (`SketchesSpec` pins both regimes).
  */
object Sketches {

  // ------------------------------------------------------------- KLL

  case class KllAgg(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
      b1.merge(b2); b1
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(n: Int): KllAgg = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KllAgg = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): KllAgg = copy(child = c)
    override def prettyName: String = "kll_sketch"
  }

  /** Aggregate Column: serialized KLL doubles sketch of `c` (cast to
    * double). k=200 gives ~1.65% rank error.
    */
  def kllSketch(c: Column, k: Int = 200): Column =
    GraftColumnBridge.column(
      KllAgg(GraftColumnBridge.expression(c.cast("double")), k).toAggregateExpression())

  /** Quantiles at `probs` from a serialized KLL sketch (inclusive
    * ranks, the DataSketches default).
    */
  def kllQuantiles(bytes: Array[Byte], probs: Seq[Double]): Seq[Double] = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) probs.map(_ => Double.NaN)
    else probs.map(sk.getQuantile)
  }

  def kllN(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN

  /** Per-group quantile profile: ONE aggregation pass building a KLL
    * sketch per group, quantiles extracted from the group-count-bounded
    * result. Output: (groups..., n, q_<p> per prob).
    */
  def groupQuantiles(df: DataFrame, groups: Seq[String], value: Column,
                     probs: Seq[Double], k: Int = 200): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), s"bad probs $probs")
    val sketched = df.groupBy(groups.map(col): _*).agg(kllSketch(value, k).as("__sk"))
    val qs = udf((b: Array[Byte]) => kllQuantiles(b, probs))
    val nOf = udf((b: Array[Byte]) => kllN(b))
    val withQ = sketched.withColumn("__qs", qs(col("__sk")))
    val qCols = probs.zipWithIndex.map { case (p, i) =>
      col("__qs").getItem(i).as(s"q_${(p * 100).round}")
    }
    withQ.select((groups.map(col) :+ nOf(col("__sk")).as("n")) ++ qCols: _*)
  }

  // ----------------------------------------------------------- Theta

  case class ThetaAgg(child: Expression, lgK: Int,
                      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
    with UnaryLike[Expression] {

    private def newUnion() =
      SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

    override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
      newUnion()

    override def update(buf: org.apache.datasketches.theta.Union,
                        input: InternalRow): org.apache.datasketches.theta.Union = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
      buf
    }

    override def merge(b1: org.apache.datasketches.theta.Union,
                       b2: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
      b1.union(b2.getResult); b1
    }

    override def eval(buf: org.apache.datasketches.theta.Union): Any =
      buf.getResult.toByteArray

    override def serialize(buf: org.apache.datasketches.theta.Union): Array[Byte] =
      buf.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
      val u = newUnion()
      u.union(CompactSketch.heapify(Memory.wrap(bytes)))
      u
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(n: Int): ThetaAgg = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): ThetaAgg = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): ThetaAgg = copy(child = c)
    override def prettyName: String = "theta_sketch"
  }

  /** Aggregate Column: serialized compact Theta sketch of the distinct
    * string values of `c`. lgK=12 (4096 entries) keeps sub-1% error.
    */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    GraftColumnBridge.column(
      ThetaAgg(GraftColumnBridge.expression(c.cast("string")), lgK).toAggregateExpression())

  def thetaEstimate(bytes: Array[Byte]): Double =
    CompactSketch.heapify(Memory.wrap(bytes)).getEstimate

  /** |A \ B| from two serialized sketches (exact while both are in
    * exact mode) — "how many of today's documents are NEW vs the
    * corpus" without touching either side's rows again.
    */
  def thetaANotB(a: Array[Byte], b: Array[Byte]): Double = {
    val op = SetOperation.builder().buildANotB()
    op.aNotB(CompactSketch.heapify(Memory.wrap(a)),
      CompactSketch.heapify(Memory.wrap(b))).getEstimate
  }

  /** Cross-stratum distinct-overlap matrix: ONE scan builds a Theta
    * sketch of `value`'s distinct set per stratum; the
    * stratum-count-bounded sketch list (KBs each — the documented
    * driver materialization gate) runs pairwise set algebra on the
    * driver. Output per unordered pair: (src_a, src_b, n_a, n_b,
    * inter, uni, jaccard) — estimates, EXACT while every sketch stays in
    * exact mode (distinct count ≤ 2^lgK), which is what makes the
    * harness row oracle-checkable.
    */
  def distinctOverlap(df: DataFrame, stratum: String, value: Column,
                      lgK: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perStratum = df.groupBy(col(stratum))
      .agg(thetaSketch(value, lgK).as("sk"))
      .collect()
      .map(r => (r.getString(0), CompactSketch.heapify(Memory.wrap(r.getAs[Array[Byte]]("sk")))))
      .sortBy(_._1)
    val rows = for {
      i <- perStratum.indices
      j <- (i + 1) until perStratum.length
    } yield {
      val (sa, ska) = perStratum(i)
      val (sb, skb) = perStratum(j)
      val inter = SetOperation.builder().buildIntersection()
      inter.intersect(ska); inter.intersect(skb)
      val uni = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
      uni.union(ska); uni.union(skb)
      val (ni, nu) = (inter.getResult.getEstimate, uni.getResult.getEstimate)
      (sa, sb, math.round(ska.getEstimate), math.round(skb.getEstimate),
        math.round(ni), math.round(nu),
        BigDecimal(if (nu == 0) 0.0 else ni / nu)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    rows.toDF("src_a", "src_b", "n_a", "n_b", "inter", "uni", "jaccard")
      .withColumn("jaccard", col("jaccard").cast("decimal(10,6)"))
  }
}
