package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark plans `p BETWEEN s AND e` as a
  * broadcast-nested-loop (or a sort-merge with a residual range
  * condition) — O(|points|·|intervals|) per key group in the worst
  * case. The binned form makes it an EQUI-join: intervals are exploded
  * to the fixed-width bins they cover, points carry their single bin,
  * and the exact BETWEEN runs only on bin-mates. Cost is
  * |intervals|·(span/binWidth) replication against a one-shuffle hash
  * join — the classic interval-index trade, and each (point, interval)
  * pair meets exactly once because a point has exactly one bin.
  *
  * Pick `binWidth` ≈ the typical interval span: replication stays
  * O(1)× while bin selectivity does the pruning.
  */
object RangeJoin {

  /** Inner join of `points` with `intervals` on `keys` AND
    * pointCol ∈ [startCol, endCol] (inclusive both ends; non-negative
    * domains, e.g. epoch times). Columns of both frames survive.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth ($binWidth) must be positive")
    // Integral `div`, not `/`: double division rounds int64 values above
    // 2^53 (nanosecond epochs), so a point and an interval endpoint near a
    // bin boundary could bin inconsistently and silently drop a match.
    def bin(c: String): Column = expr(s"`$c` div ${binWidth}L")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(startCol), bin(endCol))))
    val p = points.withColumn("__bin", bin(pointCol))
    p.join(binned, keys :+ "__bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
