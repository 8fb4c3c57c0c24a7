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

  /** INTERVAL × INTERVAL overlap self-join on `keys`: pairs
    * (id_a < id_b) whose [lo, hi] ranges intersect (inclusive). Binned
    * like [[pointInInterval]], with the interval×interval wrinkle that
    * an overlapping pair shares MANY bins — each pair is kept only in
    * the bin holding the overlap's START (`greatest(lo_a, lo_b)`), so
    * every pair reports exactly once WITHOUT a distinct/shuffle dedup.
    * Output: keys, id_a, id_b, lo_a, hi_a, lo_b, hi_b, overlap_start,
    * overlap_end. Cost: |intervals|·(span/binWidth) replication into
    * one equi-join — never the per-key cartesian the naive BETWEEN
    * self-join plans.
    */
  def intervalSelfOverlap(df: DataFrame, keys: Seq[String], id: String,
                          lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth ($binWidth) must be positive")
    def binned(suffix: String) = {
      val renamed = df.select((keys.map(col) ++
        Seq(col(id).as(s"id$suffix"), col(lo).as(s"lo$suffix"),
          col(hi).as(s"hi$suffix"))): _*)
      renamed.withColumn("__bin",
        explode(sequence(expr(s"lo$suffix DIV ${binWidth}L"),
          expr(s"hi$suffix DIV ${binWidth}L"))))
    }
    binned("_a").join(binned("_b"), keys :+ "__bin")
      .where(col("id_a") < col("id_b") &&
        col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a") &&
        col("__bin") === expr(s"greatest(lo_a, lo_b) DIV ${binWidth}L"))
      .select((keys.map(col) ++ Seq(col("id_a"), col("id_b"),
        col("lo_a"), col("hi_a"), col("lo_b"), col("hi_b"),
        greatest(col("lo_a"), col("lo_b")).as("overlap_start"),
        least(col("hi_a"), col("hi_b")).as("overlap_end"))): _*)
  }
}
