package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks up the value columns of the
  * LATEST right row with `rightTs <= leftTs` within the same key group
  * (the time-series enrichment join Spark has no built-in operator for).
  *
  * Spark-first mechanics — the union+window idiom instead of a range
  * join: tag both sides, union them, and carry right values forward with
  * `last(..., ignoreNulls)` over an (ts, side)-ordered window. ONE
  * shuffle on the key columns and a per-key sort; a naive range join is
  * O(|left|·|right|) per key and a broadcast-range join needs the right
  * side in memory. Right rows sort BEFORE left rows at equal timestamps,
  * making the match inclusive.
  *
  * The right side must be unique per (keys, ts) — pre-aggregate if not —
  * otherwise "the" matched row is ambiguous.
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val carryLeft = left.columns.toSeq.filterNot(keys.contains)
    // All value columns ride ONE struct per right row so the carried values
    // always come from the SAME matched row — per-column last(ignoreNulls)
    // would stitch columns from different right rows whenever a value is null.
    val valsType = org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c)))
    // side 0 = right (sorts first at equal ts → inclusive match)
    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__vals")) ++
        carryLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(valsType).as("__vals")) ++
        carryLeft.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .select(keys.map(col) ++ carryLeft.map(col) ++ Seq(col("__side"),
        last(col("__vals"), ignoreNulls = true).over(w).as("__vals")): _*)
      .where(col("__side") === 1)
      .select(keys.map(col) ++ carryLeft.map(col) ++
        valueCols.map(c => col("__vals").getField(c).as(c)): _*)
  }

  /** Forward as-of join: each left row picks up the EARLIEST right row
    * with `rightTs >= leftTs` in its key group — same union+window
    * idiom mirrored (first-looking-forward window, left sorts before
    * right at equal timestamps so the match stays inclusive).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val carryLeft = left.columns.toSeq.filterNot(keys.contains)
    // Same single-struct carry as backward(): one matched row, all columns.
    val valsType = org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c)))
    // side 1 = right (sorts after left at equal ts → inclusive match)
    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(1).as("__side"),
        struct(valueCols.map(col): _*).as("__vals")) ++
        carryLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(valsType).as("__vals")) ++
        carryLeft.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    taggedLeft.unionByName(taggedRight)
      .select(keys.map(col) ++ carryLeft.map(col) ++ Seq(col("__side"),
        first(col("__vals"), ignoreNulls = true).over(w).as("__vals")): _*)
      .where(col("__side") === 0)
      .select(keys.map(col) ++ carryLeft.map(col) ++
        valueCols.map(c => col("__vals").getField(c).as(c)): _*)
  }
}
