package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: when a few hot keys dominate the big
  * side, a plain shuffle join puts each hot key in ONE task. Salting
  * splits every key into `salts` shuffle buckets — the big side gets a
  * deterministic salt from non-key columns, the small side is
  * replicated `salts`× — so a hot key spreads over `salts` tasks at
  * the cost of replicating the (small) build side.
  *
  * AQE's runtime skew-join split covers sort-merge joins after the
  * fact; explicit salting is the plan-level tool when the skew is
  * known (e.g. a null-heavy or default-valued key) or the join sits
  * where AQE cannot rewrite it.
  */
object Salting {

  /** Inner equi-join of `big` with (small) `dim` on `keys`, salted
    * `salts` ways. Result equals `big.join(dim, keys)` exactly.
    *
    * @param saltBy expression over `big`'s columns giving a
    *               well-distributed long (defaults to a random-ish but
    *               deterministic hash of all big-side columns).
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String], salts: Int,
                 saltBy: Option[Column] = None): DataFrame = {
    require(salts > 0, s"salts ($salts) must be positive")
    val saltExpr = saltBy.getOrElse(hash(big.columns.map(big.col).toIndexedSeq: _*))
    val saltedBig = big.withColumn("__salt", pmod(saltExpr, lit(salts)))
    val saltedDim = dim.crossJoin(
      big.sparkSession.range(0, salts).select(col("id").cast("int").as("__salt")))
    saltedBig.join(saltedDim, keys :+ "__salt").drop("__salt")
  }
}
