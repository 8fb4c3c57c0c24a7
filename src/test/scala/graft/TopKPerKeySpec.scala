package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom heap-based operator returns exactly the window top-k set. */
class TopKPerKeySpec extends SparkSpec {

  test("perKey matches row_number window top-k") {
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
    val viaWindow = cust
      .withColumn("rk", row_number().over(
        Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .where(col("rk") <= 3).drop("rk")
      .orderBy("c_nationkey", "c_custkey")
      .collect().map(_.toSeq).toSeq
    val viaTopK = TopKPerKey.perKey(cust,
      Seq("c_nationkey"), Seq(("c_acctbal", true), ("c_custkey", false)), 3)
      .orderBy("c_nationkey", "c_custkey")
      .collect().map(_.toSeq).toSeq
    assert(viaTopK == viaWindow)
    assert(viaTopK.nonEmpty)
  }

  test("physical plan contains the custom exec and no sort") {
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
    val df = TopKPerKey.perKey(cust,
      Seq("c_nationkey"), Seq(("c_acctbal", true)), 2)
    val plan = df.queryExecution.executedPlan.toString
    // "TopKPerKey 2, [c_nationkey], [c_acctbal DESC]" above an
    // ENSURE_REQUIREMENTS hash exchange, and no Sort node anywhere
    assert(plan.contains("TopKPerKey "))
    assert(plan.contains("ENSURE_REQUIREMENTS"))
    assert(!plan.contains("Sort "))
  }
}
