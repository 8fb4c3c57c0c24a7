package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKRewriteRule replans the row_number()<=k-then-drop idiom onto the
  * heap operator — same rows, no per-partition sort — and refuses every
  * pattern it cannot prove equivalent.
  */
class TopKRewriteSpec extends SparkSpec {

  private def cust = spark.read.parquet(s"${sf()}/customer.parquet")

  private def idiom(k: Int): DataFrame = cust
    .withColumn("rn", row_number().over(
      Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))))
    .where(col("rn") <= k).drop("rn")

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("idiom is rewritten onto the heap operator with no sort, same rows") {
    val df = idiom(3)
    val plan = physical(df)
    assert(plan.contains("TopKPerKey "), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
    val viaHeap = df.orderBy("c_nationkey", "c_custkey").collect().map(_.toSeq).toSeq
    val viaWindow = withConf("spark.graft.topkRewrite.enabled", "false") {
      val w = idiom(3)
      assert(physical(w).contains("Window"), "disable flag must restore the window plan")
      w.orderBy("c_nationkey", "c_custkey").collect().map(_.toSeq).toSeq
    }
    assert(viaHeap == viaWindow)
    assert(viaHeap.nonEmpty)
  }

  test("rn = 1 form rewrites as k=1") {
    val df = cust
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .where(col("rn") === 1).drop("rn")
    assert(physical(df).contains("TopKPerKey 1,"), physical(df))
    val perKey = df.groupBy("c_nationkey").count().where(col("count") > 1).count()
    assert(perKey == 0L)
  }

  test("surviving rank column rewrites too — the operator emits the ranks") {
    def rankIdiom = cust
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .where(col("rn") <= 3)
      .select("c_custkey", "rn")
    val df = rankIdiom
    val plan = physical(df)
    assert(plan.contains("TopKPerKey "), plan)
    assert(!plan.contains("Window"), plan)
    // rank VALUES must be byte-identical to the window's row_number()
    // (the order here is total, so ranks are deterministic)
    val viaHeap = df.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val viaWindow = withConf("spark.graft.topkRewrite.enabled", "false") {
      val w = rankIdiom
      assert(physical(w).contains("Window"), "disable flag must restore the window plan")
      w.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    }
    assert(viaHeap == viaWindow)
    assert(viaHeap.nonEmpty)
    assert(viaHeap.exists(_(1) == 3), "k=3 must actually appear as a rank")
  }

  test("rank() never rewrites (ties may exceed k rows)") {
    val df = cust
      .withColumn("rn", rank().over(
        Window.partitionBy("c_nationkey").orderBy(col("c_mktsegment"))))
      .where(col("rn") <= 3).drop("rn")
    assert(physical(df).contains("Window"), physical(df))
  }

  test("k past maxK keeps the window plan (heap memory bound)") {
    withConf("spark.graft.topkRewrite.maxK", "2") {
      assert(physical(idiom(3)).contains("Window"))
      assert(physical(idiom(2)).contains("TopKPerKey "))
    }
  }

  test("heap entry budget turns the no-spill OOM into an actionable error") {
    withConf("spark.graft.topk.maxHeapEntries", "30") {
      // ~1500 distinct keys x k=3 blows a 30-entry budget immediately
      val e = intercept[org.apache.spark.SparkException] {
        cust.withColumn("rn", row_number().over(
            Window.partitionBy("c_custkey").orderBy(col("c_acctbal"))))
          .where(col("rn") <= 3).drop("rn").count()
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("maxHeapEntries"), msg)
      assert(msg.contains("topkRewrite.enabled=false"), msg)
    }
    // and the budget is generous by default: the same query passes
    assert(idiom(3).count() > 0)
  }

  test("map-side partial phase bounds the exchange input") {
    // 32 input partitions, TWO keys: the exchange between partial and
    // final must see at most k rows per key per input partition, not
    // the dataset — and the global top-k must still be exact even
    // though every partition holds candidates for both keys.
    val df = spark.range(0, 100000, 1, 32)
      .selectExpr("CAST(pmod(id, 2) AS INT) AS key", "id AS v")
      .withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc)))
      .where(col("rn") <= 2)
      .select("key", "v", "rn")
    val plan = physical(df)
    assert(plan.contains("TopKPerKeyPartial "), plan)
    // partial sits BELOW the exchange, final above it
    val iPartial = plan.indexOf("TopKPerKeyPartial ")
    val iFinal = plan.indexOf("TopKPerKey ")
    val iExchange = plan.indexOf("Exchange")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"final/exchange/partial order wrong:\n$plan")
    assert(df.select("key", "v", "rn").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      == Seq((0, 99996L, 2), (0, 99998L, 1), (1, 99997L, 2), (1, 99999L, 1)))
  }

  test("SQL-surface form rewrites too") {
    cust.createOrReplaceTempView("cust_tkr")
    val df = spark.sql(
      """SELECT c_custkey, c_acctbal FROM (
        |  SELECT c_custkey, c_acctbal, row_number() OVER (
        |    PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM cust_tkr) WHERE rn <= 2""".stripMargin)
    assert(physical(df).contains("TopKPerKey "), physical(df))
    assert(df.count() > 0)
  }
}
