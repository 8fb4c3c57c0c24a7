package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k rows per key as a first-class operator.
  *
  * The DataFrame idiom — `row_number() OVER (PARTITION BY k ORDER BY o)
  * <= n` — sorts every partition fully before discarding all but k
  * rows; at corpus scale that sort is the cost. This operator keeps a
  * bounded k-heap per key instead: one shuffle (Catalyst inserts it via
  * `requiredChildDistribution`), no sort, O(rows·log k) work and O(keys·k)
  * memory.
  *
  * Memory bound: the per-partition heap map holds keys·k rows with NO spill
  * path — correct sizing is keys/partition · k rows in executor memory
  * (our ANN uses: ~query-side cardinality · k, far below partition size).
  * For key cardinalities where keys·k approaches partition row count the
  * window+sort idiom (which spills) is the right plan; use this operator
  * when k·keys ≪ rows, which is exactly when the full sort is wasteful.
  *
  * Wired the idiomatic way: logical node → Strategy → physical exec,
  * activated per session via `TopKPerKey.install(spark)`
  * (spark.experimental.extraStrategies) or cluster-wide through
  * `graft.GraftExtensions`.
  */
case class TopKPerKeyNode(k: Int, partitionExprs: Seq[Expression],
                          order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(k: Int, partitionExprs: Seq[Expression],
                          order: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // ask Catalyst for co-located keys; EnsureRequirements adds the shuffle
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val partLocal = partitionExprs
    val childOutput = child.output
    // The heap map has NO spill path: its bound is keys-per-partition·k,
    // and the KEYS dimension is unbounded by any plan-time check. Turn
    // the would-be executor OOM into an actionable failure at a
    // configurable entry budget — the error names the fix (window plan
    // spills; disable the rewrite or raise the budget with memory to
    // match).
    val maxEntries = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.maxHeapEntries", "16000000").toLong
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      // "best first" comparator; the heap keeps the WORST kept row on top
      val better = RowOrdering.create(orderLocal, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val worstFirst = new java.util.Comparator[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = better.compare(b, a)
      }
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, worstFirst)
          heaps.put(key.copy(), heap)
          if (heaps.size.toLong * kLocal > maxEntries)
            throw new IllegalStateException(
              s"TopKPerKey: ${heaps.size} keys x k=$kLocal exceeds " +
                s"spark.graft.topk.maxHeapEntries=$maxEntries in one partition — " +
                "the bounded-heap operator holds keys*k rows with no spill path. " +
                "For this key cardinality use the window plan " +
                "(spark.graft.topkRewrite.enabled=false) or raise the budget " +
                "with executor memory to match")
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (better.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach(h => h.forEach(r => out += r))
      out.iterator
    }, preservesPartitioning = true)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, parts, order, child) =>
      TopKPerKeyExec(k, parts, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Register the strategy in a live session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per key, ordered best-first by `orderBy` columns
    * ((name, descending) pairs; tie-breakers allowed). Columns are
    * resolved directly against the child's analyzed output — the
    * operator plugs in below the analyzer. Output order is unspecified,
    * like any aggregate.
    */
  def perKey(df: DataFrame, partitionCols: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
    val parts = partitionCols.map(attr)
    val order = orderBy.map { case (name, desc) =>
      SortOrder(attr(name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftColumnBridge.ofRows(spark, TopKPerKeyNode(k, parts, order, plan))
  }
}
