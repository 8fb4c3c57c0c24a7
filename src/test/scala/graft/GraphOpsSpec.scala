package graft

import graft.graph.GraphOps
import org.apache.spark.sql.functions._

/** Structural laws for the graph operators (the harness row proves
  * engine parity on the trade graph; these pin the semantics).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: symmetric cycle gives equal ranks, mass ≈ 1") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = GraphOps.pagerank(e, iterations = 10).collect()
    val fps = r.map(_.getAs[Long]("rank_fp")).toSet
    assert(fps.size == 1, s"cycle must be rank-uniform, got $fps")
    val mass = r.map(_.getAs[Long]("rank_fp")).sum
    assert(math.abs(mass - 1000000000000L) < 1000L, s"mass $mass")
  }

  test("pagerank: hub of a star collects the most rank; dangling mass recycles") {
    // 1..4 all point at 5; 5 points nowhere (dangling)
    val e = (1L to 4L).map(i => (i, 5L)).toDF("src", "dst")
    val r = GraphOps.pagerank(e, iterations = 10).collect()
      .map(x => x.getAs[Long]("node") -> x.getAs[Long]("rank_fp")).toMap
    assert(r(5L) > r(1L) * 3, s"hub must dominate: $r")
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.size == 1, "leaves symmetric")
    val mass = r.values.sum
    assert(math.abs(mass - 1000000000000L) < 1000L,
      s"dangling mass must recycle, not vanish: $mass")
  }

  test("pagerank: deterministic across runs and partitionings") {
    val e = (1L to 300L).map(i => (i % 37, (i * 7) % 41 + 100)).toDF("src", "dst")
    val a = GraphOps.pagerank(e, iterations = 5).orderBy("node").collect().toSeq
    val b = GraphOps.pagerank(e.repartition(7), iterations = 5)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("degrees counts distinct in/out edges with zero-filled absences") {
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = GraphOps.degrees(e).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(d == Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }
}
