package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over edge DataFrames.
  *
  * PageRank is the canonical link-quality signal web-corpus pipelines
  * feed into curation (Common-Crawl-derived corpora rank hosts by
  * centrality before sampling). This is the textbook distributed
  * formulation — per iteration: one equi-join of edges with the rank
  * table, one groupBy(dst) aggregation, a 1-row dangling-mass
  * broadcast — nothing node- or edge-proportional ever touches the
  * driver, so the plan is the one you'd run on a 100-TB link graph
  * (partition count scales with edges; AQE handles hub skew).
  *
  * DETERMINISM: rank state is FIXED-POINT — longs scaled by 10^12 with
  * floor division everywhere (a first double-vs-decimal attempt died on
  * HALF_UP-vs-half-even at exact dyadic ties: rank/outdeg with a
  * power-of-two out-degree lands a 5 exactly at the 13th decimal).
  * Integer DIV has no rounding mode, long sums are exact and
  * associative, so the result is bit-identical across engines,
  * partitionings and shuffle orders. Floor truncation leaks
  * < 10^-12/node/iteration of mass — the standard fixed-point trade.
  */
object GraphOps {

  private val Scale = 1000000000000L // 10^12

  /** PageRank over `iterations` rounds on the DISTINCT directed edge
    * set (parallel edges collapse — encode multiplicity as weights
    * upstream if it should matter). Dangling nodes (no out-edges)
    * redistribute their mass uniformly, the standard fix. `damping` is
    * taken at 2-decimal precision (the fixed-point multiplier is
    * damping·100). Output: (node, rank_fp, rank) — rank_fp the exact
    * scaled long, rank = rank_fp/10^12 as double; total mass ≈ 1.
    */
  def pagerank(edges0: DataFrame, src: String = "src", dst: String = "dst",
               iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1,
      s"pagerank: need iterations >= 1 and damping in (0,1), got $iterations, $damping")
    val d100 = math.round(damping * 100)
    val e = edges0
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    // the iterated STATE carries each node's out-degree next to its
    // rank (null = dangling): the contribution pass then needs ONE join
    // (edges ⋈ state) instead of two (edges ⋈ ranks ⋈ outdeg), and the
    // dangling mass is a plain aggregate over the state instead of an
    // anti-join of two frames — per iteration that removes a join and a
    // two-sided probe, and the one-time nodes/outdeg/ranks triple
    // checkpoint collapses to a single state checkpoint. Cost: one long
    // column rides the per-iteration checkpoint. Arithmetic unchanged —
    // same fixed-point longs, bit-identical result.
    // node set and out-degree in ONE aggregation pass (src rows vote 1,
    // dst rows vote 0; a zero sum = dangling → null outdeg) — the
    // union-distinct + groupBy + join form shuffled the edge set twice
    // and joined the results; this is one map-combined shuffle.
    val stateBase = e.select(col("src").as("node"), lit(1L).as("__e"))
      .unionAll(e.select(col("dst").as("node"), lit(0L).as("__e")))
      .groupBy(col("node")).agg(sum(col("__e")).as("od0"))
      .select(col("node"), when(col("od0") > 0, col("od0")).as("outdeg"))
      .localCheckpoint()
    val n = stateBase.count()

    val base = ((100L - d100) * Scale) / (100L * n) // exact long arithmetic

    var state = stateBase.withColumn("rank_fp", lit(Scale / n))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(state.where(col("outdeg").isNotNull), col("src") === col("node"))
        .select(col("dst"), expr("rank_fp DIV outdeg").as("contrib"))
      val sums = contribs.groupBy(col("dst").as("c_node"))
        .agg(sum(col("contrib")).as("csum"))
      val dang = state.agg(coalesce(
        sum(when(col("outdeg").isNull, col("rank_fp"))), lit(0L)).as("dsum"))
      state = state.select(col("node"), col("outdeg"))
        .join(sums, col("node") === col("c_node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("outdeg"),
          (lit(base) +
            expr(s"($d100 * (coalesce(csum, 0L) + (dsum DIV $n))) DIV 100")
          ).as("rank_fp"))
        .localCheckpoint()
    }
    state.select(col("node"), col("rank_fp"),
      (col("rank_fp").cast("double") / Scale.toDouble).as("rank"))
  }

  /** DuckDB twin of [[pagerank]]: `edgesSql` must yield (src, dst);
    * iterations unroll into numbered CTEs, each mirroring one Spark
    * round in the same fixed-point long arithmetic (`//` is DuckDB's
    * integer floor division — all values non-negative, so it equals
    * Spark's truncating DIV).
    */
  def pagerankSql(edgesSql: String, iterations: Int, damping: Double = 0.85): String = {
    val d100 = math.round(damping * 100)
    val iters = (1 to iterations).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS (
         |  SELECT e.dst AS node, SUM(r.rank_fp // od.outdeg) AS csum
         |  FROM e JOIN $prev r ON e.src = r.node JOIN od ON od.node = e.src
         |  GROUP BY e.dst),
         |d$k AS (
         |  SELECT COALESCE(SUM(r.rank_fp), 0) AS dsum
         |  FROM $prev r LEFT JOIN od ON r.node = od.node WHERE od.node IS NULL),
         |r$k AS (
         |  SELECT nodes.node,
         |    CAST((SELECT base FROM consts) +
         |      ($d100 * (COALESCE(c.csum, 0) +
         |        ((SELECT dsum FROM d$k) // (SELECT n FROM consts)))) // 100
         |      AS BIGINT) AS rank_fp
         |  FROM nodes LEFT JOIN c$k c ON nodes.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesSql)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |consts AS (SELECT COUNT(*) AS n,
       |  ((100 - $d100) * ${Scale}) // (100 * COUNT(*)) AS base FROM nodes),
       |od AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST($Scale // (SELECT n FROM consts) AS BIGINT) AS rank_fp FROM nodes),
       |$iters
       |SELECT node, rank_fp, CAST(rank_fp AS DOUBLE) / $Scale.0 AS rank
       |FROM r$iterations ORDER BY node""".stripMargin
  }

  /** Degree table: (node, out_deg, in_deg) over the distinct edge set. */
  def degrees(edges0: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val e = edges0.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst")).distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
