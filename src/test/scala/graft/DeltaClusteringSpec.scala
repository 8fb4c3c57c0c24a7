package graft

import graft.functions.ZOrderKernel
import graft.sources.{Clustering, DeltaReader, LakeWriter}
import org.apache.spark.sql.functions._

/** Clustered tables — the protocol's `clustering` writer feature:
  * CLUSTER BY declared at CREATE (SQL, through the catalog) or by
  * ALTER, carried in the `delta.clustering` domain metadata, applied
  * by OPTIMIZE as a multi-dimensional re-layout (1..4 columns,
  * type-aware ranking incl. strings), cheaply re-keyable, removable
  * with CLUSTER BY NONE — and the layout measurably narrows per-file
  * min/max stats on every clustering column.
  */
class DeltaClusteringSpec extends SparkSpec {
  import spark.implicits._

  // catalog instances pin their root at initialize (once per JVM) —
  // reuse an already-registered root, like the delta_catalog harness
  private lazy val root: String = {
    val r = spark.conf.getOption("spark.sql.catalog.graft.root").getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft_cluster_")
        .toAbsolutePath.toString
      spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", d)
      d
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cl")
    r
  }

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cluster_$tag").resolve("t")
      .toAbsolutePath.toString

  private def statsRange(dir: String, col: String): Seq[(Long, Long)] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    DeltaReader.snapshot(spark, dir, None).active.flatMap(_.stats).map { st =>
      val n = om.readTree(st)
      (n.get("minValues").get(col).asLong(), n.get("maxValues").get(col).asLong())
    }
  }

  test("kernel: interleave is monotonic per dimension and prefixRank orders strings") {
    val rs = Seq(0, 1, 17, 128, 255)
    for (k <- 1 to 4; Seq(a, b) <- rs.combinations(2).map(_.sorted)) {
      assert(ZOrderKernel.interleave(k, a, 0, 0, 0) < ZOrderKernel.interleave(k, b, 0, 0, 0))
      if (k >= 2)
        assert(ZOrderKernel.interleave(k, 0, a, 0, 0) < ZOrderKernel.interleave(k, 0, b, 0, 0))
    }
    // 2-d interleave bit layout == the morton kernel's
    import org.apache.spark.sql.catalyst.util.ArrayData
    val bounds = ArrayData.toArrayData((1 until 256).map(_.toDouble).toArray)
    for ((x, y) <- Seq((0.0, 255.0), (17.5, 3.0), (254.9, 254.9))) {
      val m = ZOrderKernel.morton(x, y, bounds, bounds)
      val r1 = ZOrderKernel.rank(x, bounds)
      val r2 = ZOrderKernel.rank(y, bounds)
      assert(ZOrderKernel.interleave(2, r1, r2, 0, 0) == m.toLong)
    }
    import org.apache.spark.unsafe.types.UTF8String
    def pr(s: String) = ZOrderKernel.prefixRank(UTF8String.fromString(s))
    assert(pr("a") < pr("b") && pr("ab") < pr("b") && pr("") < pr("a"))
    assert(pr("k0001") < pr("k0002") && pr("k0999") < pr("k1000"))
    assert(ZOrderKernel.prefixRank(null) == 0d)
  }

  test("SQL CREATE ... CLUSTER BY declares the feature and domain; OPTIMIZE clusters") {
    root
    spark.sql("CREATE TABLE graft.cl.t (x BIGINT, y BIGINT, v STRING) CLUSTER BY (x, y)")
    val dir = s"$root/cl/t"
    val snap0 = DeltaReader.snapshot(spark, dir, None)
    assert(snap0.minWriter == 7 && snap0.writerFeatures.contains("clustering") &&
      snap0.writerFeatures.contains("domainMetadata"))
    assert(Clustering.columnsOf(snap0) == Seq("x", "y"))
    // the domain carries the protocol shape: nested-path arrays
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val conf = om.readTree(snap0.domainMetadata("delta.clustering"))
    assert(conf.get("clusteringColumns").toString == """[["x"],["y"]]""")

    // shuffled anti-correlated inserts, several small files
    val rows = scala.util.Random.shuffle((0L until 1000L).toList)
    rows.grouped(250).foreach { g =>
      spark.createDataset(g).map(i => (i, 999L - i, s"v$i"))
        .toDF("x", "y", "v").createOrReplaceTempView("batch")
      spark.sql("INSERT INTO graft.cl.t SELECT * FROM batch")
    }
    spark.sql("OPTIMIZE graft.cl.t")
    val snap1 = DeltaReader.snapshot(spark, dir, None)
    assert(snap1.active.size <= 8, s"expected a compacted layout, got ${snap1.active.size}")
    // every file's x-range AND y-range narrowed well under the full span
    for (c <- Seq("x", "y"); (lo, hi) <- statsRange(dir, c))
      assert(hi - lo < 600, s"$c file range [$lo,$hi] not clustered")
    // rows intact
    assert(spark.sql("SELECT count(*) c, sum(x) sx FROM graft.cl.t").as[(Long, Long)]
      .head() == ((1000L, 499500L)))
  }

  test("ZORDER BY refuses on a clustered table; ALTER CLUSTER BY re-keys; NONE removes") {
    root
    spark.sql("CREATE TABLE graft.cl.rk (a BIGINT, b BIGINT) CLUSTER BY (a)")
    val dir = s"$root/cl/rk"
    spark.range(0, 512).select(col("id").as("a"), (lit(511) - col("id")).as("b"))
      .createOrReplaceTempView("rk_src")
    spark.sql("INSERT INTO graft.cl.rk SELECT * FROM rk_src")
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE graft.cl.rk ZORDER BY (a, b)")
    }
    assert(e.getMessage.contains("clustered table"), e.getMessage)
    spark.sql("ALTER TABLE graft.cl.rk CLUSTER BY (b)")
    assert(Clustering.columnsOf(DeltaReader.snapshot(spark, dir, None)) == Seq("b"))
    spark.sql("OPTIMIZE graft.cl.rk")
    // 1-column clustering = plain range layout on b
    val ranges = statsRange(dir, "b").sorted
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping b-ranges $ranges")
      case _ => ()
    }
    spark.sql("ALTER TABLE graft.cl.rk CLUSTER BY NONE")
    val snapN = DeltaReader.snapshot(spark, dir, None)
    assert(Clustering.columnsOf(snapN).isEmpty)
    assert(!snapN.domainMetadata.contains("delta.clustering"))
    // plain OPTIMIZE now compacts without a curve; table still reads
    spark.sql("OPTIMIZE graft.cl.rk")
    assert(spark.table("graft.cl.rk").count() == 512)
  }

  test("string clustering columns rank by byte prefix") {
    val dir = freshDir("str")
    LakeWriter.writeDelta(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType)))), dir)
    LakeWriter.clusterBy(spark, dir, Seq("k"))
    val rows = scala.util.Random.shuffle((0 until 1000).toList)
    rows.grouped(250).foreach { g =>
      LakeWriter.appendDelta(
        spark.createDataset(g).map(i => (f"k$i%04d", i.toLong)).toDF("k", "n"), dir)
    }
    LakeWriter.compactDeltaCluster(spark, dir, Seq("k"), filesPerPartition = 4)
    // per-file k prefixes are disjoint → the numeric twin n is narrow too
    for ((lo, hi) <- statsRange(dir, "n"))
      assert(hi - lo < 400, s"string-clustered file spans n=[$lo,$hi]")
    assert(DeltaReader.read(spark, dir).count() == 1000)
  }

  test("refusals: partitioned tables, bad arity, bad types, unknown columns") {
    val dir = freshDir("refuse")
    LakeWriter.writeDelta(Seq((1L, "a", 1.0)).toDF("id", "p", "v"), dir,
      partitionBy = Seq("p"))
    val e1 = intercept[IllegalArgumentException] {
      LakeWriter.clusterBy(spark, dir, Seq("id"))
    }
    assert(e1.getMessage.contains("unpartitioned"), e1.getMessage)

    val flat = freshDir("flat")
    LakeWriter.writeDelta(Seq((1L, "a", Seq(1.0))).toDF("id", "s", "arr"), flat)
    val e2 = intercept[IllegalArgumentException] {
      LakeWriter.clusterBy(spark, flat, Seq("arr"))
    }
    assert(e2.getMessage.contains("ranks numeric"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      LakeWriter.clusterBy(spark, flat, Seq("id", "s", "id", "s"))
    }
    assert(e3.getMessage.contains("twice"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      LakeWriter.clusterBy(spark, flat, Seq("nope"))
    }
    assert(e4.getMessage.contains("not in"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException] {
      LakeWriter.compactDeltaCluster(spark, flat, Nil)
    }
    assert(e5.getMessage.contains("1..4"), e5.getMessage)
  }

  test("incremental OPTIMIZE: clustered cubes never rewrite; FULL re-layouts everything") {
    val dir = freshDir("inc")
    LakeWriter.writeDelta(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)))), dir)
    LakeWriter.clusterBy(spark, dir, Seq("x"))
    LakeWriter.appendDelta(spark.range(0, 300).toDF("x").repartition(3), dir)
    spark.sql(s"OPTIMIZE graft_delta.`$dir`")
    val cube1 = DeltaReader.snapshot(spark, dir, None).active
    assert(cube1.nonEmpty && cube1.forall(_.clusteringProvider.contains("liquid")),
      cube1.map(a => a.path -> a.clusteringProvider).toString)
    // a checkpoint becomes the replay base and must preserve provenance
    LakeWriter.checkpointDelta(spark, dir, DeltaReader.snapshot(spark, dir, None).version)
    LakeWriter.appendDelta(spark.range(300, 600).toDF("x").repartition(3), dir)
    spark.sql(s"OPTIMIZE graft_delta.`$dir`")
    val snap2 = DeltaReader.snapshot(spark, dir, None)
    // cube1's files were NOT rewritten — incremental cost ∝ new data
    assert(cube1.map(_.path).toSet.subsetOf(snap2.active.map(_.path).toSet),
      "incremental OPTIMIZE rewrote an already-clustered cube")
    assert(snap2.active.forall(_.clusteringProvider.contains("liquid")))
    // nothing new → OPTIMIZE is a no-op (no commit)
    spark.sql(s"OPTIMIZE graft_delta.`$dir`")
    assert(DeltaReader.snapshot(spark, dir, None).version == snap2.version)
    // FULL re-layouts every live file into a fresh cube
    spark.sql(s"OPTIMIZE graft_delta.`$dir` FULL")
    val snap3 = DeltaReader.snapshot(spark, dir, None)
    assert(snap3.active.map(_.path).toSet.intersect(
      snap2.active.map(_.path).toSet).isEmpty, "FULL kept an old cube")
    assert(DeltaReader.read(spark, dir).count() == 600)
    // FULL on an unclustered table refuses
    val plain = freshDir("plain")
    LakeWriter.writeDelta(spark.range(0, 10).toDF("x"), plain)
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE graft_delta.`$plain` FULL")
    }
    assert(e.getMessage.contains("clustered tables"), e.getMessage)
  }

  test("mutations stay available on clustered tables and preserve the declaration") {
    val dir = freshDir("mut")
    LakeWriter.writeDelta(spark.range(0, 100)
      .select(col("id"), (col("id") % 10).as("g")).toDF(), dir)
    LakeWriter.clusterBy(spark, dir, Seq("id"))
    LakeWriter.deleteWhere(spark, dir, "g = 3")
    LakeWriter.updateWhere(spark, dir, "g = 4", Map("g" -> "44"))
    LakeWriter.appendDelta(spark.range(100, 110)
      .select(col("id"), (col("id") % 10).as("g")).toDF(), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(Clustering.columnsOf(snap) == Seq("id"))
    assert(DeltaReader.read(spark, dir).count() == 100)
    LakeWriter.compactDeltaCluster(spark, dir, Clustering.columnsOf(snap))
    assert(DeltaReader.read(spark, dir).count() == 100)
  }
}
