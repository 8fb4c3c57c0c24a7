package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic main for the cache_build attribution rows: times each
  * family's `warmCaches` SOLO and then the three CONCURRENTLY (the
  * Bench shape), twice each, so a swing in a family's bench row can
  * be split into "its own plan got slower" vs "it absorbed scheduler
  * contention from the other families warming beside it".
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.WarmProbe"
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tuneLocal(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed JVM warmup as Bench
    locally {
      val w = spark.range(0, 1000000L, 1, 8).selectExpr("id % 97 AS k", "id AS v")
      w.groupBy("k").count().count()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    }
    System.gc()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[warmprobe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val fams: Seq[(String, SparkSession => Unit)] = Seq(
      "discovery" -> (s => graft.queries.DiscoveryQueries.warmCaches(s, sfDir)),
      "pipeline" -> (s => graft.queries.PipelineQueries.warmCaches(s, sfDir)),
      "dup" -> (s => graft.queries.DupQueries.warmCaches(s, sfDir)))
    (1 to 2).foreach { pass =>
      // SOLO: fresh session per family so shared caches rebuild
      fams.foreach { case (n, f) =>
        val s = spark.newSession()
        t(s"solo_$n($pass)")(f(s))
        spark.catalog.clearCache(); System.gc()
      }
      // CONCURRENT: the Bench shape
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val s2 = spark.newSession()
      t(s"concurrent_all($pass)") {
        Await.result(Future.sequence(fams.map { case (n, f) =>
          Future(t(s"conc_$n($pass)")(f(s2)))
        }), Duration.Inf)
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
