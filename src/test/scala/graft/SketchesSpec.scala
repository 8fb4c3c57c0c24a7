package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Sketch aggregate laws: exact below capacity, error-bounded above,
  * canonical under repartitioning (theta).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KLL: exact regime returns true order statistics; n is exact") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Sketches.groupQuantiles(df, Seq("g"), col("v"), Seq(0.0, 0.5, 1.0)).head()
    assert(out.getAs[Long]("n") == 100L)
    assert(out.getAs[Double]("q_0") == 1.0)
    assert(out.getAs[Double]("q_100") == 100.0)
    val q50 = out.getAs[Double]("q_50")
    assert(q50 >= 49.0 && q50 <= 52.0, s"median of 1..100 came back $q50")
  }

  test("KLL: estimation regime stays inside the k=200 rank-error bound") {
    val n = 100000
    val df = (1 to n).map(i => ("g", i.toDouble)).toDF("g", "v").repartition(8)
    val out = Sketches.groupQuantiles(df, Seq("g"), col("v"), Seq(0.5)).head()
    assert(out.getAs[Long]("n") == n.toLong)
    val q50 = out.getAs[Double]("q_50")
    // k=200 => ~1.65% rank error at 99% confidence; allow 3%
    assert(math.abs(q50 - n / 2.0) < n * 0.03, s"q50=$q50")
  }

  test("theta overlap: exact regime equals hand-computed set algebra, zero pairs included") {
    val rows =
      (1 to 30).map(i => ("a", s"w$i")) ++
      (16 to 45).map(i => ("b", s"w$i")) ++   // |a∩b|=15, |a∪b|=45
      (1 to 10).map(i => ("c", s"x$i"))       // disjoint from both
    val df = rows.toDF("s", "w")
    val out = Sketches.distinctOverlap(df, "s", col("w"))
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      ("a", "b", 30L, 30L, 15L, 45L),
      ("a", "c", 30L, 10L, 0L, 40L),
      ("b", "c", 30L, 10L, 0L, 40L)))
  }

  test("sketches are mergeable THROUGH persistence: two sketched batches ≡ one pass") {
    // the profile-once-query-many claim, made concrete: sketch two
    // batches separately, round-trip the sketches through parquet,
    // merge — the folded answer must match sketching everything at once
    val batch1 = (1 to 500).map(i => ("g", i.toDouble)).toDF("g", "v")
    val batch2 = (400 to 900).map(i => ("g", i.toDouble)).toDF("g", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_sk").toString
    batch1.groupBy("g").agg(Sketches.kllSketch(col("v")).as("sk"),
        Sketches.thetaSketch(col("v")).as("th"))
      .unionByName(batch2.groupBy("g").agg(Sketches.kllSketch(col("v")).as("sk"),
        Sketches.thetaSketch(col("v")).as("th")))
      .write.parquet(s"$dir/sketches")
    val persisted = spark.read.parquet(s"$dir/sketches").collect()
    // KLL: merge the two persisted sketches driver-side
    val merged = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    persisted.foreach(r => merged.merge(
      org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]]("sk")))))
    assert(merged.getN == 1001L) // 500 + 501 values (overlap values still count)
    assert(merged.getQuantile(0.0) == 1.0 && merged.getQuantile(1.0) == 900.0)
    // Theta: distinct union across the persisted batches is exact here
    val u = org.apache.datasketches.theta.SetOperation.builder().buildUnion()
    persisted.foreach(r => u.union(
      org.apache.datasketches.theta.CompactSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]]("th")))))
    assert(math.round(u.getResult.getEstimate) == 900L)
    // A\B: batch2 brought exactly 401 new values (501..900 plus none below)
    val ths = persisted.map(_.getAs[Array[Byte]]("th"))
    val diff = Sketches.thetaANotB(ths(1), ths(0))
    val diff2 = Sketches.thetaANotB(ths(0), ths(1))
    assert(Set(math.round(diff), math.round(diff2)) == Set(400L, 399L),
      s"one direction is 900-500=400 new, the other 500-101=399: $diff / $diff2")
  }

  test("theta: canonical under repartitioning, error-bounded past capacity") {
    val n = 60000 // far past 2^12 nominal entries
    val rows = (1 to n).map(i => ("a", s"v$i")) ++
      ((n / 2) to (n + n / 2)).map(i => ("b", s"v$i")) // ~50% overlap
    val df = rows.toDF("s", "w")
    val a = Sketches.distinctOverlap(df.repartition(3), "s", col("w")).head()
    val b = Sketches.distinctOverlap(df.repartition(11), "s", col("w")).head()
    // canonical: the k smallest hashes survive whatever the order
    assert(a.getLong(4) == b.getLong(4) && a.getLong(5) == b.getLong(5),
      "theta results must not depend on partitioning")
    assert(math.abs(a.getLong(2) - n) < n * 0.05, s"n_a=${a.getLong(2)}")
    assert(math.abs(a.getLong(4) - n / 2.0) < n * 0.08, s"inter=${a.getLong(4)}")
  }
}
