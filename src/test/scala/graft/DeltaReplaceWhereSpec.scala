package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REPLACE WHERE — the atomic partition-window overwrite
  * (overwriteWhere) and its SQL static-partition INSERT form.
  */
class DeltaReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rw_$tag").resolve("t")
      .toAbsolutePath.toString

  private def base: DataFrame =
    (1 to 30).map(i => (i.toLong, Seq("a", "b", "c")(i % 3), i * 1.0))
      .toDF("id", "k", "v")

  test("overwriteWhere replaces exactly the matching window in one commit") {
    val d = freshDir("api")
    LakeWriter.writeDelta(base, d, partitionBy = Seq("k"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val fresh = Seq((100L, "a", 1.0), (101L, "a", 2.0)).toDF("id", "k", "v")
    val removed = LakeWriter.overwriteWhere(fresh, d, "k = 'a'")
    assert(removed.nonEmpty)
    val out = DeltaReader.read(spark, d)
    assert(out.where(col("k") === "a").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(100L, 101L))
    assert(out.where(col("k") =!= "a").count() == 20) // other partitions untouched
    // ONE commit; time travel below it sees the old window
    assert(DeltaReader.snapshot(spark, d, None).version == 1L)
    assert(DeltaReader.read(spark, d, versionAsOf = Some(0))
      .where(col("k") === "a").count() == 10)
    // complete change data: 10 deletes + 2 inserts
    val ch = DeltaReader.readChanges(spark, d, 1, 1)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("delete" -> 10L, "insert" -> 2L))
  }

  test("a batch carrying rows outside the predicate refuses loudly") {
    val d = freshDir("out")
    LakeWriter.writeDelta(base, d, partitionBy = Seq("k"))
    val e = intercept[IllegalArgumentException] {
      LakeWriter.overwriteWhere(
        Seq((100L, "a", 1.0), (200L, "b", 2.0)).toDF("id", "k", "v"), d, "k = 'a'")
    }
    assert(e.getMessage.contains("NOT matching"))
    // nothing committed
    assert(DeltaReader.snapshot(spark, d, None).version == 0L)
  }

  test("non-partition predicates replace row-level windows too") {
    val d = freshDir("row")
    LakeWriter.writeDelta(base, d)
    LakeWriter.overwriteWhere(
      Seq((5L, "mid", 0.0)).toDF("id", "k", "v"), d, "id >= 4 AND id <= 6")
    val out = DeltaReader.read(spark, d)
    assert(out.count() == 28) // 30 - 3 replaced + 1 new
    assert(out.where(col("id") === 5L).head().getString(1) == "mid")
    assert(out.where(col("id") === 4L || col("id") === 6L).count() == 0)
  }

  test("SQL: INSERT OVERWRITE PARTITION replaces one partition; INSERT INTO appends") {
    GraftExtensions.register(spark)
    val d = freshDir("sql")
    LakeWriter.writeDelta(base, d, partitionBy = Seq("k"))
    spark.sql(s"INSERT OVERWRITE graft_delta.`$d` PARTITION (k = 'b') " +
      "SELECT CAST(500 AS BIGINT), CAST(9.0 AS DOUBLE)")
    val out = DeltaReader.read(spark, d)
    assert(out.where(col("k") === "b").collect().map(_.getLong(0)).toSeq == Seq(500L))
    assert(out.where(col("k") =!= "b").count() == 20)
    // plain INSERT INTO the partition appends
    spark.sql(s"INSERT INTO graft_delta.`$d` PARTITION (k = 'b') " +
      "SELECT CAST(501 AS BIGINT), CAST(10.0 AS DOUBLE)")
    assert(DeltaReader.read(spark, d).where(col("k") === "b").count() == 2)
    // naming a non-partition column refuses
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"INSERT OVERWRITE graft_delta.`$d` PARTITION (id = '1') " +
        "SELECT 'b', CAST(1.0 AS DOUBLE)")
    }
    assert(e2.getMessage.contains("partitions by"))
  }

  test("column-mapped tables: full overwrite and REPLACE WHERE stage physical names") {
    val d = freshDir("cm")
    LakeWriter.writeDeltaMapped(base, d)
    LakeWriter.overwriteWhere(Seq((500L, "a", 5.0)).toDF("id", "k", "v"), d, "k = 'a'")
    val out = DeltaReader.read(spark, d)
    assert(out.where(col("k") === "a").collect().map(_.getLong(0)).toSeq == Seq(500L))
    assert(out.count() == 21)
    LakeWriter.overwriteDelta(Seq((900L, "x", 9.0)).toDF("id", "k", "v"), d)
    assert(DeltaReader.read(spark, d).collect().map(_.getLong(0)).toSeq == Seq(900L))
    // the physical files carry col-<uuid> names, not logical ones —
    // a real CM reader resolves them; time travel still works
    assert(DeltaReader.read(spark, d, versionAsOf = Some(0)).count() == 30)
  }

  test("ZOrderKernel bucket ranks match Arrays.binarySearch insertion points") {
    val rnd = new scala.util.Random(7)
    val bounds = Array.tabulate(255)(i => i * 2.0)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bounds)
    (0 until 1000).foreach { _ =>
      val v = rnd.nextDouble() * 600 - 50
      val viaJava = {
        val i = java.util.Arrays.binarySearch(bounds, v)
        if (i >= 0) i + 1 else -(i + 1)
      }
      // morton(a, a) with identical bounds interleaves the SAME rank
      // on both axes — recover it from the even bits to compare
      val m = graft.functions.ZOrderKernel.morton(v, v, arr, arr)
      var rank = 0
      (0 until 8).foreach(i => rank |= ((m >> (2 * i)) & 1) << i)
      assert(rank == (viaJava & 0xff),
        s"bucket($v): kernel $rank vs binarySearch ${viaJava & 0xff}")
    }
  }

  test("dynamic partition OVERWRITE replaces exactly the batch's partitions") {
    GraftExtensions.register(spark)
    val d = freshDir("dyn")
    LakeWriter.writeDelta(base, d, partitionBy = Seq("k"))
    // batch carries partitions a and c (dynamic column LAST, Hive order)
    spark.sql(s"INSERT OVERWRITE graft_delta.`$d` PARTITION (k) " +
      "SELECT CAST(x AS BIGINT), CAST(0.5 AS DOUBLE), p " +
      "FROM VALUES (600, 'a'), (601, 'c') AS s(x, p)")
    val out = DeltaReader.read(spark, d)
    assert(out.where(col("k") === "a").collect().map(_.getLong(0)).toSeq == Seq(600L))
    assert(out.where(col("k") === "c").collect().map(_.getLong(0)).toSeq == Seq(601L))
    assert(out.where(col("k") === "b").count() == 10) // untouched partition
    // dynamic with a plain INSERT refuses (just include the column)
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"INSERT INTO graft_delta.`$d` PARTITION (k) " +
        "SELECT CAST(1 AS BIGINT), CAST(1.0 AS DOUBLE), 'z'")
    }
    assert(e.getMessage.contains("OVERWRITE"))
  }
}
