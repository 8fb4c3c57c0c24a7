package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame

/** Copy-on-write UPDATE (`LakeWriter.updateWhere`) and the
  * partition-pruned read (`DeltaReader.readPartition`).
  */
class DeltaUpdateSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  test("updateWhere rewrites matching rows; time travel and untouched files keep theirs") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_upd_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    val before = DeltaReader.snapshot(spark, dir, None)

    // SET references the pre-update row (id bump + derived v)
    val removed = LakeWriter.updateWhere(spark, dir, "v = 'b'",
      Map("v" -> "concat(v, '!')", "id" -> "id + 10"))
    assert(removed.size == 1)
    assert(rows(DeltaReader.read(spark, dir)) ==
      Set((0L, "a"), (11L, "b!"), (2L, "c")))
    assert(rows(DeltaReader.read(spark, dir, Some(1L))) ==
      Set((0L, "a"), (1L, "b"), (2L, "c")))
    // version 1's non-matching file kept its original log entry
    val after = DeltaReader.snapshot(spark, dir, None)
    assert(before.active.map(_.path).toSet.intersect(after.active.map(_.path).toSet).size == 1)

    // NULL predicate rows untouched; no match → no commit
    assert(LakeWriter.updateWhere(spark, dir, "v = 'zzz'", Map("v" -> "'x'")) == Nil)
    assert(DeltaReader.snapshot(spark, dir, None).version == after.version)

    // unknown SET column refuses
    val e = intercept[IllegalArgumentException] {
      LakeWriter.updateWhere(spark, dir, "v = 'a'", Map("nope" -> "'x'"))
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("updating a partition column moves rows across partition directories") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_upd_part_")
    LakeWriter.writeDelta(
      Seq((0L, "a", "x"), (1L, "b", "x"), (2L, "c", "y")).toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    val removed = LakeWriter.updateWhere(spark, dir, "id = 1", Map("p" -> "'y'"))
    assert(removed.nonEmpty)
    val out = DeltaReader.read(spark, dir)
    assert(out.where("p = 'y'").count() == 2 && out.where("p = 'x'").count() == 1)
    // the moved row's file sits under p=y with log pv to match
    val moved = DeltaReader.snapshot(spark, dir, None).active
      .filter(_.partitionValues.get("p").contains("y"))
    assert(moved.forall(_.path.startsWith("p=y/")), moved.map(_.path).toString)
  }

  test("readPartition prunes the file resolution, not just the scan") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_readpart_")
    // 3 files under p=x, 1 under p=y (coalesce makes counts exact),
    // plus a checkpoint so the resolution runs the DataFrame path
    LakeWriter.writeDelta(Seq((0L, "a", "x")).toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    LakeWriter.appendDelta(Seq((1L, "b", "x")).toDF("id", "v", "p").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c", "x")).toDF("id", "v", "p").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((10L, "z", "y")).toDF("id", "v", "p").coalesce(1), dir)
    LakeWriter.checkpointDelta(spark, dir, 3L)

    // equality with the post-hoc filter on the full read
    assert(rows(DeltaReader.readPartition(spark, dir, Map("p" -> "y"))) ==
      rows(DeltaReader.read(spark, dir).where("p = 'y'")))
    assert(rows(DeltaReader.readPartition(spark, dir, Map("p" -> "x"))) ==
      rows(DeltaReader.read(spark, dir).where("p = 'x'")))

    // the sharp assertion: with the gate set BELOW the table's total
    // file count but AT the pruned count, the full read refuses while
    // the partition read succeeds — proof the driver never resolved
    // the other partitions' entries
    spark.conf.set("spark.graft.delta.maxSnapshotFiles", "1")
    try {
      intercept[IllegalArgumentException] {
        DeltaReader.read(spark, dir).collect()
      }
      assert(rows(DeltaReader.readPartition(spark, dir, Map("p" -> "y"))) ==
        Set((10L, "z")))
    } finally spark.conf.unset("spark.graft.delta.maxSnapshotFiles")

    // unknown key refuses without forcing anything
    val e = intercept[IllegalArgumentException] {
      DeltaReader.readPartition(spark, dir, Map("q" -> "1"))
    }
    assert(e.getMessage.contains("not partition columns"), e.getMessage)
  }
}
