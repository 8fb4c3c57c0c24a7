package graft

import graft.sources.{DeltaReader, LakeWriter}
import graft.streaming.DeltaTail
import org.apache.spark.sql.DataFrame

/** Copy-on-write DELETE (`LakeWriter.deleteWhere`) against the whole
  * table lifecycle: time travel, deletion-vector inputs, partitioned
  * layouts, the streaming tail's refusal contract, vacuum reclamation,
  * and the append-only gate.
  */
class DeltaDeleteSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  test("deleteWhere removes matching rows at latest, keeps them under time travel") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_del_")
    // one file per commit (coalesce): both must hold a match below
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c"), (3L, "d")).toDF("id", "v").coalesce(1), dir)
    val before = DeltaReader.snapshot(spark, dir, None)

    val removed = LakeWriter.deleteWhere(spark, dir, "id = 1 OR v = 'c'")
    assert(removed.nonEmpty)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (3L, "d")))
    // time travel below the delete still sees everything
    assert(rows(DeltaReader.read(spark, dir, Some(1L))) ==
      Set((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")))
    // both original files held a match here, so both were rewritten
    val after = DeltaReader.snapshot(spark, dir, None)
    assert(after.version == before.version + 1)
    assert(before.active.map(_.path).toSet.intersect(after.active.map(_.path).toSet).isEmpty)
  }

  test("a file with no matching rows is NOT rewritten; NULL predicate rows survive") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_del_nomatch_")
    LakeWriter.writeDelta(
      Seq((0L, "a"), (1L, null.asInstanceOf[String])).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    val before = DeltaReader.snapshot(spark, dir, None)

    // matches only version 0's file; v IS NULL makes the predicate
    // NULL there — SQL DELETE semantics keep that row
    val removed = LakeWriter.deleteWhere(spark, dir, "v = 'a'")
    assert(removed.size == 1)
    assert(rows(DeltaReader.read(spark, dir)) ==
      Set((1L, null.asInstanceOf[String]), (2L, "c")))
    val after = DeltaReader.snapshot(spark, dir, None)
    // version 1's file rides through untouched, same log entry
    val keptC = before.active.map(_.path).toSet.intersect(after.active.map(_.path).toSet)
    assert(keptC.size == 1, s"expected exactly the non-matching file kept, got $keptC")

    // a predicate matching NOTHING writes no commit at all
    assert(LakeWriter.deleteWhere(spark, dir, "v = 'zzz'") == Nil)
    assert(DeltaReader.snapshot(spark, dir, None).version == after.version)
  }

  test("partitioned table: partition-pruning predicate rewrites only that partition") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_del_part_")
    LakeWriter.writeDelta(
      Seq((0L, "a", "x"), (1L, "b", "x"), (2L, "c", "y"), (3L, "d", "y"))
        .toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    val before = DeltaReader.snapshot(spark, dir, None)

    val removed = LakeWriter.deleteWhere(spark, dir, "p = 'x' AND id = 0")
    assert(removed.size == 1)
    val out = DeltaReader.read(spark, dir)
    assert(out.count() == 3 && out.where("id = 0").count() == 0)
    val after = DeltaReader.snapshot(spark, dir, None)
    // partition y's file(s) kept their original log entries, and the
    // rewritten file landed back under p=x with the right pv
    val yBefore = before.active.filter(_.partitionValues.get("p").contains("y")).map(_.path)
    val yAfter = after.active.filter(_.partitionValues.get("p").contains("y")).map(_.path)
    assert(yBefore.toSet == yAfter.toSet)
    val xAfter = after.active.filter(_.partitionValues.get("p").contains("x"))
    assert(xAfter.nonEmpty && xAfter.forall(_.path.startsWith("p=x/")))
  }

  test("delete on a deletion-vector table: DV rows stay deleted, DV dropped on rewrite") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_del_dv_")
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    // one file of 4 rows; row index 1 ("b") already deleted via inline DV
    val stage = new java.io.File(dir, "_stage_fix")
    Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "v")
      .coalesce(1).write.parquet(stage.getPath)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, new java.io.File(dir, "part-0001.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    val bitmap = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(Integer.reverseBytes(1681511377))
      out.writeLong(java.lang.Long.reverseBytes(1L))
      out.writeInt(Integer.reverseBytes(0))
      val rb = new org.roaringbitmap.RoaringBitmap(); rb.add(1); rb.serialize(out)
      out.flush(); bos.toByteArray
    }
    val padded = bitmap ++ new Array[Byte]((4 - bitmap.length % 4) % 4)
    commitLines(log, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"deldv","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"part-0001.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${
        DeltaReader.base85Encode(padded)}","sizeInBytes":${bitmap.length},"cardinality":1}}}"""))
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (2L, "c"), (3L, "d")))

    val removed = LakeWriter.deleteWhere(spark, dir, "v = 'c'")
    assert(removed == Seq("part-0001.parquet"))
    // "b" (DV-deleted before) must NOT resurrect through the rewrite
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (3L, "d")))
    assert(DeltaReader.snapshot(spark, dir, None).active.forall(_.dv.isEmpty))
  }

  test("DeltaTail refuses the delete version; vacuum reclaims the rewritten file") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_del_tail_")
    val cp = tmp("graft_del_tail_cp_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v"), dir)
    assert(DeltaTail.pollOnce(spark, dir, cp, (_, _) => ()) == Some(0L))

    val removed = LakeWriter.deleteWhere(spark, dir, "v = 'b'")
    assert(removed.size == 1)
    val e = intercept[IllegalArgumentException] {
      DeltaTail.pollOnce(spark, dir, cp, (_, _) => ())
    }
    assert(e.getMessage.contains("dataChange=true"), e.getMessage)

    // vacuum past the delete: the pre-delete file physically goes away,
    // the live read is unchanged, time travel below the horizon refuses
    val deleted = LakeWriter.vacuumDelta(spark, dir, 1L)
    assert(deleted.contains(DeltaReader.percentDecode(removed.head)), deleted.toString)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a")))
    intercept[IllegalArgumentException] {
      DeltaReader.read(spark, dir, Some(0L)).collect()
    }
  }

  test("delete on a column-mapped table stages physical names and logical reads survive") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_del_cm_")
    LakeWriter.writeDeltaMapped(
      Seq((0L, "a", "x"), (1L, "b", "x"), (2L, "c", "y")).toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    val removed = LakeWriter.deleteWhere(spark, dir, "v = 'b'")
    assert(removed.nonEmpty)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (2L, "c")))
    // the rewritten file must live under the PHYSICAL partition dir and
    // carry physical parquet columns — i.e. append after delete works
    LakeWriter.appendDelta(Seq((3L, "d", "x")).toDF("id", "v", "p"), dir)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (2L, "c"), (3L, "d")))
  }

  test("append-only tables refuse deleteWhere loudly") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_del_ao_")
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    commitLines(log, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"ao","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{"delta.appendOnly":"true"}}}"""))
    val e = intercept[IllegalArgumentException] {
      LakeWriter.deleteWhere(spark, dir, "id = 1")
    }
    assert(e.getMessage.contains("appendOnly"), e.getMessage)
  }

  private def commitLines(log: java.io.File, version: Long, lines: Seq[String]): Unit =
    java.nio.file.Files.write(new java.io.File(log, f"$version%020d.json").toPath,
      lines.mkString("\n").getBytes("UTF-8"))
}
