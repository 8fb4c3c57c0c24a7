package graft

import graft.sources.DeltaReader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Deletion-vector fixtures hand-built against PROTOCOL.md: inline and
  * sidecar roaring bitmaps, shared sidecars with offsets, checksums —
  * no delta-spark involved, the reader must work from the spec alone.
  */
class DeltaDvSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  private def metaLine =
    s"""{"metaData":{"id":"dv1","format":{"provider":"parquet","options":{}},"schemaString":${
      om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{}}}"""

  private def dvProtocol =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""

  private def mkTable(): (java.io.File, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_").toFile
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    (dir, log)
  }

  private def commit(log: java.io.File, version: Long, lines: Seq[String]): Unit =
    java.nio.file.Files.write(new java.io.File(log, f"$version%020d.json").toPath,
      lines.mkString("\n").getBytes("UTF-8"))

  /** One-part parquet file with rows in Seq order (row_index = position). */
  private def part(dir: java.io.File, name: String, rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val stage = new java.io.File(dir, s"_stage_$name")
    rows.toDF("id", "v").coalesce(1).write.parquet(stage.getPath)
    val f = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(f.toPath, new java.io.File(dir, name).toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    name
  }

  /** PROTOCOL.md portable RoaringBitmapArray: LE magic 1681511377, LE
    * int64 bitmap count, per bitmap LE int32 high key + standard
    * portable 32-bit roaring serialization.
    */
  private def serializeBitmap(indexes: Seq[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Integer.reverseBytes(1681511377))
    val byKey = indexes.groupBy(i => (i >>> 32).toInt).toSeq.sortBy(_._1)
    out.writeLong(java.lang.Long.reverseBytes(byKey.size.toLong))
    byKey.foreach { case (k, vs) =>
      out.writeInt(Integer.reverseBytes(k))
      val rb = new org.roaringbitmap.RoaringBitmap()
      vs.foreach(v => rb.add(v.toInt))
      rb.serialize(out)
    }
    out.flush()
    bos.toByteArray
  }

  private def pad4(b: Array[Byte]): Array[Byte] =
    if (b.length % 4 == 0) b else b ++ new Array[Byte]((4 - b.length % 4) % 4)

  private def inlineDvJson(indexes: Seq[Long]): String = {
    val data = serializeBitmap(indexes)
    val enc = DeltaReader.base85Encode(pad4(data))
    s""""deletionVector":{"storageType":"i","pathOrInlineDv":"$enc","sizeInBytes":${data.length},"cardinality":${indexes.size}}"""
  }

  /** Writes a sidecar .bin holding the given DVs back to back; returns
    * (base85 uuid, per-DV (offset, sizeInBytes)).
    */
  private def sidecar(dir: java.io.File, uuid: java.util.UUID,
                      dvs: Seq[Seq[Long]]): (String, Seq[(Int, Int)]) = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(1) // format version
    val placed = dvs.map { indexes =>
      val data = serializeBitmap(indexes)
      val off = bos.size()
      out.writeInt(data.length)
      out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      out.writeInt(crc.getValue.toInt)
      (off, data.length)
    }
    out.flush()
    java.nio.file.Files.write(
      new java.io.File(dir, s"deletion_vector_$uuid.bin").toPath, bos.toByteArray)
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    (DeltaReader.base85Encode(bb.array()), placed)
  }

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  test("inline deletion vector excludes deleted rows; time travel below it sees them") {
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")))
    commit(log, 0, Seq(dvProtocol, metaLine,
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    // the delete: remove + re-add the same file, now carrying a DV for
    // row indexes 1 and 3 — the exact commit shape delta-spark writes
    commit(log, 1, Seq(
      s"""{"remove":{"path":"$f1","deletionTimestamp":1,"dataChange":true}}""",
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,${inlineDvJson(Seq(1L, 3L))}}}"""))
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((0L, "a"), (2L, "c")))
    assert(rows(DeltaReader.read(spark, dir.getPath, Some(0L))) ==
      Set((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")))
  }

  test("shared UUID sidecar: two files' DVs at different offsets, prefix path variant") {
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((0L, "a"), (1L, "b"), (2L, "c")))
    val f2 = part(dir, "part-0002.parquet", Seq((10L, "x"), (11L, "y"), (12L, "z")))
    val uuid = java.util.UUID.fromString("11111111-2222-3333-4444-555555555555")
    val (encUuid, placed) = sidecar(dir, uuid, Seq(Seq(0L), Seq(1L, 2L)))
    def dvJson(i: Int, card: Int) =
      s""""deletionVector":{"storageType":"u","pathOrInlineDv":"$encUuid","offset":${placed(i)._1},"sizeInBytes":${placed(i)._2},"cardinality":$card}"""
    commit(log, 0, Seq(dvProtocol, metaLine,
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,${dvJson(0, 1)}}}""",
      s"""{"add":{"path":"$f2","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,${dvJson(1, 2)}}}"""))
    // f1 loses row 0, f2 loses rows 1 and 2
    assert(rows(DeltaReader.read(spark, dir.getPath)) ==
      Set((1L, "b"), (2L, "c"), (10L, "x")))

    // the prefix variant: sidecar scattered under a random directory,
    // prefix chars ride ahead of the base85 uuid in pathOrInlineDv
    val (dir2, log2) = mkTable()
    val g1 = part(dir2, "part-0001.parquet", Seq((0L, "a"), (1L, "b")))
    val sub = new java.io.File(dir2, "ab")
    sub.mkdirs()
    val (encUuid2, placed2) = sidecar(sub, uuid, Seq(Seq(1L)))
    commit(log2, 0, Seq(dvProtocol, metaLine,
      s"""{"add":{"path":"$g1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"ab$encUuid2","offset":${placed2.head._1},"sizeInBytes":${placed2.head._2},"cardinality":1}}}"""))
    assert(rows(DeltaReader.read(spark, dir2.getPath)) == Set((0L, "a")))
  }

  test("corrupt sidecar checksum and cardinality mismatch are refused, not misread") {
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((0L, "a"), (1L, "b")))
    val uuid = java.util.UUID.randomUUID()
    val (encUuid, placed) = sidecar(dir, uuid, Seq(Seq(1L)))
    // flip one byte inside the bitmap data
    val bin = new java.io.File(dir, s"deletion_vector_$uuid.bin")
    val bytes = java.nio.file.Files.readAllBytes(bin.toPath)
    bytes(placed.head._1 + 6) = (bytes(placed.head._1 + 6) ^ 0x40).toByte
    java.nio.file.Files.write(bin.toPath, bytes)
    commit(log, 0, Seq(dvProtocol, metaLine,
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$encUuid","offset":${placed.head._1},"sizeInBytes":${placed.head._2},"cardinality":1}}}"""))
    val e = intercept[Throwable] {
      DeltaReader.read(spark, dir.getPath).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("checksum") || m.contains("magic")),
      messages(e).mkString(" | "))

    // declared cardinality disagreeing with the bitmap is refused too
    val (dir2, log2) = mkTable()
    val g1 = part(dir2, "part-0001.parquet", Seq((0L, "a"), (1L, "b")))
    commit(log2, 0, Seq(dvProtocol, metaLine,
      s"""{"add":{"path":"$g1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,${
        inlineDvJson(Seq(1L)).replace("\"cardinality\":1", "\"cardinality\":2")}}}"""))
    val e2 = intercept[Throwable] {
      DeltaReader.read(spark, dir2.getPath).collect()
    }
    assert(messages(e2).exists(_.contains("cardinality")), messages(e2).mkString(" | "))
  }

  test("v3 refusal narrows: deletionVectors readable, other reader features still refused") {
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((0L, "a")))
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      metaLine,
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException] {
      DeltaReader.read(spark, dir.getPath)
    }
    assert(e.getMessage.contains("v2Checkpoint"), e.getMessage)

    // a DV-featured table with NO deleted rows reads like a plain one
    val (dir2, log2) = mkTable()
    val g1 = part(dir2, "part-0001.parquet", Seq((0L, "a"), (1L, "b")))
    commit(log2, 0, Seq(dvProtocol, metaLine,
      s"""{"add":{"path":"$g1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    assert(rows(DeltaReader.read(spark, dir2.getPath)) == Set((0L, "a"), (1L, "b")))
  }

  test("checkpoint re-emits foreign inline DVs; compaction folds them without resurrection") {
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((0L, "a"), (1L, "b")))
    val f2 = part(dir, "part-0002.parquet", Seq((2L, "c")))
    commit(log, 0, Seq(dvProtocol, metaLine,
      s"""{"add":{"path":"$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,${inlineDvJson(Seq(0L))}}}""",
      s"""{"add":{"path":"$f2","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((1L, "b"), (2L, "c")))
    // checkpoint carries the inline descriptor: replaying FROM it (the
    // commit removed) must still hide row 0
    graft.sources.LakeWriter.checkpointDelta(spark, dir.getPath, 0L)
    new java.io.File(log, f"${0L}%020d.json").delete()
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((1L, "b"), (2L, "c")))
    // compaction folds the DV'd + plain file through the DV-applied
    // scan: one file, no descriptors, same live rows
    graft.sources.LakeWriter.compactDelta(spark, dir.getPath)
    val snap = DeltaReader.snapshot(spark, dir.getPath, None)
    assert(snap.active.size == 1 && snap.active.forall(_.dv.isEmpty))
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((1L, "b"), (2L, "c")))
  }

  test("DV anti-join matches files under directories with spaces and '+'") {
    // table root with a space AND the data file under a subdirectory
    // with a space + literal '+' (the shape of a partition dir like
    // p=a b+c). _metadata.file_path and binaryFile.path URL-encode the
    // space as %20; the log side percent-decodes — if the two key
    // normalizations diverge, the anti-join removes nothing and the
    // deleted rows silently reappear.
    val base = java.nio.file.Files.createTempDirectory("graft_dv_sp_").toFile
    val dir = new java.io.File(base, "tbl with space")
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val sub = new java.io.File(dir, "p=a b+c"); sub.mkdirs()
    val f1 = part(sub, "part-0001.parquet", Seq((0L, "a"), (1L, "b"), (2L, "c")))
    val f2 = part(sub, "part-0002.parquet", Seq((10L, "x"), (11L, "y")))
    val uuid = java.util.UUID.fromString("99999999-8888-7777-6666-555555555555")
    // sidecar under a plain random prefix (the only shape real writers
    // produce) — the table root's space still rides into binaryFile.path
    val pre = new java.io.File(dir, "ab"); pre.mkdirs()
    val (encUuid, placed) = sidecar(pre, uuid, Seq(Seq(0L)))
    commit(log, 0, Seq(dvProtocol, metaLine,
      // inline DV → exercises the _metadata.file_path key
      s"""{"add":{"path":"p=a%20b+c/$f1","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,${inlineDvJson(Seq(1L))}}}""",
      // sidecar DV on a table rooted at a space dir → binaryFile key too
      s"""{"add":{"path":"p=a%20b+c/$f2","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"ab$encUuid","offset":${placed.head._1},"sizeInBytes":${placed.head._2},"cardinality":1}}}"""))
    assert(rows(DeltaReader.read(spark, dir.getPath)) ==
      Set((0L, "a"), (2L, "c"), (11L, "y")))
  }

  test("base85 round-trips Z85 and deletion bitmaps round-trip the portable format") {
    val bytes = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    assert(DeltaReader.base85Decode(DeltaReader.base85Encode(bytes)).toSeq == bytes.toSeq)
    // Verbatim fixture from delta-io PROTOCOL.md ("Derived Fields"
    // example): storageType "u", pathOrInlineDv with a 2-char random
    // prefix ahead of the Z85 uuid. The documented expansion is
    // ab/deletion_vector_d2c639aa-8816-431a-aaf6-d3fe2512ff61.bin —
    // this only decodes under the Z85 charset, not RFC 1924.
    val proto = DeltaReader.DvDescriptor("u", "ab^-aqEH.-t@S}K{vb[*k^", Some(4), 40, 6)
    val p = DeltaReader.dvFilePath(new org.apache.hadoop.fs.Path("/tbl"), proto)
    assert(p.toString ==
      "/tbl/ab/deletion_vector_d2c639aa-8816-431a-aaf6-d3fe2512ff61.bin")
    // cross-word and high-bucket indexes survive (key > 0 exercises the
    // 64-bit bucket split)
    val idx = Seq(0L, 1L, 65535L, 65536L, (1L << 32) + 7L, (5L << 32) + 123L)
    assert(DeltaReader.decodeDvBitmap(serializeBitmap(idx), idx.size).toSeq == idx.sorted)
  }
}
