package graft

import graft.sources.DeltaReader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Fixtures are hand-written against the PUBLIC Delta protocol
  * (PROTOCOL.md): parquet part files + JSON commit lines + a classic
  * checkpoint — no delta-spark involved, which is the point (the
  * reader must work from the spec alone).
  */
class DeltaReaderSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("src", StringType)))
  private val dataSchema = StructType(schema.fields.filterNot(_.name == "src"))

  /** Writes rows as a single parquet part file, returns its relative name. */
  private def part(dir: java.io.File, name: String, rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val stage = new java.io.File(dir, s"_stage_$name")
    rows.toDF("id", "v").coalesce(1).write.parquet(stage.getPath)
    val f = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(dir, name)
    java.nio.file.Files.move(f.toPath, dest.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    name
  }

  private def commit(log: java.io.File, version: Long, lines: Seq[String]): Unit = {
    val f = new java.io.File(log, f"$version%020d.json")
    java.nio.file.Files.write(f.toPath, lines.mkString("\n").getBytes("UTF-8"))
  }

  private def meta(partCols: String) =
    s"""{"metaData":{"id":"t1","format":{"provider":"parquet","options":{}},"schemaString":${
      com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .writeValueAsString(schema.json)},"partitionColumns":[$partCols],"configuration":{}}}"""

  private def add(path: String, src: String) =
    s"""{"add":{"path":"$path","partitionValues":{"src":"$src"},"size":1,"modificationTime":1,"dataChange":true}}"""

  private def mkTable(): (java.io.File, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_").toFile
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    (dir, log)
  }

  private def collected(df: DataFrame): Set[(Long, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("delta snapshot replays add/remove across commits, typed partition columns from the log") {
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((1L, "a"), (2L, "b")))
    val f2 = part(dir, "part-0002.parquet", Seq((3L, "c")))
    val f3 = part(dir, "part-0003.parquet", Seq((4L, "d")))
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta("\"src\""), add(f1, "web"), add(f2, "book")))
    commit(log, 1, Seq(
      s"""{"remove":{"path":"$f2","dataChange":true}}""", add(f3, "web")))
    val df = DeltaReader.read(spark, dir.getPath)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "src"))
    assert(collected(df) ==
      Set((1L, "a", "web"), (2L, "b", "web"), (4L, "d", "web")))
    // time travel: version 0 still sees f2, not f3
    assert(collected(DeltaReader.read(spark, dir.getPath, Some(0L))) ==
      Set((1L, "a", "web"), (2L, "b", "web"), (3L, "c", "book")))
    // LakeReader front door dispatches directories with _delta_log
    assert(collected(graft.sources.LakeReader.read(spark, dir.getPath)) ==
      collected(df))
  }

  test("delta checkpoint is the replay base; later JSON commits apply on top") {
    val s = spark
    import s.implicits._
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((1L, "a")))
    val f2 = part(dir, "part-0002.parquet", Seq((2L, "b")))
    // checkpoint at version 1 carries the metaData + f1's add
    val cpRows = Seq(
      s"""{"metaData":{"id":"t1","schemaString":${
        com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
          .writeValueAsString(schema.json)},"partitionColumns":["src"]}}""",
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"add":{"path":"$f1","partitionValues":{"src":"web"},"size":1}}""")
    // explicit action schema: real checkpoints store partitionValues as
    // map<string,string>, which JSON inference would turn into a struct
    val cpSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          org.apache.spark.sql.types.MapType(StringType, StringType)),
        StructField("size", LongType)))),
      StructField("remove", StructType(Seq(StructField("path", StringType)))),
      StructField("metaData", StructType(Seq(
        StructField("schemaString", StringType),
        StructField("partitionColumns",
          org.apache.spark.sql.types.ArrayType(StringType))))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", LongType),
        StructField("minWriterVersion", LongType))))))
    spark.read.schema(cpSchema).json(cpRows.toDS).coalesce(1)
      .write.parquet(new java.io.File(log, "_cp_stage").getPath)
    val cpf = new java.io.File(log, "_cp_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(cpf.toPath,
      new java.io.File(log, f"${1L}%020d.checkpoint.parquet").toPath)
    // JSON commit AFTER the checkpoint adds f2
    commit(log, 2, Seq(s"""{"add":{"path":"$f2","partitionValues":{"src":"book"},"size":1,"dataChange":true}}"""))
    val df = DeltaReader.read(spark, dir.getPath)
    assert(collected(df) == Set((1L, "a", "web"), (2L, "b", "book")))
  }

  test("writeDelta/appendDelta round-trip through the reader with time travel") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_w_").toFile
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val v1 = Seq((3L, "c")).toDF("id", "v")
    graft.sources.LakeWriter.writeDelta(v0, dir.getPath)
    graft.sources.LakeWriter.appendDelta(v1, dir.getPath)
    def rows(df: DataFrame) = df.select("id", "v").as[(Long, String)].collect().toSet
    assert(rows(DeltaReader.read(spark, dir.getPath)) ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(DeltaReader.read(spark, dir.getPath, Some(0L))) ==
      Set((1L, "a"), (2L, "b")))
  }

  test("writer checkpoints every N commits; reader replays across and from them") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_cp_").toFile
    graft.sources.LakeWriter.writeDelta(Seq((0L, "v0")).toDF("id", "v"),
      dir.getPath, checkpointInterval = 10)
    (1 to 25).foreach { i =>
      graft.sources.LakeWriter.appendDelta(Seq((i.toLong, s"v$i")).toDF("id", "v"),
        dir.getPath, checkpointInterval = 10)
    }
    val log = new java.io.File(dir, "_delta_log")
    assert(new java.io.File(log, f"${10L}%020d.checkpoint.parquet").isFile)
    assert(new java.io.File(log, f"${20L}%020d.checkpoint.parquet").isFile)
    assert(new java.io.File(log, "_last_checkpoint").isFile)
    // the writer's checkpoint stores protocol versions as int32, like
    // real delta-spark checkpoints — this doubles as the regression
    // fixture for the reader's Number-based access (getLong would throw)
    val cpSchema = spark.read
      .parquet(new java.io.File(log, f"${20L}%020d.checkpoint.parquet").getPath).schema
    val proto = cpSchema("protocol").dataType.asInstanceOf[StructType]
    assert(proto("minReaderVersion").dataType ==
      org.apache.spark.sql.types.IntegerType)
    def rows(df: DataFrame) = df.select("id", "v").as[(Long, String)].collect().toSet
    val all = (0 to 25).map(i => (i.toLong, s"v$i")).toSet
    assert(rows(DeltaReader.read(spark, dir.getPath)) == all)
    // time travel ACROSS the checkpoint boundary: base = checkpoint 10,
    // then JSON commits 11..15 on top
    assert(rows(DeltaReader.read(spark, dir.getPath, Some(15L))) ==
      all.filter(_._1 <= 15))
    // ...and to a pre-checkpoint version, replayed from JSON alone
    assert(rows(DeltaReader.read(spark, dir.getPath, Some(5L))) ==
      all.filter(_._1 <= 5))
    // retention cleans commits ≤ 20: latest still reads (base =
    // checkpoint 20 + commits 21..25), pre-checkpoint version refuses
    (0 to 20).foreach(i => new java.io.File(log, f"$i%020d.json").delete())
    assert(rows(DeltaReader.read(spark, dir.getPath)) == all)
    val ex = intercept[IllegalArgumentException] {
      DeltaReader.read(spark, dir.getPath, Some(5L)).collect()
    }
    assert(ex.getMessage.contains("partial snapshot") ||
      ex.getMessage.contains("not present"), ex.getMessage)
  }

  test("add.path decoding is RFC percent-decoding, not form-urlencoding") {
    // '+' is a literal plus in a percent-encoded path; %20 is a space
    assert(graft.sources.DeltaReader.percentDecode("a+b.parquet") == "a+b.parquet")
    assert(graft.sources.DeltaReader.percentDecode("a%20b.parquet") == "a b.parquet")
    assert(graft.sources.DeltaReader.percentDecode("x%2By.parquet") == "x+y.parquet")
    // non-BMP characters survive (surrogate pairs must not be split)
    assert(graft.sources.DeltaReader.percentDecode("data-😀.parquet")
      == "data-😀.parquet")
    // malformed escapes fail loudly, not as NumberFormatException
    val ex = intercept[IllegalArgumentException] {
      graft.sources.DeltaReader.percentDecode("100%x2.parquet")
    }
    assert(ex.getMessage.contains("percent escape"))
    intercept[IllegalArgumentException] {
      graft.sources.DeltaReader.percentDecode("bad%2")
    }
  }

  test("delta reader refuses a commit chain with a gap below the target") {
    val dir = java.nio.file.Files.createTempDirectory("delta_gap")
    val log = dir.resolve("_delta_log")
    java.nio.file.Files.createDirectories(log)
    val meta = """{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{}}}"""
    // commit 1 exists, commit 0 was "cleaned" and no checkpoint covers it
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      meta + "\n" + """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    val ex = intercept[IllegalArgumentException] {
      graft.sources.DeltaReader.read(spark, dir.toString)
    }
    assert(ex.getMessage.contains("partial snapshot"), ex.getMessage)
  }

  test("delta reader refuses minReaderVersion > 1 loudly") {
    val (dir, log) = mkTable()
    val f1 = part(dir, "part-0001.parquet", Seq((1L, "a")))
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      meta("\"src\""), add(f1, "web")))
    val e = intercept[IllegalArgumentException] {
      DeltaReader.read(spark, dir.getPath).collect()
    }
    assert(e.getMessage.contains("minReaderVersion"))
  }
}
