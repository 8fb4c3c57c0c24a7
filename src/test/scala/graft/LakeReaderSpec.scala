package graft

import graft.dedup.Dedup
import graft.index.LakeIndexer
import graft.sources.LakeReader
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LakeReaderSpec extends SparkSpec {

  test("readFolder ingests mixed formats and counts errors") {
    val dir = Files.createTempDirectory("graft_folder_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"), "x,y\n1,foo\n2,bar\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.json"), "{\"p\":1}\n{\"p\":2}\n{\"p\":3}\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/c.xyz"), "unsupported")
    val (tables, errors) = LakeReader.readFolder(spark, dir)
    assert(errors == 1)
    assert(tables.map(_.name) == Seq("a.csv", "b.json"))
    val cells = LakeIndexer.cells(tables)
    // a.csv: 2 rows × 2 cols; b.json: 3 rows × 1 col — __rid not indexed
    assert(cells.count() == 2 * 2 + 3)
    assert(cells.where(col("tableid") === 1).select(max(col("colid"))).first().getInt(0) == 1)
  }

  test("readFolder and sniffDelimiter work through an explicit file:-scheme Hadoop path") {
    // the ingestion entry point must go through the Hadoop FileSystem
    // resolved from the path's scheme — a java.io.File walk returns
    // null on any non-local URI (silent NPE on hdfs/s3a lakes); the
    // file: scheme is the URI form local tests can exercise
    val dir = Files.createTempDirectory("graft_fs_uri_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"), "x,y\n1,foo\n2,bar\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"), "p;q\n5;baz\n")
    val uri = s"file:$dir"
    val (tables, errors) = LakeReader.readFolder(spark, uri)
    assert(errors == 0)
    assert(tables.map(_.name) == Seq("a.csv", "b.txt"))
    assert(tables.head.df.count() == 2 && tables(1).df.count() == 1)
    assert(LakeReader.sniffDelimiter(s"file:$dir/b.txt") == ";")
  }

  test("merged folder ingest builds the identical cell index through one scan per group") {
    val dir = Files.createTempDirectory("graft_merged_").toString
    // two homogeneous csv groups (different headers) + a tsv group + a
    // json group + one unmergeable file; the x,y group also carries a
    // space-named file (the url-encoded input_file_name join key), and
    // a header-only zero-row csv (the table_info left-join path)
    Files.writeString(java.nio.file.Paths.get(s"$dir/a b.csv"), "x,y\n0,spacey\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"), "x,y\n1,foo\n2,bar\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.csv"), "x,y\n3,baz\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/c.csv"), "p,q,r\n7,a,b\n8,c,d\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.tsv"), "m\tn\n5\tfive\n6\tsix\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/e.tsv"), "m\tn\n9\tnine\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/f.xyz"), "unsupported")
    Files.writeString(java.nio.file.Paths.get(s"$dir/g.json"),
      "{\"k\":1,\"t\":\"one\"}\n{\"k\":2,\"t\":\"two\"}\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/h.json"), "{\"t\":\"three\",\"k\":3}\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/z.csv"), "x,y\n")
    // a parquet group (footer-schema key, typed scan) and a sniffed
    // .txt group — the remaining probe branches
    val s0 = spark
    locally {
      import s0.implicits._
      def onePart(name: String, rows: Seq[(String, String)]): Unit = {
        val stage = Files.createTempDirectory("graft_pq_stage_").resolve("w")
        rows.toDF("pk", "pv").coalesce(1).write.parquet(stage.toString)
        val f = stage.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$dir/$name"))
        org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
      }
      onePart("p.parquet", Seq(("10", "ten"), ("11", "eleven")))
      onePart("q.parquet", Seq(("12", "twelve")))
    }
    Files.writeString(java.nio.file.Paths.get(s"$dir/s.txt"), "u;w\n20;twenty\n")
    val (groups, catalog, errors) = graft.sources.LakeReader.readFolderMerged(spark, dir)
    assert(errors == 1)
    assert(groups.size == 6, "one scan branch per homogeneous group, not per table")
    assert(catalog == Seq((1, "a b.csv"), (2, "a.csv"), (3, "b.csv"), (4, "c.csv"),
      (5, "d.tsv"), (6, "e.tsv"), (7, "g.json"), (8, "h.json"), (9, "p.parquet"),
      (10, "q.parquet"), (11, "s.txt"), (12, "z.csv")))
    // both parquet files land in ONE footer-schema group
    assert(groups.find(_.tableIds.contains(9)).get.tableIds == Seq(9, 10))
    // the space-named file's rows must survive the url-encoded
    // input_file_name → listing join (a decoded key would drop them)
    val xy = groups.find(_.tableIds.contains(1)).get.df
    assert(xy.where(col("tableid") === 1).count() == 1)
    // json group: sorted-key schema, typed values read back as strings
    val js = groups.find(_.tableIds.contains(7)).get
    assert(js.cols == Seq("k", "t"))
    assert(js.df.where(col("tableid") === 8).select("k", "t").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("3", "three")))
    // parity: the merged build must produce EXACTLY the per-table
    // index — readFolder is all-strings via inference? no: compare on
    // the same all-string footing readFolderMerged uses
    val (tables, _) = LakeReader.readFolder(spark, dir)
    val perTable = LakeIndexer.cells(tables.filterNot(_.name == "f.xyz"))
    val merged = LakeIndexer.cellsMerged(groups)
    assert(merged.columns.toSeq == perTable.columns.toSeq)
    val key = merged.columns.map(col)
    assert(merged.select(key: _*).collect().map(_.toString).sorted.toSeq ==
      perTable.select(key: _*).collect().map(_.toString).sorted.toSeq)
    // table_info parity
    val infoM = LakeIndexer.tableInfoMerged(spark, groups, catalog)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val infoT = LakeIndexer.tableInfo(tables)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(infoM == infoT)
  }

  test("merged __rid is identical across files.maxPartitionBytes settings") {
    // the per-table dense row id must be a property of the FILE, not of
    // how the scan happened to be carved into splits — __rid orders by
    // the split's byte offset, so resizing maxPartitionBytes (here:
    // ~16 splits vs one) must not move a single id
    val dir = Files.createTempDirectory("graft_rid_").toString
    val sb = new StringBuilder("k,v\n")
    (0 until 20000).foreach(i => sb ++= s"$i,val$i\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), sb.toString)
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    def ridMap(): Map[Long, String] = {
      val (groups, _, errors) = LakeReader.readFolderMerged(spark, dir)
      assert(errors == 0)
      groups.head.df.select("__rid", "k").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    try {
      spark.conf.set(key, "16384")
      val small = ridMap()
      spark.conf.set(key, "134217728")
      val large = ridMap()
      assert(small.size == 20000)
      assert(small == large)
      assert(small(0L) == "0" && small(19999L) == "19999")
    } finally spark.conf.set(key, prev)
  }

  test("merged scan auto-splits a lone large file without caller conf") {
    // scale-adaptive split sizing: a single big csv must not serialize
    // the melt on one task under the DEFAULT 128 MiB / 4 MiB-open-cost
    // sizing — readFolderMerged derives a target from the listing bytes
    // (floored at 64 KiB) on a cloned session. ~470 KB here → ≥2 splits.
    val dir = Files.createTempDirectory("graft_autosplit_").toString
    val sb = new StringBuilder("k,v\n")
    (0 until 20000).foreach(i => sb ++= s"$i,value_padding_$i\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), sb.toString)
    val (groups, _, errors) = LakeReader.readFolderMerged(spark, dir)
    assert(errors == 0)
    assert(groups.head.df.rdd.getNumPartitions > 1,
      "expected the auto-sized scan to split the file")
    val rids = groups.head.df.select("__rid", "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rids.size == 20000 && rids(0L) == "0" && rids(19999L) == "19999")
  }

  test("a first line over the 64 KiB probe cap is a counted error, not a truncated group") {
    val dir = Files.createTempDirectory("graft_bigline_").toString
    // > 64 KiB before the first newline: a truncated probe would build
    // a wrong group key / delimiter vote — the file must land in
    // `errors` instead
    val big = ("x," * 40000) + "x\n1,2\n"
    Files.writeString(java.nio.file.Paths.get(s"$dir/big.csv"), big)
    Files.writeString(java.nio.file.Paths.get(s"$dir/ok.csv"), "x,y\n1,foo\n")
    val (groups, catalog, errors) = LakeReader.readFolderMerged(spark, dir)
    assert(errors == 1)
    assert(catalog.map(_._2) == Seq("ok.csv"))
    assert(groups.size == 1 && groups.head.df.count() == 1)
  }

  test("json merged probe decodes UTF-8 keys the same way the scan does") {
    val dir = Files.createTempDirectory("graft_utf8_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/j.json"),
      "{\"café\":\"crème\"}\n{\"café\":\"brûlée\"}\n")
    val (groups, _, errors) = LakeReader.readFolderMerged(spark, dir)
    assert(errors == 0 && groups.size == 1)
    // a mojibaked probe (ISO-8859-1 decode of UTF-8 bytes) would name
    // the column cafÃ© and every value would read null
    assert(groups.head.cols == Seq("café"))
    val vals = groups.head.df.select(col("café")).collect().map(_.getString(0))
    assert(vals.sorted.toSeq == Seq("brûlée", "crème"))
  }

  test("cell_index_merged: the merged demo-lake index equals the per-table one under id remap") {
    // the harness row's parity core: cellsMergedDemo (folder of
    // key-sorted single-file csvs through readFolderMerged+cellsMerged)
    // must reproduce TestLake.cells exactly, with tableids remapped to
    // filename order — this is what its DuckDB oracle asserts at sf0.01
    import graft.index.TestLake
    val merged = TestLake.cellsMergedDemo(spark, sf())
      .select("tokenized", "tableid", "colid", "rowid", "table_col_id")
    val idMap = TestLake.mergedSpec.map { case (mid, (oid, _, _, _)) => (oid, mid) }.toMap
    val remap = typedlit(idMap)
    val perTable = TestLake.cells(spark, sf())
      .withColumn("tableid", remap(col("tableid")))
      .withColumn("table_col_id", concat_ws("_", col("tableid"), col("colid")))
      .select("tokenized", "tableid", "colid", "rowid", "table_col_id")
    assert(merged.collect().map(_.toString).sorted.toSeq ==
      perTable.collect().map(_.toString).sorted.toSeq)
  }

  test("delimiter sniffing reads .txt/.dat delimited files") {
    val dir = Files.createTempDirectory("graft_sniff_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"), "x;y;z\n1;foo;2\n3;bar;4\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.dat"), "p|q\n5|baz\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/c.txt"), "nodelimiterhere\n")
    assert(LakeReader.sniffDelimiter(s"$dir/a.txt") == ";")
    assert(LakeReader.sniffDelimiter(s"$dir/b.dat") == "|")
    val (tables, errors) = LakeReader.readFolder(spark, dir)
    assert(errors == 1, "the delimiter-less file is counted, not fatal")
    assert(tables.map(_.name) == Seq("a.txt", "b.dat"))
    assert(tables.head.df.columns.toSeq == Seq("x", "y", "z", "__rid"))
    assert(tables.head.df.count() == 2 && tables(1).df.count() == 1)
  }

  test("orc round-trip reads back with schema and filter pushdown") {
    val dir = Files.createTempDirectory("graft_orc_").toString
    import spark.implicits._
    Seq((1, "foo", 2.5), (2, "bar", 7.0), (3, "baz", 1.0))
      .toDF("k", "name", "v").write.orc(s"$dir/t.orc")
    val back = LakeReader.read(spark, s"$dir/t.orc")
    assert(back.schema.fieldNames.toSeq == Seq("k", "name", "v"))
    assert(back.where(col("k") > 1).count() == 2)
    // predicate reaches the ORC scan, not a post-scan filter only
    val plan = back.where(col("k") > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(k,1)"), plan.take(500))
  }

  test("readFolder arff parsing") {
    val dir = Files.createTempDirectory("graft_arff_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.arff"),
      "@relation test\n@attribute name string\n@attribute size numeric\n@data\n'widget',3\n'bolt',5\n")
    val (tables, errors) = LakeReader.readFolder(spark, dir)
    assert(errors == 0 && tables.size == 1)
    val rows = tables.head.df.select("name", "size").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("widget", "3"), ("bolt", "5")))
  }

  test("avro round-trip through the class-addressed built-in reader") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro").toString + "/t.avro"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0)).toDF("id", "name", "x")
    df.write.format("org.apache.spark.sql.avro.AvroFileFormat").save(dir)
    val back = LakeReader.read(s, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "x"))
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("xml rows read through the built-in xml source") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("xml")
    val f = dir.resolve("t.xml")
    java.nio.file.Files.writeString(f,
      """<rows><row><id>1</id><name>alpha</name></row>
        |<row><id>2</id><name>beta</name></row></rows>""".stripMargin)
    val back = LakeReader.read(s, f.toString)
    assert(back.count() == 2)
    assert(back.select("id", "name").orderBy("id").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, "alpha"), Seq(2L, "beta")))
  }

  test("binary folder ingestion feeds the image decoder") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("bin")
    // one real 2x1 PNG + one non-image file the glob excludes
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x0000ff)
    javax.imageio.ImageIO.write(img, "png", dir.resolve("a.png").toFile)
    java.nio.file.Files.writeString(dir.resolve("skip.txt"), "not an image")
    val bin = LakeReader.readBinaryFolder(s, dir.toString, "*.png")
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(7L))
    assert(bin.count() == 1)
    val feats = graft.multimodal.Multimodal.decodeImages(s, bin, id = "doc_id", blobCol = "content")
      .collect()
    assert(feats.length == 1 && feats.head.decode_ok &&
      feats.head.width == 2 && feats.head.height == 1)
  }

  test("cluster propagation finds connected components") {
    val s = spark
    import s.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (4L, 5L, 1.0)).toDF("id_1", "id_2", "jac")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L)
    // local union-find path (default threshold) and the distributed
    // propagation path (threshold 0) must agree exactly
    val local = Dedup.clusters(docs, pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.clusters(docs, pairs, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected)
    assert(dist == expected)
  }

  test("frequent-shingle filter drops hot keys only") {
    val s = spark
    import s.implicits._
    val inv = Seq((1L, "hot"), (2L, "hot"), (3L, "hot"), (1L, "rare"), (2L, "rare"))
      .toDF("did", "g")
    val kept = Dedup.frequentShingleFilter(inv, maxDocFreq = 2)
      .select("g").distinct().collect().map(_.getString(0))
    assert(kept.toSeq == Seq("rare"))
  }
}
