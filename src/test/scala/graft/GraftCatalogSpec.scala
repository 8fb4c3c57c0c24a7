package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.functions._

/** The V2 TableCatalog surface: every statement a named-table user
  * writes — CREATE/INSERT/SELECT/DML/maintenance/ALTER/RENAME/DROP —
  * against `graft.db.t` names resolved through a catalog-root
  * directory, all routed onto the same production reader/writers as
  * the path API.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  // the catalog instance pins its root at initialize (once per JVM) —
  // reuse an already-registered root; a spec that re-set the conf
  // AFTER another suite instantiated the catalog would resolve names
  // through the conf while the catalog reads its pinned root
  private lazy val root: String =
    spark.conf.getOption("spark.sql.catalog.graft.root").getOrElse {
      val r = java.nio.file.Files.createTempDirectory("graft_catalog_")
        .toAbsolutePath.toString
      spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", r)
      r
    }

  private def ensureDb(db: String): Unit = {
    root // force catalog registration
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$db")
  }

  test("CREATE TABLE / INSERT / SELECT / spark.table round-trip by name") {
    ensureDb("db1")
    spark.sql("CREATE TABLE graft.db1.t1 (id BIGINT, k STRING, v DOUBLE) " +
      "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')")
    assert(new java.io.File(s"$root/db1/t1/_delta_log").isDirectory)
    // empty read by name through the catalog relation
    assert(spark.table("graft.db1.t1").count() == 0)
    spark.sql("INSERT INTO graft.db1.t1 VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0)")
    val rows = spark.sql("SELECT k, sum(v) AS s FROM graft.db1.t1 GROUP BY k ORDER BY k")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(rows.toSeq == Seq("a" -> 4.0, "b" -> 2.0))
    // the name IS the path: the path API sees the same table
    assert(DeltaReader.read(spark, s"$root/db1/t1").count() == 3)
  }

  test("SHOW TABLES / SHOW NAMESPACES list the directory layout") {
    ensureDb("db2")
    spark.sql("CREATE TABLE graft.db2.a (x INT)")
    spark.sql("CREATE TABLE graft.db2.b (x INT)")
    val tables = spark.sql("SHOW TABLES IN graft.db2").collect().map(_.getString(1)).toSet
    assert(tables == Set("a", "b"))
    val nss = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
    assert(nss.contains("db2"))
  }

  test("DELETE / UPDATE / MERGE by name route to the production writers") {
    ensureDb("db3")
    LakeWriter.writeDelta(
      (1 to 30).map(i => (i.toLong, Seq("a", "b", "c")(i % 3), i * 1.0))
        .toDF("id", "k", "v"),
      s"$root/db3/t")
    spark.sql("DELETE FROM graft.db3.t WHERE k = 'a'")
    assert(spark.table("graft.db3.t").where("k = 'a'").count() == 0)
    spark.sql("UPDATE graft.db3.t SET v = 0.0 WHERE k = 'b'")
    assert(spark.table("graft.db3.t").where("k = 'b'").agg(sum("v")).head().getDouble(0) == 0.0)
    spark.sql(
      """MERGE INTO graft.db3.t AS t
        |USING (SELECT 100L AS id, 'z' AS k, CAST(9.0 AS DOUBLE) AS v) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("graft.db3.t").where("id = 100").count() == 1)
  }

  test("time travel by name: VERSION AS OF") {
    ensureDb("db4")
    LakeWriter.writeDelta(Seq((1L, "x")).toDF("id", "s"), s"$root/db4/tt")
    LakeWriter.appendDelta(Seq((2L, "y")).toDF("id", "s"), s"$root/db4/tt")
    assert(spark.sql("SELECT count(*) FROM graft.db4.tt VERSION AS OF 0").head().getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM graft.db4.tt").head().getLong(0) == 2)
  }

  test("OPTIMIZE and VACUUM by name (maintenance normalization)") {
    ensureDb("db5")
    val d = s"$root/db5/m"
    LakeWriter.writeDelta(Seq((0L, "0")).toDF("id", "s"), d)
    (1 to 7).foreach(i => LakeWriter.appendDelta(Seq((i.toLong, i.toString)).toDF("id", "s"), d))
    spark.sql("OPTIMIZE graft.db5.m")
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(snap.active.size < 8)
    spark.sql("VACUUM graft.db5.m RETAIN 1 VERSIONS")
    assert(spark.table("graft.db5.m").count() == 8)
  }

  test("CTAS by name; ALTER and RENAME and DROP") {
    ensureDb("db6")
    spark.sql("CREATE TABLE graft.db6.c AS SELECT id, id * 2 AS dbl FROM range(10)")
    assert(spark.table("graft.db6.c").count() == 10)
    spark.sql("ALTER TABLE graft.db6.c SET TBLPROPERTIES ('graft.note' = 'hi')")
    assert(DeltaReader.snapshot(spark, s"$root/db6/c", None)
      .configuration("graft.note") == "hi")
    spark.sql("ALTER TABLE graft.db6.c ADD COLUMNS (extra STRING)")
    assert(spark.table("graft.db6.c").columns.contains("extra"))
    // RENAME TO names are catalog-relative (SQL cannot move a table
    // across catalogs)
    spark.sql("ALTER TABLE graft.db6.c RENAME TO db6.c2")
    assert(spark.table("graft.db6.c2").count() == 10)
    assert(!new java.io.File(s"$root/db6/c").exists())
    spark.sql("DROP TABLE graft.db6.c2")
    assert(!new java.io.File(s"$root/db6/c2").exists())
    val tables = spark.sql("SHOW TABLES IN graft.db6").collect()
    assert(tables.isEmpty)
  }

  test("external LOCATION: pointer file, data stays on DROP") {
    ensureDb("db7")
    val ext = java.nio.file.Files.createTempDirectory("graft_cat_ext_")
      .resolve("data").toAbsolutePath.toString
    LakeWriter.writeDelta(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), ext)
    spark.sql(s"CREATE TABLE graft.db7.e (id BIGINT, s STRING) LOCATION '$ext'")
    assert(spark.table("graft.db7.e").count() == 2)
    spark.sql("DELETE FROM graft.db7.e WHERE id = 1")
    assert(DeltaReader.read(spark, ext).count() == 1)
    spark.sql("DROP TABLE graft.db7.e")
    // the pointer is gone, the data is not
    assert(!new java.io.File(s"$root/db7/e").exists())
    assert(DeltaReader.read(spark, ext).count() == 1)
  }

  test("readStream/writeStream by name: option(\"table\", \"graft.db.t\")") {
    ensureDb("db9")
    val src = s"$root/db9/src"
    LakeWriter.writeDelta((1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "s"), src)
    spark.sql("CREATE TABLE graft.db9.dst (id BIGINT, s STRING)")
    val cp = java.nio.file.Files.createTempDirectory("graft_cat_cp_").toString
    val q = spark.readStream.format("graft-delta").option("table", "graft.db9.src").load()
      .writeStream.format("graft-delta")
      .option("table", "graft.db9.dst")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table("graft.db9.dst").count() == 5)
  }

  test("partitioned CREATE by name lays out hive directories") {
    ensureDb("db8")
    spark.sql("CREATE TABLE graft.db8.p (id BIGINT, k STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.db8.p VALUES (1, 'x'), (2, 'y')")
    val snap = DeltaReader.snapshot(spark, s"$root/db8/p", None)
    assert(snap.partCols == Seq("k"))
    assert(spark.table("graft.db8.p").where("k = 'x'").count() == 1)
  }

  test("DESCRIBE, SHOW TBLPROPERTIES and SHOW CREATE-adjacent surfaces read the log") {
    ensureDb("db11")
    spark.sql("CREATE TABLE graft.db11.d (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('delta.appendOnly' = 'false', 'team' = 'data')")
    val desc = spark.sql("DESCRIBE TABLE graft.db11.d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("id").contains("bigint") && desc.get("v").contains("string"), desc)
    val props = spark.sql("SHOW TBLPROPERTIES graft.db11.d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("data"), props.toString)
    spark.sql("ALTER TABLE graft.db11.d SET TBLPROPERTIES ('team' = 'ml')")
    val props2 = spark.sql("SHOW TBLPROPERTIES graft.db11.d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2.get("team").contains("ml"), props2.toString)
    // clustering surfaces in DESCRIBE's partitioning section
    spark.sql("CREATE TABLE graft.db11.dc (a BIGINT, b BIGINT) CLUSTER BY (a, b)")
    val descC = spark.sql("DESCRIBE TABLE graft.db11.dc").collect()
      .map(_.getString(0))
    assert(descC.exists(_.toLowerCase.contains("clustering")), descC.mkString("|"))
  }

  test("CREATE TABLE with CHECK constraint declares the floor and enforces from the first write") {
    ensureDb("db10")
    spark.sql("CREATE TABLE graft.db10.c (id BIGINT, qty BIGINT, " +
      "CONSTRAINT qty_pos CHECK (qty > 0))")
    val snap = DeltaReader.snapshot(spark, s"$root/db10/c", None)
    assert(snap.configuration.get("delta.constraints.qty_pos").exists(_.contains("qty")),
      snap.configuration.toString)
    assert(snap.minWriter >= 3, s"constraint floor not declared: ${snap.minWriter}")
    spark.sql("INSERT INTO graft.db10.c VALUES (1, 5)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.db10.c VALUES (2, -1)")
    }
    assert(e.getMessage.contains("qty_pos"), e.getMessage)
    assert(spark.table("graft.db10.c").count() == 1)
  }
}
