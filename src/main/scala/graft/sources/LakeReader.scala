package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format lake ingestion (reference: maco/data_handler.py:362 —
  * csv/tsv/json/parquet/arff readers feeding the indexer; we add orc,
  * which Spark reads natively with the same pushdown/pruning as
  * parquet).
  *
  * Spark-native: each format maps to a built-in DataFrame reader so
  * scans stay distributed and schema-aware. `arff` (a niche academic
  * format) is parsed from its text form.
  */
object LakeReader {

  /** Ingest every file in a folder (maco/data_handler.py:501
    * add_tables_folder): each readable file becomes a LakeTable with a
    * synthetic dense row id; unreadable/unsupported files are counted,
    * not fatal (the reference's file_errors counter).
    *
    * The folder walk goes through the path's Hadoop FileSystem — this
    * is the lake's INGESTION entry point, and a `java.io.File` listing
    * would return null (→ NPE) on hdfs:// or s3a:// lakes while
    * silently working in local tests.
    */
  def readFolder(s: SparkSession, dir: String, firstTableId: Int = 1):
      (Seq[graft.index.LakeTable], Int) = {
    val hconf = s.sessionState.newHadoopConf()
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    val files = fs.listStatus(dirPath)
      .filter(st => st.isFile ||
        (st.isDirectory && DeltaReader.isDeltaTable(st.getPath.toString, hconf)))
      .map(_.getPath.toString).sorted // full URI — scheme preserved
    var errors = 0
    val tables = scala.collection.mutable.ArrayBuffer.empty[graft.index.LakeTable]
    files.foreach { f =>
      try {
        val df = read(s, f)
        df.schema // force analysis
        val withId = withDenseRowId(df)
        val name = f.split('/').last
        tables += graft.index.LakeTable(firstTableId + tables.length, name,
          withId, org.apache.spark.sql.functions.col("__rid"), df.columns.toSeq)
      } catch { case _: Exception => errors += 1 }
    }
    (tables.toSeq, errors)
  }

  /** Dense 0-based row id in (partition, in-partition) order, fully
    * distributed: `zipWithIndex` runs one tiny count job for the
    * per-partition offsets and each partition then stamps its own
    * contiguous range. The previous form — `row_number()` over an
    * unpartitioned window — funneled the whole file through ONE task,
    * a scale-killer for any real file.
    */
  def withDenseRowId(df: DataFrame, name: String = "__rid"): DataFrame = {
    val s = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(name, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    s.createDataFrame(rdd, schema)
  }

  def read(s: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    if (DeltaReader.isDeltaTable(path, s.sessionState.newHadoopConf()))
      DeltaReader.read(s, path)
    else path.split('.').last match {
      case "csv"     => readCsv(s, path, ",", schema)
      case "tsv"     => readCsv(s, path, "\t", schema)
      case "json"    => readJson(s, path, schema)
      case "parquet" => s.read.parquet(path)
      case "orc"     => s.read.orc(path)
      case "arff"    => readArff(s, path)
      case "avro"    => readAvro(s, path)
      case "xml"     => readXml(s, path)
      case "txt" | "dat" => readCsv(s, path, sniffDelimiter(path, s.sessionState.newHadoopConf()))
      case other     => throw new IllegalArgumentException(s"Invalid file format: $other")
    }

  /** Avro container files. Spark 4 ships the Avro format inside
    * spark-sql but does not service-register the "avro" short name
    * (it stays an "external module" by policy), so the reader is
    * addressed by class — same distributed scan, projection pushdown
    * via ReadSchema.
    */
  def readAvro(s: SparkSession, path: String): DataFrame =
    s.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(path)

  /** XML via the built-in (Spark 4) xml source; `rowTag` defaults to
    * `row` to mirror the csv header convention.
    */
  def readXml(s: SparkSession, path: String, rowTag: String = "row"): DataFrame =
    s.read.option("rowTag", rowTag).xml(path)

  /** A folder of raw media files as a binary-column DataFrame
    * (path, modificationTime, length, content) — the ingestion edge of
    * the multimodal pipeline: feed `content` straight into
    * `Multimodal.decodeImages/decodeAudio`. Distributed file listing
    * and reads; `pathGlobFilter` narrows by extension.
    */
  def readBinaryFolder(s: SparkSession, dir: String, glob: String = "*"): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Delimiter sniffing for extension-less delimited files (reference
    * extract_delimiter_from_line, maco/data_handler.py:581 — Python's
    * csv.Sniffer over the first line): the candidate separator
    * occurring most often in the first line wins; a line with no
    * candidate at all is an error (counted by [[readFolder]], not
    * fatal). Driver-side single-line read — never loads the file.
    */
  def sniffDelimiter(path: String,
                     conf: org.apache.hadoop.conf.Configuration =
                       new org.apache.hadoop.conf.Configuration()): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // bounded read: first 64 KiB, first line — never the whole file,
    // and through the Hadoop FS so extension-less files on any scheme
    // sniff identically to local ones
    val in = fs.open(p)
    val line = try {
      val buf = new Array[Byte](65536)
      var off = 0
      var n = 0
      while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
        off += n
      val s0 = new String(buf, 0, off, "ISO-8859-1")
      val nl = s0.indexOf('\n')
      if (nl >= 0) s0.substring(0, nl).stripSuffix("\r") else s0
    } finally in.close()
    val candidates = Seq(',', '\t', ';', '|', ':')
    val best = candidates.maxBy(d => line.count(_ == d))
    if (line.count(_ == best) == 0)
      throw new IllegalArgumentException(s"no delimiter found in first line of $path")
    best.toString
  }

  def readCsv(s: SparkSession, path: String, delimiter: String = ",",
              schema: Option[StructType] = None): DataFrame = {
    val r = s.read.option("header", "true").option("delimiter", delimiter)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  def readJson(s: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = s.read
    schema.fold(r)(r.schema).json(path)
  }

  /** Minimal ARFF: `@attribute name type` declarations then `@data` CSV
    * rows; all attributes read as strings (the indexer tokenizes
    * everything to text anyway, maco/data_handler.py:406).
    */
  def readArff(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    val lines = s.read.textFile(path)
    val attrs = lines
      .filter(l => l.trim.toLowerCase.startsWith("@attribute"))
      .collect()
      .map(_.trim.split("\\s+")(1))
    val n = attrs.length
    val data = lines
      .filter { l =>
        val t = l.trim
        t.nonEmpty && !t.startsWith("@") && !t.startsWith("%")
      }
      .map(_.split(",", -1).map(_.trim.stripPrefix("'").stripSuffix("'")))
      .filter(_.length == n)
    val cols = attrs.indices.map(i => org.apache.spark.sql.functions.col("value")(i).as(attrs(i)))
    data.toDF("value").select(cols: _*)
  }
}
