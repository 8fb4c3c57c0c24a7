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

  /** One homogeneous slice of a lake folder, read as a SINGLE
    * multi-path scan: `df` carries `tableid` + dense per-table `__rid`
    * + the group's data columns; `tableIds` lists the member tables so
    * catalog-driven consumers (table_info) can account for tables whose
    * scan produces zero rows. See [[readFolderMerged]].
    */
  case class MergedGroup(df: DataFrame, cols: Seq[String], tableIds: Seq[Int] = Nil)

  /** Per-file metadata probe result: the grouping key, the format, the
    * delimiter (csv family only) and the column list.
    */
  private case class Probe(key: String, fmt: String, delim: String, cols: Seq[String])

  /** Wide-lake folder ingestion: files grouped by (format, header /
    * schema), each group read as ONE multi-path scan with `tableid`
    * resolved from `input_file_name()` through a broadcast file→id
    * join. Returns the merged groups, the (tableid, dataset_name)
    * catalog, and the unmergeable-file count.
    *
    * This is the 10^4-10^5-table entry path: [[readFolder]] builds one
    * DataFrame per table, which makes the downstream index build a
    * union with one branch per table — the analyzer walks a plan as
    * wide as the lake and every branch compiles its own codegen unit
    * (driver/compile time, not executor time, becomes first-build's
    * bottleneck). Here a million same-schema csv files are ONE scan
    * node, one codegen unit, however wide the lake is.
    *
    * csv/tsv groups key on the header line (bounded first-line read
    * through the Hadoop FS) and read with an explicit all-string
    * schema — no per-file inference scan; the indexer tokenizes to
    * text anyway (maco/data_handler.py:406). parquet groups key on the
    * footer schema. Line-delimited json groups key on the FIRST
    * record's sorted top-level key set (the json analog of a csv
    * header — same bounded one-line probe) and read all-string with an
    * explicit schema in sorted key order, matching Spark's
    * alphabetized json inference; a file whose later records carry
    * extra keys mis-groups exactly like a csv with a lying header
    * would, so heterogeneous-record json belongs in [[readFolder]].
    * Anything else is counted in `errors` — route exotic formats
    * through [[readFolder]].
    *
    * The per-table `__rid` is dense 0-based in FILE ORDER: ordered by
    * the split's byte offset (`_metadata.file_block_start`) then
    * intra-split read order — deterministic however
    * `files.maxPartitionBytes` carves the scan, where plain
    * `monotonically_increasing_id()` order would follow Spark's
    * size-descending file packing and shift ids when partition sizing
    * changes. Assigned WITHOUT shuffling the data: a one-row-per-split
    * count/min aggregate feeds broadcast prefix-sum offsets back onto
    * the scan (see inline comment), so there is no per-table
    * single-reducer sort — the id assignment has no skew bound at all,
    * and huge tables cost the same as many small ones.
    */
  def readFolderMerged(s: SparkSession, dir: String, firstTableId: Int = 1):
      (Seq[MergedGroup], Seq[(Int, String)], Int) = {
    val hconf = s.sessionState.newHadoopConf()
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    val listing = fs.listStatus(dirPath).filter(_.isFile)
    val files = listing.map(_.getPath.toString).sorted
    // Scale-adaptive SPLIT sizing for the scan below: `__rid` is
    // split-independent by construction (see scaladoc), the melt+hash
    // downstream is CPU-bound, and csv/json are line-splittable — so a
    // lake of a few large files must not serialize its ingest on
    // one-task-per-file scans (the default 128 MiB maxPartitionBytes /
    // 4 MiB openCost never split them). Target ~2 splits per core,
    // floored at 64 KiB; when the lake is big enough that bytes per
    // 2·cores exceeds the session default this is a no-op and the
    // session's own sizing stands. The tuned confs live on a CLONED
    // session (captured by the HadoopFsRelation at read time), never
    // the caller's.
    val scanSession = {
      val totalBytes = listing.map(_.getLen).sum
      val parallelism = math.max(1, s.sparkContext.defaultParallelism)
      val defaultMax = s.sessionState.conf.filesMaxPartitionBytes
      val target = math.min(defaultMax,
        math.max(64L << 10, totalBytes / (2L * parallelism)))
      if (target >= defaultMax) s
      else {
        val rs = org.apache.spark.sql.GraftColumnBridge.cloneSession(s)
        rs.conf.set("spark.sql.files.maxPartitionBytes", target.toString)
        rs.conf.set("spark.sql.files.openCostInBytes",
          math.min(target, 4L << 20).toString)
        rs
      }
    }
    // metadata probe (header line / parquet footer) per file, in
    // PARALLEL: at 10^5 files a serial probe is minutes of driver
    // wall time for ~3ms of I/O each — the probe must not become the
    // wide lake's first bottleneck. Probe results keep listing order;
    // id assignment below stays sequential and deterministic.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    val om = new com.fasterxml.jackson.databind.ObjectMapper() // thread-safe for reads
    val probed: Seq[Option[Probe]] = try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      Await.result(Future.traverse(files.toSeq) { f => Future {
        try Some(f.split('.').last match {
          case ext @ ("csv" | "tsv" | "txt" | "dat") =>
            val d = ext match {
              case "csv" => ","
              case "tsv" => "\t"
              case _     => sniffDelimiter(f, hconf)
            }
            val header = firstLine(f, hconf).split(java.util.regex.Pattern.quote(d), -1).toSeq
            require(header.nonEmpty && header.forall(_.nonEmpty), s"empty header column in $f")
            Probe(s"delim:$d:" + header.mkString("\u0000"), "csv", d, header)
          case "json" =>
            // parse from RAW BYTES: jackson auto-detects UTF-8/BOM per
            // the JSON spec, where a string decode in the wrong charset
            // would mojibake non-ASCII keys — the probed names would
            // never match what Spark's UTF-8 json parser resolves and
            // every such column would read all-null
            val first = om.readTree(firstLineBytes(f, hconf))
            require(first != null && first.isObject, s"first json record is not an object in $f")
            val keys = {
              val it = first.fieldNames()
              val b = Seq.newBuilder[String]
              while (it.hasNext) b += it.next()
              b.result().sorted
            }
            require(keys.nonEmpty, s"empty first json record in $f")
            Probe("json:" + keys.mkString("\u0000"), "json", null, keys)
          case "parquet" =>
            val sch = s.read.parquet(f).schema
            Probe("parquet:" + sch.json, "parquet", null, sch.fieldNames.toSeq)
          case other => throw new IllegalArgumentException(s"unmergeable format: $other")
        })
        catch { case _: Exception => None }
      } }, Duration.Inf)
    } finally pool.shutdown()
    var errors = 0
    // group key -> (format, delimiter or null, cols, member files, member ids)
    val groups = scala.collection.mutable.LinkedHashMap.empty[String,
      (String, String, Seq[String], scala.collection.mutable.ArrayBuffer[String],
       scala.collection.mutable.ArrayBuffer[Int])]
    val catalog = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val fileIds = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    files.zip(probed).foreach {
      case (_, None) => errors += 1
      case (f, Some(Probe(key, fmt, d, cols))) =>
        val g = groups.getOrElseUpdate(key, (fmt, d, cols,
          scala.collection.mutable.ArrayBuffer.empty, scala.collection.mutable.ArrayBuffer.empty))
        val id = firstTableId + catalog.length
        g._4 += f
        g._5 += id
        catalog += ((id, f.split('/').last))
        fileIds += ((f, id))
    }
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, min, sum, input_file_name, monotonically_increasing_id, regexp_replace}
    // join key: the PATH part of the file URI in its PERCENT-ENCODED
    // form — input_file_name() returns Spark's url-encoded path (a
    // space is "%20"), so the listing side must key on the encoded
    // form too (Path.toUri.getRawPath); a decoded getPath key would
    // silently drop every row of any file whose name needs encoding.
    // The fully-qualified scheme/authority prefix ("file:///x" vs
    // "file:/x") is stripped — it need not match byte-for-byte.
    def pathOf(uri: String): String = new org.apache.hadoop.fs.Path(uri).toUri.getRawPath
    val idFrame = {
      import s.implicits._
      fileIds.toSeq.map { case (f, id) => (pathOf(f), id) }.toDF("__file", "tableid")
    }
    val merged = groups.values.toSeq.map { case (fmt, delim, cols, groupFiles, ids) =>
      val allString = StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
      val base = fmt match {
        case "csv" =>
          scanSession.read.option("header", "true").option("delimiter", delim)
            .schema(allString).csv(groupFiles.toSeq: _*)
        case "json" => scanSession.read.schema(allString).json(groupFiles.toSeq: _*)
        case _      => scanSession.read.parquet(groupFiles.toSeq: _*)
      }
      val tagged = base
        // captured BEFORE any join — metadata columns don't resolve
        // through one. __pos orders a table's splits by byte offset and
        // __mid orders rows within a split (read order), so __rid below
        // is independent of partition sizing.
        .withColumn("__pos", col("_metadata.file_block_start"))
        .withColumn("__file",
          regexp_replace(input_file_name(), "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""))
        .withColumn("__mid", monotonically_increasing_id())
      // Dense per-table __rid WITHOUT shuffling the data: a
      // row_number() window partitioned by table would shuffle the
      // whole lake and sort each table on a single reducer (the
      // biggest table = one task). Instead aggregate one row PER SPLIT
      // (count + first read-order id — rows of a split are contiguous
      // in its scan partition, so min(__mid) anchors the split) and
      // broadcast the exclusive prefix sums back:
      //   __rid = split_offset + (__mid - min __mid of the split).
      // The offsets subplan re-scans the files (column-pruned to
      // metadata only), which is two parallel passes instead of one
      // pass plus a full-data shuffle — strictly better at scale, and
      // the ordering contract (byte offset, then intra-split read
      // order) is byte-identical to the window it replaces.
      val splits = tagged.groupBy("__file", "__pos")
        .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__minmid"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__file").orderBy("__pos")
      val offsets = splits
        .join(broadcast(idFrame), "__file")
        .withColumn("__off", sum(col("__cnt")).over(w) - col("__cnt"))
        .select("__file", "__pos", "tableid", "__minmid", "__off")
      MergedGroup(
        tagged
          .join(broadcast(offsets), Seq("__file", "__pos"))
          .withColumn("__rid", col("__off") + (col("__mid") - col("__minmid")))
          .drop("__file", "__pos", "__mid", "__minmid", "__off"),
        cols, ids.toSeq)
    }
    (merged, catalog.toSeq, errors)
  }

  /** Bounded first-line read through the Hadoop FS (64 KiB cap). A
    * file whose first line exceeds the cap FAILS the probe rather than
    * returning the truncated buffer as a pseudo-line: a silently
    * truncated csv header would give [[readFolderMerged]] a wrong
    * group key / column list and [[sniffDelimiter]] a delimiter vote
    * over a partial line — the caller counts the file in `errors`,
    * which is loud where truncation is silent. A short file with no
    * trailing newline is still its own (complete) first line.
    */
  private def firstLine(path: String, conf: org.apache.hadoop.conf.Configuration): String =
    // UTF-8 decode, matching Spark's own csv parser charset: an
    // ISO-8859-1 decode would mojibake non-ASCII header names into a
    // group key / column list that never matches what the scan sees
    new String(firstLineBytes(path, conf), java.nio.charset.StandardCharsets.UTF_8)

  /** Raw bytes of the first line (64 KiB cap; `\n` is safe to split on
    * byte-wise — UTF-8 never embeds 0x0A in a multi-byte sequence). The
    * json probe parses these bytes directly so jackson's own
    * UTF-8/BOM detection applies.
    */
  private def firstLineBytes(path: String, conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](65536)
      var off = 0
      var n = 0
      while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
        off += n
      var nl = 0
      while (nl < off && buf(nl) != '\n') nl += 1
      if (nl < off || off < buf.length) {
        val end = if (nl > 0 && nl <= off && buf(math.min(nl, off) - 1) == '\r') nl - 1 else nl
        java.util.Arrays.copyOfRange(buf, 0, math.min(end, off))
      } else throw new IllegalArgumentException(
        s"first line of $path exceeds ${buf.length} bytes — refusing a truncated header probe")
    } finally in.close()
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
    // bounded read: first 64 KiB, first line — never the whole file,
    // and through the Hadoop FS so extension-less files on any scheme
    // sniff identically to local ones
    val line = firstLine(path, conf)
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
