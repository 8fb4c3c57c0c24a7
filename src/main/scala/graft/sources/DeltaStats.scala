package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

/** Per-file statistics — the `add.stats` JSON of the Delta protocol —
  * written from the staged parquet FOOTERS at commit time and used for
  * DATA SKIPPING: a predicate that cannot match a file's
  * [min, max]/null-count envelope prunes the file WITHOUT opening it.
  * At 100 TB this is the difference between a narrow DELETE's
  * find-phase touching O(matching files) and touching every file in
  * the table (file-open cost alone, even with parquet row-group
  * pruning, is proportional to file count — measured in SURVEY §4).
  *
  * Stats cover top-level int/long/float/double/boolean/string columns
  * (strings only when valid UTF-8; NaN-containing float/double
  * chunks are skipped); `numRecords` and per-column `nullCount`
  * always. Unknown shapes simply OMIT entries — the pruner treats a
  * missing bound as "may match", so partial stats are always sound.
  *
  * The pruner is deliberately CONSERVATIVE three-valued logic over the
  * parsed (unresolved) predicate tree: comparisons and IN against
  * literals, IsNull/IsNotNull via null counts, AND/OR composition;
  * anything else answers "may match". Partition columns evaluate
  * against the add's partitionValues — so one pruner serves both
  * partition pruning and stats skipping. String comparisons use CODE
  * POINT order throughout — identical to UTF-8 unsigned-byte order
  * (parquet's footer comparator for UTF8 columns) and to Spark's own
  * UTF8String ordering, but NOT to java.lang.String.compareTo, whose
  * UTF-16 code-unit order sorts [U+E000, U+FFFF] above supplementary
  * characters; compareTo here would wrongly prune files for exactly
  * the international corpora that need skipping most. String bounds
  * are TRUNCATED at write time (delta-spark's rule): min keeps a
  * 32-code-point prefix (≤ every value by the prefix property), max
  * truncates then increments the last incrementable code point
  * skipping the surrogate gap (≥ every value), so the stored envelope
  * only ever WIDENS and the three-valued pruner stays sound at the
  * truncation boundary with no extra cases.
  */
object DeltaStats {

  private val sharedOm = new com.fasterxml.jackson.databind.ObjectMapper()

  /** `delta.dataSkippingNumIndexedCols` (delta-spark's knob, default
    * 32): per-column stats cover only the first N top-level columns in
    * schema order; -1 means all. The point is WIDE tables at scale —
    * add.stats JSON rides in every commit, checkpoint and snapshot
    * resolve, so a 2000-column table indexing everything pays
    * ~60× the metadata bytes of the default for columns nobody
    * filters on. A missing column's stats read as "may match"
    * (pruning stays sound), and `numRecords` is always written.
    */
  def indexedColsOf(tableConf: Map[String, String]): Int =
    tableConf.get("delta.dataSkippingNumIndexedCols").map(_.trim.toInt).getOrElse(32)

  /** `delta.dataSkippingStatsColumns` (delta-spark's explicit form): a
    * comma-separated column list that REPLACES the first-N prefix rule
    * when present — the wide-table answer when the columns people
    * filter on (source, lang, quality) sit past position 32 and
    * indexing a 2000-column prefix to reach them would be absurd.
    * None = use the numIndexedCols prefix.
    */
  def statsColumnsOf(tableConf: Map[String, String]): Option[Set[String]] =
    tableConf.get("delta.dataSkippingStatsColumns")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

  /** Full dotted PHYSICAL→LOGICAL path map for every struct-reachable
    * node of `schema`: each segment maps through its field's
    * `delta.columnMapping.physicalName` metadata (the field name where
    * absent), per LEVEL — so a foreign table whose nested struct
    * fields carry their own physical names remaps every segment, not
    * just the head. Both mapping modes carry this metadata ("id"-mode
    * tables declare physicalName alongside the field id — PROTOCOL.md
    * requires both), so one map serves name- AND id-mode stats keys.
    */
  private[graft] def physToLogicalPaths(
      schema: org.apache.spark.sql.types.StructType): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    def physName(f: org.apache.spark.sql.types.StructField): String =
      if (f.metadata.contains("delta.columnMapping.physicalName"))
        f.metadata.getString("delta.columnMapping.physicalName")
      else f.name
    def walk(physPrefix: String, logPrefix: String,
             st: org.apache.spark.sql.types.StructType): Unit =
      st.fields.foreach { f =>
        val p = if (physPrefix.isEmpty) physName(f) else physPrefix + "." + physName(f)
        val l = if (logPrefix.isEmpty) f.name else logPrefix + "." + f.name
        b += p -> l
        f.dataType match {
          case s: org.apache.spark.sql.types.StructType => walk(p, l, s)
          case _ =>
        }
      }
    walk("", "", schema)
    b.result()
  }

  /** The PHYSICAL shape of a column's data type under column mapping:
    * every struct level renames through its field's
    * `delta.columnMapping.physicalName` (field name where absent), and
    * with `attachIds` each field carrying `delta.columnMapping.id`
    * gains `parquet.field.id` metadata — the one walker the read
    * schemas (scanFiles / readCdcFiles) and the write staging
    * (stagePhysicalRows) all share, so the two sides cannot
    * desynchronize on a mapping rule.
    */
  private[graft] def physicalShape(dt: org.apache.spark.sql.types.DataType,
                                   attachIds: Boolean)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val pn = if (f.metadata.contains("delta.columnMapping.physicalName"))
          f.metadata.getString("delta.columnMapping.physicalName") else f.name
        val md =
          if (!attachIds || !f.metadata.contains("delta.columnMapping.id")) f.metadata
          else new MetadataBuilder().withMetadata(f.metadata)
            .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id"))
            .build()
        f.copy(name = pn, dataType = physicalShape(f.dataType, attachIds), metadata = md)
      })
      case ArrayType(et, n) => ArrayType(physicalShape(et, attachIds), n)
      case MapType(k, v, n) =>
        MapType(physicalShape(k, attachIds), physicalShape(v, attachIds), n)
      case other => other
    }
  }

  /** `dt` with nullability relaxed at EVERY level — the cast-back
    * target when a physically-shaped scan projects to the logical
    * type: parquet reads are nullable, and a struct Cast refuses a
    * nullable→non-nullable field, so casting to the DECLARED shape
    * would refuse readable foreign tables whose nested fields are
    * non-nullable (r16). Nullability is advisory on the read side;
    * the write gates enforce it.
    */
  private[graft] def deepNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = deepNullable(f.dataType), nullable = true)))
      case ArrayType(e, _) => ArrayType(deepNullable(e), containsNull = true)
      case MapType(k, v, _) =>
        MapType(deepNullable(k), deepNullable(v), valueContainsNull = true)
      case other => other
    }
  }

  /** `delta.dataSkippingStatsColumns` translated into the staged
    * files' key domain: on a column-mapped table the parquet footer
    * paths are PHYSICAL names, so each configured logical (possibly
    * dotted, case-insensitive) name walks the schema level by level
    * and lands as its dotted physical path — without this the listed
    * columns silently collect no stats at all, the exact failure
    * validateStatsColumns exists to prevent. Unmapped tables pass
    * through unchanged; a name that doesn't resolve (foreign conf
    * drift) passes through too — it matches nothing, which is sound.
    */
  def physicalStatsColumns(tableConf: Map[String, String],
                           schema: Option[org.apache.spark.sql.types.StructType])
      : Option[Set[String]] = {
    val cols = statsColumnsOf(tableConf)
    if (tableConf.getOrElse("delta.columnMapping.mode", "none") == "none") cols
    else (cols, schema) match {
      case (Some(cs), Some(st)) =>
        def eq(a: String, b: String): Boolean = a.equalsIgnoreCase(b)
        def physName(f: org.apache.spark.sql.types.StructField): String =
          if (f.metadata.contains("delta.columnMapping.physicalName"))
            f.metadata.getString("delta.columnMapping.physicalName")
          else f.name
        def resolve(parts: List[String],
                    cur: org.apache.spark.sql.types.StructType): Option[String] =
          parts match {
            case Nil => None
            case h :: t => cur.fields.find(f => eq(f.name, h)).flatMap { f =>
              (t, f.dataType) match {
                case (Nil, _) => Some(physName(f))
                case (_, s: org.apache.spark.sql.types.StructType) =>
                  resolve(t, s).map(physName(f) + "." + _)
                case _ => None
              }
            }
          }
        Some(cs.map { name =>
          // a literal top-level name (dots included) wins over dotted
          // struct resolution — validateStatsColumns' precedence
          st.fields.find(f => eq(f.name, name)).map(physName)
            .orElse(resolve(name.split('.').toList, st))
            .getOrElse(name)
        })
      case _ => cols
    }
  }

  /** Refuse a `delta.dataSkippingStatsColumns` list naming columns the
    * schema doesn't have (delta-spark validates too) — a misspelled
    * entry otherwise silently collects NO stats for the column the
    * user explicitly asked to index, quietly disabling the skipping
    * they configured. Names resolve against top-level fields or
    * dotted struct-leaf paths (the nested-stats key shape).
    */
  def validateStatsColumns(tableConf: Map[String, String],
                           schema: org.apache.spark.sql.types.StructType,
                           what: String): Unit =
    statsColumnsOf(tableConf).foreach(_.foreach { name =>
      def eq(a: String, b: String): Boolean = a.equalsIgnoreCase(b)
      def resolves(parts: List[String],
                   dt: org.apache.spark.sql.types.DataType): Boolean = (parts, dt) match {
        case (Nil, _) => true
        case (h :: t, st: org.apache.spark.sql.types.StructType) =>
          st.fields.find(f => eq(f.name, h)).exists(f => resolves(t, f.dataType))
        case _ => false
      }
      // a literal top-level name (dots included) wins over dotted
      // struct resolution; names compare CASE-INSENSITIVELY (Spark's
      // default resolution — delta-spark accepts either spelling)
      require(schema.fields.exists(f => eq(f.name, name)) ||
          resolves(name.split('.').toList, schema),
        s"$what: delta.dataSkippingStatsColumns names '$name' which is not a " +
          s"column of the table schema (${schema.fieldNames.mkString(", ")}) — " +
          "stats for it would silently never be collected")
    })

  /** Footer-derived stats JSON for one staged parquet file, or None if
    * the footer is unreadable (the add simply carries no stats).
    */
  def fileStats(path: Path, conf: Configuration,
                numIndexedCols: Int = 32,
                alwaysInclude: Set[String] = Set.empty,
                statsColumns: Option[Set[String]] = None): Option[String] =
    try {
      // local paths open via java.nio directly: the Hadoop
      // LocalFileSystem route pays checksum-FS overhead and a shared
      // lock that serializes concurrent footer reads (measured ~7.6 ms
      // per footer vs sub-ms raw)
      val uri = path.toUri
      val in: org.apache.parquet.io.InputFile =
        if (uri.getScheme == null || uri.getScheme == "file")
          new org.apache.parquet.io.LocalInputFile(
            java.nio.file.Paths.get(uri.getPath))
        else org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = rdr.getFooter.getBlocks
        import scala.jdk.CollectionConverters._
        // skippable leaves, depth-first in footer-schema (= staged
        // table) order: primitives reachable through STRUCT nesting
        // only — list/map internals have per-ROW multiplicity, so a
        // chunk min/max is not a row-envelope delta-spark's shape can
        // carry. Dotted paths are the stats keys for nested leaves;
        // for a flat schema this is exactly the old top-level list.
        def leafPaths(gt: org.apache.parquet.schema.GroupType,
                      prefix: String): Seq[String] =
          gt.getFields.asScala.toSeq.flatMap { f =>
            val name = if (prefix.isEmpty) f.getName else prefix + "." + f.getName
            if (f.getRepetition == org.apache.parquet.schema.Type.Repetition.REPEATED) Nil
            else if (f.isPrimitive) Seq(name)
            else f.getLogicalTypeAnnotation match {
              case _: org.apache.parquet.schema.LogicalTypeAnnotation
                    .ListLogicalTypeAnnotation => Nil
              case _: org.apache.parquet.schema.LogicalTypeAnnotation
                    .MapLogicalTypeAnnotation => Nil
              case _ => leafPaths(f.asGroupType(), name)
            }
          }
        val leaves = leafPaths(rdr.getFooter.getFileMetaData.getSchema, "")
        val leafSet = leaves.toSet
        // `alwaysInclude` rides over the cap: identity watermark
        // advance is DERIVED from these stats, so the identity
        // column's bounds must exist no matter where it sits in a
        // wide schema (a capped-away identity column would refuse
        // every append)
        val indexed: String => Boolean = statsColumns match {
          // the explicit list REPLACES the prefix rule (delta-spark's
          // dataSkippingStatsColumns precedence); naming a struct
          // includes all its leaves; names match CASE-INSENSITIVELY
          // (Spark's resolution — the validated config must also
          // COLLECT, whatever case the user typed); identity columns
          // still ride over it — their watermark needs the bounds
          case Some(cols) =>
            val lower = cols.map(_.toLowerCase(java.util.Locale.ROOT))
            p => {
              val pl = p.toLowerCase(java.util.Locale.ROOT)
              lower.contains(pl) || alwaysInclude.contains(p) ||
                lower.exists(c => pl.startsWith(c + "."))
            }
          case None =>
            if (numIndexedCols < 0) _ => true
            else {
              // the cap counts LEAF fields in depth-first order
              // (delta-spark's rule — a 3-leaf struct spends 3 slots)
              val capped = leaves.take(numIndexedCols).toSet
              p => capped.contains(p) || alwaysInclude.contains(p)
            }
        }
        val om = sharedOm
        val root = om.createObjectNode()
        var numRecords = 0L
        val it0 = blocks.iterator()
        while (it0.hasNext) numRecords += it0.next().getRowCount
        root.put("numRecords", numRecords)
        val minNode = om.createObjectNode()
        val maxNode = om.createObjectNode()
        val nullNode = om.createObjectNode()
        // aggregate per column across row groups
        case class Agg(var min: Any, var max: Any, var nulls: Long,
                       var ok: Boolean, var hasValues: Boolean)
        val aggs = scala.collection.mutable.LinkedHashMap.empty[String, Agg]
        val bit = blocks.iterator()
        while (bit.hasNext) {
          val cit = bit.next().getColumns.iterator()
          while (cit.hasNext) {
            val c = cit.next()
            val pathArr = c.getPath.toArray
            val dotted = pathArr.mkString(".")
            if (leafSet.contains(dotted) && indexed(dotted)) {
              val name = dotted
              val agg = aggs.getOrElseUpdate(name, Agg(null, null, 0L, ok = true,
                hasValues = false))
              val st = c.getStatistics
              if (st == null || st.isEmpty) agg.ok = false
              else {
                agg.nulls += st.getNumNulls
                if (st.getNumNulls < 0) agg.ok = false
                if (st.hasNonNullValue) {
                  val (mn, mx) = statBounds(c, st)
                  if (mn == null) agg.ok = false
                  else {
                    if (!agg.hasValues) { agg.min = mn; agg.max = mx; agg.hasValues = true }
                    else {
                      if (ordLt(mn, agg.min)) agg.min = mn
                      if (ordLt(agg.max, mx)) agg.max = mx
                    }
                  }
                }
              }
            }
          }
        }
        // a dotted key lands as NESTED objects (delta-spark's stats
        // shape: minValues.a.b, not a flat "a.b" key)
        def place(node: com.fasterxml.jackson.databind.node.ObjectNode,
                  dotted: String): (com.fasterxml.jackson.databind.node.ObjectNode, String) = {
          val parts = dotted.split('.')
          var n = node
          var i = 0
          while (i < parts.length - 1) {
            n = n.get(parts(i)) match {
              case o: com.fasterxml.jackson.databind.node.ObjectNode => o
              case _ => n.putObject(parts(i))
            }
            i += 1
          }
          (n, parts.last)
        }
        aggs.foreach { case (name, a) =>
          if (a.ok) {
            locally { val (n, leaf) = place(nullNode, name); n.put(leaf, a.nulls) }
            if (a.hasValues) (a.min, a.max) match {
              // string bounds truncate (metadata bloat: add.stats JSON
              // rides in every commit, checkpoint and snapshot
              // resolve — a 1 MB document column must not). An
              // unincrementable max (all prefix code points at
              // U+10FFFF) omits BOTH bounds: the pruner needs the
              // two-sided envelope, and a lone min would read as an
              // exact bound
              case (mn: String, mx: String) =>
                truncateMaxString(mx, stringPrefixLen).foreach { tmx =>
                  locally { val (n, leaf) = place(minNode, name)
                    putValue(n, leaf, prefixCodePoints(mn, stringPrefixLen)) }
                  locally { val (n, leaf) = place(maxNode, name); putValue(n, leaf, tmx) }
                }
              case (mn, mx) =>
                locally { val (n, leaf) = place(minNode, name); putValue(n, leaf, mn) }
                locally { val (n, leaf) = place(maxNode, name); putValue(n, leaf, mx) }
            }
          }
        }
        root.set[JsonNode]("minValues", minNode)
        root.set[JsonNode]("maxValues", maxNode)
        root.set[JsonNode]("nullCount", nullNode)
        Some(om.writeValueAsString(root))
      } finally rdr.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Write-side typed carriers for the temporal families: days since
    * epoch (DATE) and microseconds since epoch (TIMESTAMP adjusted to
    * UTC / TIMESTAMP_NTZ on the zoneless local line) — kept distinct
    * from plain Long so serialization and aggregation can't conflate a
    * day count with an int column's value.
    */
  private[graft] final case class DateVal(days: Long)
  private[graft] final case class TsVal(micros: Long, ntz: Boolean)

  /** (min, max) as Long / Double / Boolean / String / DateVal / TsVal
    * / java BigDecimal, or (null, null) when the physical/logical type
    * is one we don't prune on.
    */
  private def statBounds(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
                         st: org.apache.parquet.column.statistics.Statistics[_]): (Any, Any) = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val pt = c.getPrimitiveType
    def decimalScale: Option[Int] = pt.getLogicalTypeAnnotation match {
      case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => Some(d.getScale)
      case _ => None
    }
    pt.getPrimitiveTypeName match {
      case INT32 if pt.getLogicalTypeAnnotation == null ||
          pt.getLogicalTypeAnnotation.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
        (s.getMin.toLong, s.getMax.toLong)
      case INT32 if pt.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
        (DateVal(s.getMin.toLong), DateVal(s.getMax.toLong))
      case INT32 if decimalScale.isDefined =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
        (java.math.BigDecimal.valueOf(s.getMin.toLong, decimalScale.get),
          java.math.BigDecimal.valueOf(s.getMax.toLong, decimalScale.get))
      case INT64 if pt.getLogicalTypeAnnotation == null ||
          pt.getLogicalTypeAnnotation.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
        (s.getMin, s.getMax)
      case INT64 if pt.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation] =>
        // MILLIS/MICROS only: Spark 4 writes MICROS for both timestamp
        // kinds; NANOS tables read as plain long under the legacy flag
        // (no timestamp semantics to prune with)
        val ann = pt.getLogicalTypeAnnotation
          .asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
        val ntz = !ann.isAdjustedToUTC
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
        ann.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MICROS =>
            (TsVal(s.getMin, ntz), TsVal(s.getMax, ntz))
          case LogicalTypeAnnotation.TimeUnit.MILLIS =>
            try (TsVal(Math.multiplyExact(s.getMin, 1000L), ntz),
              TsVal(Math.multiplyExact(s.getMax, 1000L), ntz))
            catch { case _: ArithmeticException => (null, null) }
          case _ => (null, null)
        }
      case INT64 if decimalScale.isDefined =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
        (java.math.BigDecimal.valueOf(s.getMin, decimalScale.get),
          java.math.BigDecimal.valueOf(s.getMax, decimalScale.get))
      case FLOAT =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.FloatStatistics]
        if (s.getMin.isNaN || s.getMax.isNaN) (null, null)
        else (s.getMin.toDouble, s.getMax.toDouble)
      case DOUBLE =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.DoubleStatistics]
        if (s.getMin.isNaN || s.getMax.isNaN) (null, null)
        else (s.getMin, s.getMax)
      case BOOLEAN =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.BooleanStatistics]
        (s.getMin, s.getMax)
      case BINARY if pt.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
        try (s.genericGetMin.toStringUsingUTF8, s.genericGetMax.toStringUsingUTF8)
        catch { case scala.util.control.NonFatal(_) => (null, null) }
      case BINARY | FIXED_LEN_BYTE_ARRAY if decimalScale.isDefined =>
        // unscaled big-endian two's-complement bytes (parquet DECIMAL)
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.Statistics[_]]
        try {
          def bd(b: Array[Byte]) =
            new java.math.BigDecimal(new java.math.BigInteger(b), decimalScale.get)
          (bd(s.getMinBytes), bd(s.getMaxBytes))
        } catch { case scala.util.control.NonFatal(_) => (null, null) }
      case _ => (null, null)
    }
  }

  private def ordLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long)       => x < y
    case (x: Double, y: Double)   => x < y
    case (x: Boolean, y: Boolean) => !x && y
    case (x: String, y: String)   => codePointCompare(x, y) < 0
    case (DateVal(x), DateVal(y)) => x < y
    case (x: TsVal, y: TsVal)     => x.micros < y.micros
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y) < 0
    case _                        => false
  }

  /** delta-spark's DATA_SKIPPING_STRING_PREFIX_LENGTH. */
  private[graft] val stringPrefixLen = 32

  /** Code-point order — identical to UTF-8 unsigned-byte order (the
    * parquet footer comparator these bounds come from) and to Spark's
    * UTF8String ordering; String.compareTo is NOT (UTF-16 code units
    * sort [U+E000, U+FFFF] above supplementary characters).
    */
  private[graft] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** The first `n` code points of `s` — a lower bound for `s` by the
    * prefix property, so sound as a (possibly widened) stats min.
    */
  private[graft] def prefixCodePoints(s: String, n: Int): String = {
    var i = 0; var cnt = 0
    while (i < s.length && cnt < n) { i += Character.charCount(s.codePointAt(i)); cnt += 1 }
    if (i >= s.length) s else s.substring(0, i)
  }

  /** A string ≥ `s` of at most `n` code points: `s` itself when it
    * fits, else the n-prefix with its last incrementable code point
    * bumped (skipping the surrogate gap U+D800–U+DFFF, which no valid
    * string contains) and the tail dropped — delta-spark's
    * increment-after-truncate upper bound. None when every prefix code
    * point is already U+10FFFF (no finite upper bound at this length).
    */
  private[graft] def truncateMaxString(s: String, n: Int): Option[String] = {
    val p = prefixCodePoints(s, n)
    if (p.length == s.length) Some(s) else prefixSucc(p)
  }

  /** The least string ABOVE every string prefixed by `p` (in code-point
    * order): `p` with its last incrementable code point bumped
    * (skipping the surrogate gap) and the tail dropped. None when every
    * code point is U+10FFFF (no finite successor) — including the empty
    * prefix, which every string matches.
    */
  private[graft] def prefixSucc(p: String): Option[String] = {
    val cps = p.codePoints().toArray
    var k = cps.length - 1
    while (k >= 0) {
      var c = cps(k) + 1
      if (c == Character.MIN_SURROGATE) c = 0xE000
      if (c <= Character.MAX_CODE_POINT) {
        val out = java.util.Arrays.copyOf(cps, k + 1)
        out(k) = c
        return Some(new String(out, 0, k + 1))
      }
      k -= 1
    }
    None
  }

  /** Microsecond-precision ISO-8601: `2024-05-01T12:34:56.000001Z`
    * for UTC-adjusted timestamps, the same without the `Z` for
    * TIMESTAMP_NTZ — full precision so the written envelope is EXACT
    * (a millis-truncated max would under-report and wrongly prune).
    */
  private[graft] def formatTsMicros(us: Long, ntz: Boolean): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val base = ldt.format(tsMicrosFmt)
    if (ntz) base else base + "Z"
  }

  private val tsMicrosFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  private def putValue(n: com.fasterxml.jackson.databind.node.ObjectNode,
                       name: String, v: Any): Unit = v match {
    case x: Long    => n.put(name, x)
    case x: Double  => n.put(name, x)
    case x: Boolean => n.put(name, x)
    case x: String  => n.put(name, x)
    case DateVal(d) => n.put(name, java.time.LocalDate.ofEpochDay(d).toString)
    case TsVal(us, ntz) => n.put(name, formatTsMicros(us, ntz))
    case x: java.math.BigDecimal => n.put(name, x)
    case _          =>
  }

  // ---------- pruning ----------

  private case class FileEnv(numRecords: Option[Long],
                             min: Map[String, JsonNode],
                             max: Map[String, JsonNode],
                             nulls: Map[String, Long],
                             pv: Map[String, String])

  private def parseEnv(a: DeltaReader.AddFile,
                       om: com.fasterxml.jackson.databind.ObjectMapper,
                       physToLog: Map[String, String]): FileEnv = {
    // nested stats objects flatten to dotted keys ("a.b" for
    // minValues.a.b) — the pruner's attribute-path key shape
    def fields(n: JsonNode, name: String): Map[String, JsonNode] = {
      val b = Map.newBuilder[String, JsonNode]
      def walk(node: JsonNode, prefix: String): Unit = {
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          val k = if (prefix.isEmpty) e.getKey else prefix + "." + e.getKey
          if (e.getValue.isObject) walk(e.getValue, k)
          else b += k -> e.getValue
        }
      }
      Option(n.get(name)).filterNot(_.isNull).foreach(walk(_, ""))
      b.result()
    }
    val (nr, mn, mx, nc) = a.stats.flatMap { s =>
      try {
        val n = om.readTree(s)
        Some((
          Option(n.get("numRecords")).filterNot(_.isNull).map(_.asLong()),
          fields(n, "minValues"), fields(n, "maxValues"),
          fields(n, "nullCount").collect { case (k, v) if v.isNumber => k -> v.asLong() }))
      } catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse((None, Map.empty[String, JsonNode], Map.empty[String, JsonNode],
      Map.empty[String, Long]))
    // stats/pv keys are the file's PHYSICAL names; expose under
    // LOGICAL via the full dotted-path map (every segment remapped —
    // physToLogicalPaths walked the schema per level, so foreign
    // nested physical names land on their logical leaves too). An
    // unmapped key stays as-is: the pruner's attributes are logical,
    // so it simply never matches — may-match, sound.
    def remap[V](m: Map[String, V]): Map[String, V] =
      if (physToLog.isEmpty) m
      else m.map { case (k, v) => (physToLog.getOrElse(k, k), v) }
    FileEnv(nr, remap(mn), remap(mx), remap(nc), remap(a.partitionValues))
  }

  /** Untyped literal value (the legacy fallback when the column's
    * schema type is unknown): Long / Double / Boolean / String, or
    * null when we don't prune on its type.
    */
  private def litValue(l: Literal): Any = l.value match {
    case null => null
    case v: org.apache.spark.unsafe.types.UTF8String => v.toString
    case v: Int => v.toLong
    case v: Long => v
    case v: Short => v.toLong
    case v: Byte => v.toLong
    case v: Double => v
    case v: Float => v.toDouble
    case v: Boolean => v
    case v: java.math.BigDecimal => v.doubleValue()
    case v: org.apache.spark.sql.types.Decimal => v.toDouble
    case _ => null
  }

  /** Literal lifted into the COLUMN's comparison domain (epoch days
    * for DATE, epoch micros for the timestamp kinds, BigDecimal for
    * DECIMAL), emulating exactly the cast Spark's own filter will
    * apply — a string literal against a timestamp column compares as
    * a timestamp, never lexically against an ISO-serialized bound
    * whose format differs. Unhandled combinations answer null
    * (= may-match); a temporal/decimal column NEVER falls back to the
    * untyped path, where a raw string compare could wrongly prune.
    */
  private def typedLit(l: Literal, colDt: Option[org.apache.spark.sql.types.DataType],
                       zone: java.time.ZoneId): Any = {
    import org.apache.spark.sql.types._
    def micros(v: Any): Any = v match { case x: Long => x; case _ => null }
    def text: Option[String] = l.value match {
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case _ => None
    }
    (l.dataType, colDt) match {
      case (DateType, Some(DateType)) => l.value match {
        case d: Int => d.toLong
        case _ => null
      }
      case (TimestampType, Some(TimestampType)) => micros(l.value)
      case (TimestampNTZType, Some(TimestampNTZType)) => micros(l.value)
      case (DateType, Some(TimestampNTZType)) => l.value match {
        case d: Int =>
          try Math.multiplyExact(d.toLong, 86400000000L)
          catch { case _: ArithmeticException => null }
        case _ => null
      }
      case (DateType, Some(TimestampType)) => l.value match {
        case d: Int =>
          try {
            val i = java.time.LocalDate.ofEpochDay(d.toLong).atStartOfDay(zone).toInstant
            Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
          } catch { case scala.util.control.NonFatal(_) => null }
        case _ => null
      }
      case (StringType, Some(DateType)) =>
        text.flatMap(s =>
          try Some(java.time.LocalDate.parse(s.trim).toEpochDay)
          catch { case scala.util.control.NonFatal(_) => None }).orNull
      case (StringType, Some(TimestampType)) =>
        // Spark's cast resolves a zoneless string in the SESSION zone
        text.flatMap(parseTsString(_, zone)).orNull
      case (StringType, Some(TimestampNTZType)) =>
        // NTZ cast IGNORES an explicit offset and keeps the wall clock
        text.flatMap(parseTsString(_, java.time.ZoneOffset.UTC,
          wallClock = true)).orNull
      case (dt: DecimalType, Some(_: DecimalType)) => l.value match {
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case _ => null
      }
      case (IntegerType | LongType | ShortType | ByteType, Some(_: DecimalType)) =>
        l.value match {
          case v: Int => java.math.BigDecimal.valueOf(v.toLong)
          case v: Long => java.math.BigDecimal.valueOf(v)
          case v: Short => java.math.BigDecimal.valueOf(v.toLong)
          case v: Byte => java.math.BigDecimal.valueOf(v.toLong)
          case _ => null
        }
      case (DoubleType | FloatType, Some(_: DecimalType)) => l.value match {
        case v: Double => java.math.BigDecimal.valueOf(v)
        case v: Float => java.math.BigDecimal.valueOf(v.toDouble)
        case _ => null
      }
      // any OTHER literal against a temporal/decimal column: refuse to
      // guess (may-match) rather than risk a lexical/numeric mixup
      case (_, Some(DateType | TimestampType | TimestampNTZType | _: DecimalType)) => null
      case _ => litValue(l)
    }
  }

  /** A timestamp string in any of the forms Spark's cast accepts for
    * the common cases — 'yyyy-MM-dd', 'yyyy-MM-dd HH:mm:ss[.f…]',
    * the ISO T-form, with or without an explicit offset — to epoch
    * micros (zoneless strings resolve in `zone`). `wallClock` = the
    * TIMESTAMP_NTZ cast rule: an explicit offset in the string is
    * IGNORED and the wall-clock datetime is kept (Spark's
    * stringToTimestampWithoutTimeZone) — honoring the offset there
    * would shift the value and wrongly prune files holding matching
    * rows. None = unparseable here (Spark may still cast it; the
    * caller answers may-match).
    */
  private def parseTsString(s0: String, zone: java.time.ZoneId,
                            wallClock: Boolean = false): Option[Long] = {
    val s = s0.trim.replace(' ', 'T')
    try {
      val inst =
        try {
          val odt = java.time.OffsetDateTime.parse(s)
          if (wallClock) odt.toLocalDateTime.atZone(zone).toInstant
          else odt.toInstant
        } catch {
          case _: java.time.format.DateTimeParseException =>
            val ldt =
              if (s.contains("T")) java.time.LocalDateTime.parse(s)
              else java.time.LocalDate.parse(s).atStartOfDay()
            ldt.atZone(zone).toInstant
        }
      Some(Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
        inst.getNano / 1000L))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** An ISO temporal STATS bound to epoch micros. `widenMax`: a bound
    * written at coarser-than-micros precision (a foreign writer's
    * millis truncation) under-reports the true max — widen by the
    * precision gap (10^(6-digits)-1 µs) so pruning stays sound against
    * it; min needs nothing (truncation only lowers it).
    */
  private[graft] def parseTsBound(text0: String, widenMax: Boolean,
                                  wallClock: Boolean = false): Option[Long] = {
    val text = text0.trim
    val base = parseTsString(text, java.time.ZoneOffset.UTC, wallClock)
    base.map { us =>
      if (!widenMax) us
      else {
        val dot = text.indexOf('.')
        val frac = if (dot < 0) 0 else text.drop(dot + 1).takeWhile(_.isDigit).length
        if (frac >= 6) us
        else {
          var gap = 1L; var i = frac
          while (i < 6) { gap *= 10L; i += 1 }
          try Math.addExact(us, gap - 1L)
          catch { case _: ArithmeticException => us }
        }
      }
    }
  }

  private def jsonValue(n: JsonNode): Any =
    if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isTextual) n.asText()
    else null

  /** A stats-JSON bound lifted into the column's comparison domain —
    * the read-side twin of [[typedLit]]. Temporal bounds are textual
    * ISO (this writer's micros-exact form or a foreign engine's
    * truncated one — `isMax` widens the latter); decimals are JSON
    * numbers (parsed to BigDecimal — exact, never a lossy double).
    */
  private def statVal(node: JsonNode,
                      colDt: Option[org.apache.spark.sql.types.DataType],
                      isMax: Boolean): Any = {
    import org.apache.spark.sql.types._
    colDt match {
      case Some(DateType) =>
        if (!node.isTextual) null
        else try java.lang.Long.valueOf(
          java.time.LocalDate.parse(node.asText().trim).toEpochDay)
        catch { case scala.util.control.NonFatal(_) => null }
      case Some(TimestampType) =>
        if (!node.isTextual) null
        else parseTsBound(node.asText(), widenMax = isMax).map(Long.box).orNull
      case Some(TimestampNTZType) =>
        // an NTZ bound is a wall clock; a (nonstandard) offset suffix
        // must not shift it
        if (!node.isTextual) null
        else parseTsBound(node.asText(), widenMax = isMax, wallClock = true)
          .map(Long.box).orNull
      case Some(_: DecimalType) =>
        if (node.isNumber) node.decimalValue() else null
      case Some(StringType) => if (node.isTextual) node.asText() else null
      case _ => jsonValue(node)
    }
  }

  /** A PARTITION VALUE string lifted into the column's comparison
    * domain. The protocol serializes temporal partition values as
    * 'yyyy-MM-dd[ HH:mm:ss[.ffffff]]' with no zone — a TIMESTAMP
    * (with-local-zone) value was rendered in the writing session's
    * zone, so it resolves in `zone` (the reading session's — the
    * standard single-zone deployment; a cross-zone foreign table's
    * zoneless pv is ambiguous by protocol design).
    */
  private def pvVal(sv: String,
                    colDt: Option[org.apache.spark.sql.types.DataType],
                    litDomain: Any, zone: java.time.ZoneId): Any = {
    import org.apache.spark.sql.types._
    colDt match {
      case Some(DateType) =>
        try java.lang.Long.valueOf(java.time.LocalDate.parse(sv.trim).toEpochDay)
        catch { case scala.util.control.NonFatal(_) => null }
      case Some(TimestampType) => parseTsString(sv, zone).map(Long.box).orNull
      case Some(TimestampNTZType) =>
        parseTsString(sv, java.time.ZoneOffset.UTC, wallClock = true)
          .map(Long.box).orNull
      case Some(_: DecimalType) =>
        try new java.math.BigDecimal(sv.trim)
        catch { case scala.util.control.NonFatal(_) => null }
      case Some(LongType | IntegerType | ShortType | ByteType) =>
        try java.lang.Long.valueOf(sv.trim.toLong)
        catch { case scala.util.control.NonFatal(_) => null }
      case Some(DoubleType | FloatType) =>
        try java.lang.Double.valueOf(sv.trim.toDouble)
        catch { case scala.util.control.NonFatal(_) => null }
      case Some(BooleanType) =>
        try java.lang.Boolean.valueOf(sv.trim.toBoolean)
        catch { case scala.util.control.NonFatal(_) => null }
      case Some(StringType) => sv
      // unknown column type: the legacy literal-driven coercion
      case _ => (sv, litDomain) match {
        case (s: String, _: Long)    => try java.lang.Long.valueOf(s.trim.toLong)
          catch { case _: Exception => null }
        case (s: String, _: Double)  => try java.lang.Double.valueOf(s.trim.toDouble)
          catch { case _: Exception => null }
        case (s: String, _: Boolean) => try java.lang.Boolean.valueOf(s.trim.toBoolean)
          catch { case _: Exception => null }
        case (b, _)                  => b
      }
    }
  }

  /** Numeric-tolerant three-way compare; None = incomparable. ±0.0
    * compare EQUAL (SQL's `-0.0 = 0.0` is true; Double.compare's
    * -0.0 < 0.0 would let an equality predicate wrongly prune a file
    * whose envelope is the other zero).
    */
  private def cmp(a: Any, b: Any): Option[Int] = {
    def z(d: Double): Double = if (d == 0.0d) 0.0d else d
    (a, b) match {
    case (null, _) | (_, null)    => None
    case (x: Long, y: Long)       => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double)     => Some(java.lang.Double.compare(x.toDouble, z(y)))
    case (x: Double, y: Long)     => Some(java.lang.Double.compare(z(x), y.toDouble))
    case (x: Double, y: Double)   => Some(java.lang.Double.compare(z(x), z(y)))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (x: String, y: String)   => Some(codePointCompare(x, y))
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => Some(x.compareTo(y))
    case (x: java.math.BigDecimal, y: Long) =>
      Some(x.compareTo(java.math.BigDecimal.valueOf(y)))
    case (x: Long, y: java.math.BigDecimal) =>
      Some(java.math.BigDecimal.valueOf(x).compareTo(y))
    case (x: java.math.BigDecimal, y: Double) =>
      Some(x.compareTo(java.math.BigDecimal.valueOf(y)))
    case (x: Double, y: java.math.BigDecimal) =>
      Some(java.math.BigDecimal.valueOf(x).compareTo(y))
    case _                        => None
  }}

  /** May ANY row of the file match `pred`? Conservative: unknown
    * shapes, missing stats, incomparable types all answer true.
    * Comparisons lift BOTH sides into the schema column's domain
    * ([[typedLit]] / [[statVal]] / [[pvVal]]) so date / timestamp /
    * timestamp_ntz / decimal predicates prune — with exactly the cast
    * semantics Spark's own filter applies.
    */
  private def mayMatch(pred: Expression, env: FileEnv, partCols: Set[String],
                       colTypes: Map[String, org.apache.spark.sql.types.DataType],
                       zone: java.time.ZoneId): Boolean = {
    def recur(p: Expression): Boolean = mayMatch(p, env, partCols, colTypes, zone)
    // multi-part names address struct leaves ("s.x") — the dotted key
    // the stats flattener and the schema walk both produce; a part
    // that's actually a table alias simply finds no bounds (may-match)
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.mkString("."))
      case _ => None
    }
    // the column's (min, max) envelope in its typed domain, given the
    // literal's lifted value (for the legacy untyped pv coercion)
    def bounds(c: String, litDomain: Any): Option[(Any, Any)] = {
      val dt = colTypes.get(c)
      if (partCols.contains(c)) {
        // a partition value is a single point
        env.pv.get(c).filter(_ != null)
          .map(sv => { val v = pvVal(sv, dt, litDomain, zone); (v, v) })
          .filter(p => p._1 != null)
      } else for {
        mnN <- env.min.get(c)
        mxN <- env.max.get(c)
        mn = statVal(mnN, dt, isMax = false)
        mx = statVal(mxN, dt, isMax = true)
        if mn != null && mx != null
      } yield (mn, mx)
    }
    def cmpOp(attr: Expression, lit: Expression, op: String, flip: Boolean): Boolean = {
      (attrName(attr), lit) match {
        case (Some(c), l: Literal) =>
          val v = typedLit(l, colTypes.get(c), zone)
          if (v == null) return true
          bounds(c, v) match {
            case None => true
            case Some((mn, mx)) =>
              if (mn == null || mx == null) return true
              val effOp = if (!flip) op else op match {
                case "<" => ">" case "<=" => ">=" case ">" => "<" case ">=" => "<=" case o => o
              }
              effOp match {
                case "="  => cmp(mn, v).forall(_ <= 0) && cmp(v, mx).forall(_ <= 0)
                case "<"  => cmp(mn, v).forall(_ < 0)   // any value below v?
                case "<=" => cmp(mn, v).forall(_ <= 0)
                case ">"  => cmp(mx, v).forall(_ > 0)
                case ">=" => cmp(mx, v).forall(_ >= 0)
                case _    => true
              }
          }
        case _ => true
      }
    }
    // NOT(a = v): no row can satisfy it only when every non-null value
    // provably equals v, i.e. the envelope is the single point v (null
    // rows never satisfy a NOT(=) either). Truncated string bounds can
    // never present as a point: a truncated max is strictly above the
    // stored min, so this prunes only exact envelopes.
    def notEqualMayMatch(attr: Expression, l: Literal): Boolean =
      attrName(attr) match {
        case Some(c) =>
          val v = typedLit(l, colTypes.get(c), zone)
          if (v == null) true
          else bounds(c, v) match {
            case Some((mn, mx)) if mn != null && mx != null =>
              !(cmp(mn, v).contains(0) && cmp(mx, v).contains(0))
            case _ => true
          }
        case None => true
      }
    // a LIKE whose pattern is a literal prefix + one trailing '%'
    // (no other wildcards or escapes) is a prefix predicate
    def likePrefix(pattern: String): Option[String] =
      if (pattern.nonEmpty && pattern.last == '%' &&
          !pattern.dropRight(1).exists(c => c == '%' || c == '_' || c == '\\'))
        Some(pattern.dropRight(1))
      else None
    // may any value in the file start with `p`? v startsWith p ⟺
    // p <= v < succ(p), succ = increment-last-code-point (surrogate
    // gap skipped); an unincrementable p has no finite upper bound.
    // Sound against TRUNCATED stored bounds with no extra cases: the
    // stored envelope only ever widens, so the intersection test can
    // only keep more files, never fewer.
    def prefixMayMatch(attr: Expression, p: String): Boolean =
      attrName(attr) match {
        case Some(c) if colTypes.get(c).forall(
            _ == org.apache.spark.sql.types.StringType) =>
          bounds(c, p) match {
            case Some((mn: String, mx: String)) =>
              codePointCompare(mx, p) >= 0 &&
                prefixSucc(p).forall(succ => codePointCompare(mn, succ) < 0)
            case _ => true
          }
        case _ => true
      }
    pred match {
      case And(l, r) => recur(l) && recur(r)
      case Or(l, r)  => recur(l) || recur(r)
      // NOT pushes through exactly-invertible shapes; anything else
      // stays may-match. NOT(a = v) prunes only a provably constant-v
      // file (truncated string bounds can never present as constant:
      // a truncated max is strictly above the stored min).
      case Not(Not(e))       => recur(e)
      case Not(And(l, r))    => recur(Or(Not(l), Not(r)))
      case Not(Or(l, r))     => recur(And(Not(l), Not(r)))
      case Not(LessThan(a, b))           => recur(GreaterThanOrEqual(a, b))
      case Not(LessThanOrEqual(a, b))    => recur(GreaterThan(a, b))
      case Not(GreaterThan(a, b))        => recur(LessThanOrEqual(a, b))
      case Not(GreaterThanOrEqual(a, b)) => recur(LessThan(a, b))
      case Not(IsNull(a))    => recur(IsNotNull(a))
      case Not(IsNotNull(a)) => recur(IsNull(a))
      case Not(In(a, vs)) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.forall(v => recur(Not(EqualTo(a, v))))
      case Not(EqualTo(a, l: Literal)) => notEqualMayMatch(a, l)
      case Not(EqualTo(l: Literal, a)) => notEqualMayMatch(a, l)
      case StartsWith(a, l: Literal) =>
        l.value match {
          case s: org.apache.spark.unsafe.types.UTF8String =>
            prefixMayMatch(a, s.toString)
          case _ => true
        }
      case Like(a, l: Literal, '\\') =>
        l.value match {
          case s: org.apache.spark.unsafe.types.UTF8String =>
            likePrefix(s.toString).forall(prefixMayMatch(a, _))
          case _ => true
        }
      case EqualTo(a, l: Literal)            => cmpOp(a, l, "=", flip = false)
      case EqualTo(l: Literal, a)            => cmpOp(a, l, "=", flip = false)
      case LessThan(a, l: Literal)           => cmpOp(a, l, "<", flip = false)
      case LessThan(l: Literal, a)           => cmpOp(a, l, "<", flip = true)
      case LessThanOrEqual(a, l: Literal)    => cmpOp(a, l, "<=", flip = false)
      case LessThanOrEqual(l: Literal, a)    => cmpOp(a, l, "<=", flip = true)
      case GreaterThan(a, l: Literal)        => cmpOp(a, l, ">", flip = false)
      case GreaterThan(l: Literal, a)        => cmpOp(a, l, ">", flip = true)
      case GreaterThanOrEqual(a, l: Literal) => cmpOp(a, l, ">=", flip = false)
      case GreaterThanOrEqual(l: Literal, a) => cmpOp(a, l, ">=", flip = true)
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => cmpOp(a, v.asInstanceOf[Literal], "=", flip = false))
      case IsNull(a) => attrName(a) match {
        case Some(c) if !partCols.contains(c) =>
          env.nulls.get(c).forall(_ > 0L)
        case Some(c) => env.pv.get(c).forall(_ == null)
        case None => true
      }
      case IsNotNull(a) => attrName(a) match {
        case Some(c) if !partCols.contains(c) =>
          // prune only a provably all-null file
          !((env.nulls.get(c), env.numRecords) match {
            case (Some(n), Some(t)) => n == t && t > 0L
            case _ => false
          })
        case Some(c) => env.pv.get(c).exists(_ != null)
        case None => true
      }
      case _ => true
    }
  }

  /** Derived partition conjuncts for GENERATED partition columns
    * (delta-spark's OptimizeGeneratedColumn): when a partition column
    * g carries `delta.generationExpression` = a MONOTONE date mapping
    * f over one source column src — `CAST(src AS DATE)` / `to_date` /
    * `date_trunc(level, src)` / `year(src)` — every top-level
    * conjunct `src <op> L` in the user predicate implies a partition
    * predicate `g <op'> f(L)` (floor functions: < and <= both derive
    * <= f(L); > and >= derive >= f(L); = derives =). The derived
    * conjuncts prune through add.partitionValues, which matters for
    * the files per-file stats cannot help with: FOREIGN adds written
    * without stats still carry partition values, so a timestamp
    * predicate keeps pruning a date-partitioned 100-TB table even
    * when the stats envelope is absent. Harvesting stops at the
    * top-level conjunction (a comparison under OR or NOT is not an
    * implied global constraint). f(L) evaluates under the PRUNE-TIME
    * session zone for zoned sources — the same zone the writer's
    * expr() used when it computed the partition values in-process;
    * like delta-spark, a table written under a different zone should
    * disable derivation by not declaring the generation expression.
    * KNOWN EDGE (shared with delta-spark, documented rather than
    * restricted): in zones with MIDNIGHT DST transitions (e.g.
    * America/Santiago, where some days start at 01:00), `CAST(src AS
    * DATE)` / `date_trunc` over a zoned TIMESTAMP are not strictly
    * epoch-monotone around the transition instant, so a derived
    * DAY-or-finer bound can in principle prune a file holding rows
    * inside the skipped hour. Zones whose transitions never cross
    * midnight (all offsets that shift at 02:00+, and DATE /
    * TIMESTAMP_NTZ sources, which have no zone at all) are exact.
    * Matching the reference engine's session-zone semantics here is
    * deliberate — a table that must be robust to such zones should
    * not declare the generation expression.
    */
  private[graft] def derivedPartitionConjuncts(
      pred: Expression,
      schema: org.apache.spark.sql.types.StructType,
      partCols: Set[String],
      zone: java.time.ZoneId,
      parser: org.apache.spark.sql.catalyst.parser.ParserInterface): Seq[Expression] = {
    import org.apache.spark.sql.types._
    sealed trait Shape
    case object ToDate extends Shape
    final case class Trunc(level: String) extends Shape
    case object YearOf extends Shape
    def attrOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => Some(a.nameParts.head)
      case _ => None
    }
    // (generated partition col, source col, shape, generated type)
    val gens: Seq[(String, String, Shape, DataType)] = schema.fields.toSeq.flatMap { g =>
      if (!partCols.contains(g.name) ||
          !g.metadata.contains("delta.generationExpression")) None
      else {
        val parsed =
          try Some(parser.parseExpression(g.metadata.getString("delta.generationExpression")))
          catch { case scala.util.control.NonFatal(_) => None }
        parsed.flatMap {
          case c: Cast if c.dataType == DateType =>
            attrOf(c.child).map(src => (g.name, src, ToDate, g.dataType))
          case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
            val fn = f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
            (fn, f.arguments) match {
              case ("to_date" | "date", Seq(a)) =>
                attrOf(a).map(src => (g.name, src, ToDate, g.dataType))
              case ("date_trunc",
                    Seq(Literal(lvl: org.apache.spark.unsafe.types.UTF8String, StringType), a)) =>
                val level = lvl.toString.toUpperCase(java.util.Locale.ROOT)
                if (!Set("YEAR", "MONTH", "WEEK", "DAY", "HOUR", "MINUTE")(level)) None
                else attrOf(a).map(src => (g.name, src, Trunc(level), g.dataType))
              case ("year", Seq(a)) =>
                attrOf(a).map(src => (g.name, src, YearOf, g.dataType))
              case _ => None
            }
          case _ => None
        }
      }
    }
    if (gens.isEmpty) return Nil
    val srcType: Map[String, DataType] =
      schema.fields.map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap
    def ldtOf(src: DataType, v: Any): Option[java.time.LocalDateTime] = (src, v) match {
      case (TimestampType, us: Long) => Some(java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L), zone))
      case (TimestampNTZType, us: Long) => Some(java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
      case (DateType, d: Long) => Some(java.time.LocalDate.ofEpochDay(d).atStartOfDay())
      case _ => None
    }
    def truncLdt(level: String, t: java.time.LocalDateTime): java.time.LocalDateTime =
      level match {
        case "YEAR"   => java.time.LocalDateTime.of(t.getYear, 1, 1, 0, 0)
        case "MONTH"  => java.time.LocalDateTime.of(t.getYear, t.getMonthValue, 1, 0, 0)
        case "WEEK"   => t.toLocalDate.minusDays(t.getDayOfWeek.getValue - 1L).atStartOfDay()
        case "DAY"    => t.toLocalDate.atStartOfDay()
        case "HOUR"   => t.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
        case _        => t.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
      }
    def microsOf(gDt: DataType, t: java.time.LocalDateTime): Option[Long] = gDt match {
      case TimestampType =>
        val i = t.atZone(zone).toInstant
        Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
      case TimestampNTZType =>
        Some(Math.addExact(Math.multiplyExact(
          t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L), t.getNano / 1000L))
      case _ => None
    }
    // f(L) as a typed literal in the generated column's domain; an
    // extreme-but-legal literal whose mapping overflows epoch micros
    // (year ±290307 boundaries) degrades to None = may-match, like
    // every other unmappable literal in this file — never an exception
    // out of the prune path
    def mapped(shape: Shape, src: DataType, gDt: DataType, l: Literal): Option[Literal] = try {
      val lifted = typedLit(l, Some(src), zone)
      if (lifted == null) None
      else ldtOf(src, lifted).flatMap { t =>
        shape match {
          case ToDate if gDt == DateType =>
            Some(Literal(t.toLocalDate.toEpochDay.toInt, DateType))
          // date_trunc returns zoned TIMESTAMP even for NTZ input
          // (Spark casts first — the wall clock carries over in the
          // session zone), so truncate the WALL datetime and land it
          // in whatever temporal domain g declares; microsOf answers
          // None for a non-timestamp g
          case Trunc(level) =>
            microsOf(gDt, truncLdt(level, t)).map(Literal(_, gDt))
          case YearOf => gDt match {
            case IntegerType => Some(Literal(t.getYear, IntegerType))
            case LongType    => Some(Literal(t.getYear.toLong, LongType))
            case _           => None
          }
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def gensFor(e: Expression): Seq[(String, String, Shape, DataType)] =
      attrOf(e).toSeq.flatMap(n => gens.filter(_._2.equalsIgnoreCase(n)))
    val out = Seq.newBuilder[Expression]
    def derive(a: Expression, l: Literal, lower: Boolean, upper: Boolean,
               eq: Boolean): Unit =
      gensFor(a).foreach { case (gName, src, shape, gDt) =>
        srcType.get(src.toLowerCase(java.util.Locale.ROOT))
          .flatMap(st => mapped(shape, st, gDt, l)).foreach { fl =>
            val gAttr = UnresolvedAttribute(Seq(gName))
            if (eq) out += EqualTo(gAttr, fl)
            else if (lower) out += GreaterThanOrEqual(gAttr, fl)
            else if (upper) out += LessThanOrEqual(gAttr, fl)
          }
      }
    conjuncts(pred).foreach {
      case EqualTo(a, l: Literal) => derive(a, l, lower = false, upper = false, eq = true)
      case EqualTo(l: Literal, a) => derive(a, l, lower = false, upper = false, eq = true)
      case GreaterThan(a, l: Literal)        => derive(a, l, lower = true,  upper = false, eq = false)
      case GreaterThanOrEqual(a, l: Literal) => derive(a, l, lower = true,  upper = false, eq = false)
      case LessThan(a, l: Literal)           => derive(a, l, lower = false, upper = true,  eq = false)
      case LessThanOrEqual(a, l: Literal)    => derive(a, l, lower = false, upper = true,  eq = false)
      case GreaterThan(l: Literal, a)        => derive(a, l, lower = false, upper = true,  eq = false)
      case GreaterThanOrEqual(l: Literal, a) => derive(a, l, lower = false, upper = true,  eq = false)
      case LessThan(l: Literal, a)           => derive(a, l, lower = true,  upper = false, eq = false)
      case LessThanOrEqual(l: Literal, a)    => derive(a, l, lower = true,  upper = false, eq = false)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        gensFor(a).foreach { case (gName, src, shape, gDt) =>
          val st = srcType.get(src.toLowerCase(java.util.Locale.ROOT))
          val ms = st.map(t => vs.map(v => mapped(shape, t, gDt, v.asInstanceOf[Literal])))
          ms.filter(_.forall(_.isDefined)).foreach(m =>
            out += In(UnresolvedAttribute(Seq(gName)), m.map(_.get)))
        }
      case _ =>
    }
    out.result()
  }

  /** The subset of `files` whose stats/partition envelope may satisfy
    * `predicate` — sound (never drops a matching file), driver-side,
    * O(files × predicate size), zero file opens.
    */
  def prune(spark: SparkSession, files: Seq[DeltaReader.AddFile], predicate: String,
            snap: DeltaReader.Snapshot): Seq[DeltaReader.AddFile] = {
    val pred =
      try spark.sessionState.sqlParser.parseExpression(predicate)
      catch { case scala.util.control.NonFatal(_) => return files }
    // decimal bounds must parse EXACTLY (a double round-trip of a
    // 38-digit decimal could flip a boundary comparison)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
      .configure(com.fasterxml.jackson.databind.DeserializationFeature
        .USE_BIG_DECIMAL_FOR_FLOATS, true)
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // BOTH mapping modes remap stats keys — id-mode tables read fine
    // through field ids but their stats are keyed by the same
    // physicalName metadata, and without this map every predicate on
    // an id-mode table answered may-match: sound, zero pruning
    val cmMode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    val physToLog: Map[String, String] =
      if (cmMode == "none") Map.empty else physToLogicalPaths(schema)
    val partCols = snap.partCols.toSet
    // leaf types keyed by dotted path — struct leaves prune like any
    // top-level column
    val colTypes: Map[String, org.apache.spark.sql.types.DataType] = {
      val b = Map.newBuilder[String, org.apache.spark.sql.types.DataType]
      def walk(prefix: String, st: org.apache.spark.sql.types.StructType): Unit =
        st.fields.foreach { f =>
          val n = if (prefix.isEmpty) f.name else prefix + "." + f.name
          f.dataType match {
            case s: org.apache.spark.sql.types.StructType => walk(n, s)
            case dt => b += n -> dt
          }
        }
      walk("", schema)
      b.result()
    }
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    // generated-partition derivation: conjoin the implied partition
    // predicates so files WITHOUT stats (foreign adds) still prune
    // through their partition values
    val fullPred = derivedPartitionConjuncts(pred, schema, partCols, zone,
      spark.sessionState.sqlParser).foldLeft(pred)(And(_, _))
    files.filter { a =>
      val env = parseEnv(a, om, physToLog)
      // a zero-row file satisfies NO row predicate — drop it outright
      // (its bounds are absent, which would otherwise read may-match)
      !env.numRecords.contains(0L) &&
        mayMatch(fullPred, env, partCols, colTypes, zone)
    }
  }
}
