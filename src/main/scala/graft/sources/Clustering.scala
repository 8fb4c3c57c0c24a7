package graft.sources

import org.apache.spark.sql.types.StructType

/** Clustered tables — the protocol's `clustering` writer feature
  * ("Liquid" clustering's table-format shape): the table's clustering
  * columns live in the `delta.clustering` DOMAIN METADATA as
  * `{"clusteringColumns":[["col"],...]}` (PHYSICAL names under column
  * mapping, each entry a nested-field path — graft clusters top-level
  * columns only). Clustering is BEST-EFFORT by design: appends land
  * unclustered and stay correct; `OPTIMIZE` re-layouts the live rows
  * along the multi-dimensional curve of the declared columns
  * ([[LakeWriter.compactDeltaCluster]]), which is what makes min/max
  * file stats selective on every clustering column at once — at
  * 100 TB, a filter on ANY of them prunes to O(matching files).
  *
  * Unlike hive partitioning the declaration is CHEAPLY MUTABLE:
  * `ALTER TABLE t CLUSTER BY (other, cols)` is one domain-metadata
  * commit (no rewrite). OPTIMIZE is INCREMENTAL: it lays NEW (and
  * DV-carrying) files by the current columns and leaves existing
  * cubes where they are — after a re-key, history keeps its old
  * layout until `OPTIMIZE ... FULL` rewrites it (delta-spark's own
  * re-key semantics). That is the operational point over
  * partitioning: re-keying a 100-TB table is a metadata change plus
  * incremental maintenance, with the full rewrite an explicit,
  * separately-priced decision.
  *
  * The protocol requires clustered tables to be UNPARTITIONED (the
  * two layouts compete for the directory structure); both the CREATE
  * and ALTER paths refuse the combination loudly.
  *
  * Reference: delta-io PROTOCOL.md "Clustered Table"; delta-spark's
  * CLUSTER BY surface.
  */
private[graft] object Clustering {
  val Feature = "clustering"
  val Domain = "delta.clustering"
  /** clustering + its prerequisite; both writer features. */
  val Features: Set[String] = Set(Feature, "domainMetadata")
  val MaxCols = 4

  /** The table's clustering columns as LOGICAL names (domain carries
    * physical ones under column mapping); empty when not clustered or
    * the domain was removed (CLUSTER BY NONE).
    */
  def columnsOf(snap: DeltaReader.Snapshot): Seq[String] = {
    snap.domainMetadata.get(Domain).toSeq.flatMap { conf =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(conf)
      val cols = Option(node.get("clusteringColumns")).toSeq.flatMap { arr =>
        (0 until arr.size()).map { i =>
          val path = arr.get(i)
          require(path.size() == 1,
            s"delta.clustering declares a nested clustering column " +
              s"(${(0 until path.size()).map(path.get(_).asText()).mkString(".")}) — " +
              "graft clusters top-level columns only")
          path.get(0).asText()
        }
      }
      val table = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
        .asInstanceOf[StructType]
      val logicalByPhys = table.fields.flatMap { f =>
        if (f.metadata.contains("delta.columnMapping.physicalName"))
          Some(f.metadata.getString("delta.columnMapping.physicalName") -> f.name)
        else None
      }.toMap
      cols.map(c => logicalByPhys.getOrElse(c, c))
    }
  }

  def isClustered(snap: DeltaReader.Snapshot): Boolean =
    columnsOf(snap).nonEmpty

  /** The domain-metadata action declaring `physCols` (already physical
    * names); empty cols renders the REMOVED form (CLUSTER BY NONE).
    */
  def domainAction(physCols: Seq[String]): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    if (physCols.isEmpty)
      s"""{"domainMetadata":{"domain":"$Domain","configuration":"{}","removed":true}}"""
    else {
      val conf = om.writeValueAsString(
        s"""{"clusteringColumns":${physCols.map(c =>
          s"[${om.writeValueAsString(c)}]").mkString("[", ",", "]")}}""")
      s"""{"domainMetadata":{"domain":"$Domain","configuration":$conf,"removed":false}}"""
    }
  }

  /** Declared-shape gates shared by CREATE ... CLUSTER BY and ALTER
    * ... CLUSTER BY: 1..4 existing top-level columns of a type the
    * curve can rank (numeric, string, date, timestamp), never on a
    * partitioned table.
    */
  def validate(table: StructType, partCols: Seq[String], cols: Seq[String],
               op: String): Unit = {
    require(cols.nonEmpty && cols.size <= MaxCols,
      s"$op: CLUSTER BY takes 1..$MaxCols columns, got ${cols.size}")
    require(cols.distinct.size == cols.size,
      s"$op: CLUSTER BY lists a column twice (${cols.mkString(", ")})")
    require(partCols.isEmpty,
      s"$op: the table partitions by (${partCols.mkString(", ")}) — the protocol " +
        "requires clustered tables to be unpartitioned (the two layouts compete " +
        "for the directory structure); drop the partitioning first")
    cols.foreach { c =>
      require(table.fieldNames.contains(c),
        s"$op: clustering column '$c' not in ${table.fieldNames.mkString(", ")}")
      val dt = table(c).dataType
      import org.apache.spark.sql.types._
      val ok = dt.isInstanceOf[NumericType] || dt == StringType || dt == DateType ||
        dt == TimestampType || dt == TimestampNTZType
      require(ok, s"$op: clustering column '$c' has type ${dt.simpleString} — the " +
        "curve ranks numeric, string, date and timestamp columns only")
    }
  }
}
