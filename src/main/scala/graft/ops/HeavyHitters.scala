package graft.ops

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters via a two-pass sketch-then-verify plan.
  *
  * A plain `groupBy(key).count().filter(cnt >= T)` shuffles one row per
  * DISTINCT key (map-side partial aggregation already collapses
  * occurrences) — at lake scale the distinct-key set itself is the
  * bottleneck (token vocabularies run to billions). The frequent-items
  * sketch (Apache DataSketches ItemsSketch — the Misra-Gries /
  * SpaceSaving family Spark itself bundles) cuts that shuffle to the
  * candidates only:
  *
  *   pass 1 — one sketch per partition (mapPartitions, no shuffle),
  *            merged on the driver: sketches are `maxMapSize` entries
  *            regardless of input size, and merge is associative.
  *            `getFrequentItems(NO_FALSE_NEGATIVES)` then yields every
  *            key whose true count COULD reach the threshold — the
  *            sketch's upper bound is ≥ the true count, so no true
  *            heavy hitter is missed (false positives possible).
  *   pass 2 — exact counts of the candidate keys only: broadcast the
  *            candidate set, semi-filter the occurrences BEFORE the
  *            shuffle, one small grouped aggregation, drop the false
  *            positives with the exact threshold.
  *
  * The result is EXACT (hence DuckDB-oracle-checkable); only the
  * pruning is approximate. Candidate-set size is bounded by
  * `maxMapSize` (sketch capacity ≈ 0.75·maxMapSize active items), so
  * the broadcast is small by construction. For the guarantee to be
  * airtight, `minCount` must exceed the merged sketch's maximum error
  * (≈ 3.5·n/maxMapSize); below that the sketch cannot separate heavy
  * from light and this implementation FAILS LOUDLY rather than
  * silently dropping qualifying keys.
  */
object HeavyHitters {

  /** Exact (key, cnt) for every value of `keyCol` occurring at least
    * `minCount` times in `rows`. `maxMapSize` must be a power of two
    * (sketch requirement).
    */
  def frequentKeys(rows: DataFrame, keyCol: Column, minCount: Long,
                   maxMapSize: Int = 1 << 12): DataFrame = {
    require(minCount > 0, s"minCount must be positive, got $minCount")
    require(maxMapSize > 0 && (maxMapSize & (maxMapSize - 1)) == 0,
      s"maxMapSize must be a power of two, got $maxMapSize")
    val spark = rows.sparkSession
    val occurrences = rows.select(keyCol.cast("string").as("key")).where(col("key").isNotNull)

    // pass 1: per-partition sketches, driver merge (each sketch
    // serializes to O(maxMapSize) bytes — collecting one per partition
    // is bounded and tiny next to any shuffle of the distinct keys)
    val serde = new ArrayOfStringsSerDe
    val partSketches = occurrences.queryExecution.toRdd
      .mapPartitions { it =>
        val sk = new ItemsSketch[String](maxMapSize)
        it.foreach(r => sk.update(r.getUTF8String(0).toString))
        if (sk.isEmpty) Iterator.empty
        else Iterator.single(sk.toByteArray(new ArrayOfStringsSerDe))
      }
      .collect()
    val merged = new ItemsSketch[String](maxMapSize)
    partSketches.foreach(b => merged.merge(ItemsSketch.getInstance(Memory.wrap(b), serde)))

    require(merged.getMaximumError < minCount,
      s"minCount=$minCount is within the sketch's error bound " +
        s"(${merged.getMaximumError} at maxMapSize=$maxMapSize over " +
        s"${merged.getStreamLength} rows) — the no-false-negative guarantee " +
        "needs a bigger maxMapSize or a higher threshold")

    val candidates = merged.getFrequentItems(minCount, ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem)

    // pass 2: exact verify — only candidate occurrences reach the
    // shuffle. The candidate set is sketch-capacity-bounded, so the
    // prefilter is a broadcast hash semi-join (whole-stage codegen'd),
    // not a per-row set-lookup UDF.
    import spark.implicits._
    val candDf = broadcast(candidates.toSeq.toDF("key"))
    occurrences.join(candDf, Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** Heavy tokens of a text corpus: every word (of `split(lower(text),
    * ' ')`, empties dropped) occurring at least `minCount` times, with
    * its exact count.
    */
  def frequentTokens(docs: DataFrame, minCount: Long, text: String = "text",
                     maxMapSize: Int = 1 << 12): DataFrame =
    frequentKeys(
      docs.select(explode(split(lower(col(text)), " ")).as("word")).where(length(col("word")) > 0),
      col("word"), minCount, maxMapSize)
      .withColumnRenamed("key", "word")
}
