package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enrichment evaluation via permutation feature importance
  * (reference: maco/machine_learning.py — autogluon + sklearn PFI;
  * here spark.ml linear regression, seeded permutation, fully
  * distributed).
  */
object FeatureEval {

  /** Fits target ~ features, then scores each feature by the MSE
    * increase when that column is permuted (seeded, one iteration).
    * Output: (feature, importance).
    */
  def permutationImportance(df: DataFrame, features: Seq[String], target: String,
                            seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select((features :+ target).map(c => col(c).cast("double")): _*).na.drop()
    val asm = new VectorAssembler().setInputCols(features.toArray).setOutputCol("fv")
    val lr = new LinearRegression().setFeaturesCol("fv").setLabelCol(target)
      .setMaxIter(20).setRegParam(0.0)
    val model = lr.fit(asm.transform(base))

    def mse(d: DataFrame): Double =
      model.transform(asm.transform(d))
        .select(avg(pow(col("prediction") - col(target), 2)))
        .first().getDouble(0)

    val mse0 = mse(base)
    // The permutation is a pseudorandom bijection old-row → new-row:
    // rank every row under two independent seeded hash orders and pair
    // equal ranks. Each rank pass is a distributed range sort +
    // per-partition-offset dense ids — the previous form ran TWO
    // unpartitioned row_number windows PER FEATURE, funneling the whole
    // dataset through one task 2·|features| times. One bijection reused
    // across features is statistically equivalent for PFI: each
    // feature's evaluation permutes only its own column.
    val withId = graft.sources.LakeReader.withDenseRowId(base, "__id")
    def hashRanked(s: Long): DataFrame = {
      val sorted = withId.withColumn("__h", xxhash64(lit(s), col("__id")))
        .repartitionByRange(col("__h")).sortWithinPartitions("__h")
      graft.sources.LakeReader.withDenseRowId(sorted, "__rn").drop("__h", "__id")
    }
    val vals = hashRanked(seed).select((col("__rn") +: features.map(col)): _*).cache()
    val keyed = hashRanked(seed + 1).cache()
    val rows = features.map { f =>
      val permuted = keyed.drop(f).join(vals.select(col("__rn"), col(f)), "__rn")
      f -> (mse(permuted) - mse0)
    }
    vals.unpersist(); keyed.unpersist()
    rows.toDF("feature", "importance")
  }
}
