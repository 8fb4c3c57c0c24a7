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
    val withId = base.withColumn("__id", monotonically_increasing_id()).cache()
    val rows = features.map { f =>
      // permute column f: re-pair values with rows via a seeded shuffle
      val w1 = org.apache.spark.sql.expressions.Window.orderBy(col("__r"))
      val w2 = org.apache.spark.sql.expressions.Window.orderBy(col("__r2"))
      val shuffled = withId.select(col(f)).withColumn("__r", rand(seed))
        .withColumn("__rn", row_number().over(w1))
      val keyed = withId.withColumn("__r2", rand(seed + 1))
        .withColumn("__rn", row_number().over(w2))
        .drop(f)
      val permuted = keyed.join(shuffled.select(col("__rn"), col(f)), "__rn")
      f -> (mse(permuted) - mse0)
    }
    rows.toDF("feature", "importance")
  }
}
