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
    // The permutation is a seeded Feistel bijection on the dense-id
    // domain: σ(id) is computed PER ROW (cycle-walking keeps it inside
    // [0, n)), so re-pairing rows with permuted values costs one
    // equi-join and nothing else — no sort, no window. The previous
    // form ran TWO unpartitioned row_number windows per feature,
    // funneling the whole dataset through one task 2·|features| times.
    // One bijection reused across features is statistically equivalent
    // for PFI: each feature's evaluation permutes only its own column.
    val withId = graft.sources.LakeReader.withDenseRowId(base, "__id").cache()
    val n = withId.count()
    // codegen'd Feistel kernel (StaticInvoke) — the permutation is pure
    // per-row arithmetic and stays inside whole-stage codegen; the
    // boxed-UDF form broke the codegen span for every feature's join
    def perm(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          FeatureEval.getClass, org.apache.spark.sql.types.LongType, "feistelPermute",
          Seq(org.apache.spark.sql.GraftColumnBridge.expression(c),
            org.apache.spark.sql.catalyst.expressions.Literal(n),
            org.apache.spark.sql.catalyst.expressions.Literal(seed)),
          returnNullable = false))
    val vals = withId.select((col("__id").as("__pid") +: features.map(col)): _*)
    val rows = features.map { f =>
      val permuted = withId.withColumn("__pid", perm(col("__id"))).drop(f)
        .join(vals.select(col("__pid"), col(f)), "__pid")
      f -> (mse(permuted) - mse0)
    }
    withId.unpersist()
    rows.toDF("feature", "importance")
  }

  /** Seeded pseudorandom bijection on [0, n): a 4-round Feistel network
    * over the smallest even-bit domain covering n, cycle-walked back
    * into range (repeatedly applying a domain bijection must re-enter
    * [0, n) — cycles of a permutation). Pure per-row arithmetic: the
    * whole "shuffle" ships zero bytes.
    */
  def feistelPermute(id: Long, n: Long, seed: Long): Long = {
    require(n > 0 && id >= 0 && id < n, s"id $id out of [0, $n)")
    if (n == 1) return 0L
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    val half = (bits + 1) / 2
    val mask = (1L << half) - 1
    var v = id
    do {
      var l = v >>> half
      var r = v & mask
      var i = 0
      while (i < 4) {
        val f = scala.util.hashing.byteswap64(r ^ (seed * 0x9E3779B97F4A7C15L + i)) & mask
        val nl = r
        r = l ^ f
        l = nl
        i += 1
      }
      v = (l << half) | r
    } while (v >= n)
    v
  }
}
