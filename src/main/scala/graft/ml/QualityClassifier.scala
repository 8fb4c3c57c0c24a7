package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the classifier step a
  * pretraining pipeline runs after the heuristic gates (GPT-3 / CCNet
  * discipline: fit a linear classifier on hashed bag-of-words features
  * of a trusted positive set vs an untrusted negative set, keep corpus
  * documents the model scores high).
  *
  * Scale shape: features are a fixed-width HashingTF projection (no
  * vocabulary fit, no shuffle — each document hashes independently,
  * exactly fastText's hashing trick), so TRAINING is spark.ml logistic
  * regression over weak labels (treeAggregate — map-side gradient
  * partials, driver-sized model) and SCORING is one broadcast of the
  * coefficient vector and a per-row dot product. Nothing corpus-sized
  * ever sits on one node.
  */
object QualityClassifier {

  private def featurize(docs: DataFrame, text: String, numFeatures: Int): DataFrame = {
    val words = docs.withColumn("__ws", split(lower(col(text)), " "))
    new HashingTF().setInputCol("__ws").setOutputCol("__fv").setNumFeatures(numFeatures)
      .transform(words).drop("__ws")
  }

  /** Fit on documents carrying a boolean/0-1 `labelCol` (weak labels
    * are the norm: heuristic gates, or trusted-source membership).
    */
  def train(labeled: DataFrame, labelCol: String, text: String = "text",
            numFeatures: Int = 1 << 18, maxIter: Int = 30,
            regParam: Double = 1e-4): LogisticRegressionModel = {
    val feat = featurize(labeled.withColumn("__lb", col(labelCol).cast("double")), text, numFeatures)
    new LogisticRegression()
      .setFeaturesCol("__fv").setLabelCol("__lb")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feat)
  }

  /** Score a corpus: (id, quality_prob ∈ [0,1], keep). The model rides
    * one broadcast; the pass is shuffle-free.
    */
  def score(model: LogisticRegressionModel, docs: DataFrame, threshold: Double = 0.5,
            id: String = "doc_id", text: String = "text"): DataFrame = {
    val numFeatures = model.numFeatures
    model.transform(featurize(docs, text, numFeatures))
      .select(col(id), org.apache.spark.ml.functions.vector_to_array(col("probability"))
        .getItem(1).as("quality_prob"))
      .withColumn("keep", col("quality_prob") >= threshold)
  }

  /** End-to-end weak-label flow over one corpus: label by a heuristic
    * predicate, train, score everything. The classifier generalizes
    * past the heuristic — documents the gate mislabels but whose
    * vocabulary matches the other class move across the boundary.
    */
  def weakLabelScore(docs: DataFrame, weakLabel: org.apache.spark.sql.Column,
                     text: String = "text", id: String = "doc_id",
                     numFeatures: Int = 1 << 18, threshold: Double = 0.5): DataFrame = {
    val labeled = docs.withColumn("__weak", weakLabel.cast("double"))
    val model = train(labeled, "__weak", text, numFeatures)
    score(model, docs, threshold, id, text)
  }
}
