package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Discriminative quality filtering — the GPT-3/CCNet pipeline component:
  * train a linear classifier to tell a TARGET slice (curated/high-quality
  * pages) from the raw crowd, then score every document and keep/resample
  * by the score (the complement of [[Dsir]]'s generative importance
  * weights; the discriminative form is what the GPT-3 data work used).
  *
  * Spark-first shape: hashed bag-of-tokens features (`HashingTF`, a pure
  * projection — no vocabulary state to build or broadcast), MLlib
  * `LogisticRegression` (distributed L-BFGS: per-iteration treeAggregate of
  * gradient partials — the fit never collects rows), scoring as one narrow
  * pass. At 100 TB the fit runs on a hash-sampled slice
  * ([[Sampling.hashSample]]) and the SCORING is the corpus-scale pass,
  * which is embarrassingly parallel.
  */
object QualityClassifier {

  final case class Trained(
      model: LogisticRegressionModel,
      numFeatures: Int,
      tokenPattern: String,
  )

  /** Fit on documents labeled `labelCol` ∈ {0, 1} (1 = target slice). */
  def train(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      numFeatures: Int = 4096,
      maxIter: Int = 30,
      regParam: Double = 1e-3,
  ): Trained = {
    val featured = features(docs, textCol, numFeatures)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setLabelCol(labelCol)
      .setFeaturesCol("__features")
    Trained(lr.fit(featured), numFeatures, TokenPattern)
  }

  /** Score `docs`: input columns + `quality_score` = P(target | text). */
  def score(t: Trained, docs: DataFrame, textCol: String): DataFrame = {
    val featured = features(docs, textCol, t.numFeatures)
    t.model.transform(featured)
      .withColumn("quality_score", vector_to_array(col("probability"))(1))
      .drop("__tokens", "__features", "rawPrediction", "probability", "prediction")
  }

  /** AUC of `scoreCol` against `labelCol` by the rank-sum (Mann–Whitney)
    * identity. The only window is a GLOBAL rank over the EVAL SLICE — eval
    * sets are sample-sized by construction (never the corpus), which is why
    * this isn't the scale hazard a corpus-global window is.
    */
  def auc(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(scoreCol))
    scored
      .select(col(labelCol).cast("double").as("__y"), col(scoreCol))
      .withColumn("__r", row_number().over(w).cast("double"))
      .agg(
        sum(when(col("__y") === 1.0, col("__r"))).as("__rpos"),
        sum(col("__y")).as("__npos"),
        count(lit(1)).cast("double").as("__n"),
      )
      .select(
        ((col("__rpos") - col("__npos") * (col("__npos") + 1) / 2) /
          (col("__npos") * (col("__n") - col("__npos")))).as("auc"),
        col("__npos").cast("long").as("n_pos"),
        (col("__n") - col("__npos")).cast("long").as("n_neg"),
      )
  }

  private val TokenPattern = "[^a-z0-9]+"

  private def features(docs: DataFrame, textCol: String, numFeatures: Int): DataFrame = {
    Seq("__text", "__tokens", "__features").foreach(c =>
      require(!docs.columns.contains(c), s"input already has a '$c' column"))
    val tok = new RegexTokenizer()
      .setInputCol("__text").setOutputCol("__tokens")
      .setPattern(TokenPattern).setToLowercase(true).setMinTokenLength(1)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__features").setNumFeatures(numFeatures)
    tf.transform(tok.transform(docs.withColumn("__text", coalesce(col(textCol), lit("")))))
      .drop("__text")
  }
}
