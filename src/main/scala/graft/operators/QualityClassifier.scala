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
    * identity, with EXPLICIT midrank tie handling (tied scores share the
    * mean of the ranks they span — the standard tie-corrected AUC,
    * equal to P(s⁺ > s⁻) + ½·P(s⁺ = s⁻); the former `row_number` rank
    * made tied scores contribute an arbitrary split instead).
    *
    * NO global window anywhere, so a corpus-sized scored frame never
    * single-threads: tie groups collapse in one map-side-combined
    * aggregate keyed by score, the distinct-score table range-partitions
    * into global score order across tasks, and ONE pass emits each
    * partition's local rank-sum + count masses (≤ numPartitions rows to
    * the driver), which recombine exactly via prefix offsets
    * (rp_global = rp_local + offset·np) — the [[Eval.deltaQids]]
    * sort-then-offset device, folded into a single job.
    */
  def auc(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val spark = scored.sparkSession
    val hist = scored
      .select(col(scoreCol).cast("double").as("__s"), col(labelCol).cast("double").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).cast("double").as("__c"), sum(col("__y")).as("__p"))
    // range partitioning keeps equal scores in one partition (they are one
    // histogram row anyway) and gives global order across partitions
    val sorted = hist.repartitionByRange(col("__s")).sortWithinPartitions(col("__s"))
    // ONE pass: a tie group's global midrank is its LOCAL midrank plus the
    // count mass of score-earlier partitions, so
    //   rp_global(part) = rp_local(part) + offset(part) · np(part)
    // — each partition emits (rpLocal, np, nn), the driver computes the
    // prefix offsets from the nn column and recombines. No second job, no
    // persisted intermediate, no broadcast.
    val parts = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var cumb = 0.0; var rp = 0.0; var np = 0.0; var nn = 0.0
      it.foreach { r =>
        val c = r.getDouble(1)
        val p = if (r.isNullAt(2)) 0.0 else r.getDouble(2)
        rp += p * (cumb + (c + 1.0) / 2.0) // midrank within this partition
        np += p; nn += c; cumb += c
      }
      Iterator((i, rp, np, nn))
    }.collect().sortBy(_._1)
    var offset = 0.0; var rpos = 0.0; var npos = 0.0; var n = 0.0
    parts.foreach { case (_, rpLocal, np, nn) =>
      rpos += rpLocal + offset * np
      npos += np; n += nn; offset += nn
    }
    val nneg = n - npos
    val aucV: java.lang.Double =
      if (npos == 0.0 || nneg == 0.0) null
      else Double.box((rpos - npos * (npos + 1.0) / 2.0) / (npos * nneg))
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(aucV, npos.toLong, nneg.toLong)),
      StructType(Seq(
        StructField("auc", DoubleType, nullable = true),
        StructField("n_pos", LongType, nullable = false),
        StructField("n_neg", LongType, nullable = false))))
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
