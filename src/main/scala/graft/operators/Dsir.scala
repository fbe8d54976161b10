package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): pick
  * raw-corpus documents whose hashed-n-gram distribution looks like a small
  * TARGET corpus (the quality domain — e.g. curated text), by importance
  * weighting under two smoothed bag-of-hashed-ngrams models and sampling
  * with the Gumbel top-k trick.
  *
  * Spark shape, sized for the DSIR premise (tiny target, huge raw):
  *  - features are unigram+bigram occurrences bucketed by an md5-prefix
  *    (16^4 = 65536 buckets — a string key both engines hash identically,
  *    so the oracle replays everything);
  *  - the per-bucket log-likelihood-ratio table is at most 65536 rows
  *    regardless of corpus size → it BROADCASTS; the raw corpus is never
  *    shuffled by bucket;
  *  - the raw side is tokenized ONCE: the occurrence stream pre-aggregates
  *    to a persisted (id, bucket, cnt) frame from which both the global q̂
  *    bucket counts and the per-doc weight sums derive — one corpus scan,
  *    one id-keyed shuffle of partial sums, no all-pairs anything, no
  *    driver collect of corpus data;
  *  - resampling is deterministic Gumbel top-k from the portable hash
  *    ([[Sampling.portableHash]]), planned as `TakeOrderedAndProject` —
  *    the same no-global-sort top-k as every other sampler here.
  */
object Dsir {

  /** md5 hex prefix length for the feature bucket: 4 → 65536 buckets (the
    * DSIR paper uses 10k hash buckets; a fixed 65536 keeps the table
    * broadcastable while halving collisions).
    */
  val BucketPrefixLen = 4
  val NumBuckets: Long = 65536L

  /** (id, bucket) — one row per unigram/bigram OCCURRENCE. Internal: the
    * two consumers aggregate it differently.
    */
  private def bucketed(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = TextOps.tokens(col(textCol))
    val bigrams = zip_with(
      slice(t, lit(1), greatest(lit(0), size(t) - 1)),
      slice(t, lit(2), greatest(lit(0), size(t) - 1)),
      (a, b) => concat(a, lit(" "), b))
    df.select(col(idCol).as("id"), explode(concat(t, bigrams)).as("__g"))
      .select(col("id"), substring(md5(col("__g")), 1, BucketPrefixLen).as("bucket"))
  }

  /** Per-document importance log-weight
    * `log ŵ(d) = Σ_gram (log p̂[b(gram)] − log q̂[b(gram)])` with add-α
    * smoothed bucket categoricals fitted on the target (p̂) and raw (q̂)
    * corpora. Documents with no grams keep log-weight 0 (the empty
    * product — weight 1). Output: every `raw` column + `log_weight`.
    */
  def importanceWeights(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      alpha: Double = 0.01,
  ): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    require(!raw.columns.contains("log_weight"), "input already has a 'log_weight' column")
    val spark = raw.sparkSession
    import spark.implicits._
    // Bucket-count tables are ≤65536 rows whatever the corpus size, so they
    // COLLECT: totals and the ratio table then compute driver-side. The raw
    // corpus is tokenized exactly ONCE: the occurrence stream pre-aggregates
    // to (id, bucket, cnt) — far smaller than the gram stream, bounded by
    // docs × distinct-buckets-per-doc — and that persisted aggregate feeds
    // BOTH the global q̂ counts and the per-doc weight sums.
    val tb = bucketed(target.select(lit(0L).as("__tid"), col(targetTextCol)), "__tid", targetTextCol)
    val tCounts = tb.groupBy("bucket").agg(count(lit(1)).as("tc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rb = bucketed(raw, idCol, textCol)
      .groupBy("id", "bucket").agg(count(lit(1)).as("__cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rCounts = rb.groupBy("bucket").agg(sum("__cnt").as("rc"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val tTot = tCounts.valuesIterator.sum
    val rTot = rCounts.iterator.map(_._2).sum
    // every bucket the raw corpus emits is in rCounts by construction, so
    // its key set covers the lookup domain; absent target buckets smooth
    // to α
    val ratios = rCounts.iterator.map { case (b, rc) =>
      (b,
        math.log((tCounts.getOrElse(b, 0L) + alpha) / (tTot + alpha * NumBuckets)) -
          math.log((rc + alpha) / (rTot + alpha * NumBuckets)))
    }.toSeq.toDF("bucket", "__lr")
    val sums = rb.join(broadcast(ratios), Seq("bucket"))
      .groupBy("id")
      .agg(sum(col("__lr") * col("__cnt")).as("log_weight"))
      .select(col("id").as("__dsir_id"), col("log_weight"))
    raw.join(sums, col(idCol) === col("__dsir_id"), "left")
      .drop("__dsir_id")
      .withColumn("log_weight", coalesce(col("log_weight"), lit(0.0)))
  }

  /** Gumbel top-k resample: k documents WITHOUT replacement with inclusion
    * tilted toward the target distribution — key = log ŵ + Gumbel(h(id)),
    * Gumbel = −ln(−ln(u)), u = (h(id)+0.5)/2³² ∈ (0,1) strictly (no ±∞
    * keys). Deterministic: same ids selected on every run, engine, and
    * parallelism; the oracle replays the exact key formula.
    */
  def resample(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      k: Int,
      alpha: Double = 0.01,
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(!raw.columns.contains("__dsir_key"), "input already has a '__dsir_key' column")
    val weighted = importanceWeights(raw, idCol, textCol, target, targetTextCol, alpha)
    val u = (Sampling.portableHash(col(idCol)) + 0.5) / lit(4294967296.0)
    weighted
      .withColumn("__dsir_key", col("log_weight") - log(-log(u)))
      .orderBy(desc("__dsir_key"), col(idCol))
      .limit(k)
      .drop("__dsir_key")
  }
}
