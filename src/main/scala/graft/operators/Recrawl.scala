package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental-crawl maintenance round — the reference's
  * upload → invalidate → re-query lifecycle (backend/main.py:277,339,479
  * cache invalidations) re-expressed at corpus scale: instead of
  * invalidating caches per uploaded file, a recrawl diffs the new snapshot
  * against the old one, re-embeds ONLY the changed/added documents, and
  * patches the vector store in place ([[Ivf.applyDelta]] rewrites only the
  * affected list partitions; [[Hnsw]] graphs `extend` instead of rebuild).
  *
  * Scale shape: the diff is one full-outer join moving only (id, 16-byte
  * hash) per row ([[Dedup.snapshotDiff]]); everything downstream —
  * embedding, assignment, the store rewrite — is DELTA-sized, never
  * corpus-sized. A 100 TB corpus with a 0.1% daily churn does 0.1% of the
  * embed work and rewrites the sliver of index partitions the churn maps
  * to; the untouched 99.9% of store files is neither read nor written.
  */
object Recrawl {

  /** Everything one maintenance round needs, all lazily planned:
    *
    *  - `diff`: (id, status ∈ added|removed|changed|unchanged, old_hash,
    *    new_hash) — persisted, since three consumers read it;
    *  - `staleIds`: ids whose stored vectors must DROP (removed docs and
    *    the superseded version of changed docs);
    *  - `fresh`: (id, embedding) for exactly the added+changed docs, via
    *    the batch `mapPartitions` embed path — the only embedding work in
    *    the round.
    */
  final case class Delta(diff: DataFrame, staleIds: DataFrame, fresh: DataFrame)

  def delta(
      spark: SparkSession,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      embedder: Embedder = Embedder.default,
  ): Delta = {
    val diff = Dedup.snapshotDiff(oldDocs, newDocs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stale = diff.where(col("status").isin("removed", "changed")).select(col(idCol))
    val toEmbed = newDocs.join(
      diff.where(col("status").isin("added", "changed")).select(col(idCol)), Seq(idCol))
    val fresh = Embedder.embedText(spark, toEmbed, idCol, textCol, embedder)
      .toDF().select(col("id").as(idCol), col("embedding"))
    Delta(diff, stale, fresh)
  }

  /** One full physical round against a live IVF store: diff → re-embed the
    * delta → selective-partition store rewrite. Returns the diff (for the
    * caller's bookkeeping/reporting) and the number of list partitions the
    * rewrite touched.
    */
  def maintainIvf(
      spark: SparkSession,
      storePath: String,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      embedder: Embedder = Embedder.default,
  ): (DataFrame, Long) = {
    val d = delta(spark, oldDocs, newDocs, idCol, textCol, embedder)
    // the store's sidecar names its indexed column; align the fresh frame
    val vecName = Ivf.readCentroids(storePath, spark.sparkContext.hadoopConfiguration)
      .flatMap(_.column).getOrElse("embedding")
    val n = Ivf.applyDelta(
      spark, storePath, d.staleIds, d.fresh.withColumnRenamed("embedding", vecName), idCol)
    (d.diff, n)
  }

  /** The same round against a sharded HNSW store ([[Hnsw.writeIndex]]):
    * diff → re-embed the delta → one [[Hnsw.applyDelta]] selective-shard
    * rewrite (removals rebuild only the shards they land in; additions
    * extend). Returns the diff and the shards touched.
    */
  def maintainHnsw(
      spark: SparkSession,
      storePath: String,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      embedder: Embedder = Embedder.default,
  ): (DataFrame, Int) = {
    val d = delta(spark, oldDocs, newDocs, idCol, textCol, embedder)
    val n = Hnsw.applyDelta(spark, storePath, d.staleIds, d.fresh, "embedding", idCol)
    (d.diff, n)
  }

  /** Which pages to recrawl NEXT — the scheduling policy that decides what
    * `oldDocs`/`newDocs` even contain. Per-URL change-rate estimation from
    * visit history (Cho & Garcia-Molina, "Estimating Frequency of Change",
    * ACM TOIT 2003): a page visited n+1 times with X detected changes over
    * average interval Δ gets the bias-corrected rate estimate
    *
    *   λ̂ = −ln((n − X + 0.5) / (n + 0.5)) / Δ   [changes per second]
    *
    * (the +0.5 regularizer keeps X = n finite and X = 0 meaningful). From
    * λ̂: `priority` = λ̂ · age (expected changes missed since the last
    * visit — the greedy "crawl highest expected staleness first" order)
    * and `next_due` = last visit + 1/λ̂ (the uniform-refresh target).
    *
    * Plan shape: one window over (url, ts) moving only the content hash,
    * one group-by per URL — both shuffle on the URL key once; no collect,
    * no self-join. `visits` carries (urlCol, tsCol TIMESTAMP, hashCol);
    * URLs with fewer than 2 visits or a zero time span are dropped (no
    * interval evidence). `asOf` is the scheduling instant.
    */
  def schedule(
      visits: DataFrame,
      urlCol: String,
      tsCol: String,
      hashCol: String,
      asOf: java.time.Instant,
  ): DataFrame = {
    val names = visits.columns.toSet
    Seq("__sec", "__h", "__prev", "n_visits", "n_changes",
      "change_rate", "priority", "next_due")
      .foreach(c => require(!names.contains(c), s"input already has a '$c' column"))
    // hash tie-break pins the lag order when two visits share a timestamp
    // (same instant + same hash is order-free anyway)
    val w   = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol)).orderBy(col("__sec"), col("__h"))
    val sec = unix_micros(col(tsCol)) / lit(1e6)
    val nowSec = asOf.getEpochSecond.toDouble + asOf.getNano / 1e9
    val obs = visits
      .select(col(urlCol), sec.as("__sec"), col(hashCol).as("__h"))
      .withColumn("__prev", lag(col("__h"), 1).over(w))
    val agg = obs.groupBy(col(urlCol)).agg(
      count(lit(1)).as("n_visits"),
      sum(when(col("__prev").isNotNull && col("__h") =!= col("__prev"), 1L)
        .otherwise(0L)).as("n_changes"),
      min(col("__sec")).as("__first"),
      max(col("__sec")).as("__last"))
    val n      = col("n_visits") - 1 // observation intervals
    val lambda = -log((n - col("n_changes") + 0.5) / (n + 0.5)) /
      ((col("__last") - col("__first")) / n)
    agg
      .where(col("n_visits") >= 2 && col("__last") > col("__first"))
      .withColumn("change_rate", lambda)
      .withColumn("priority", col("change_rate") * (lit(nowSec) - col("__last")))
      .withColumn("next_due",
        when(col("change_rate") > 0,
          timestamp_seconds(col("__last") + lit(1.0) / col("change_rate"))))
      .drop("__first", "__last")
  }
}
