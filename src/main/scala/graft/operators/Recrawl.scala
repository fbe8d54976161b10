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
}
