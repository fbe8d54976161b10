package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("packs"), the step between a cleaned corpus and a training
  * run — context windows are filled with whole documents until the budget
  * is spent, then the next pack starts.
  *
  * Packing is inherently sequential (each pack depends on everything packed
  * before it), so the scalable formulation fixes a deterministic document
  * order and derives the assignment from an exclusive running token sum:
  * pack_id = floor(prefix_tokens / budget). A document whose tokens straddle
  * a boundary stays in the pack where it started — greedy-with-overflow, a
  * pack may exceed the budget by at most one document's tail (trainers
  * truncate or roll the remainder; bit-exact first-fit would serialize the
  * whole stream through one task and still not match what streaming packers
  * do in practice). The closed-form assignment is what makes the operator
  * both distributed (one window shuffle per stream) and independently
  * verifiable by a SQL oracle.
  *
  * `idCol` must be UNIQUE within each stream: the prefix sum orders by it
  * with a ROWS frame, so duplicate ids near a pack boundary would make the
  * assignment depend on shuffle arrival order.
  *
  * `streamCol` shards the running sum: packs form per stream (per language,
  * per shard, per source), so the window is `partitionBy(stream)` and no
  * single task sees the whole corpus. At 100 TB pick a stream key with
  * enough cardinality for the cluster — a single global stream funnels the
  * prefix sum through one partition by definition.
  */
object Packing {
  def packByBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      streamCol: String,
  ): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prefix", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__prefix div ${budget}L"))
      .drop("__prefix")
  }

  // ------------------------------------------------ concat-and-chunk layout

  /** Rows-per-shard bound behind [[packConcat]]'s derived shard count. */
  val RowsPerShard: Long = 1000000L

  private def shardsFor(n: Long): Int =
    math.max(1L, (n + RowsPerShard - 1) / RowsPerShard).toInt

  /** The OTHER packing scheme pretraining runs use — concat-and-chunk: lay
    * the token stream head-to-tail and cut fixed `seqLen` sequences, letting
    * documents STRADDLE sequence boundaries (no padding, no overflow;
    * [[packByBudget]] instead keeps documents whole within a budgeted pack).
    *
    * Deterministic and sharded: each document lands in shard
    * `portableHash(id) mod nShards` (the training shard files), documents
    * within a shard are ordered by (hash, id) — a reproducible global
    * shuffle, which is what training wants — and placement derives from a
    * per-SHARD running token sum. The only window is `partitionBy(shard)`
    * over ≤ [[RowsPerShard]] rows (`nShards = 0` derives the count from a
    * corpus count, like [[Contrastive]]); never a global window.
    *
    * Output adds: `shard`, `tok_offset` (doc's first token in its shard's
    * stream), `off_in_seq`, `seq_first`/`seq_last` (shard-local sequence
    * ids the doc touches) and `n_seqs`. Zero-token docs occupy no stream
    * space (`seq_last = seq_first`).
    */
  def packConcat(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      seqLen: Int,
      nShards: Int = 0,
  ): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    Seq("__h", "shard", "tok_offset", "off_in_seq", "seq_first", "seq_last", "n_seqs")
      .foreach(c => require(!df.columns.contains(c), s"input already has a '$c' column"))
    val shards = if (nShards > 0) nShards else shardsFor(df.count())
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    val nTok: Column = greatest(col(nTokensCol).cast("long"), lit(0L))
    df
      .withColumn("__h", Sampling.portableHash(col(idCol)))
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
      .withColumn("tok_offset", coalesce(sum(nTok).over(w), lit(0L)) - nTok)
      .withColumn("off_in_seq", col("tok_offset") % seqLen)
      .withColumn("seq_first", floor(col("tok_offset") / seqLen))
      .withColumn("seq_last",
        floor((col("tok_offset") + greatest(nTok, lit(1L)) - 1) / seqLen))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
      .drop("__h")
  }

  /** Length-bucketed padded batching — the THIRD trainer layout, for
    * models that can't straddle documents (encoders, rerankers, SFT with
    * per-example loss): rows batch with LIKE-LENGTH rows so the per-batch
    * pad-to-max waste stays small. The measurement IS the operator's
    * output: every row gets its (bucket, batch, batch_max, pad), so
    * "bucketed batching saves X% padding vs arrival order" is a single
    * aggregate downstream.
    *
    * Deterministic, oracle-replayable bucketing WITHOUT a global sort:
    * bucket edges derive from the LENGTH HISTOGRAM (a ≤|distinct lengths|
    * table — the only thing the corpus-wide prefix sum runs over), not
    * from per-row ranks: a row of length L lands in bucket
    * min(nBuckets−1, cumBefore(L)·nBuckets div n) where cumBefore is the
    * count of strictly-shorter rows. Equal lengths always share a bucket
    * (bucket sizes wobble under skew — the price of exactness). Within a
    * bucket, rows order by (length, id) and cut into fixed `batchSize`
    * batches; `batch_max` and `pad = batch_max − len` follow.
    *
    * Plan shape: one corpus scan into the histogram aggregate; the
    * histogram (broadcast) joins back for assignment; the batching
    * windows partition by bucket — like [[packByBudget]]'s stream key,
    * pick nBuckets at least the cluster parallelism at scale. `idCol`
    * must be unique (window tie-break).
    */
  def lengthBuckets(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      nBuckets: Int,
      batchSize: Int,
  ): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    Seq("bucket", "batch", "batch_max", "pad", "__len", "__c", "__cumb", "__n", "__rn")
      .foreach(c => require(!df.columns.contains(c), s"input already has a '$c' column"))
    val L = col(lenCol).cast("long")
    // inline fail-loud on null lengths: a null histogram group would
    // inflate the edge denominator __n while the null-unsafe join back
    // silently dropped the rows — rows out < rows in with skewed edges.
    // The check rides the histogram scan (lazy, codegen'd, no extra scan).
    val lChecked = when(L.isNull, raise_error(format_string(
      s"'$lenCol' must be non-null for bucket edges to cover the corpus: " +
        "offending row id %s", col(idCol).cast("string"))))
      .otherwise(L)
    val hist = df.groupBy(lChecked.as("__len")).agg(count(lit(1)).as("__c"))
    // histogram-sized window: distinct lengths, never corpus rows
    val wLen = Window.orderBy(col("__len")).rowsBetween(Window.unboundedPreceding, -1)
    val edges = hist.withColumn("__cumb", coalesce(sum(col("__c")).over(wLen), lit(0L)))
    val total = hist.agg(sum(col("__c")).as("__n"))
    val wB     = Window.partitionBy(col("bucket")).orderBy(L, col(idCol))
    val wBatch = Window.partitionBy(col("bucket"), col("batch"))
    df
      .join(broadcast(edges.select(col("__len"), col("__cumb"))), L === col("__len"))
      .crossJoin(broadcast(total))
      .withColumn("bucket",
        least(lit(nBuckets - 1L), expr(s"__cumb * $nBuckets div __n")))
      .withColumn("__rn", row_number().over(wB))
      .withColumn("batch", expr(s"(__rn - 1) div $batchSize"))
      .withColumn("batch_max", max(L).over(wBatch))
      .withColumn("pad", col("batch_max") - L)
      .drop("__len", "__cumb", "__n", "__rn")
  }

  /** Per-shard manifest a trainer reads off [[packConcat]] output:
    * docs/tokens per shard and the number of FULL `seqLen` sequences (the
    * ragged tail is dropped, as in practice).
    */
  def shardManifest(packed: DataFrame, nTokensCol: String, seqLen: Int): DataFrame =
    packed
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(greatest(col(nTokensCol).cast("long"), lit(0L))).as("n_tokens"),
      )
      .withColumn("n_sequences", floor(col("n_tokens") / seqLen))
}
