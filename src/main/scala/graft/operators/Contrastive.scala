package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-pair mining over an embedding corpus — the data-prep
  * step for contrastive/metric-learning fine-tunes (SimCSE/E5-style): every
  * anchor needs a POSITIVE (a semantically-near neighbor) and one or more
  * NEGATIVES (verified-far samples), drawn reproducibly.
  *
  * Positives ride the banded sign-bit LSH near-dup machinery
  * ([[Dedup.embeddingNearDupPairs]]): candidate pairs at `posTau`, then ONE
  * struct-max aggregate picks each anchor's best partner (highest cosine,
  * ties → smallest partner id) — never a per-anchor window over the corpus.
  *
  * Negatives must NOT be nearest-neighbor mining (that would be hard-negative
  * search, a different budget); they need to be (a) reproducible, (b) spread
  * across the corpus, (c) verified far. The deterministic shard-rank pairing
  * does that relationally:
  *  - shard s = portableHash(id) mod nShards, rank r = row_number within the
  *    shard ordered by (hash, id) — a per-SHARD window, bounded n/nShards;
  *  - negative j for (s, r) is the row at (s+1+j mod nShards,
  *    r wrapped into the target shard's size) — an equi-join on
  *    (shard, rank), shard sizes broadcast;
  *  - the pair is kept only if cosine ≤ `negTau` (the verify leg, exact and
  *    candidates-only like the dedup family).
  *
  * Requires nNeg < nShards so a negative never lands in the anchor's own
  * shard (in particular never the anchor itself). Anchors without a
  * qualifying positive, or whose candidate negative fails the verify, drop
  * out of the respective legs — training consumers want clean pairs, not
  * placeholders.
  *
  * `nShards` defaults to 0 = **derived from a corpus count** so the
  * per-shard window sort stays bounded (~[[RowsPerShard]] rows per task)
  * at any corpus size — a fixed shard count would mean each of its window
  * tasks sorts corpus/nShards rows, a scale-killer at 100 TB. The count is
  * one cheap id-projection job; the derived value is a pure function of
  * the corpus size, so the draw stays reproducible run-to-run. Pass an
  * explicit nShards only to pin an oracle-replayable pairing.
  *
  * Output: (anchor_id, pos_id, pos_cos, neg_id, neg_cos), one row per
  * (anchor, negative).
  */
object Contrastive {

  /** Target rows per negative-mining shard: bounds the per-shard window
    * sort (1M rows ≈ tens of MB of (hash, id) keys — comfortable in one
    * task's sort buffer).
    */
  val RowsPerShard: Long = 1L << 20

  /** nShards for a corpus of `n` rows: ceil(n / RowsPerShard), floored so
    * nNeg < nShards always holds.
    */
  def deriveShards(n: Long, nNeg: Int): Int = {
    val byRows = (n + RowsPerShard - 1) / RowsPerShard
    math.max(nNeg + 1L, byRows).min(Int.MaxValue.toLong).toInt
  }

  def triplets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      posTau: Double,
      negTau: Double,
      nNeg: Int,
      dim: Int,
      numBits: Int = 32,
      bands: Int = 4,
      nShards: Int = 0,
  ): DataFrame = {
    require(nNeg >= 1, s"need nNeg >= 1: $nNeg")
    require(posTau > negTau, s"posTau must exceed negTau: $posTau vs $negTau")
    val nSh = if (nShards > 0) nShards else deriveShards(df.select(col(idCol)).count(), nNeg)
    require(nNeg < nSh, s"need nNeg < nShards: $nNeg vs $nSh")
    import graft.functions.VectorOps.asDouble

    // ---- positives: best LSH-verified partner per anchor ----
    val pairs = Dedup.embeddingNearDupPairs(df, idCol, vecCol, posTau, dim, numBits, bands)
      .select(col("id_a"), col("id_b"), col("cos"))
    val both = pairs.select(col("id_a").as("anchor_id"), col("id_b").as("pid"), col("cos"))
      .unionByName(pairs.select(col("id_b").as("anchor_id"), col("id_a").as("pid"), col("cos")))
    val positives = both
      .groupBy("anchor_id")
      .agg(max(struct(col("cos").as("c"), (-col("pid")).as("ni"))).as("__m"))
      .select(col("anchor_id"), (-col("__m.ni")).as("pos_id"), col("__m.c").as("pos_cos"))

    // ---- negatives: shard-rank pairing, cosine-verified far ----
    val base = df.select(
      col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("v"),
      (Sampling.portableHash(col(idCol)) % nSh).cast("int").as("shard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(Sampling.portableHash(col("id")), col("id"))
    // ranked feeds THREE consumers (shard sizes, the anchor fan-out, the
    // partner lookup) — without materialization the per-shard rank window
    // (a corpus shuffle) runs once per consumer. The cached unit is
    // (id, vec, shard, rank), the same frame all three need anyway; same
    // persist discipline as winnowOverlapPairs/pagerank.
    val ranked = base.withColumn("rank", row_number().over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes  = ranked.groupBy("shard").agg(count(lit(1)).cast("int").as("sz"))
    val wanted = ranked
      .select(col("id").as("anchor_id"), col("v").as("av"), col("shard"), col("rank"),
        explode(sequence(lit(1), lit(nNeg))).as("j"))
      .withColumn("tgt_shard", pmod(col("shard") + col("j"), lit(nSh)).cast("int"))
      .join(broadcast(sizes.select(col("shard").as("tgt_shard"), col("sz"))), Seq("tgt_shard"))
      .withColumn("tgt_rank", pmod(col("rank") - 1, col("sz")).cast("int") + 1)
    val partner = ranked.select(
      col("shard").as("tgt_shard"), col("rank").as("tgt_rank"),
      col("id").as("neg_id"), col("v").as("nv"))
    val negatives = wanted
      .join(partner, Seq("tgt_shard", "tgt_rank"))
      .withColumn("neg_cos", graft.functions.VectorExpressions.cosineFast(col("av"), col("nv")))
      .where(col("neg_cos") <= negTau)
      .select(col("anchor_id"), col("neg_id"), col("neg_cos"))

    positives.join(negatives, Seq("anchor_id"))
      .select("anchor_id", "pos_id", "pos_cos", "neg_id", "neg_cos")
  }
}
