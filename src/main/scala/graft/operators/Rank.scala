package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Lexical ranking and hybrid fusion — the keyword half of hybrid search.
  *
  * The reference ranks purely by embedding cosine (Qdrant HNSW); pairing a
  * lexical BM25 leg with the vector leg and fusing by reciprocal rank is
  * the standard hybrid-retrieval upgrade (and what most production KBs
  * ship). Both operators are plain relational plans, so they hold at
  * corpus scale: nothing driver-side, no per-row UDFs.
  */
object Rank {

  /** Okapi BM25 scores for one query over a document table. Returns
    * (idCol, score) for every document containing ≥1 query term.
    *
    * Plan shape (all map-side-combinable, query-term frames broadcast):
    *  - the exploded token stream is FILTERED to the query's terms before
    *    any shuffle, so the (doc, term) tf agg moves |terms|-bounded rows,
    *    not the corpus's token stream;
    *  - the doc length rides the filtered stream (size over the same
    *    materialized token array) — there is NO corpus-wide (id, dl)
    *    table and no join back to it: every exchange moves
    *    |matching docs| rows, not |corpus|;
    *  - df_t and (N, avgdl) are tiny aggregates broadcast back.
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative Robertson
    * variant); score = Σ_t idf_t · tf/(tf + k1·(1 − b + b·dl/avgdl)).
    */
  def bm25(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
  ): DataFrame = {
    require(terms.toSet.size == terms.size, s"duplicate query terms in $terms")
    bm25Weighted(df, idCol, textCol, terms.map(_ -> 1.0), k1, b)
  }

  /** BM25 with a per-term weight multiplier: score = Σ_t w_t · bm25_t(d).
    * With all weights 1.0 this IS [[bm25]] (×1.0 is an IEEE no-op, so the
    * delegation is bit-exact). The weighted form is the primitive RM3
    * query expansion composes: original terms carry λ/|Q|, expansion terms
    * carry (1−λ)·P(t|R). Same plan shape as [[bm25]] — the (term, weight)
    * table is broadcast, the corpus token stream is filtered to the query
    * terms before any shuffle.
    */
  def bm25Weighted(
      df: DataFrame, idCol: String, textCol: String, termWeights: Seq[(String, Double)],
      k1: Double = 1.2, b: Double = 0.75,
  ): DataFrame = {
    require(termWeights.nonEmpty, "terms must not be empty")
    require(termWeights.map(_._1).toSet.size == termWeights.size,
      s"duplicate query terms in ${termWeights.map(_._1)}")
    require(termWeights.size <= 1024, s"query term list is broadcast — capped at 1024")
    val spark = df.sparkSession
    import spark.implicits._
    val terms = termWeights.map(_._1)
    val wTab  = termWeights.toDF("__t", "__w")
    val toks = graft.functions.TextOps.tokens(col(textCol))
    // global stats (one row, broadcast via crossJoin) — a map-side
    // aggregate over one corpus scan, never a shuffle
    val stats = df.select(size(toks).cast("double").as("__dl")).agg(
      count(lit(1)).cast("double").as("__n"), avg(col("__dl")).as("__avgdl"))
    // token stream filtered to query terms BEFORE the shuffle; the doc
    // length RIDES the exploded stream (size over the same materialized
    // token array), so no corpus-wide (id, dl) table ever joins back —
    // every exchange below moves |matching docs| rows, not |corpus|
    val hits = df
      .select(col(idCol), toks.as("__tk"))
      .select(col(idCol), size(col("__tk")).cast("double").as("__dl"),
        explode(col("__tk")).as("__t"))
      .where(col("__t").isin(terms: _*))
    val tf = hits.groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"), max(col("__dl")).as("__dl"))
    val dfT = tf.groupBy(col("__t")).agg(count(lit(1)).cast("double").as("__df"))
    tf
      .join(broadcast(dfT), "__t")
      .join(broadcast(wTab), "__t")
      .crossJoin(broadcast(stats))
      .withColumn("__idf", log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__w") * (col("__idf") * col("__tf") /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))))
      .groupBy(col(idCol))
      .agg(sum(col("__s")).as("score"))
  }

  /** Pseudo-relevance-feedback expansion terms (the relevance-model half of
    * RM3, Lavrenko & Croft SIGIR'01 / the Anserini default): take the
    * first-pass BM25 top-`fbDocs`, weight every non-query term by
    * `Σ_d tf(t,d) · s4_d` where `s4_d` is the doc's first-pass score scaled
    * to an INTEGER (round(score·10⁴)) — so the weight is integer-exact and
    * the top-`fbTerms` cut (weight desc, term asc) is bit-deterministic in
    * any engine, with no float-sum-order ambiguity. (Classic RM3 divides by
    * doc length; the tf·score form keeps the same "frequent in highly
    * ranked docs" signal while staying exactly replayable — a declared
    * deviation.)
    *
    * Scale shape: first pass is [[bm25]] + TakeOrderedAndProject; the
    * feedback-doc token explode is gated by a BROADCAST semi-join on the
    * ≤ `fbDocs` winners, so the corpus is scanned, never shuffled; the
    * weight agg moves (term, tf·s4) rows for `fbDocs` documents only.
    *
    * Returns (term, w: long), the `fbTerms` selected expansion terms.
    */
  def prfExpansionTerms(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      fbDocs: Int = 10, fbTerms: Int = 8,
      k1: Double = 1.2, b: Double = 0.75,
  ): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1, s"fbDocs ($fbDocs) and fbTerms ($fbTerms) must be >= 1")
    val first = bm25(df, idCol, textCol, terms, k1, b)
      .select(col(idCol), round(col("score"), 4).as("__sc"))
      .orderBy(col("__sc").desc, col(idCol))
      .limit(fbDocs)
      .select(col(idCol), round(col("__sc") * 10000).cast("long").as("__s4"))
    val toks = graft.functions.TextOps.tokens(col(textCol))
    df.join(broadcast(first), idCol) // BEFORE the explode: only the ≤fbDocs winners tokenize
      .select(col("__s4"), explode(toks).as("__t"))
      .where(!col("__t").isin(terms: _*))
      .groupBy(col("__t"))
      .agg(sum(col("__s4")).as("w")) // Σ_d tf·s4 ≡ summing s4 once per occurrence
      .orderBy(col("w").desc, col("__t"))
      .limit(fbTerms)
      .select(col("__t").as("term"), col("w"))
  }

  /** Full RM3 retrieval: first-pass BM25 → [[prfExpansionTerms]] →
    * second-pass [[bm25Weighted]] with the interpolated query model
    * (original terms λ/|Q| each; expansion term t gets (1−λ)·w_t/Σw, the
    * Σw an exact integer sum). The expansion table is ≤ `fbTerms` rows —
    * collected (bounded, documented) to drive the second broadcast pass.
    * Returns (idCol, score) over the full corpus, unrounded.
    */
  def bm25Rm3(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      fbDocs: Int = 10, fbTerms: Int = 8, lambda: Double = 0.5,
      k1: Double = 1.2, b: Double = 0.75,
  ): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    require(fbTerms <= 256, s"expansion terms are collected + broadcast — capped at 256, got $fbTerms")
    // bounded collect: ≤ fbTerms rows
    val exp = prfExpansionTerms(df, idCol, textCol, terms, fbDocs, fbTerms, k1, b)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val z = exp.map(_._2).sum.toDouble
    val qw = terms.map(_ -> lambda / terms.size)
    val ew = if (z > 0) exp.toSeq.map { case (t, w) => t -> (1.0 - lambda) * (w / z) } else Nil
    // λ=1 (or 0) zeroes a leg — drop its terms so a zero-weight match
    // can't surface rows the pure form would never return
    val weighted = (qw ++ ew).filter(_._2 != 0.0)
    // λ=0 with an empty feedback model (no query term matched any doc)
    // zeroes BOTH legs — name the degenerate configuration instead of
    // failing deep inside bm25Weighted with "terms must not be empty"
    require(weighted.nonEmpty,
      s"RM3 query model is empty: lambda=$lambda and no expansion terms were found " +
        "(first-pass BM25 matched nothing) — raise lambda or check the query terms")
    bm25Weighted(df, idCol, textCol, weighted, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09): fused(d) =
    * Σ_legs 1/(k + rank_leg(d)), documents absent from a leg contribute 0.
    * `legs` are (idCol, rank) frames with 1-based ranks — produced by any
    * ranking (BM25, cosine top-k). k=60 is the standard constant.
    *
    * A union + one map-side-combined agg: fusion cost is the sum of the
    * legs' result sizes (top-k lists, not corpora).
    */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, rankCol: String, k: Int = 60): DataFrame = {
    require(legs.nonEmpty, "need at least one ranking leg")
    require(k >= 0, s"k must be nonnegative: $k")
    legs
      .map(l => l.select(col(idCol), (lit(1.0) / (lit(k.toDouble) + col(rankCol))).as("__c")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf"))
  }

  /** Scores (query, document-text) PAIRS — the cross-encoder seam. The
    * recall stage hands a bounded candidate list to [[rerankTopKWith]];
    * implementations range from the deterministic token-overlap default
    * to a real ONNX cross-encoder (pair-encode `[CLS] q [SEP] d [SEP]`,
    * take the relevance head) — the same pluggable-model stance as
    * [[Embedder]].
    */
  trait PairScorer extends Serializable {
    def scoreBatch(query: String, texts: Seq[String]): Seq[Double]
  }

  /** Candidate-rerank retrieval — the two-stage shape production RAG
    * stacks run (recall with BM25/bi-encoder, precision with a stronger
    * pair scorer; Nogueira & Cho 2019). First pass: [[bm25]] top
    * `nCandidates` (TakeOrderedAndProject over the filtered token
    * stream); the ≤N candidate ids broadcast back to hydrate texts; the
    * rerank re-scores each candidate against the query and returns top-k
    * by (rerank_score, first_score, id).
    *
    * This default form scores with the DICE TOKEN OVERLAP
    * `2·|q ∩ d| / (|q| + |d|)` over distinct tokens — deterministic,
    * codegen'd ([[graft.functions.TextOps.tokens]] + array_intersect),
    * and exactly replayable by a SQL oracle. Model-backed scoring drops
    * into the same plan via [[rerankTopKWith]].
    *
    * Scale shape: stage 2 touches `nCandidates` rows, never the corpus —
    * the whole point of the two-stage split (a cross-encoder over the
    * corpus would be |corpus| forward passes).
    */
  def rerankTopK(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int, nCandidates: Int,
      k1: Double = 1.2, b: Double = 0.75,
  ): DataFrame = {
    val hydrated = rerankCandidates(df, idCol, textCol, terms, k, nCandidates, k1, b)
    val qd   = terms.distinct
    val toks = array_distinct(graft.functions.TextOps.tokens(col(textCol)))
    val dice = lit(2.0) * size(array_intersect(toks, typedLit(qd))) / (lit(qd.size) + size(toks))
    hydrated
      .select(col(idCol), col("__first").as("first_score"), round(dice, 4).as("rerank_score"))
      .orderBy(col("rerank_score").desc, col("first_score").desc, col(idCol))
      .limit(k)
  }

  /** [[rerankTopK]] with a pluggable [[PairScorer]] (e.g. an ONNX
    * cross-encoder): candidates hydrate, then score in `mapPartitions`
    * batches — the [[Embedder.embedText]] seam shape, so a JVM-loaded
    * model runs once per executor over ≤nCandidates rows. `idCol` must be
    * integral (the embed-seam convention).
    */
  def rerankTopKWith(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      query: String, scorer: PairScorer,
      k: Int, nCandidates: Int,
      k1: Double = 1.2, b: Double = 0.75,
      batchSize: Int = 64,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hydrated = rerankCandidates(df, idCol, textCol, terms, k, nCandidates, k1, b)
    val scored = hydrated
      .select(col(idCol).cast("long"), col("__first"), col(textCol).cast("string"))
      .as[(Long, Double, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val scores = scorer.scoreBatch(query, batch.map(_._3))
          batch.zip(scores).map { case ((id, first, _), s) => (id, first, s) }
        }
      }
      .toDF(idCol, "first_score", "rerank_score")
    scored
      .orderBy(col("rerank_score").desc, col("first_score").desc, col(idCol))
      .limit(k)
  }

  private def rerankCandidates(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int, nCandidates: Int, k1: Double, b: Double,
  ): DataFrame = {
    require(k >= 1 && nCandidates >= k, s"need nCandidates ($nCandidates) >= k ($k) >= 1")
    require(nCandidates <= 10000,
      s"stage 2 hydrates every candidate — bound it (got $nCandidates)")
    // first-pass scores round to 4 decimals BEFORE the cut so the
    // candidate set (and the tie-break order) replays exactly in a SQL
    // engine — the prfExpansionTerms discipline
    val cand = bm25(df, idCol, textCol, terms, k1, b)
      .select(col(idCol), round(col("score"), 4).as("__first"))
      .orderBy(col("__first").desc, col(idCol))
      .limit(nCandidates)
    df.select(col(idCol), col(textCol)).join(broadcast(cand), Seq(idCol))
  }
}
