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
    *  - doc length = codegen'd token count expression — no explode for dl;
    *  - the exploded token stream is FILTERED to the query's terms before
    *    any shuffle, so the (doc, term) tf agg moves |terms|-bounded rows,
    *    not the corpus's token stream;
    *  - df_t and (N, avgdl) are tiny aggregates broadcast back.
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative Robertson
    * variant); score = Σ_t idf_t · tf/(tf + k1·(1 − b + b·dl/avgdl)).
    */
  def bm25(
      df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
  ): DataFrame = {
    require(terms.nonEmpty, "terms must not be empty")
    require(terms.toSet.size == terms.size, s"duplicate query terms in $terms")
    val toks = graft.functions.TextOps.tokens(col(textCol))
    // per-doc length + global stats (one row, broadcast via crossJoin)
    val lens  = df.select(col(idCol), size(toks).cast("double").as("__dl"))
    val stats = lens.agg(
      count(lit(1)).cast("double").as("__n"), avg(col("__dl")).as("__avgdl"))
    // token stream filtered to query terms BEFORE the shuffle
    val hits = df
      .select(col(idCol), explode(toks).as("__t"))
      .where(col("__t").isin(terms: _*))
    val tf = hits.groupBy(col(idCol), col("__t")).agg(count(lit(1)).cast("double").as("__tf"))
    val dfT = tf.groupBy(col("__t")).agg(count(lit(1)).cast("double").as("__df"))
    tf
      .join(broadcast(dfT), "__t")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__idf", log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("__tf") /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("__s")).as("score"))
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
}
