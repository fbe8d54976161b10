package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Retrieval-quality evaluation — the trec_eval-style metrics a pipeline
  * that ships a retrieval stack (BM25 `v10`, hybrid RRF `v11`, the ANN
  * family, MMR/RM3/ColBERT rerankers) needs to CLOSE THE LOOP on: given a
  * run (per-query ranked candidate lists) and graded relevance judgments
  * (qrels), compute per-query recall@k, reciprocal rank and nDCG@k
  * (Järvelin & Kekäläinen 2002). The reference exposes search endpoints
  * but no quality harness (reference: backend/vector_db.py:84 returns raw
  * hits); at training-data scale, retrieval changes (a new index, a new
  * embedder, a quantization level) are only shippable against exactly
  * these numbers.
  *
  * Plan shape, built for |Q| in the millions: one broadcast-or-shuffle
  * join of the rank-capped run against qrels on (query, doc), one
  * group-by per side keyed on the query — no window over the corpus, no
  * collect. The qrels window (ideal-DCG ranking) partitions by query and
  * orders by grade, so its shuffle is qrels-sized, never corpus-sized.
  */
object Eval {

  /** Per-query metrics table: (queryCol, n_rel, recall_at_k, rr_at_k,
    * ndcg_at_k). Standard trec_eval conventions:
    *
    *  - only queries that HAVE at least one positively-graded judgment
    *    are evaluated (inner join — a query with no qrels has no defined
    *    recall/nDCG);
    *  - recall@k = |relevant ∩ top-k| / |relevant| (the full relevant
    *    count, not min(k, ·));
    *  - rr@k = 1/rank of the first relevant hit, 0 when the top-k holds
    *    none (MRR is the mean of this column);
    *  - nDCG@k with the exponential gain form (2^rel − 1)/log2(rank + 1),
    *    ideal DCG from the qrels' own top-k grades.
    *
    * `run` carries (queryCol, docCol, rankCol) with 1-based ranks;
    * `qrels` carries (queryCol, docCol, relCol) with grades ≥ 0 (grade-0
    * rows are tolerated and ignored). Duplicate (query, doc) judgments
    * are rejected — they would double-count gains.
    */
  def rankingMetrics(
      run: DataFrame,
      qrels: DataFrame,
      k: Int,
      queryCol: String = "query_id",
      docCol: String = "doc_id",
      rankCol: String = "rank",
      relCol: String = "rel",
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val reserved = Seq("n_rel", "recall_at_k", "rr_at_k", "ndcg_at_k",
      "__i", "__idcg", "__n_rel_ret", "__frr", "__dcg")
    for (c <- reserved; f <- Seq(run, qrels))
      require(!f.columns.contains(c), s"input already has a '$c' column")
    val dup = qrels.groupBy(col(queryCol), col(docCol)).count()
      .where(col("count") > 1).limit(1).count()
    require(dup == 0, s"duplicate ($queryCol, $docCol) judgments in qrels")
    // trec_eval treats a repeated doc inside one query's run as an error:
    // left unguarded it would double-count __n_rel_ret and __dcg (recall
    // could exceed 1). Guard the rank-capped slice — duplicates past k
    // can't affect any metric.
    val dupRun = run.where(col(rankCol) <= k)
      .groupBy(col(queryCol), col(docCol)).count()
      .where(col("count") > 1).limit(1).count()
    require(dupRun == 0, s"duplicate ($queryCol, $docCol) rows in run top-$k")

    val graded = qrels.where(col(relCol) > 0)
      .select(col(queryCol), col(docCol), col(relCol).cast("double").as(relCol))
    // ideal DCG: each query's own grades, best-first. Ties in grade are
    // rank-order-arbitrary but the DCG SUM is invariant under them.
    val byGrade = Window.partitionBy(col(queryCol)).orderBy(col(relCol).desc)
    val ideal = graded
      .withColumn("__i", row_number().over(byGrade))
      .groupBy(col(queryCol))
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__i") <= k,
          (pow(lit(2.0), col(relCol)) - 1.0) / log2(col("__i") + 1.0))).as("__idcg"))

    val hits = run
      .where(col(rankCol) <= k)
      .select(col(queryCol), col(docCol), col(rankCol).cast("long").as(rankCol))
      .join(graded, Seq(queryCol, docCol), "left")
      .withColumn(relCol, coalesce(col(relCol), lit(0.0)))
    val perQuery = hits
      .groupBy(col(queryCol))
      .agg(
        sum(when(col(relCol) > 0, 1L).otherwise(0L)).as("__n_rel_ret"),
        min(when(col(relCol) > 0, col(rankCol))).as("__frr"),
        sum((pow(lit(2.0), col(relCol)) - 1.0) / log2(col(rankCol) + 1.0)).as("__dcg"))

    // inner join: evaluated queries = those with judgments; a query whose
    // run returned nothing still shows up (zero metrics) via the right
    // side — hence the outer-coalesce on the run-derived columns
    ideal.join(perQuery, Seq(queryCol), "left")
      .select(
        col(queryCol),
        col("n_rel"),
        (coalesce(col("__n_rel_ret"), lit(0L)) / col("n_rel")).as("recall_at_k"),
        coalesce(lit(1.0) / col("__frr"), lit(0.0)).as("rr_at_k"),
        (coalesce(col("__dcg"), lit(0.0)) / col("__idcg")).as("ndcg_at_k"))
  }
}
