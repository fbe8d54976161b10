package graft.operators

import graft.functions.VectorOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Filtered cosine top-k — the reference's core query operator
  * (reference: backend/vector_db.py:131-183; backend/main.py:185-230).
  *
  * Exact form: broadcast the query vector as a literal, score every row with
  * the codegen'd cosine expression, then `orderBy(desc).limit(k)` which
  * Catalyst plans as `TakeOrderedAndProject` — a single scan-side top-k per
  * partition + driver merge, no full sort, no shuffle of the corpus. Filters
  * are plain `where` clauses so they push down to the parquet scan.
  *
  * Scale path (100 TB): [[IvfIndex]] prunes partitions by coarse centroid
  * before the exact scan; exact scoring then touches only nProbe/nList of
  * the data.
  */
object Search {

  /** Score + filter + top-k. Ties broken by `idCol` for determinism. */
  def topK(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int,
      filters: Seq[Column] = Nil,
  ): DataFrame = {
    val q      = typedLit(queryVec)
    val scored = corpus
      .withColumn("score", cosine(asDouble(col(vecCol)), q))
    filters
      .foldLeft(scored)((df, f) => df.where(f))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Brute-force k-NN join: top-k corpus neighbors for EVERY query row.
    * Queries are broadcast (small side); ranking is a per-query-partition
    * window — the corpus is never shuffled by more than the window's
    * partitionBy on query id.
    */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      queryVecCol: String,
      queryIdCol: String,
      corpusVecCol: String,
      corpusIdCol: String,
      k: Int,
      excludeSelf: Boolean = true,
  ): DataFrame = {
    val q = queries.select(
      col(queryIdCol).as("query_id"),
      asDouble(col(queryVecCol)).as("__qv"),
    )
    val c = corpus.select(
      col(corpusIdCol).as("neighbor_id"),
      asDouble(col(corpusVecCol)).as("__cv"),
    )
    val crossed = c
      .join(broadcast(q), if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("score", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col("neighbor_id"))
    crossed
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Search-result formatting (reference: backend/vector_db.py:172-180):
    * hit → {id, score, payload columns}.
    */
  def formatHits(hits: DataFrame, idCol: String, payloadCols: Seq[String]): DataFrame =
    hits.select((col(idCol) +: col("score") +: payloadCols.map(col)): _*)
}
