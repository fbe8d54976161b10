package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Mergeable distinct-count sketches — the incremental-analytics primitive
  * a 100 TB corpus registry needs (reference keeps exact per-collection
  * counters, backend/main.py registry stats; exact re-counts don't survive
  * scale when the question spans buckets).
  *
  * The pattern: sketch ONCE per fine bucket (ingest batch, day, shard) at
  * write time — a map-side-combined aggregation over each batch only — then
  * answer any coarser distinct question by UNIONING the per-bucket sketches:
  * no raw-data rescan, ever. Sketches are Apache DataSketches HLL binaries
  * (Spark's `hll_sketch_agg` / `hll_union_agg`), a few KB each regardless of
  * cardinality, so the sketch table is registry-sized while the raw table is
  * corpus-sized. Standard error at the default lgK=12 is ~1.6%.
  */
object Sketches {

  /** Per-bucket sketch table: one row per `keyCols` group carrying a
    * mergeable HLL sketch of `valueCol`'s distinct values (plus the group's
    * row count — it rides along for free). Append one batch's sketches per
    * ingest; never rebuild old buckets.
    */
  def distinctSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12,
  ): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    df.where(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(valueCol), lgK).as("sketch"),
        count(lit(1)).as("n_rows"),
      )
  }

  /** Roll a sketch table up to a coarser grouping by unioning sketches —
    * the shuffle moves KB-sized sketch rows, not raw data. `groupCols` must
    * be a subset of the sketch table's key columns.
    */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"),
        sum(col("n_rows")).as("n_rows"),
      )
  }

  /** Per-bucket QUANTILE sketch table (DataSketches KLL,
    * [[graft.functions.KllSketchAgg]]) — same incremental pattern as
    * [[distinctSketches]], for the other question a registry answers:
    * distribution shape (p50/p90/p99 of doc length, score, latency) across
    * any bucket combination, without rescanning raw data.
    */
  def quantileSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Int = 200,
  ): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val kll = graft.functions.KllSketchAgg.sketchUdaf(k)
    df.where(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .groupBy(keyCols.map(col): _*)
      .agg(
        kll(col(valueCol).cast("double")).as("sketch"),
        count(lit(1)).as("n_rows"),
      )
  }

  /** Roll a quantile-sketch table up and extract quantiles `qs` (INCLUSIVE
    * rank). Output: groupCols + `approx_q` (array aligned with `qs`) +
    * `n_rows`. The extraction UDF touches one merged KB-row per group.
    */
  def mergeQuantileSketches(
      sketches: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double],
      k: Int = 200,
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"ranks must be in [0,1]: $qs")
    val union   = graft.functions.KllSketchAgg.unionUdaf(k)
    val extract = udf((b: Array[Byte]) => qs.map(q => graft.functions.KllSketchAgg.quantile(b, q)))
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(union(col("sketch")).as("__merged"), sum(col("n_rows")).as("n_rows"))
      .withColumn("approx_q", extract(col("__merged")))
      .drop("__merged")
  }
}
