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
}
