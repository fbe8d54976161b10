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

  /** Per-bucket theta SET sketch table ([[graft.functions.ThetaSketchAgg]]):
    * like [[distinctSketches]] but the binaries support set ALGEBRA —
    * union, intersection, difference of distinct sets across slices. Below
    * 2^lgK distinct values a theta sketch is exact.
    */
  def setSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12,
  ): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val theta = graft.functions.ThetaSketchAgg.sketchUdaf(lgK)
    df.where(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        theta(col(valueCol).cast("string")).as("sketch"),
        count(lit(1)).as("n_rows"),
      )
  }

  /** Pairwise slice overlap from a set-sketch table: roll buckets up to
    * `sliceCol`, then estimate |A ∩ B| and |A ∪ B| for every unordered
    * slice pair — set algebra over KB binaries, the raw table untouched.
    * Output: (slice_a, slice_b, distinct_a, distinct_b, overlap, union).
    */
  def sliceOverlap(sketches: DataFrame, sliceCol: String, lgK: Int = 12): DataFrame = {
    val union = graft.functions.ThetaSketchAgg.unionUdaf(lgK)
    val inter = udf((a: Array[Byte], b: Array[Byte]) =>
      graft.functions.ThetaSketchAgg.intersectionEstimate(a, b))
    val est = udf((a: Array[Byte]) => graft.functions.ThetaSketchAgg.estimate(a))
    val merged = sketches
      .groupBy(col(sliceCol))
      .agg(union(col("sketch")).as("sketch"))
    val a = merged.select(col(sliceCol).as("slice_a"), col("sketch").as("__ska"))
    val b = merged.select(col(sliceCol).as("slice_b"), col("sketch").as("__skb"))
    a.join(b, col("slice_a") < col("slice_b"))
      .select(
        col("slice_a"), col("slice_b"),
        est(col("__ska")).as("distinct_a"),
        est(col("__skb")).as("distinct_b"),
        inter(col("__ska"), col("__skb")).as("overlap"),
        (est(col("__ska")) + est(col("__skb")) -
          inter(col("__ska"), col("__skb"))).as("union_est"),
      )
  }

  /** Heavy hitters with guaranteed bounds from per-bucket frequent-items
    * sketches ([[graft.functions.FreqItemsAgg]]): union the buckets, then
    * surface every item whose count COULD reach `thresholdExpr`
    * (NO_FALSE_NEGATIVES — an item with true count ≥ threshold is NEVER
    * missed, the property a sampled groupBy cannot give). Output: one row
    * per surfaced item with (item, estimate, lower, upper).
    */
  def heavyHitters(
      sketches: DataFrame,
      thresholdDf: DataFrame,
      maxMapSize: Int = 1024,
  ): DataFrame = {
    require(thresholdDf.columns.length == 1, "thresholdDf must have exactly one column")
    val union = graft.functions.FreqItemsAgg.unionUdaf(maxMapSize)
    val items = udf((b: Array[Byte], thr: Long) =>
      graft.functions.FreqItemsAgg.frequentItems(b, thr)
        .map { case (i, e, lo, hi) => (i, e, lo, hi) })
    val thr = thresholdDf.select(col(thresholdDf.columns.head).cast("long").as("__thr"))
    sketches
      .agg(union(col("sketch")).as("__merged"))
      .crossJoin(thr) // both sides are single rows
      .select(explode(items(col("__merged"), col("__thr"))).as("__f"))
      .select(
        col("__f._1").as("item"),
        col("__f._2").as("estimate"),
        col("__f._3").as("lower"),
        col("__f._4").as("upper"),
      )
  }

  /** Per-bucket frequent-items sketch table over `valueCol` strings. */
  def freqSketches(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      maxMapSize: Int = 1024,
  ): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val fi = graft.functions.FreqItemsAgg.sketchUdaf(maxMapSize)
    df.where(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        fi(col(valueCol).cast("string")).as("sketch"),
        count(lit(1)).as("n_rows"),
      )
  }
}
