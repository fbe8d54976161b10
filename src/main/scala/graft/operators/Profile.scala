package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Table profiling: per-column counts, null counts, distinct counts and
  * min/max in ONE aggregation pass over the table, unpivoted to one row per
  * column — the audit a pipeline runs before pointing a 100 TB job at a new
  * dataset (schema drift, null explosions, key-cardinality sanity).
  *
  * The profile is a single `agg()` so the table is scanned once; Catalyst
  * computes every column's aggregates in the same partial+final pass.
  * `exactNdv = false` (the scale default) uses HLL sketches for distinct
  * counts — the pass stays one shuffle of one partial row per partition no
  * matter how many columns. `exactNdv = true` (verification grade) runs ONE
  * extra standard two-stage distinct aggregation per column and broadcast-
  * joins the results in. Deliberately NOT multiple `countDistinct`s inside
  * the single agg: string min/max make the buffer variable-width, so
  * Catalyst's multi-distinct Expand falls back to SortAggregate and sorts
  * rows×columns expanded rows — measured 6 s vs <1 s at 600k rows.
  */
object Profile {
  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String],
      exactNdv: Boolean = false,
  ): DataFrame = {
    val all = numericCols ++ stringCols
    require(all.nonEmpty, "profile needs at least one column")
    require(all.distinct == all, "duplicate columns in profile spec")
    // the HLL leg is built ONLY in sketch mode: a stack() generator's input
    // expressions are not prunable, so an always-present approx column
    // would be computed across the whole scan and discarded in exact mode
    val ndvAgg: String => Seq[org.apache.spark.sql.Column] =
      if (exactNdv) _ => Seq.empty
      else c => Seq(approx_count_distinct(col(c)).as(s"${c}__ndv"))
    val aggs = all.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"), // count(col) skips NULLs
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
      ) ++ ndvAgg(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // names are interpolated into stack() SQL — escape them so a backtick
    // or quote in a (legal) column name can't break or reshape the unpivot
    def qid(n: String)  = "`" + n.replace("`", "``") + "`"
    def slit(n: String) = "'" + n.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def ndvLeg(c: String) = if (exactNdv) "CAST(NULL AS BIGINT)" else qid(s"${c}__ndv")
    val legs =
      numericCols.map(c =>
        s"${slit(c)}, ${qid(s"${c}__n")}, ${qid(s"${c}__nulls")}, ${ndvLeg(c)}, CAST(${qid(s"${c}__min")} AS DOUBLE), CAST(${qid(s"${c}__max")} AS DOUBLE), CAST(NULL AS STRING), CAST(NULL AS STRING)") ++
      stringCols.map(c =>
        s"${slit(c)}, ${qid(s"${c}__n")}, ${qid(s"${c}__nulls")}, ${ndvLeg(c)}, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(${qid(s"${c}__min")} AS STRING), CAST(${qid(s"${c}__max")} AS STRING)")
    val stacked = row.select(expr(
      s"stack(${all.size}, ${legs.mkString(", ")}) AS (col_name, n, n_nulls, ndv, min_num, max_num, min_str, max_str)"))
    if (!exactNdv) stacked
    else {
      val exacts = all.map(c =>
        df.agg(countDistinct(col(c)).as("ndv")).select(lit(c).as("col_name"), col("ndv")))
        .reduce(_ unionByName _)
      stacked.drop("ndv").join(broadcast(exacts), Seq("col_name"))
        .select("col_name", "n", "n_nulls", "ndv", "min_num", "max_num", "min_str", "max_str")
    }
  }

  /** Snapshot-to-snapshot drift report — the check a pipeline runs when a
    * new data DROP arrives: join two [[profile]] outputs by column and
    * flag what moved. Per column: presence (`added`/`removed`/`present`),
    * null-rate shift beyond `maxNullRateShift`, exact-NDV ratio outside
    * [1/maxNdvRatio, maxNdvRatio], and numeric range EXPANSION (a new min
    * below or max above the before-range — values the downstream job has
    * never seen). `drifted` ORs them; the inputs are ≤|columns|-row
    * profile tables, so the whole report is a broadcast-sized join —
    * the corpus cost was already paid by the two profile scans.
    *
    * Use `exactNdv = true` profiles when the NDV leg must be
    * deterministic (sketch NDV estimates can wobble across runs).
    */
  def drift(
      before: DataFrame,
      after: DataFrame,
      maxNullRateShift: Double = 0.05,
      maxNdvRatio: Double = 2.0,
  ): DataFrame = {
    require(maxNullRateShift >= 0.0 && maxNullRateShift <= 1.0,
      s"maxNullRateShift must be in [0,1]: $maxNullRateShift")
    require(maxNdvRatio >= 1.0, s"maxNdvRatio must be >= 1: $maxNdvRatio")
    def pick(df: DataFrame, suffix: String) = df.select(
      col("col_name"),
      ((col("n_nulls").cast("double")) /
        greatest(col("n") + col("n_nulls"), lit(1L))).as(s"null_rate$suffix"),
      col("ndv").cast("double").as(s"ndv$suffix"),
      col("min_num").as(s"min_num$suffix"),
      col("max_num").as(s"max_num$suffix"),
      lit(true).as(s"present$suffix"))
    val j = pick(before, "_before").join(pick(after, "_after"), Seq("col_name"), "full_outer")
    val status = when(coalesce(col("present_before"), lit(false)) &&
      coalesce(col("present_after"), lit(false)), "present")
      .when(coalesce(col("present_after"), lit(false)), "added")
      .otherwise("removed")
    val nullShift = abs(coalesce(col("null_rate_after"), lit(0.0))
      - coalesce(col("null_rate_before"), lit(0.0)))
    val ndvRatio = col("ndv_after") / col("ndv_before") // null when either side lacks NDV
    val ndvDrift = coalesce(
      ndvRatio > maxNdvRatio || ndvRatio < 1.0 / maxNdvRatio, lit(false))
    val rangeExpanded = coalesce(
      col("min_num_after") < col("min_num_before") ||
        col("max_num_after") > col("max_num_before"), lit(false))
    j.select(
      col("col_name"),
      status.as("status"),
      round(nullShift, 6).as("null_rate_shift"),
      (nullShift > maxNullRateShift).as("null_drift"),
      round(ndvRatio, 6).as("ndv_ratio"),
      ndvDrift.as("ndv_drift"),
      rangeExpanded.as("range_expanded"),
      (status =!= "present" || nullShift > maxNullRateShift
        || ndvDrift || rangeExpanded).as("drifted"))
  }
}
