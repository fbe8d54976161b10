package graft.streaming

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live corpus-quality rollup — the monitoring face of the x3 quality
  * features (SURVEY §2.11 extension): per group (source, shard, crawl
  * snapshot, …) the doc count, mean quality score, and the short/empty
  * tallies an ingestion pipeline alerts on when a feed goes bad (a
  * scraper shipping boilerplate shows up as a mean-quality cliff and a
  * `n_short` spike long before a human reads the data).
  *
  * The same declarative aggregation runs in batch and under
  * `readStream` (update/complete mode): per-doc features are pure
  * projections ([[TextOps.qualityFeatures]]), the rollup is one
  * partial+final aggregate keyed by the group — streaming state is one
  * row per group, never per document.
  *
  * Parity discipline: the mean is integer-scaled (`sum of round(score
  * ·10⁴)` DIV n) — double sums depend on reduction order across
  * partitions/batches, the integer form cannot (the sliding-window
  * `avg_value_e4` rule).
  */
object QualityMonitor {

  def monitor(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    Seq("__toks", "__q_e4").foreach(c =>
      require(!docs.columns.contains(c), s"input already has working column $c"))
    docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__q_e4",
        round(TextOps.qualityFeatures(col(textCol), col("__toks")).getField("quality_score") * 10000, 0)
          .cast("long"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__q_e4")).as("q_sum_e4"),
        count(when(size(col("__toks")) < 20, 1)).as("n_short"),
        count(when(size(col("__toks")) === 0, 1)).as("n_empty"),
      )
      .withColumn("mean_quality_e4", expr("q_sum_e4 DIV n_docs"))
      .drop("q_sum_e4")
  }
}
