package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-handling utilities. AQE re-plans skewed shuffle joins at runtime,
  * but a hot GROUP BY key still lands on one reducer; the classic fix is
  * two-stage salted aggregation: shard each key across `saltBuckets`
  * partial groups, then merge the partials. Works for any algebraic
  * aggregate (sum/count/min/max — pass the merge form).
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 groups on (key, salt) — spreading
    * a hot key over `saltBuckets` reducers — stage 2 merges partials per
    * key. `partials` aggregate raw rows; `merges` combine partial columns
    * (e.g. partial `count` merges with `sum`).
    */
  def saltedAggregate(
      df: DataFrame,
      keyCol: String,
      saltBuckets: Int,
      partials: Seq[Column],
      merges: Seq[Column],
  ): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(keyCol))
      .agg(merges.head, merges.tail: _*)
}
