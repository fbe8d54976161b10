package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("packs"), the step between a cleaned corpus and a training
  * run — context windows are filled with whole documents until the budget
  * is spent, then the next pack starts.
  *
  * Packing is inherently sequential (each pack depends on everything packed
  * before it), so the scalable formulation fixes a deterministic document
  * order and derives the assignment from an exclusive running token sum:
  * pack_id = floor(prefix_tokens / budget). A document whose tokens straddle
  * a boundary stays in the pack where it started — greedy-with-overflow, a
  * pack may exceed the budget by at most one document's tail (trainers
  * truncate or roll the remainder; bit-exact first-fit would serialize the
  * whole stream through one task and still not match what streaming packers
  * do in practice). The closed-form assignment is what makes the operator
  * both distributed (one window shuffle per stream) and independently
  * verifiable by a SQL oracle.
  *
  * `idCol` must be UNIQUE within each stream: the prefix sum orders by it
  * with a ROWS frame, so duplicate ids near a pack boundary would make the
  * assignment depend on shuffle arrival order.
  *
  * `streamCol` shards the running sum: packs form per stream (per language,
  * per shard, per source), so the window is `partitionBy(stream)` and no
  * single task sees the whole corpus. At 100 TB pick a stream key with
  * enough cardinality for the cluster — a single global stream funnels the
  * prefix sum through one partition by definition.
  */
object Packing {
  def packByBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      streamCol: String,
  ): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prefix", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__prefix div ${budget}L"))
      .drop("__prefix")
  }
}
