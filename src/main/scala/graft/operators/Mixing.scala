package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Corpus mixing: resample each class (source/domain/language) to a target
  * share of a global size budget — the step that turns N crawled corpora
  * with arbitrary sizes into ONE training mix with chosen proportions
  * (the "data mixing" table every LLM data paper publishes; the reference
  * has no analog — this is a beyond-reference training-pipeline operator).
  *
  * Semantics, all integer arithmetic so an independent SQL oracle can replay
  * the exact assignment:
  *   - target tokens per class: T_c = floor(budget · w_c / 10000)
  *     (weights in basis points, like [[Sampling]]);
  *   - available tokens: A_c = Σ sizeCol over the class;
  *   - keep-fraction in bp: f_c = floor(T_c · 10000 / A_c) — may exceed
  *     10000, which means UPSAMPLING by repetition (epochs over the class,
  *     the standard fix for small high-quality corpora);
  *   - a row is emitted with `epoch` = 0 .. floor(f_c/10000), where every
  *     full epoch keeps all rows and the final fractional epoch keeps rows
  *     with hash-bucket < f_c mod 10000 ([[Sampling.bucket]] — the same
  *     portable hash as the samplers, so the subset is deterministic and
  *     engine-checkable). Classes not in `targetsBp` are dropped.
  *
  * Scale shape: per-class totals are ONE map-side-combined groupBy whose
  * result has |classes| rows; that tiny frame joins back broadcast (no
  * shuffle of the corpus); the epoch generator is an explode whose
  * multiplicity is exactly the intended repetition; the fractional filter
  * is a pure projection. The corpus is read once and never shuffled.
  */
object Mixing {

  /** Mix `df` to `targetsBp` shares of `budget` total size. Returns the
    * input columns plus `epoch` (0-based copy index, long). Deterministic:
    * the same row lands in the same epochs on every run and engine.
    *
    * @param sizeCol per-row size in the budget's unit (tokens, chars, bytes)
    * @param targetsBp (class value, weight in basis points); weights need
    *                  not sum to 10000 — they are shares of `budget`, and a
    *                  short sum simply uses less than the whole budget
    */
  def mixToBudget(
      df: DataFrame, classCol: String, idCol: String, sizeCol: String,
      targetsBp: Seq[(String, Int)], budget: Long,
      maxEpochs: Int = 100,
  ): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    require(targetsBp.nonEmpty, "targetsBp must not be empty")
    require(targetsBp.forall(_._2 >= 0), s"negative weight in $targetsBp")
    require(budget >= 0, s"budget must be nonnegative: $budget")
    // binding intermediate is budget·w (T_c·10000 ≤ budget·w by construction)
    require(
      targetsBp.forall(t => t._2 == 0 || budget <= Long.MaxValue / t._2),
      s"budget * weight must fit in a long (budget=$budget)")
    require(
      targetsBp.map(_._1).distinct.size == targetsBp.size,
      s"duplicate class in $targetsBp")
    val names = df.columns.toSet
    Seq("__wbp", "__avail", "__fbp", "__full", "epoch").foreach(c =>
      require(!names.contains(c), s"input already has a '$c' column"))

    val spark = df.sparkSession
    import spark.implicits._
    val targets = targetsBp.toDF(classCol, "__wbp")

    // |classes| rows after a map-side-combined agg; stays broadcast-sized
    // by construction (one row per mixed class). All divisions are
    // INTEGRAL (`div`): a `/` would go through double, whose 53-bit
    // mantissa silently mis-floors once budget·10000 passes ~9e15 —
    // i.e. exactly at the corpus sizes this operator exists for.
    val totals = df
      .join(broadcast(targets), classCol)
      .groupBy(classCol)
      .agg(sum(col(sizeCol)).cast("long").as("__avail"), first("__wbp").as("__wbp"))
      .where(col("__avail") > 0L)
      // f_c = floor( floor(budget·w/10000) · 10000 / A_c )
      .select(
        col(classCol),
        expr(s"(((${budget}L * __wbp) div 10000) * 10000) div __avail").as("__fbp"))
      // fail FAST on the |classes|-row frame if a tiny class would need
      // more than maxEpochs repetitions: without this, explode(sequence)
      // materializes a __full-element array PER ROW before any filter —
      // a mis-sized budget against a 10k-token class would OOM executors
      // instead of erroring. (Epoch counts beyond a few dozen are also
      // statistically useless — repetition stops helping long before.)
      .select(
        col(classCol),
        when(col("__fbp") >= lit(maxEpochs * 10000L),
          raise_error(concat(
            lit(s"mixToBudget: class "), col(classCol),
            lit(s" needs more than maxEpochs=$maxEpochs upsampling epochs "),
            lit("(fbp="), col("__fbp").cast("string"),
            lit(s"); shrink the budget/weight or raise maxEpochs"))))
          .otherwise(col("__fbp")).as("__fbp"))

    df.join(broadcast(totals), classCol)
      .withColumn("__full", expr("__fbp div 10000"))
      .withColumn("epoch", explode(sequence(lit(0L), col("__full"))))
      .where(
        col("epoch") < col("__full") ||
          Sampling.bucket(col(idCol)) < col("__fbp") % 10000L)
      .drop("__fbp", "__full")
  }
}
