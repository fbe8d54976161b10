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
    // by construction (one row per mixed class).
    val totals = df
      .join(broadcast(targets), classCol)
      .groupBy(classCol)
      .agg(sum(col(sizeCol)).cast("long").as("__avail"), first("__wbp").as("__wbp"))
      .where(col("__avail") > 0L)
    emitEpochs(df, classCol, idCol, totals, budget, maxEpochs)
  }

  /** Temperature-scaled mixing (the mT5 / XLM-R multilingual recipe): the
    * share of class c is derived from its OWN size, w_c ∝ A_c^α, instead
    * of a hand-written table — α = 1 reproduces natural proportions, α → 0
    * approaches uniform, and the standard α ≈ 0.2–0.5 boosts low-resource
    * classes without drowning the head. Everything downstream of the
    * weight derivation (epochs, fractional hash-bucket keep) is shared
    * with [[mixToBudget]], so the assignment stays deterministic and
    * engine-replayable; the only floating-point step is the |classes|-row
    * pow/normalize, floored to basis points (IEEE-754 pow agrees across
    * engines to ~1 ulp; the floor is checked against the oracle on fixed
    * data, and a 1-ulp flip would need the product to sit within ~1e-12
    * of an integer).
    *
    * Scale shape: identical to [[mixToBudget]] — the corpus is read once,
    * never shuffled; the pow/normalize runs on the |classes|-row agg.
    */
  def temperatureMix(
      df: DataFrame, classCol: String, idCol: String, sizeCol: String,
      alpha: Double, budget: Long,
      maxEpochs: Int = 100,
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    require(budget >= 0, s"budget must be nonnegative: $budget")
    require(budget <= Long.MaxValue / 10000L, s"budget * 10000 must fit in a long: $budget")
    val names = df.columns.toSet
    Seq("__z", "__avail", "__wbp", "__fbp", "__full", "epoch").foreach(c =>
      require(!names.contains(c), s"input already has a '$c' column"))
    val totalsRaw = df
      .groupBy(classCol)
      .agg(sum(col(sizeCol)).cast("long").as("__avail"))
      .where(col("__avail") > 0L)
    // w_c = floor(10000 · A_c^α / Σ A^α): one cross join against the
    // 1-row normalizer — both sides are |classes|-sized, never the corpus.
    val z = totalsRaw.agg(sum(pow(col("__avail"), lit(alpha))).as("__z"))
    val totals = totalsRaw.crossJoin(broadcast(z))
      .select(col(classCol), col("__avail"),
        floor(lit(10000d) * pow(col("__avail"), lit(alpha)) / col("__z"))
          .cast("long").as("__wbp"))
    emitEpochs(df, classCol, idCol, totals, budget, maxEpochs)
  }

  /** Shared tail of the mixers: per-class keep-fraction f_c (bp) from a
    * (class, __avail, __wbp) frame, then the epoch explode + fractional
    * hash-bucket keep. All divisions are INTEGRAL (`div`): a `/` would go
    * through double, whose 53-bit mantissa silently mis-floors once
    * budget·10000 passes ~9e15 — i.e. exactly at the corpus sizes this
    * operator exists for.
    */
  private def emitEpochs(
      df: DataFrame, classCol: String, idCol: String,
      totals: DataFrame, budget: Long, maxEpochs: Int,
  ): DataFrame = {
    // f_c = floor( floor(budget·w/10000) · 10000 / A_c )
    val withF = totals
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

    df.join(broadcast(withF), classCol)
      .withColumn("__full", expr("__fbp div 10000"))
      .withColumn("epoch", explode(sequence(lit(0L), col("__full"))))
      .where(
        col("epoch") < col("__full") ||
          Sampling.bucket(col(idCol)) < col("__fbp") % 10000L)
      .drop("__fbp", "__full")
  }

  /** Utility-optimal budget allocation — [[mixToBudget]] takes the
    * per-class weights as GIVEN; this derives them: allocate a token
    * budget across classes to maximize total utility, i.e. the fractional
    * knapsack (greedy by utility density, provably optimal for the
    * fractional relaxation — Dantzig 1957). Per class c with available
    * tokens A_c = Σ cost and utility U_c = Σ util: density = U_c/A_c;
    * classes fill best-density-first until the budget runs out, the
    * boundary class takes the integer remainder, the rest take 0.
    *
    * `util`/`cost` must be integer columns — the per-class sums are then
    * EXACT, the single density division is one deterministic IEEE op, and
    * the whole allocation (including every take) stays integer, so a SQL
    * oracle replays it bit for bit. Ties in density break by class name.
    *
    * Plan: one per-class aggregate (|classes| rows), a window cumsum over
    * that tiny frame — the corpus is scanned once and never shuffled by
    * anything but the class key. Feed the resulting per-class fractions
    * to [[mixToBudget]] to materialize the mix.
    *
    * Output: (classCol, avail, utility, density, take, frac_bp).
    */
  def budgetAllocate(
      df: DataFrame, classCol: String, utilCol: String, costCol: String,
      budget: Long,
  ): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val stats = df.groupBy(col(classCol)).agg(
      sum(col(costCol).cast("long")).as("avail"),
      sum(col(utilCol).cast("long")).as("utility"))
      // a zero-cost class has nothing to allocate and would poison the
      // fill order with a NaN/Inf density — excluded, not an error (an
      // all-empty-docs source is a data condition, not a caller bug)
      .where(col("avail") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy((col("utility").cast("double") / col("avail")).desc, col(classCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    stats
      .withColumn("density", col("utility").cast("double") / col("avail"))
      .withColumn("__before", coalesce(sum(col("avail")).over(w), lit(0L)))
      .withColumn("take",
        greatest(lit(0L), least(col("avail"), lit(budget) - col("__before"))))
      // SQL `div` is exact integral division — `/` on longs goes through
      // double, whose floor diverges from DuckDB's integer `//` once
      // take*10000 exceeds 2^53 (~9e11 tokens/class, plausible at
      // trillion-token scale). The whole allocation stays integer.
      .withColumn("frac_bp",
        expr("(take * CAST(10000 AS BIGINT)) div avail").cast("long"))
      .drop("__before")
  }
}
