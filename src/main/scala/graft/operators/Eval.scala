package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Retrieval-quality evaluation — the trec_eval-style metrics a pipeline
  * that ships a retrieval stack (BM25 `v10`, hybrid RRF `v11`, the ANN
  * family, MMR/RM3/ColBERT rerankers) needs to CLOSE THE LOOP on: given a
  * run (per-query ranked candidate lists) and graded relevance judgments
  * (qrels), compute per-query recall@k, reciprocal rank and nDCG@k
  * (Järvelin & Kekäläinen 2002). The reference exposes search endpoints
  * but no quality harness (reference: backend/vector_db.py:84 returns raw
  * hits); at training-data scale, retrieval changes (a new index, a new
  * embedder, a quantization level) are only shippable against exactly
  * these numbers.
  *
  * Plan shape, built for |Q| in the millions: one broadcast-or-shuffle
  * join of the rank-capped run against qrels on (query, doc), one
  * group-by per side keyed on the query — no window over the corpus, no
  * collect. The qrels window (ideal-DCG ranking) partitions by query and
  * orders by grade, so its shuffle is qrels-sized, never corpus-sized.
  */
object Eval {

  /** Per-query metrics table: (queryCol, n_rel, recall_at_k, rr_at_k,
    * ndcg_at_k). Standard trec_eval conventions:
    *
    *  - only queries that HAVE at least one positively-graded judgment
    *    are evaluated (inner join — a query with no qrels has no defined
    *    recall/nDCG);
    *  - recall@k = |relevant ∩ top-k| / |relevant| (the full relevant
    *    count, not min(k, ·));
    *  - rr@k = 1/rank of the first relevant hit, 0 when the top-k holds
    *    none (MRR is the mean of this column);
    *  - nDCG@k with the exponential gain form (2^rel − 1)/log2(rank + 1),
    *    ideal DCG from the qrels' own top-k grades.
    *
    * `run` carries (queryCol, docCol, rankCol) with 1-based ranks;
    * `qrels` carries (queryCol, docCol, relCol) with grades ≥ 0 (grade-0
    * rows are tolerated and ignored). Duplicate (query, doc) judgments
    * are rejected — they would double-count gains.
    */
  def rankingMetrics(
      run: DataFrame,
      qrels: DataFrame,
      k: Int,
      queryCol: String = "query_id",
      docCol: String = "doc_id",
      rankCol: String = "rank",
      relCol: String = "rel",
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val reserved = Seq("n_rel", "recall_at_k", "rr_at_k", "ndcg_at_k",
      "__i", "__idcg", "__n_rel_ret", "__frr", "__dcg", "__n", "__nr")
    for (c <- reserved; f <- Seq(run, qrels))
      require(!f.columns.contains(c), s"input already has a '$c' column")
    // Duplicate guards run INLINE (raise_error behind a (query, doc)
    // aggregate) rather than as eager validation counts: run/qrels are
    // usually the OUTPUT of whole retrieval pipelines, and an eager
    // `.count()` per guard re-executed both pipelines once per guard
    // before the real computation even started (measured: the v31 eval
    // harness ran each retrieval leg ~3×). The aggregates key on
    // (query, doc) — the same key the hits join needs — and a count > 1
    // fails loudly at materialization, exactly when the eager guard
    // would have.
    val graded = qrels
      .groupBy(col(queryCol), col(docCol))
      .agg(count(lit(1)).as("__n"), max(col(relCol).cast("double")).as(relCol))
      .select(col(queryCol), col(docCol),
        when(col("__n") > 1, raise_error(format_string(
          s"duplicate ($queryCol, $docCol) judgments in qrels: (%s, %s)",
          col(queryCol).cast("string"), col(docCol).cast("string"))))
          .otherwise(col(relCol)).as(relCol))
      .where(col(relCol) > 0)
    // ideal DCG: each query's own grades, best-first. Ties in grade are
    // rank-order-arbitrary but the DCG SUM is invariant under them.
    val byGrade = Window.partitionBy(col(queryCol)).orderBy(col(relCol).desc)
    val ideal = graded
      .withColumn("__i", row_number().over(byGrade))
      .groupBy(col(queryCol))
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__i") <= k,
          (pow(lit(2.0), col(relCol)) - 1.0) / log2(col("__i") + 1.0))).as("__idcg"))

    // trec_eval treats a repeated doc inside one query's run as an error:
    // left unguarded it would double-count __n_rel_ret and __dcg (recall
    // could exceed 1). Guard the rank-capped slice — duplicates past k
    // can't affect any metric — inline, on the same (query, doc) key the
    // qrels join needs.
    val hits = run
      .where(col(rankCol) <= k)
      .groupBy(col(queryCol), col(docCol))
      .agg(count(lit(1)).as("__nr"), max(col(rankCol).cast("long")).as(rankCol))
      .select(col(queryCol), col(docCol),
        when(col("__nr") > 1, raise_error(format_string(
          s"duplicate ($queryCol, $docCol) rows in run top-$k: (%s, %s)",
          col(queryCol).cast("string"), col(docCol).cast("string"))))
          .otherwise(col(rankCol)).as(rankCol))
      .join(graded, Seq(queryCol, docCol), "left")
      .withColumn(relCol, coalesce(col(relCol), lit(0.0)))
    val perQuery = hits
      .groupBy(col(queryCol))
      .agg(
        sum(when(col(relCol) > 0, 1L).otherwise(0L)).as("__n_rel_ret"),
        min(when(col(relCol) > 0, col(rankCol))).as("__frr"),
        sum((pow(lit(2.0), col(relCol)) - 1.0) / log2(col(rankCol) + 1.0)).as("__dcg"))

    // inner join: evaluated queries = those with judgments; a query whose
    // run returned nothing still shows up (zero metrics) via the right
    // side — hence the outer-coalesce on the run-derived columns
    ideal.join(perQuery, Seq(queryCol), "left")
      .select(
        col(queryCol),
        col("n_rel"),
        (coalesce(col("__n_rel_ret"), lit(0L)) / col("n_rel")).as("recall_at_k"),
        coalesce(lit(1.0) / col("__frr"), lit(0.0)).as("rr_at_k"),
        (coalesce(col("__dcg"), lit(0.0)) / col("__idcg")).as("ndcg_at_k"))
  }

  /** Paired sign-flip permutation test over per-query metric deltas — the
    * significance call behind an A/B retrieval decision. `perQuery` holds
    * one row per evaluated query with the same metric under the baseline
    * and the treatment system (e.g. two [[rankingMetrics]] outputs joined
    * on the query); the test statistic is the summed delta, and the null
    * ("the systems are exchangeable per query") is sampled by flipping
    * each query's delta sign in `permutations` deterministic patterns.
    * Two-sided p with add-one smoothing (Phipson & Smyth 2010):
    * p = (1 + #{j : |T_j| >= |T_obs|}) / (1 + P) — never exactly 0.
    *
    * trec_eval users eyeball per-topic deltas; shipping a retrieval
    * change at scale needs the number. Everything is exact-integer so a
    * SQL oracle replays the p-value bit for bit: metrics become basis
    * points (round(m * 10000) as long), qid is the 1-based rank of the
    * query key, and the sign of query q in permutation j is the parity
    * of [[mix31]] over the unique index qid * P + j — a 31-bit
    * xorshift-multiply finalizer (lowbias32's shape masked to 31 bits)
    * built ONLY from `& ^ >> * %` on positive 64-bit integers, so any
    * SQL engine computes the identical schedule. Sign matrices from this
    * mixer are statistically indistinguishable from fair coins on the
    * balance/pairwise-correlation/pattern-collision diagnostics (additive
    * or single-product LCG-mod schemes are NOT — their mod-carry is a
    * function of qid alone and collapses the schedule to two patterns).
    *
    * Scale shape: `perQuery` is |Q| rows — the EVAL QUERY SET, never the
    * corpus. qids come from a global range-partitioned sort plus an
    * order-preserving zipWithIndex (parallel across tasks — no
    * single-partition window, so a 10^6-topic A/B never funnels through
    * one task); the |Q| x P sign expansion aggregates map-side into P
    * partial sums, so the only shuffle is P rows wide. Nothing here
    * touches corpus data. n_queries * permutations must stay under 2^31
    * (checked, fail-loud) so the 31-bit-masked mix index stays injective.
    */
  def pairedSignificance(
      perQuery: DataFrame,
      queryCol: String,
      baselineCol: String,
      treatmentCol: String,
      permutations: Int = 256,
  ): DataFrame = {
    require(permutations >= 1 && permutations <= (1 << 20),
      s"permutations must be in [1, 2^20]: $permutations")
    val reserved = Seq("__qid", "__delta_bp", "__j", "__s", "__tj", "__obs", "__nq",
      "n_queries", "sum_delta_bp", "n_extreme", "n_perms", "p_value")
    for (c <- reserved)
      require(!perQuery.columns.contains(c), s"input already has a '$c' column")

    val spark = perQuery.sparkSession
    val (d, cached) = deltaQidsHandle(perQuery, queryCol, baselineCol, treatmentCol, permutations)
    val perms = spark.range(1, permutations.toLong + 1L).toDF("__j")
    // ONE pass over the |Q| x P expansion: per permutation, the signed sum
    // __tj PLUS the unflipped sum and row count — identical for every j,
    // so the observed statistic rides the same aggregate instead of a
    // second scan of d. That matters because d's lineage (sort + zip over
    // perQuery, itself usually the output of whole retrieval pipelines)
    // would otherwise execute once per consumer per action.
    val tj = d.crossJoin(perms)
      .select(col("__j"), col("__delta_bp"),
        when(mix31(col("__qid") * permutations.toLong + col("__j")) % 2 === 0,
          col("__delta_bp")).otherwise(-col("__delta_bp")).as("__s"))
      .groupBy("__j").agg(
        sum("__s").as("__tj"),
        coalesce(sum("__delta_bp"), lit(0L)).as("__obs"),
        count(lit(1)).cast("long").as("__nq"))
    val out = tj
      .groupBy(col("__nq").as("n_queries"), col("__obs").as("sum_delta_bp"))
      .agg(sum(when(abs(col("__tj")) >= abs(col("__obs")), 1L).otherwise(0L))
        .as("n_extreme"))
      .select(
        col("n_queries"),
        col("sum_delta_bp"),
        col("n_extreme"),
        lit(permutations.toLong).as("n_perms"),
        ((col("n_extreme") + 1.0) / (permutations + 1.0)).as("p_value"))
    // materialize the 1-row result NOW so the |Q|-sized qid cache can be
    // freed deterministically — an eval sweep calling this per system pair
    // must not accumulate unreferenced caches until ContextCleaner's GC
    // happens to run. The returned frame is a local relation of that row.
    // The unpersist sits in a finally: the collect is also where the
    // planted fail-loud raise_errors (duplicate qids, qid*perms overflow)
    // surface, and a sweep that catches-and-retries per pair must not
    // accumulate the very caches this change exists to free.
    val rows =
      try out.collect()
      finally cached.unpersist()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Reliability (calibration) bins for a probabilistic scorer — the
    * diagnostic behind "can this quality/rerank score be thresholded at
    * face value?" (Guo 2017 revived it for neural scorers; the reliability
    * diagram itself goes back to forecasting). Rows bin by
    * min(nBins−1, floor(score·nBins)); each bin reports its population,
    * mean predicted score, observed positive rate and |gap|. ECE/MCE are
    * one aggregate away ([[calibrationSummary]]).
    *
    * Scores must be in [0, 1] — out-of-range or null scores are a caller
    * bug and fail loudly INLINE (raise_error where the score enters the
    * bin expression — lazy, codegen'd, no separate validation scan over
    * what may be a whole scoring pipeline's output). Plan: one scan into
    * a ≤nBins-row aggregate; nothing corpus-sized shuffles.
    */
  def calibrationBins(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int,
  ): DataFrame = {
    require(nBins >= 2 && nBins <= 10000, s"nBins must be in [2, 10000]: $nBins")
    val reserved = Seq("bin", "n", "mean_score", "frac_pos", "gap", "__s", "__y")
    for (c <- reserved)
      require(!scored.columns.contains(c), s"input already has a '$c' column")
    val sRaw = col(scoreCol).cast("double")
    val s = when(sRaw.isNull || sRaw < 0.0 || sRaw > 1.0 || isnan(sRaw),
      raise_error(format_string(
        s"'$scoreCol' must be a probability in [0,1] with no nulls/NaNs: got %s",
        sRaw.cast("string"))))
      .otherwise(sRaw)
    scored
      .select(least(lit(nBins - 1L), floor(s * nBins).cast("long")).as("bin"),
        s.as("__s"), col(labelCol).cast("double").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg("__s").as("mean_score"), avg("__y").as("frac_pos"))
      .withColumn("gap", abs(col("mean_score") - col("frac_pos")))
  }

  /** ECE (population-weighted mean |gap|) and MCE (max |gap|) off a
    * [[calibrationBins]] table — single row: (n, ece, mce).
    */
  def calibrationSummary(bins: DataFrame): DataFrame =
    bins.agg(
      sum("n").as("n"),
      (sum(col("n") * col("gap")) / sum(col("n"))).as("ece"),
      max("gap").as("mce"))

  /** 31-bit xorshift-multiply finalizer over a non-negative long: three
    * `x ^= x >> 16` rounds interleaved with two `x = (x * 73244475) &
    * 0x7FFFFFFF` multiplies. 73244475 (0x45d9f3b) is the lowbias32
    * multiplier; masking to 31 bits keeps every product under 2^58, so
    * the arithmetic is exact (no wraparound) in any engine's BIGINT —
    * the whole point is that a SQL oracle replays it operator by
    * operator.
    */
  /** (__qid, __delta_bp) for [[pairedSignificance]] — distributed dense-qid
    * assignment: a global SORT on the query key (range exchange — parallel
    * across tasks even at 10^6 topics) + order-preserving `zipWithIndex`,
    * instead of an unpartitioned row_number window that would funnel every
    * row through one task. Indices are contiguous 1-based ranks of the
    * (unique, caller-checked) query keys — exactly the window's qid, so
    * the oracle replay is unchanged.
    *
    * mix31 masks its input to 31 bits: qid * P + j must stay injective
    * under that mask or distinct queries silently share sign schedules
    * (qids 2^31/P apart would collide). Fail loud per-row — the guard is
    * a codegen'd projection over the |Q|-sized table, no extra action.
    */
  private[graft] def deltaQids(
      perQuery: DataFrame, queryCol: String,
      baselineCol: String, treatmentCol: String, permutations: Int,
  ): DataFrame =
    deltaQidsHandle(perQuery, queryCol, baselineCol, treatmentCol, permutations)._1

  /** [[deltaQids]] plus the persisted sorted-delta handle, so the caller
    * can unpersist DETERMINISTICALLY once the result is consumed instead
    * of leaving a |Q|-sized cache for ContextCleaner's GC to find.
    */
  private[graft] def deltaQidsHandle(
      perQuery: DataFrame, queryCol: String,
      baselineCol: String, treatmentCol: String, permutations: Int,
  ): (DataFrame, DataFrame) = {
    val spark = perQuery.sparkSession
    // duplicate query keys have no well-defined delta — fail loud INLINE
    // (the key-grouped aggregate that dedups is also the guard), not via
    // an eager validation count that would re-execute perQuery's lineage.
    // PERSISTED because zipWithIndex is unavoidably eager (it runs one
    // per-partition count job at construction): the cache makes that job
    // the ONLY execution of perQuery's lineage — later actions on the
    // result read the cached sorted deltas instead of re-running the
    // upstream pipelines. The cache is |Q| (key, long) rows;
    // [[pairedSignificance]] unpersists it deterministically once its
    // result row is materialized (bare deltaQids callers fall back to
    // ContextCleaner GC).
    val sorted = perQuery.select(
      col(queryCol).as("__k"),
      (round(col(treatmentCol) * 10000).cast("long")
        - round(col(baselineCol) * 10000).cast("long")).as("__delta_bp"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), max(col("__delta_bp")).as("__delta_bp"))
      .select(col("__k"),
        when(col("__n") > 1, raise_error(format_string(
          s"duplicate $queryCol rows in perQuery — one row per query: %s",
          col("__k").cast("string"))))
          .otherwise(col("__delta_bp")).as("__delta_bp"))
      .orderBy(col("__k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deltaIdx = sorted.schema.fieldIndex("__delta_bp")
    val dRows = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(
        i + 1L, if (r.isNullAt(deltaIdx)) null else r.getLong(deltaIdx))
    }
    val dSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__qid", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "__delta_bp", org.apache.spark.sql.types.LongType, nullable = true)))
    val maxQid = (0x7FFFFFFFL - permutations.toLong) / permutations.toLong
    val out = spark.createDataFrame(dRows, dSchema)
      .select(
        when(col("__qid") <= maxQid, col("__qid"))
          .otherwise(raise_error(format_string(
            s"n_queries * permutations must stay under 2^31 for an injective " +
              s"sign schedule: qid %s with permutations=$permutations overflows " +
              s"the 31-bit mix domain (max qid $maxQid)", col("__qid"))))
          .as("__qid"),
        col("__delta_bp"))
    (out, sorted)
  }

  private def mix31(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val mask = lit(0x7FFFFFFFL)
    val c    = lit(73244475L)
    val x0 = n.bitwiseAND(mask)
    val x1 = x0.bitwiseXOR(shiftright(x0, 16))
    val x2 = (x1 * c).bitwiseAND(mask)
    val x3 = x2.bitwiseXOR(shiftright(x2, 16))
    val x4 = (x3 * c).bitwiseAND(mask)
    x4.bitwiseXOR(shiftright(x4, 16))
  }
}
