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

  /** Pre-flight shuffle-skew audit for a planned key — the measurement
    * that decides BETWEEN plain `groupBy`/join, [[saltedAggregate]], and
    * [[saltedJoin]] before a 100 TB shuffle is launched. Simulates hash
    * partitioning into `nBuckets` reducers with an ENGINE-PORTABLE bucket
    * function (first 8 hex digits of md5 over the ␁-joined key string —
    * replayable in any SQL engine, unlike Spark's murmur) and reports one
    * row:
    *
    *  - n_rows, n_keys, max_key_rows, top_key, key_share — the key-level
    *    view (`key_share` ≈ 1 means salting, not repartitioning, is the
    *    only fix: one key IS the load);
    *  - n_buckets, max_bucket_rows, imbalance = max bucket / mean bucket
    *    — the reducer-level view (straggler factor of the planned
    *    shuffle);
    *  - salt_recommended — true when the heaviest key alone exceeds the
    *    mean bucket load, i.e. no key-hash arrangement can balance it.
    *
    * Cost: ONE map-side-combined key aggregate (the same shuffle the
    * audited groupBy would do, but carrying only (key, count)), folded
    * through a ≤nBuckets-row rollup — each stage consumed once, so the
    * key aggregate never re-executes.
    */
  def keySkewStats(df: DataFrame, keyCols: Seq[String], nBuckets: Int): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(nBuckets >= 2 && nBuckets <= (1 << 20), s"nBuckets must be in [2, 2^20]: $nBuckets")
    keyCols.foreach(c => require(df.columns.contains(c), s"unknown column $c"))
    // concat_ws SKIPS null parts (the FileSources.scala pitfall): composite
    // keys (null,'x') and ('x',null) — or null vs '' — would collapse to
    // one __k and share a simulated bucket. Each part is therefore
    // escape-encoded (NUL -> NUL NUL, SOH -> NUL SOH — unambiguous, and
    // the IDENTITY on strings without those control chars, so oracles
    // replaying md5 over the raw key string stay exact) and nulls become
    // the "NUL N" sentinel no encoded real value can produce.
    def encodedPart(c: String): Column = {
      val escaped = regexp_replace(
        regexp_replace(col(c).cast("string"), "\u0000", "\u0000\u0000"),
        "\u0001", "\u0000\u0001")
      coalesce(escaped, lit("\u0000N"))
    }
    val keys = df
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__c"))
      .select(col("__c"),
        concat_ws("\u0001", keyCols.map(encodedPart).toIndexedSeq: _*).as("__k"))
      .withColumn("__b",
        pmod(conv(substring(md5(col("__k")), 1, 8), 16, 10).cast("long"), lit(nBuckets.toLong)))
    keys
      .groupBy(col("__b"))
      .agg(sum(col("__c")).as("__bc"), count(lit(1)).as("__bk"),
        max(struct(col("__c").as("c"), col("__k").as("k"))).as("__bt"))
      .agg(
        coalesce(sum(col("__bc")), lit(0L)).as("n_rows"),
        coalesce(sum(col("__bk")), lit(0L)).as("n_keys"),
        coalesce(max(col("__bc")), lit(0L)).as("max_bucket_rows"),
        max(col("__bt")).as("__top"))
      .select(
        col("n_rows"), col("n_keys"),
        coalesce(col("__top.c"), lit(0L)).as("max_key_rows"),
        col("__top.k").as("top_key"),
        round(coalesce(col("__top.c"), lit(0L)).cast("double") /
          greatest(col("n_rows"), lit(1L)), 4).as("key_share"),
        lit(nBuckets.toLong).as("n_buckets"),
        col("max_bucket_rows"),
        round(col("max_bucket_rows").cast("double") * nBuckets /
          greatest(col("n_rows"), lit(1L)), 4).as("imbalance"),
        (coalesce(col("__top.c"), lit(0L)) * nBuckets > col("n_rows")).as("salt_recommended"))
  }

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
  ): DataFrame = twoStageAggregate(df, Seq(keyCol), saltBuckets, partials, merges)

  private def twoStageAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      partials: Seq[Column],
      merges: Seq[Column],
  ): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy((keyCols.map(col) :+ col("__salt")).toIndexedSeq: _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(merges.head, merges.tail: _*)

  /** Measurement-gated aggregation — [[keySkewStats]] finally CONSUMED by
    * the operator it was built to protect: run the pre-flight audit (on
    * `auditSample` when given — a predicate selecting a representative
    * slice — or the full frame), then pick plain vs salted from its
    * `salt_recommended` verdict (the heaviest key alone exceeding the
    * mean simulated-reducer load, i.e. no key-hash arrangement can
    * balance it). Returns (result, salted?).
    *
    * Both paths run the SAME two-stage shape so the output schema and
    * values are identical (merges over partials must be the aggregate's
    * merge form — count merges with sum, etc.): the plain path is the
    * two-stage with ONE salt bucket, whose stage 1 IS the plain groupBy
    * and whose stage 2 folds single-row groups (a |keys|-row no-op).
    * The audit itself is skew-safe — it carries (key, count) with
    * map-side combine, so the hot key reaches the shuffle as one row per
    * map partition.
    *
    * `nBuckets` is the simulated reducer count the verdict is judged
    * against; 0 (default) uses the session's `spark.sql.shuffle.partitions`
    * — the audit then answers "would THIS plan's shuffle straggle".
    */
  def autoAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      partials: Seq[Column],
      merges: Seq[Column],
      saltBuckets: Int = 16,
      nBuckets: Int = 0,
      auditSample: Column = lit(true),
  ): (DataFrame, Boolean) = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2: $saltBuckets")
    // floor at 2: keySkewStats needs >= 2 simulated reducers, and a
    // 1-partition session (local[1] smoke runs) can't straggle anyway —
    // the audit still runs so the verdict column is well-defined.
    val nb =
      if (nBuckets > 0) nBuckets
      else math.max(2, df.sparkSession.sessionState.conf.numShufflePartitions)
    val salted = keySkewStats(df.where(auditSample), keyCols, nb)
      .select("salt_recommended").head().getBoolean(0)
    (twoStageAggregate(df, keyCols, if (salted) saltBuckets else 1, partials, merges), salted)
  }

  /** Measurement-gated equi-join — [[keySkewStats]] consumed by the join
    * it protects ([[autoAggregate]]'s device applied to [[saltedJoin]]).
    * The pre-flight audits the BIG side's join-key distribution (on
    * `auditSample` when given, column-pruned to the key either way);
    * `salt_recommended` — the heaviest key alone exceeding the mean
    * simulated-reducer load, so NO key-hash arrangement balances it —
    * routes through [[saltedJoin]], anything else through the same code
    * path with ONE salt bucket (whose pmod is the constant 0 and whose
    * small-side replication is ×1: a plain equi-join in salted clothing,
    * so both verdicts produce identical schemas and values — the
    * [[autoAggregate]] one-bucket device). Broadcast remains Catalyst's
    * size-based decision on either path: salting exists for the case
    * where the small side is too big to broadcast AND the big side is
    * key-skewed. Returns (result, salted?).
    */
  def autoJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int = 16,
      nBuckets: Int = 0,
      auditSample: Column = lit(true),
  ): (DataFrame, Boolean) = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2: $saltBuckets")
    val nb =
      if (nBuckets > 0) nBuckets
      else math.max(2, big.sparkSession.sessionState.conf.numShufflePartitions)
    val salted = keySkewStats(big.where(auditSample).select(col(key)), Seq(key), nb)
      .select("salt_recommended").head().getBoolean(0)
    (saltedJoin(big, small, key, if (salted) saltBuckets else 1), salted)
  }

  /** Skew-salted equi-join: a shuffle join hashes every row of a hot key to
    * ONE reducer — a key holding 20% of a 100 TB fact side serializes 20 TB
    * through one task. Salting shards the big side's hot keys across
    * `saltBuckets` sub-keys and replicates the small side once per bucket,
    * so the join key becomes (key, salt) and the hot key spreads over
    * `saltBuckets` reducers. Cost: small side shuffles ×saltBuckets —
    * cheap by the premise that it's the small side.
    *
    * The salt must be deterministic per row (retried tasks must re-salt
    * identically or shuffle replays corrupt the join), so it hashes the
    * whole big-side row rather than using rand(): identical rows share a
    * bucket, which skews nothing unless the data is mostly duplicate rows.
    *
    * Inner join on `key`; output = big columns + small payload columns.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int,
  ): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive: $saltBuckets")
    require(big.columns.contains(key) && small.columns.contains(key),
      s"join key '$key' must exist on both sides")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "'__salt' is reserved by saltedJoin; rename the input column")
    val collisions = (big.columns.toSet & small.columns.toSet) - key
    require(collisions.isEmpty,
      s"non-key columns present on both sides would be ambiguous after the join: ${collisions.mkString(", ")}")
    // hash() fails analysis on MapType (maps have no deterministic hash);
    // salt on the hashable columns only — determinism per row is what
    // matters, not that every column contributes.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType  => hasMap(a.elementType)
      case _             => false
    }
    val hashable = big.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toSeq
    require(hashable.nonEmpty, "big side has no hashable (non-map) columns to derive a salt from")
    val saltedBig = big.withColumn("__salt", pmod(hash(hashable: _*), lit(saltBuckets)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
