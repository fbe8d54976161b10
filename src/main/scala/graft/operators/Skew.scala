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
