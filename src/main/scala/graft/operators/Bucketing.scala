package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the storage-level answer to repeated joins on
  * the same key at 100 TB: both sides written with `bucketBy(n, key)` hash
  * into the same bucket layout, so a later join planner-proves co-location
  * and elides BOTH shuffle exchanges (verified by plan-shape test). The
  * reference has no analog (Qdrant/SQLite are single-node); this is the
  * Spark-native pattern for the chunks ⋈ documents / chunks ⋈ labels joins
  * an analytics deployment runs constantly.
  */
object Bucketing {

  /** Write a table bucketed+sorted by `key` into the session catalog.
    * `path` (optional) makes it an EXTERNAL table at that location — the
    * deployment shape where the lake, not the warehouse dir, owns the
    * bytes; bucketing metadata lives in the catalog either way, which is
    * what lets the planner prove co-location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
      path: String = null): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
    (if (path != null) w.option("path", path) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching bucket
    * counts Catalyst plans a sort-merge join with zero Exchange operators.
    */
  def cogroupJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
