package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Table-maintenance operators (SURVEY §2.1 S11–S16). The reference mutates
  * Qdrant point-by-point over HTTP; here every mutation is a declarative
  * table rewrite — one distributed pass, no per-row calls. In particular
  * [[joinUpdate]] replaces the reference's known O(n)-HTTP-calls cluster
  * write-back loop (backend/main.py:811-830, tech report §13.2) with a
  * single broadcast join.
  */
object Maintenance {

  /** S11 — upsert: rows in `updates` replace same-key rows in `base`; new
    * keys append. One shuffle-free plan when `updates` is small: broadcast
    * anti join + union (the reference's 500-point batching dissolves into
    * partition-parallel writes, backend/vector_db.py:87-129).
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(broadcast(updates.select(key)), Seq(key), "left_anti").unionByName(updates)

  /** S14 — delete by predicate as a table rewrite
    * (backend/vector_db.py:204-228: delete where payload[key] == value).
    */
  def deleteWhere(df: DataFrame, pred: Column): DataFrame = df.where(!pred)

  /** S15 — join-update: apply (key → new values) to a table in one pass;
    * columns in `updates` (other than the key) overwrite via coalesce.
    */
  def joinUpdate(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val updCols = updates.columns.filterNot(_ == key)
    val renamed = updCols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__new_$c"))
    val joined  = base.join(broadcast(renamed), Seq(key), "left")
    val applied = updCols.foldLeft(joined)((d, c) => d.withColumn(c, coalesce(col(s"__new_$c"), col(c))))
    applied.select(base.columns.map(col): _*)
  }

  /** S16 — collection reset: empty table with the same schema
    * (backend/vector_db.py:50-60).
    */
  def reset(df: DataFrame): DataFrame = df.where(lit(false))
}
