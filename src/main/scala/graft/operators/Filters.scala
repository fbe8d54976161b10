package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's filter surface (SURVEY §2.2), as plan-time Column
  * builders. Everything here is a plain declarative predicate, so Catalyst
  * pushes it into the parquet scan (`PushedFilters` in explain) — the Spark
  * analog of the reference evaluating filters inside Qdrant
  * (backend/vector_db.py:136-163) rather than post-filtering in Python.
  */
object Filters {

  /** F1 — equality predicate (backend/vector_db.py:156-162, MatchValue). */
  def eq(key: String, value: Any): Column = col(key) === lit(value)

  /** F2 — IN-list predicate for scalar columns (backend/vector_db.py:149-155,
    * MatchAny).
    */
  def inList(key: String, values: Seq[Any]): Column = col(key).isin(values: _*)

  /** F2 (array form) — MatchAny over an array payload column like `tags`:
    * true when any element overlaps the wanted set.
    */
  def anyOverlap(key: String, values: Seq[String]): Column =
    arrays_overlap(col(key), array(values.map(lit): _*))

  /** F3 — optional-bounded range predicate (backend/vector_db.py:139-148). */
  def range(key: String, gte: Option[Any], lte: Option[Any]): Column = {
    val lower = gte.map(col(key) >= lit(_))
    val upper = lte.map(col(key) <= lit(_))
    (lower.toSeq ++ upper.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** F4 — conjunctive composition: Qdrant `must` = AND of all entries
    * (backend/vector_db.py:137,163). Empty filter set → everything.
    */
  def conjunction(preds: Seq[Column]): Column =
    preds.reduceOption(_ && _).getOrElse(lit(true))

  /** F5 — cluster-filter coercion (backend/main.py:203-207): a string
    * cluster id; "all" or non-numeric → no filter.
    */
  def clusterFilter(key: String, raw: String): Column =
    if (raw == null || raw == "all" || raw.toIntOption.isEmpty) lit(true)
    else col(key) === lit(raw.toInt)

  /** F7 — extension allow-list gate (backend/config.py:54-59,
    * backend/main.py:299-303): true = accepted.
    */
  def extAllowed(extCol: Column, allowed: Seq[String]): Column =
    lower(extCol).isin(allowed.map(_.toLowerCase(java.util.Locale.ROOT)): _*)
}
