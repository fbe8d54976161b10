package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` columns, composed from
  * codegen'd builtins (`zip_with` + `aggregate`) so the hot scoring loop stays
  * inside whole-stage codegen — no UDF, no boxing per element.
  *
  * Mirrors the reference's cosine scoring contract
  * (reference: backend/vector_db.py:41 — cosine distance, 768-d collection;
  * here dimension-agnostic). All math is done in Double: the testdata stores
  * `array<float>`, so callers cast with [[asDouble]] first — this matches the
  * DuckDB oracle's `embedding::DOUBLE[]` bit-for-bit because both engines fold
  * the array sequentially.
  */
object VectorOps {

  /** Cast an array<float> column to array<double> for stable double math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product; stays in whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity (reference: backend/vector_db.py:131-183 search metric). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** L2-normalize a vector column (pre-normalized corpora turn cosine into a
    * plain dot product — the 100 TB-scale trick: normalize once at ingest,
    * score with `dot` only).
    */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    transform(v, x => x / n)
  }

  /** Squared euclidean distance (used by clustering ops). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
}
