package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scalar int8 quantization (SQ8) for embedding columns — the standard
  * memory-bound-ANN storage trick: each vector stores as one int8 code per
  * dimension (4× smaller than float32, 8× smaller than float64), and
  * queries compare against codes directly. The reference keeps full-
  * precision vectors in its store (backend/vector_db.py:41); SQ8 is the
  * scale path a 100 TB corpus needs — the difference between an embedding
  * table that fits executor memory and one that doesn't.
  *
  * Per-vector SYMMETRIC quantization on purpose:
  *  - `code_i = floor(v_i / s · 127 + 0.5)` with `s = max_i |v_i|` —
  *    pure codegen'd higher-order expressions, no fitted state, and
  *    IEEE-reproducible 1:1 in the DuckDB oracle (same ops, same order);
  *  - under COSINE the per-vector scale cancels exactly (cos(q, v/s) =
  *    cos(q, v)), so searching codes against a full-precision query
  *    (asymmetric comparison, ADC-style) loses only the ±0.5-step
  *    rounding error per component — no scale metadata needed at query
  *    time. Dot-product or L2 consumers must multiply back `sq8Scale`.
  *
  * Zero vectors code to all-zero (a 0/0 division would NaN-poison the
  * codes; cosine against a zero vector is undefined either way and
  * [[graft.functions.CosineSimilarity]] already guards it).
  */
object Quant {

  /** int8 code array ([-127, 127]) for one embedding column. */
  def sq8Codes(v: Column): Column = {
    val s = array_max(transform(v, x => abs(x)))
    when(s === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => floor(x / s * 127 + 0.5).cast("int")))
  }

  /** The per-vector scale (max |component|) — needed only by non-cosine
    * consumers to dequantize: `v_i ≈ code_i / 127 · scale`.
    */
  def sq8Scale(v: Column): Column = array_max(transform(v, x => abs(x)))

  /** Quantize an embedding table: adds `codes` (int8 range) and `scale`.
    * Written to parquet the codes column is the 4–8× storage win; keep the
    * original embedding column out of the projection for stores that
    * serve search from codes alone.
    */
  def sq8Table(df: DataFrame, embCol: String, codesCol: String = "codes", scaleCol: String = "scale"): DataFrame = {
    val names = df.columns.toSet
    Seq(codesCol, scaleCol).foreach(c => require(!names.contains(c), s"input already has a '$c' column"))
    val v = col(embCol).cast("array<double>")
    df.withColumn(codesCol, sq8Codes(v)).withColumn(scaleCol, sq8Scale(v))
  }

  /** Cosine top-k over a quantized table: codes compare directly against
    * the full-precision query (per-vector scale cancels). Same plan shape
    * as [[Search.topK]] — scan + codegen cosine + TakeOrderedAndProject —
    * but the scanned bytes are the int8 codes.
    */
  def topKOnCodes(
      quantized: DataFrame,
      codesCol: String,
      idCol: String,
      query: Seq[Double],
      k: Int,
  ): DataFrame =
    Search.topK(
      quantized.withColumn("__sq8_d", col(codesCol).cast("array<double>")),
      "__sq8_d", idCol, query, k,
    ).drop("__sq8_d")
}
