package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Codegen'd product-quantization codec (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the sub-SQ8 memory point of
  * the ANN family: m one-byte codes per vector (64-d → 8 B vs SQ8's 64 B vs
  * float64's 512 B).
  *
  * Both halves run inside whole-stage codegen: the codebooks / ADC lookup
  * table travel as reference objects in the generated class (NOT literal
  * arrays — a 96×256×8-d codebook as a Catalyst literal would explode the
  * plan), and the per-row work is one primitive loop. The HOF composition of
  * the same math would pay an interpreted boxed lambda per element, the cost
  * the Sq8 expression already measured at 260× (VectorExpressions.scala).
  */
case class PqEncode(child: Expression, flat: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqCodec.encode(input.asInstanceOf[ArrayData], flat, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqCodec$$.MODULE$$.encode($c, $ref, $m, $ksub, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric distance computation: score(codes) = Σ_j table[j·ksub+code_j],
  * where the table holds the query subvector · codebook-entry inner
  * products. On L2-normalized inputs this approximates cosine(query, v).
  */
case class PqAdc(child: Expression, table: Array[Double], ksub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary codes, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(input: Any): Any =
    PqCodec.adc(input.asInstanceOf[Array[Byte]], table, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", table, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqCodec$$.MODULE$$.adc($c, $ref, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

/** Pair-form ADC for BATCH joins: score(codes, query) = q̂ · reconstruct
  * (codes), computed per (candidate, query) row without a per-query driver
  * table — the single-query path precomputes the m×ksub lookup table once
  * ([[PqAdc]]), which a batch join cannot (the query is a COLUMN). The
  * accumulation order matches [[Pq.Model.adcTable]] + [[PqCodec.adc]]
  * exactly (per-subspace subtotal, then the subspace sum), so the two
  * forms are bit-identical and the batch join ranks candidates exactly as
  * the single-query probe would.
  */
case class PqAdcPair(
    left: Expression,
    right: Expression,
    flat: Array[Double],
    m: Int,
    ksub: Int,
    dsub: Int,
) extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires (binary, array<double>), got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_pair"

  override protected def nullSafeEval(codes: Any, q: Any): Any =
    PqCodec.adcPair(codes.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData], flat, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.PqCodec$$.MODULE$$.adcPair($c, $q, $ref, $m, $ksub, $dsub)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcPair =
    copy(left = newLeft, right = newRight)
}

object PqCodec {

  /** Pair-form ADC: normalize the query, then per subspace the
    * inner product of its (normalized) slice with the coded codebook
    * entry — subtotal per subspace, summed in subspace order, matching
    * [[graft.operators.Pq.Model.adcTable]]'s entry arithmetic + [[adc]]'s
    * summation bit for bit.
    */
  def adcPair(codes: Array[Byte], q: ArrayData, flat: Array[Double], m: Int, ksub: Int, dsub: Int): Double = {
    val n  = q.numElements()
    var nn = 0.0
    var i  = 0
    while (i < n) { val x = q.getDouble(i); nn += x * x; i += 1 }
    val inv = if (nn > 0) 1.0 / math.sqrt(nn) else 0.0
    var s = 0.0
    var j = 0
    val mj = math.min(m, codes.length)
    while (j < mj) {
      val base = (j * ksub + (codes(j) & 0xff)) * dsub
      var sub  = 0.0
      var t    = 0
      while (t < dsub) {
        val idx = j * dsub + t
        if (idx < n) sub += q.getDouble(idx) * inv * flat(base + t)
        t += 1
      }
      s += sub
      j += 1
    }
    s
  }

  /** Encode one vector: L2-normalize, then per subspace the argmin-distance
    * codebook entry (ties → lowest index). Vectors shorter than m·dsub are
    * zero-padded (mirrors the cosine expression's min-length semantics);
    * the zero vector normalizes to itself and still encodes
    * deterministically.
    */
  def encode(v: ArrayData, flat: Array[Double], m: Int, ksub: Int, dsub: Int): Array[Byte] = {
    val n   = v.numElements()
    var nn  = 0.0
    var i   = 0
    while (i < n) { val x = v.getDouble(i); nn += x * x; i += 1 }
    val inv = if (nn > 0) 1.0 / math.sqrt(nn) else 0.0
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best  = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val idx = j * dsub + t
          val x   = (if (idx < n) v.getDouble(idx) * inv else 0.0) - flat(base + t)
          d += x * x
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  def adc(codes: Array[Byte], table: Array[Double], ksub: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < codes.length) { s += table(j * ksub + (codes(j) & 0xff)); j += 1 }
    s
  }
}

object PqExpressions {

  /** Codegen'd PQ encode: array<double> → m-byte code. */
  def pqEncode(v: Column, flat: Array[Double], m: Int, ksub: Int, dsub: Int): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v), flat, m, ksub, dsub))

  /** Codegen'd ADC score of a code column against a query lookup table. */
  def pqAdc(codes: Column, table: Array[Double], ksub: Int): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(codes), table, ksub))

  /** Pair-form ADC for batch joins: codes column × query-vector column. */
  def pqAdcPair(codes: Column, query: Column, flat: Array[Double], m: Int, ksub: Int, dsub: Int): Column =
    GraftBridge.column(PqAdcPair(
      GraftBridge.expression(codes), GraftBridge.expression(query), flat, m, ksub, dsub))
}
