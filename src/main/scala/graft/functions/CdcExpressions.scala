package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Content-defined chunk boundaries over a binary column — Gear-style
  * rolling-hash CDC (the FastCDC/LBFS family): `h ← (h·2 + g(b)) mod 2^m`,
  * a byte index is a boundary when `h == 0`. Content-defined cuts survive
  * byte insertions/shifts, so identical media segments land in identical
  * chunks regardless of container offsets — the blob-level analog of the
  * text dedup family (chunk md5s become the exact-dedup key).
  *
  * Two deliberate choices keep the operator exactly oracle-able:
  *  - the gear table is the Knuth multiplicative hash
  *    `g(b) = b · 2654435761 mod 2^m` (computable in SQL, no lookup
  *    table to ship);
  *  - NO min/max chunk bounds: bounds make the cut sequence depend on the
  *    previous cut (inherently sequential), while the pure predicate form
  *    is windowed — `h mod 2^m` only sees the last `m` bytes
  *    (`2^k ≡ 0 mod 2^m` for `k ≥ m`), so DuckDB reproduces every
  *    boundary with an m-term windowed sum. Expected chunk size is set by
  *    `maskBits` alone (≈ 2^maskBits bytes on high-entropy input).
  *
  * One codegen'd loop per row; returns the int array of boundary byte
  * indices (a boundary ENDS its chunk).
  */
case class GearBoundaries(child: Expression, maskBits: Int) extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 20, s"maskBits must be in [1,20]: $maskBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary input, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gear_boundaries"

  override protected def nullSafeEval(input: Any): Any =
    GearBoundaries.boundaries(input.asInstanceOf[Array[Byte]], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GearBoundaries$$.MODULE$$.boundaries($c, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): GearBoundaries =
    copy(child = newChild)
}

object GearBoundaries {
  def boundaries(bytes: Array[Byte], maskBits: Int): ArrayData = {
    val mask = (1L << maskBits) - 1L
    val out  = new scala.collection.mutable.ArrayBuffer[Int]()
    var h    = 0L
    var i    = 0
    while (i < bytes.length) {
      h = ((h << 1) + (bytes(i) & 0xffL) * 2654435761L) & mask
      if (h == 0L) out += i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
