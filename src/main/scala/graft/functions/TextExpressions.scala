package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer for the text hot path (SURVEY §2.12): the declarative
  * form `filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)`
  * is THREE passes — a full lowercase materialization, a regex split
  * allocating every fragment (including the empties), then an INTERPRETED
  * higher-order filter (lambdas never enter whole-stage codegen) — and it
  * sits under a6/m2 TF-IDF naming, x1–x4 text analysis, v2 embedding and
  * the chunk pipeline.
  *
  * This expression does ONE byte-level pass over the lowercased UTF-8
  * bytes. Byte scanning is exact, not an approximation: in UTF-8 every
  * byte of a multi-byte character is ≥ 0x80, so runs of ASCII `[a-z0-9]`
  * bytes correspond 1:1 to the regex's `[a-z0-9]+` matches on the string
  * (verified against the declarative form by a ScalaCheck parity property
  * over arbitrary Unicode input).
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(input: Any): Any =
    Tokenize.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize$$.MODULE$$.split($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Word n-gram shingles over a token array: `["a","b","c"]`, n=2 →
  * `["a b","b c"]` (fewer than n tokens → empty). Replaces the
  * `transform(sequence(...), i => array_join(slice(toks,i+1,n)))`
  * composition — an interpreted lambda allocating a sliced array AND a
  * joined string per position — with one pass reusing the source
  * UTF8Strings. Sits under the TF-IDF naming chain (A6/M2) and the
  * n-gram dedup family.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle size must be positive (got $n)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other                    => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles$$.MODULE$$.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def shingle(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out    = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    var i      = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object Tokenize {

  /** Lowercase once, then emit each maximal run of `[a-z0-9]` bytes. */
  def split(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val out   = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i     = 0
    val n     = bytes.length
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        var j     = i + 1
        while (j < n && {
          val c = bytes(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        out += UTF8String.fromBytes(bytes, start, j - start)
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
