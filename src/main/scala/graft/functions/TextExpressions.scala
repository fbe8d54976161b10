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

/** Winnowing fingerprints (Schleimer 2003 §4, the MOSS scheme) as ONE
  * codegen'd pass: tokenize → k-gram md5 → sliding-window min → distinct,
  * replacing the interpreted HOF composition (`transform(sequence(...),
  * i => array_min(slice(hs, i, w)))`) that allocated a w-wide array slice
  * and compared 32-char strings per window position (~3 µs/token
  * interpreted — it was 28% of the whole bench suite).
  *
  * Semantics are BIT-IDENTICAL to the HOF form (ScalaCheck parity
  * property in `ExpressionParitySpec`): md5 HEX of the space-joined
  * k-gram stays the hash domain — lexicographic order over hex equals
  * unsigned big-endian order over the 16 digest bytes, so the window min
  * is computed on two longs (one `compareUnsigned` pair per step via a
  * monotonic deque, O(n) total) and hex is re-emitted only for the ~2/(w+1)
  * winners. Fewer than `window` k-grams (but ≥ 1) degrade to one
  * whole-doc-min fingerprint; no k-grams → empty (matches the HOF and the
  * DuckDB oracle's `greatest(len(hs) - w + 1, 1)` replay).
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1: $k")
  require(window >= 1, s"window must be >= 1: $window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fingerprints(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints$$.MODULE$$.fingerprints($c, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val HexDigits = "0123456789abcdef".getBytes

  /** Hex-encode a 128-bit md5 held as two big-endian longs (the emitted
    * domain must stay md5-hex for oracle portability).
    */
  private def hex(hi: Long, lo: Long): UTF8String = {
    val out = new Array[Byte](32)
    var i   = 0
    while (i < 16) {
      out(i) = HexDigits(((hi >>> (60 - 4 * i)) & 0xf).toInt)
      out(16 + i) = HexDigits(((lo >>> (60 - 4 * i)) & 0xf).toInt)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def fingerprints(s: UTF8String, k: Int, window: Int): ArrayData = {
    // Tokenize pass (same byte-run rule as Tokenize.split), but keeping
    // (start, end) offsets so k-gram digests stream straight from the
    // lowercased byte buffer — no per-token UTF8String materialization.
    val bytes  = s.toLowerCase.getBytes
    val n      = bytes.length
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends   = new scala.collection.mutable.ArrayBuffer[Int]()
    var i      = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        var j = i + 1
        while (j < n && {
          val c = bytes(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        starts += i; ends += j
        i = j
      } else i += 1
    }
    val nTok = starts.length
    if (nTok < k) return new GenericArrayData(Array.empty[Any])

    // md5 per k-gram (digest fed token bytes + single-space separators —
    // byte-identical to md5 of the space-joined shingle string), packed
    // into two big-endian longs for O(1) unsigned comparison.
    val nGram = nTok - k + 1
    val hi    = new Array[Long](nGram)
    val lo    = new Array[Long](nGram)
    val md    = java.security.MessageDigest.getInstance("MD5")
    var g     = 0
    while (g < nGram) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(bytes, starts(g + j), ends(g + j) - starts(g + j))
        j += 1
      }
      val d = md.digest()
      var h = 0L; var l = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); l = (l << 8) | (d(8 + b) & 0xffL); b += 1 }
      hi(g) = h; lo(g) = l
      g += 1
    }

    // Sliding-window min via a monotonic deque (amortized O(1)/position);
    // distinct preserves first-occurrence order like array_distinct.
    @inline def less(a: Int, b: Int): Boolean = {
      val c = java.lang.Long.compareUnsigned(hi(a), hi(b))
      if (c != 0) c < 0 else java.lang.Long.compareUnsigned(lo(a), lo(b)) <= 0
    }
    val w     = math.min(window, nGram)
    val dq    = new Array[Int](nGram)
    var head  = 0; var tail = 0
    val seen  = new java.util.HashSet[(Long, Long)]()
    val out   = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastM = -1
    i = 0
    while (i < nGram) {
      while (tail > head && less(i, dq(tail - 1))) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = dq(head)
        // Consecutive windows usually share a min index — skip those for
        // free; the exact full-128-bit set (no lossy folding: a 64-bit mix
        // could collide and DROP a fingerprint array_distinct would keep)
        // only sees the ~2/(w+1) min transitions.
        if (m != lastM) {
          lastM = m
          if (seen.add((hi(m), lo(m)))) out += hex(hi(m), lo(m))
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Deterministic MLM masking (BERT 80/10/10, Devlin 2019 §3.1) as ONE
  * codegen'd pass — replaces the [[TextOps.mlmMaskHof]] composition of
  * four interpreted higher-order passes over a per-token index sequence
  * (each re-deriving the portable hash per element: ~2.6 s warm at sf0.1
  * for a pure projection). Selection semantics are BIT-IDENTICAL (ScalaCheck
  * parity property): r = portable-hash bucket of (id·100000 + pos) decides
  * 80/10/10, the random draw is the hash-picked same-doc token, and the
  * corrupted text is md5'd via a streaming digest instead of materializing
  * the joined string.
  *
  * Returns a struct (n_tokens, n_masked, n_mask_tok, n_random,
  * corrupted_md5); the five field extractions in the projection share one
  * evaluation through whole-stage codegen subexpression elimination.
  */
case class MlmMask(left: Expression, right: Expression, maskBp: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(maskBp >= 0 && maskBp <= 10000, s"maskBp out of range: $maskBp")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.LongType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (bigint, string), got ($l, $r)")
  }

  override def dataType: DataType = MlmMask.schema
  override def prettyName: String = "mlm_mask"

  override protected def nullSafeEval(id: Any, text: Any): Any =
    MlmMask.mask(id.asInstanceOf[Long], text.asInstanceOf[UTF8String], maskBp)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (i, t) => s"graft.functions.MlmMask$$.MODULE$$.mask($i, $t, $maskBp)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MlmMask =
    copy(left = newLeft, right = newRight)
}

object MlmMask {
  import org.apache.spark.sql.types._

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_masked", LongType, nullable = false),
    StructField("n_mask_tok", LongType, nullable = false),
    StructField("n_random", LongType, nullable = false),
    StructField("corrupted_md5", StringType, nullable = false),
  ))

  /** graft.operators.Sampling.portableHash replicated on the JVM —
    * verified bit-equal to the column form by the parity property.
    */
  @inline private def portableHash(id: Long): Long = {
    val x  = java.lang.Math.floorMod(id, 4294967296L)
    val h0 = (x * 31153L + ((x * 40503L) % 65536L) * 65536L) % 4294967296L
    h0 ^ (h0 >>> 16)
  }

  private val MaskTok  = "[MASK]".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val HexDigits = "0123456789abcdef".getBytes

  def mask(id: Long, text: UTF8String, maskBp: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bpMask = maskBp * 8 / 10
    val bpRand = maskBp * 9 / 10
    // tokenize pass (same byte-run rule as Tokenize.split), offsets only
    val bytes  = text.toLowerCase.getBytes
    val nb     = bytes.length
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends   = new scala.collection.mutable.ArrayBuffer[Int]()
    var i      = 0
    while (i < nb) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        var j = i + 1
        while (j < nb && {
          val c = bytes(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        starts += i; ends += j
        i = j
      } else i += 1
    }
    val n  = starts.length
    val md = java.security.MessageDigest.getInstance("MD5")
    var nMasked = 0L; var nMaskTok = 0L; var nRandom = 0L
    i = 0
    while (i < n) {
      val key = id * 100000L + i
      val r   = portableHash(key) % 10000L
      if (r < maskBp) nMasked += 1
      if (i > 0) md.update(' '.toByte)
      if (r < bpMask) { nMaskTok += 1; md.update(MaskTok) }
      else if (r < bpRand) {
        nRandom += 1
        val pick = (portableHash(key + 7919L) % n).toInt // hash ≥ 0, % == pmod
        md.update(bytes, starts(pick), ends(pick) - starts(pick))
      } else md.update(bytes, starts(i), ends(i) - starts(i))
      i += 1
    }
    val d   = md.digest()
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, nMasked, nMaskTok, nRandom, UTF8String.fromBytes(hex)))
  }
}

/** Fused PII battery (x28): the four audit counts over the raw text plus
  * the 4-stage tagged scrub in ONE expression — the declarative form ran
  * eight separate regexp passes (4 × regexp_count + 4 × regexp_replace),
  * each with its own UTF8String↔String round trip. Patterns and pass
  * order are EXACTLY [[TextOps]]'s (URL → email → IPv4 → phone; counts
  * independent on the raw text), evaluated by the same java.util.regex
  * engine Spark's builtins use, so results are bit-identical and the
  * DuckDB oracle is unchanged.
  */
case class PiiScan(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got $other")
  }

  override def dataType: DataType = PiiScan.schema
  override def prettyName: String = "pii_scan"

  override protected def nullSafeEval(input: Any): Any =
    PiiScan.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan$$.MODULE$$.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

object PiiScan {
  import org.apache.spark.sql.types._

  val schema: StructType = StructType(Seq(
    StructField("n_urls", LongType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false),
  ))

  // compiled once per JVM — same pattern strings as the Column API
  private lazy val url   = java.util.regex.Pattern.compile(TextOps.UrlRe)
  private lazy val email = java.util.regex.Pattern.compile(TextOps.EmailRe)
  private lazy val ip    = java.util.regex.Pattern.compile(TextOps.Ipv4Re)
  private lazy val phone = java.util.regex.Pattern.compile(TextOps.PhoneRe)

  private def count(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  def scan(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val raw = text.toString
    val counts = Array(count(url, raw), count(email, raw), count(ip, raw), count(phone, raw))
    val scrubbed = phone.matcher(
      ip.matcher(
        email.matcher(
          url.matcher(raw).replaceAll("<URL>")).replaceAll("<EMAIL>")).replaceAll("<IP>"))
      .replaceAll("<PHONE>")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](counts(0), counts(1), counts(2), counts(3), UTF8String.fromString(scrubbed)))
  }
}
