package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A scored candidate row flowing into [[TopKScored]]. */
final case class Scored(id: Long, score: Double)

/** Typed top-k-by-score aggregator.
  *
  * The point of doing top-k as an `Aggregator` (vs `row_number` over a
  * window) is partial aggregation: Spark runs `reduce` map-side, so each
  * input partition contributes at most k rows to the shuffle instead of its
  * entire share of the scored set. For a k-NN join over |corpus|×|queries|
  * scored pairs, the shuffle drops from the full cross product to
  * k × |queries| × numPartitions tiny buffers — the difference between a
  * plan that survives 100 TB and one that doesn't.
  *
  * Ordering is deterministic: score desc, then id asc.
  */
final class TopKScored(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def prune(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[Scored] = Vector.empty

  // Amortize: let the buffer grow to 2k before re-sorting.
  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
    val b = buf :+ a
    if (b.length >= 2 * k) prune(b) else b
  }

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = prune(b1 ++ b2)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = prune(reduction)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopKScored {

  /** Untyped UDAF handle: call as `topK(idCol, scoreCol)`. */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKScored(k), Encoders.product[Scored])
}
