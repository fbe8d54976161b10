package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Serializable holder for a frequent-items sketch (Misra–Gries family —
  * the same live-buffer / bytes-at-boundaries pattern as [[KllHolder]]).
  */
final class FreqHolder(@transient var sk: ItemsSketch[String]) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val b = sk.toByteArray(new ArrayOfStringsSerDe())
    out.writeInt(b.length)
    out.write(b)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    sk = ItemsSketch.getInstance(Memory.wrap(b), new ArrayOfStringsSerDe())
  }
}

/** Mergeable heavy-hitters aggregation (DataSketches frequent-items): the
  * question a corpus registry answers constantly — which tokens / domains /
  * sources DOMINATE a slice — with guaranteed bounds instead of a full
  * groupBy of the stream: every item with true count ≥ N·ε is surfaced
  * (ε = 3.5/maxMapSize), and each surfaced item carries [lower, upper]
  * bounds that always bracket its true count. Per-bucket sketches merge to
  * any rollup without rescanning raw data, like the HLL/KLL/theta family.
  */
final class FreqItemsAgg(maxMapSize: Int) extends Aggregator[String, FreqHolder, Array[Byte]] {
  override def zero: FreqHolder = new FreqHolder(new ItemsSketch[String](maxMapSize))

  override def reduce(b: FreqHolder, a: String): FreqHolder = {
    if (a != null) b.sk.update(a)
    b
  }

  override def merge(b1: FreqHolder, b2: FreqHolder): FreqHolder = { b1.sk.merge(b2.sk); b1 }

  override def finish(b: FreqHolder): Array[Byte] = b.sk.toByteArray(new ArrayOfStringsSerDe())

  override def bufferEncoder: Encoder[FreqHolder] = Encoders.javaSerialization[FreqHolder]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union of already-built frequent-items sketch binaries. */
final class FreqUnionAgg(maxMapSize: Int) extends Aggregator[Array[Byte], FreqHolder, Array[Byte]] {
  override def zero: FreqHolder = new FreqHolder(new ItemsSketch[String](maxMapSize))

  override def reduce(b: FreqHolder, bytes: Array[Byte]): FreqHolder = {
    if (bytes != null && bytes.nonEmpty)
      b.sk.merge(ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe()))
    b
  }

  override def merge(b1: FreqHolder, b2: FreqHolder): FreqHolder = { b1.sk.merge(b2.sk); b1 }

  override def finish(b: FreqHolder): Array[Byte] = b.sk.toByteArray(new ArrayOfStringsSerDe())

  override def bufferEncoder: Encoder[FreqHolder] = Encoders.javaSerialization[FreqHolder]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object FreqItemsAgg {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.sql.functions.udaf

  def sketchUdaf(maxMapSize: Int = 1024): UserDefinedFunction =
    udaf(new FreqItemsAgg(maxMapSize), Encoders.STRING)

  def unionUdaf(maxMapSize: Int = 1024): UserDefinedFunction =
    udaf(new FreqUnionAgg(maxMapSize), Encoders.BINARY)

  /** Items whose count COULD reach `threshold` (NO_FALSE_NEGATIVES: every
    * item with true count ≥ threshold is guaranteed present). Returns
    * (item, estimate, lowerBound, upperBound).
    */
  def frequentItems(bytes: Array[Byte], threshold: Long): Seq[(String, Long, Long, Long)] = {
    val sk = ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())
    sk.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound)).toSeq
  }

  /** Count bounds for one item: (estimate, lower, upper); lower ≤ true ≤ upper. */
  def bounds(bytes: Array[Byte], item: String): (Long, Long, Long) = {
    val sk = ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())
    (sk.getEstimate(item), sk.getLowerBound(item), sk.getUpperBound(item))
  }
}
