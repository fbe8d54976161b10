package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Java-serializable holder for a KLL sketch: the sketch object itself is
  * not `Serializable`, but it defines a compact byte image, so the holder
  * round-trips through that. Spark's typed-Aggregator machinery
  * (`ScalaAggregator`, a `TypedImperativeAggregate`) keeps the buffer as
  * this live object during partial aggregation and only serializes at
  * shuffle boundaries — updates stay O(1) per row, never
  * serialize-per-row.
  */
final class KllHolder(@transient var sk: KllDoublesSketch) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val b = sk.toByteArray
    out.writeInt(b.length)
    out.write(b)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    sk = KllDoublesSketch.heapify(Memory.wrap(b))
  }
}

/** Mergeable quantile sketch aggregation (Apache DataSketches KLL,
  * Karnin–Lang–Liberty 2016) — `percentile_approx`'s answer is a number;
  * this aggregator's answer is a MERGEABLE binary, the difference that
  * matters at 100 TB: sketch each ingest bucket once, answer any
  * cross-bucket quantile later by merging KB-sized sketches, no raw-data
  * rescan (the same incremental pattern as the HLL distinct sketches in
  * [[graft.operators.Sketches]]).
  *
  * k = 200 gives ~0.65% normalized rank error at 99% confidence
  * (the library default). Nulls/NaNs are skipped by the caller's filter.
  */
final class KllSketchAgg(k: Int) extends Aggregator[Double, KllHolder, Array[Byte]] {
  override def zero: KllHolder = new KllHolder(KllDoublesSketch.newHeapInstance(k))

  override def reduce(b: KllHolder, a: Double): KllHolder = { b.sk.update(a); b }

  override def merge(b1: KllHolder, b2: KllHolder): KllHolder = { b1.sk.merge(b2.sk); b1 }

  override def finish(b: KllHolder): Array[Byte] = b.sk.toByteArray

  override def bufferEncoder: Encoder[KllHolder] = Encoders.javaSerialization[KllHolder]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union of already-built KLL sketch binaries — the rollup aggregator. */
final class KllUnionAgg(k: Int) extends Aggregator[Array[Byte], KllHolder, Array[Byte]] {
  override def zero: KllHolder = new KllHolder(KllDoublesSketch.newHeapInstance(k))

  override def reduce(b: KllHolder, bytes: Array[Byte]): KllHolder = {
    if (bytes != null && bytes.nonEmpty) b.sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    b
  }

  override def merge(b1: KllHolder, b2: KllHolder): KllHolder = { b1.sk.merge(b2.sk); b1 }

  override def finish(b: KllHolder): Array[Byte] = b.sk.toByteArray

  override def bufferEncoder: Encoder[KllHolder] = Encoders.javaSerialization[KllHolder]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object KllSketchAgg {
  import org.apache.spark.sql.functions.udaf
  import org.apache.spark.sql.expressions.UserDefinedFunction

  /** `kll_sketch_agg(valueCol)`: double column → sketch binary. */
  def sketchUdaf(k: Int = 200): UserDefinedFunction =
    udaf(new KllSketchAgg(k), Encoders.scalaDouble)

  /** `kll_union_agg(sketchCol)`: sketch binaries → merged sketch binary. */
  def unionUdaf(k: Int = 200): UserDefinedFunction =
    udaf(new KllUnionAgg(k), Encoders.BINARY)

  /** Driver-side quantile extraction from a sketch binary (INCLUSIVE rank,
    * the DataSketches default).
    */
  def quantile(bytes: Array[Byte], q: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
      .getQuantile(q, org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)

  /** Rank of a value in a sketch binary (INCLUSIVE). */
  def rank(bytes: Array[Byte], v: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
      .getRank(v, org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
}
