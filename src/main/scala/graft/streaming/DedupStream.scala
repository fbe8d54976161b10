package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the unbounded-stream form of [[Dedup
  * .exactDupGroups]] (D1): emit only the first row seen for each dedup key.
  *
  * State is bounded by the event-time watermark: a key's fingerprint is
  * dropped from the state store once it ages past the horizon, which is the
  * standard scale contract for an infinite stream (an unbounded seen-set
  * cannot exist on any cluster). Within the horizon the semantics match the
  * batch first-wins dedup exactly, which is what the parity test asserts.
  */
object DedupStream {

  /** Keep the first row per `keyCols` within the watermark horizon. */
  def firstSeen(stream: DataFrame, tsCol: String, keyCols: Seq[String], watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Exact-text dedup: key = md5 of the text column (D1's key). */
  def exactTextDedup(stream: DataFrame, tsCol: String, textCol: String, watermark: String): DataFrame =
    firstSeen(
      stream.withColumn("__text_hash", Dedup.exactKey(col(textCol))),
      tsCol,
      Seq("__text_hash"),
      watermark,
    ).drop("__text_hash")
}
