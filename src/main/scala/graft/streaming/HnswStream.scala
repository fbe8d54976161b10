package graft.streaming

import graft.operators.Hnsw
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming HNSW maintenance — the [[graft.operators.Ivf.streamInto]]
  * twin for the graph store (VERDICT r13 task 5): a live-index user was
  * forced onto IVF because HNSW had batch [[Hnsw.applyDelta]] but no
  * streaming wrapper. Each micro-batch routes through `applyDelta`
  * unchanged, so the stream inherits the batch path's whole contract:
  * id-hash shard routing with no store read, touched-shards-only
  * rebuild/extend, the staged `.delta` write + per-shard directory swap,
  * and the crashed-swap recovery that runs at every applyDelta entry — a
  * kill between micro-batches (or mid-swap) never loses a shard, the next
  * batch completes the swap first.
  *
  * Delivery semantics: foreachBatch is at-least-once on retry, and
  * `applyDelta` is IDEMPOTENT for exactly this shape — `added` rows are
  * id-keyed upserts (a replayed batch replaces rows with themselves) and
  * removals of already-absent ids are no-ops — so a batch replay
  * converges to the same store, unlike an append-only sink where replays
  * accumulate duplicates.
  *
  * The store must exist before the stream starts ([[Hnsw.writeIndex]] —
  * the bootstrap-then-stream lifecycle of [[RecrawlStream]]); an empty
  * bootstrap (`df.limit(0)`) is fine, shards then populate as batches
  * arrive. Unlike IVF's append-only `streamInto`, a sustained-growth
  * store should pair this with [[Hnsw.maintain]] on a maintenance cadence
  * (the shard COUNT never changes under applyDelta; the rows-per-shard
  * budget erodes as the corpus grows).
  *
  * With `opCol` set, the stream is a CDC feed: rows whose `opCol` equals
  * `deleteOp` are removals (vector column ignored), everything else
  * upserts. With `opCol` null every row is an upsert.
  */
object HnswStream {

  def into(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      vecCol: String,
      idCol: String,
      opCol: String = null,
      deleteOp: String = "delete",
      availableNow: Boolean = true,
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (removed, added) =
          if (opCol == null)
            (batch.limit(0).select(col(idCol)), batch.select(col(idCol), col(vecCol)))
          else
            (batch.where(col(opCol) === deleteOp).select(col(idCol)),
              batch.where(col(opCol) =!= deleteOp).select(col(idCol), col(vecCol)))
        Hnsw.applyDelta(batch.sparkSession, path, removed, added, vecCol, idCol)
        ()
      }
    (if (availableNow) w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()) else w)
      .start()
  }
}
