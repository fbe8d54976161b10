package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Streaming backward as-of join (temporal join): enrich each left event
  * with the latest right row of the same key at or before the event's
  * timestamp — [[graft.operators.Joins.asofJoin]] over an unbounded stream.
  * Spark has no native temporal join (stream-stream joins are
  * interval-equality, not point-in-time); this is the
  * `flatMapGroupsWithState` formulation, the same design as Flink's
  * temporal table join:
  *
  *  - LEFT rows wait in state until the event-time watermark passes their
  *    timestamp — only then is "every right row at or before ts has
  *    arrived" guaranteed, so the match emitted is the one batch would
  *    produce, regardless of cross-batch arrival order.
  *  - RIGHT rows accumulate in a sorted buffer; once the watermark passes,
  *    everything strictly older than the newest right row at-or-below the
  *    watermark is evicted (that newest row stays — it is the floor match
  *    for the next left row), so state is bounded by the watermark horizon,
  *    not the stream length.
  *
  * Both buffers and all comparisons are in epoch micros, the batch
  * operator's precision. Inner semantics: a left row whose key has no
  * right row at or before it emits nothing (same as `asofJoin`'s default).
  */
object AsofStream {
  /** Unioned input: side 0 = right (enrichment source), side 1 = left. */
  final case class Tagged(user_id: Long, ts: Timestamp, side: Int, event_id: Long, view_id: Long, view_value: Double)
  final case class Matched(event_id: Long, user_id: Long, view_id: Long, view_value: Double, lag_us: Long)
  final case class RightRow(tsUs: Long, viewId: Long, value: Double)
  final case class LeftRow(tsUs: Long, eventId: Long)
  final case class AsofState(rights: Vector[RightRow], pending: Vector[LeftRow])

  private def micros(ts: Timestamp): Long = {
    val inst = ts.toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  private def insertRight(buf: Vector[RightRow], r: RightRow): Vector[RightRow] = {
    val i = buf.lastIndexWhere(_.tsUs <= r.tsUs) + 1
    (buf.take(i) :+ r) ++ buf.drop(i)
  }

  /** Greatest right row with tsUs <= t, if any (buffer sorted ascending). */
  private def floorOf(buf: Vector[RightRow], t: Long): Option[RightRow] = {
    val i = buf.lastIndexWhere(_.tsUs <= t)
    if (i < 0) None else Some(buf(i))
  }

  def enrichStream(spark: SparkSession, tagged: Dataset[Tagged]): Dataset[Matched] = {
    import spark.implicits._
    tagged
      .groupByKey(_.user_id)
      // EventTimeTimeout, not NoTimeout: flatMapGroupsWithState only invokes
      // a group when it has new rows OR a fired timeout — a left row waiting
      // for the watermark in a group that then goes quiet would otherwise
      // never emit. The timeout is armed at the earliest pending left, so
      // the group wakes exactly when that row ripens.
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Tagged], state: GroupState[AsofState]) =>
          var st = state.getOption.getOrElse(AsofState(Vector.empty, Vector.empty))
          if (!state.hasTimedOut) {
            it.foreach { row =>
              if (row.side == 0)
                st = st.copy(rights = insertRight(st.rights, RightRow(micros(row.ts), row.view_id, row.view_value)))
              else
                st = st.copy(pending = st.pending :+ LeftRow(micros(row.ts), row.event_id))
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // Lefts STRICTLY below the watermark are final. Not <=: Spark's
          // late filter drops rows with ts <= wm-1ms only, so a right row
          // AT the watermark is still on time — a left at the same instant
          // must keep waiting or it would emit before its inclusive
          // same-instant match can arrive. Emit in timestamp order.
          val (ripe, wait) = st.pending.partition(_.tsUs < wmUs)
          val out = ripe.sortBy(l => (l.tsUs, l.eventId)).flatMap { l =>
            floorOf(st.rights, l.tsUs).map(r =>
              Matched(l.eventId, user, r.viewId, r.value, l.tsUs - r.tsUs))
          }
          // Evict rights no future left can reach: every remaining left has
          // tsUs >= wmUs, so anything strictly older than the newest right
          // at-or-below the watermark (the floor) is unreachable.
          val floorIdx = st.rights.lastIndexWhere(_.tsUs <= wmUs)
          val rights   = if (floorIdx > 0) st.rights.drop(floorIdx) else st.rights
          if (rights.isEmpty && wait.isEmpty) {
            state.remove()
          } else {
            state.update(AsofState(rights, wait))
            if (wait.nonEmpty) {
              // wake when the watermark passes the earliest waiting left;
              // ms-ceil and the +1 keep the timestamp strictly above the
              // current watermark (API requirement) for sub-ms residues
              val wakeMs = Math.floorDiv(wait.map(_.tsUs).min + 999L, 1000L)
              state.setTimeoutTimestamp(math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }
}
