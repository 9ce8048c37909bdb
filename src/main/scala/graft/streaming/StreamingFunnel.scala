package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming conversion-funnel attribution — the ingestion-time form of
  * the batch funnel (`q10_funnel`, built on `AsOf.asofJoinWithin`): each
  * arriving purchase is attributed to the user's LAST click within the
  * tolerance window, the moment it arrives, instead of in a nightly as-of
  * join over everything.
  *
  * Scale shape: state is keyed by user and holds ONE (ts, id) pair — 16
  * bytes per user who ever clicked, regardless of stream volume (the
  * CDC/quota bounded-state class; a `TTLConfig` of the tolerance bounds
  * it further to ACTIVE users, since an expired click can never satisfy
  * the staleness check anyway).
  *
  * Semantics match the batch join's frame order: within a micro-batch,
  * rows fold in (ts, side, id) order — clicks sort before purchases at
  * the same instant, so an exactly-simultaneous click IS visible
  * (inclusive boundary), and tied clicks resolve to the greatest id
  * (the batch tieBreak). Across batches the feed is assumed event-time
  * ordered (the source checkpoint discipline of W3); a click arriving
  * after its purchase was already attributed cannot retro-attribute —
  * that is the defining batch/stream gap of any as-of join, the same
  * reason the batch operator exists for offline reconciliation.
  */
object StreamingFunnel {

  /** One incoming event (clicks and purchases share the stream). */
  final case class Ev(userId: Long, eventId: Long, tsMs: Long, eventType: String)

  /** The per-user state: the best (latest, greatest-id) click seen. */
  final case class LastClick(tsMs: Long, clickId: Long)

  /** A purchase with its attribution (None = no click within tolerance). */
  final case class Attribution(userId: Long, purchaseId: Long, tsMs: Long,
                               clickId: Option[Long], clickTsMs: Option[Long])

  final class FunnelProcessor(toleranceMs: Long)
      extends StatefulProcessor[Long, Ev, Attribution] {
    @transient private var last: ValueState[LastClick] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastClick]("lastClick",
        Encoders.product[LastClick], TTLConfig_NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Attribution] = {
      var best = Option(last.get())
      val out = Seq.newBuilder[Attribution]
      // deterministic intra-batch fold mirroring the batch window order:
      // (ts, side, id) with clicks (side 0) before purchases at equal ts
      rows.toSeq.sortBy(e => (e.tsMs, if (e.eventType == "click") 0 else 1, e.eventId))
        .foreach { e =>
          if (e.eventType == "click") {
            // keep the latest click; ties on ts resolve to the greatest id
            if (best.forall(b => b.tsMs < e.tsMs ||
                (b.tsMs == e.tsMs && b.clickId < e.eventId)))
              best = Some(LastClick(e.tsMs, e.eventId))
          } else if (e.eventType == "purchase") {
            val hit = best.filter(b => b.tsMs >= e.tsMs - toleranceMs)
            out += Attribution(key, e.eventId, e.tsMs,
              hit.map(_.clickId), hit.map(_.tsMs))
          }
        }
      best.foreach(last.update)
      out.result().iterator
    }
  }

  private val TTLConfig_NONE = org.apache.spark.sql.streaming.TTLConfig.NONE

  /** Attribution stream: one output row per arriving purchase, matched
    * against the user's last in-window click (state = one pair per user).
    */
  def attribute(events: Dataset[Ev], toleranceMs: Long): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(toleranceMs), TimeMode.None(), OutputMode.Append())
  }
}
