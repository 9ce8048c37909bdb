package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming SCD2 interval closer — the ingestion-time form of
  * [[graft.state.Scd2.history]]: each arriving version CLOSES its
  * predecessor's validity interval and emits that completed row the moment
  * the supersession happens, instead of deriving all intervals in a
  * nightly window pass. Append-mode streams cannot retract, so the OPEN
  * head is never emitted — it lives in state (one version per key, the
  * same bounded-state class as the funnel's last-click pair) and is
  * queryable there; the batch operator's `is_current` slice is exactly
  * that state's contents.
  *
  * Semantics match the batch window order: within a micro-batch, versions
  * fold in (ts, id) ascending order, so equal-ms versions close each other
  * in id order — the batch `lead` tiebreak. Across batches the feed is
  * assumed event-time ordered (the W3 checkpoint discipline); a version
  * arriving after a LATER version was already admitted would close out of
  * order, which is the defining batch/stream gap the offline history
  * derivation reconciles.
  *
  * Scale shape: state = ONE version per entity (id, ts, payload — tens of
  * bytes), forever, regardless of stream volume; output is one row per
  * superseded version, exactly the batch history's closed subset.
  */
object StreamingScd2 {

  /** One arriving entity version. */
  final case class Ver(userId: Long, eventId: Long, tsMs: Long,
                       eventType: String, value: Double)

  /** A closed validity interval: version `eventId` held from
    * `validFromMs` until `validToMs` (exclusive), when `closedById`
    * superseded it.
    */
  final case class Closed(userId: Long, eventId: Long, validFromMs: Long,
                          validToMs: Long, closedById: Long,
                          eventType: String, value: Double)

  final class Scd2Processor extends StatefulProcessor[Long, Ver, Closed] {
    @transient private var head: ValueState[Ver] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      head = getHandle.getValueState[Ver]("openHead",
        Encoders.product[Ver], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ver],
        timerValues: TimerValues): Iterator[Closed] = {
      var cur = Option(head.get())
      val out = Seq.newBuilder[Closed]
      // deterministic intra-batch fold in the batch window's (ts, id) order
      rows.toSeq.sortBy(v => (v.tsMs, v.eventId)).foreach { v =>
        cur.foreach { p =>
          out += Closed(key, p.eventId, p.tsMs, v.tsMs, v.eventId,
            p.eventType, p.value)
        }
        cur = Some(v)
      }
      cur.foreach(head.update)
      out.result().iterator
    }
  }

  /** Closed-interval stream: one output row per superseded version; the
    * open head per key stays in state.
    */
  def closeIntervals(versions: Dataset[Ver]): Dataset[Closed] = {
    import versions.sparkSession.implicits._
    versions.groupByKey(_.userId)
      .transformWithState(new Scd2Processor, TimeMode.None(), OutputMode.Append())
  }
}
