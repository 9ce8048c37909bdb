package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming per-key sequence building — the ingestion-time form of
  * [[graft.ops.Sequences.buildSequences]]: each arriving event is ASSIGNED
  * its position in the key's capped sequence and emitted exactly once as
  * `(userId, rn, token)`; re-assembling the assignments downstream (sort
  * by rn, join tokens — or any incremental writer keyed on (user, rn))
  * reproduces the batch sequence bit-for-bit, because positions are
  * immutable once assigned. Events past the cap emit NOTHING — the
  * truncation the batch form applies before collection, applied here
  * before state.
  *
  * Ordering contract: intra-batch rows are sorted by (tsMs, tieId) —
  * the batch window's frame order — and cross-batch ordering relies on
  * the event-time-ordered feed (the W3 assumption shared by the funnel /
  * retention / SCD2 processors; an out-of-order arrival that would alter
  * an ALREADY-ASSIGNED position cannot be expressed in append mode and
  * trips the monotonicity check loudly).
  *
  * Scale shape: state per key = ONE (count, lastTs, lastTie) triple — 24
  * bytes forever, never the sequence itself (the emitted assignments ARE
  * the sequence; state only needs to know how many were assigned and
  * where the order cursor stands). The bounded-state class of the
  * funnel, one size below retention's bitmask.
  */
object StreamingSequences {

  /** One incoming event. */
  final case class Ev(userId: Long, tieId: Long, tsMs: Long, token: String)

  /** An immutable position assignment in the key's sequence. */
  final case class Assign(userId: Long, rn: Int, token: String)

  /** Per-key cursor: positions assigned so far + the order high-water mark. */
  final case class Cursor(n: Int, lastTs: Long, lastTie: Long)

  final class SequenceProcessor(maxLen: Int)
      extends StatefulProcessor[Long, Ev, Assign] {
    @transient private var cursor: ValueState[Cursor] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cursor = getHandle.getValueState[Cursor]("cursor",
        Encoders.product[Cursor], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Assign] = {
      var st = Option(cursor.get()).getOrElse(Cursor(0, Long.MinValue, Long.MinValue))
      val out = Seq.newBuilder[Assign]
      rows.toSeq.sortBy(e => (e.tsMs, e.tieId)).foreach { e =>
        require(e.tsMs > st.lastTs || (e.tsMs == st.lastTs && e.tieId > st.lastTie),
          s"out-of-order feed for user $key: (${e.tsMs}, ${e.tieId}) after " +
            s"(${st.lastTs}, ${st.lastTie}) — a position already assigned would move")
        if (st.n < maxLen) {
          out += Assign(key, st.n + 1, e.token)
          st = Cursor(st.n + 1, e.tsMs, e.tieId)
        } else st = st.copy(lastTs = e.tsMs, lastTie = e.tieId)
      }
      cursor.update(st)
      out.result().iterator
    }
  }

  /** The assignment stream: one row per (user, position), exactly once. */
  def assignments(events: Dataset[Ev], maxLen: Int): Dataset[Assign] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new SequenceProcessor(maxLen), TimeMode.None(),
        OutputMode.Append())
  }
}
