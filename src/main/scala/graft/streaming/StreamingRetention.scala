package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming cohort-retention tracking — the ingestion-time form of the
  * batch retention matrix (`q11_retention`): each user's cohort is their
  * FIRST active day (append-monotone under an event-time-ordered feed,
  * the same W3 assumption as the funnel), and each (user, day) first
  * touch emits ONE increment row `(cohort_day, day_offset)`; summing the
  * increments downstream — a plain streaming count aggregate or the
  * nightly batch — yields exactly the batch matrix, because the bitmask
  * guarantees each (user, day) cell increments once no matter how many
  * events arrive in it.
  *
  * Scale shape: state per user = the cohort day plus a SEEN-DAYS BITMASK
  * — one long covers a 64-day retention horizon, 16 bytes per user
  * forever (the funnel/CDC bounded-state class). A longer horizon widens
  * the mask by one long per additional 64 days; it never grows with
  * event volume. Days beyond the horizon are rejected loudly rather than
  * silently mis-counted.
  */
object StreamingRetention {

  /** One incoming event (only user and event time matter here). */
  final case class Ev(userId: Long, tsMs: Long)

  /** First touch of a (user, day) cell, pre-aggregated shape. */
  final case class Touch(cohortDay: Long, dayOffset: Long)

  /** Per-user state: cohort day + seen-day bitmask (bit i = offset i). */
  final case class UserDays(cohortDay: Long, seenMask: Long)

  final class RetentionProcessor extends StatefulProcessor[Long, Ev, Touch] {
    @transient private var days: ValueState[UserDays] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      days = getHandle.getValueState[UserDays]("days",
        Encoders.product[UserDays], TTLConfig_NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Touch] = {
      var st = Option(days.get())
      val out = Seq.newBuilder[Touch]
      // ascending event time: the first row of a new user defines the
      // cohort exactly as the batch per-user min does on an ordered feed
      rows.toSeq.sortBy(_.tsMs).foreach { e =>
        val day = Math.floorDiv(e.tsMs, 86400000L)
        st match {
          case None =>
            st = Some(UserDays(day, 1L))
            out += Touch(day, 0L)
          case Some(s) =>
            val off = day - s.cohortDay
            require(off >= 0,
              s"out-of-order feed: day $day precedes cohort ${s.cohortDay} for user $key")
            require(off < 64,
              s"retention horizon exceeded (offset $off >= 64): widen the mask")
            if ((s.seenMask & (1L << off)) == 0L) {
              st = Some(s.copy(seenMask = s.seenMask | (1L << off)))
              out += Touch(s.cohortDay, off)
            }
        }
      }
      st.foreach(days.update)
      out.result().iterator
    }
  }

  private val TTLConfig_NONE = org.apache.spark.sql.streaming.TTLConfig.NONE

  /** The first-touch increment stream: one row per new (user, day) cell;
    * count by (cohortDay, dayOffset) downstream to get the matrix.
    */
  def touches(events: Dataset[Ev]): Dataset[Touch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new RetentionProcessor, TimeMode.None(), OutputMode.Append())
  }
}
