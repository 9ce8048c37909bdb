package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming token-budget quota — the streaming form of
  * `ops/Sampling.tokenQuota`: documents arrive on an unbounded stream and
  * each GROUP (source, language, …) admits documents until its token
  * budget is exhausted; everything after is dropped. The ingestion-time
  * "cap each source at N tokens" admission a continuously-fed training
  * mix needs — admit at arrival, not in a nightly batch over everything.
  *
  * Scale shape: the group key is the quota key, so state shards like any
  * keyed aggregation and holds ONE long (the group's admitted token
  * count) per group — bytes per source, regardless of stream volume.
  *
  * Semantics are GREEDY ARRIVAL-ORDER (a doc is admitted iff the group's
  * running total plus its tokens fits; a too-big doc is skipped but later
  * smaller ones may still fit) — the same skip-and-continue rule as the
  * batch operator's greedy form, with arrival order in place of the md5
  * priority order: a stream cannot re-order what has not arrived yet.
  * Within one micro-batch, rows are folded in (tokenCount asc, docId)
  * deterministic order so replays of the same batch admit the same set.
  */
object StreamingQuota {

  /** One incoming document with its quota group. */
  final case class Doc(group: String, docId: Long, text: String)

  /** An admitted document: its token count and the group total AFTER it. */
  final case class Admitted(group: String, docId: Long, nTokens: Long, cumTokens: Long)

  /** JVM twin of `TextAnalysis.tokenCount` (Column form) — keep in sync:
    * letter runs, digit runs, single other non-space glyphs over the
    * normalized text.
    */
  private[graft] def tokenCount(text: String): Long = {
    val norm = StreamingDedup.normalize(text)
    graft.ops.TextAnalysis.TokenPattern.r.findAllIn(norm).size.toLong
  }

  final class QuotaProcessor(budget: Long) extends StatefulProcessor[String, Doc, Admitted] {
    @transient private var spent: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      spent = getHandle.getValueState[Long]("spent", Encoders.scalaLong, TTLConfig_NONE)

    override def handleInputRows(key: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Admitted] = {
      var total = Option(spent.get()).getOrElse(0L)
      val out = Seq.newBuilder[Admitted]
      // deterministic intra-batch fold: smallest docs first maximizes
      // batch-local admissions and is replay-stable
      rows.toSeq.map(d => (tokenCount(d.text), d)).sortBy { case (n, d) => (n, d.docId) }
        .foreach { case (n, d) =>
          // zero-token docs always fit (cum unchanged) — same membership
          // rule as the batch greedy form
          if (total + n <= budget) {
            total += n
            out += Admitted(key, d.docId, n, total)
          }
        }
      spent.update(total)
      out.result().iterator
    }
  }

  private val TTLConfig_NONE = org.apache.spark.sql.streaming.TTLConfig.NONE

  /** Budget-admission filter over a document stream; each group admits
    * until `budget` tokens are spent, forever (state = one long/group).
    */
  def admitWithinBudget(docs: Dataset[Doc], budget: Long): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.group)
      .transformWithState(new QuotaProcessor(budget), TimeMode.None(), OutputMode.Append())
  }
}
