package graft.streaming

import graft.streaming.StreamingAdmission.Doc
import org.apache.spark.sql.Dataset

/** Streaming PPS admission — the ingestion-time form of
  * [[graft.ops.Sampling.ppsSample]]: every arriving document is admitted
  * with probability p = min(1, n·w/W) against a FROZEN corpus-total
  * snapshot W, decided by the identical exact-integer rule
  * (hash32·W < w·n·2^32, BigInt here, DECIMAL(38,0) in batch). Like the
  * DSIR ratio model and the SemDeDup centroids, W is corpus-global, so
  * the streaming layer consumes snapshots and refreshes are batch
  * re-aggregations; against the same snapshot the decision is a function
  * of the document ALONE — stateless, and bit-equal to the batch draw
  * (asserted by StreamingPpsSpec). The live-W variant is NOT append-
  * monotone (every arrival changes W and would retroactively invalidate
  * earlier draws — the mixtureSample argument, IMPLEMENTATION.md
  * "Streaming posture"), which is exactly why the snapshot form is the
  * operator a real ingest fleet runs.
  */
object StreamingPps {

  private val Two32 = BigInt(4294967296L)

  /** JVM twin of the batch inclusion rule — same md5 unit, same exact
    * integer cross-products.
    */
  private[graft] def admit(docId: Long, weight: Long, totalW: Long,
                           expectedDocs: Long): Boolean =
    BigInt(StreamingNearDup.md5Hash32Jvm(docId.toString)) * BigInt(totalW) <
      BigInt(weight) * BigInt(expectedDocs) * Two32

  /** Stateless admission filter: keep documents the frozen-snapshot PPS
    * draw selects, weighting by `weigh(text)` (token count in the batch
    * query). Works identically on a stream or a batch Dataset; composes
    * with the other admission stages as a plain filter.
    */
  def admitByDraw(docs: Dataset[Doc], weigh: String => Long, totalW: Long,
                  expectedDocs: Long): Dataset[Doc] =
    docs.filter(d => admit(d.docId, weigh(d.text), totalW, expectedDocs))
}
