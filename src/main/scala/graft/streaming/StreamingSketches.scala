package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the [[graft.ops.Sketches]] store — per-group
  * HLL / Count-Min sketches kept current WHILE data arrives, through
  * Spark's built-in streaming aggregation (no custom state): the sketch
  * aggregates are TypedImperativeAggregates, so the state store holds
  * exactly one serialized sketch per group — bounded at 2^lgK registers
  * (HLL) / depth × width longs (CMS) per group FOREVER, the same bounded-
  * state class as the DQ counter monitor.
  *
  * Because register-max (HLL) and cell-add (CMS) are order- and
  * batching-insensitive, the maintained sketch after any prefix of the
  * stream EQUALS the batch sketch over the same rows — the streaming
  * store IS the batch store mid-build (asserted by StreamingSketchesSpec:
  * CMS state byte-identical to batch, HLL estimates equal and monotone
  * across arrival waves). Downstream readers union the live group
  * sketches with frozen stored ones via the same
  * [[graft.ops.Sketches.hllUnionEstimate]] / `cmsUnionSketch` read path.
  */
object StreamingSketches {

  /** Per-group distinct-count sketches over a stream: same contract as
    * the batch [[graft.ops.Sketches.hllGroupSketches]] (it IS the batch
    * plan — streaming-ness comes from the source; complete/update output
    * modes both see one row per group).
    */
  def distinctSketches(stream: DataFrame, groupCol: Column, keyCol: Column,
                       lgK: Int = 12): DataFrame =
    graft.ops.Sketches.hllGroupSketches(stream, groupCol, keyCol, lgK)

  /** Per-group frequency sketches over a stream: the batch
    * [[graft.ops.Sketches.cmsGroupSketches]] plan on a streaming source.
    */
  def frequencySketches(stream: DataFrame, groupCol: Column, keyCol: Column,
                        eps: Double = 1e-4, confidence: Double = 0.999,
                        seed: Int = 42): DataFrame =
    graft.ops.Sketches.cmsGroupSketches(stream, groupCol, keyCol, eps, confidence, seed)

  /** Per-group quantile sketches over a stream: the batch
    * [[graft.ops.Sketches.qsGroupSketches]] plan on a streaming source —
    * state = one serialized GK summary per group, ≤ O(1/relativeError)
    * samples forever. Unlike HLL/CMS the GK summary is NOT
    * order/batching-insensitive: the maintained state after a prefix is
    * a VALID summary honoring the rank bound (the store's actual
    * contract), not byte-identical to the batch one-shot — the spec
    * gates rank-soundness at every arrival wave, not byte equality.
    */
  def quantileSketches(stream: DataFrame, groupCol: Column, valueCol: Column,
                       relativeError: Double = 1e-4): DataFrame =
    graft.ops.Sketches.qsGroupSketches(stream, groupCol, valueCol, relativeError)
}
