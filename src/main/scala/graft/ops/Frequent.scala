package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters in BOUNDED memory — the two-pass Misra–Gries
  * algorithm (Misra & Gries '82; the MG summary is the canonical
  * mergeable frequent-items sketch, Agarwal et al. PODS'12): find every
  * key with frequency > n/k without ever materializing the full key
  * space in any aggregation state.
  *
  * Why not a plain groupBy-count? Exact counting shuffles ONE AGGREGATE
  * ROW PER DISTINCT KEY — at 100 TB a long-tail key column (URLs, user
  * agents, shingles) has billions of distinct keys, and the hash
  * aggregate's state is the key space. The MG summary holds at most k−1
  * counters whatever the input: on overflow every counter decrements —
  * charging each decrement against k distinct arrivals — so any key with
  * true frequency > n/k MUST survive with a positive counter (≤ n/k
  * decrements can hit it). Summaries MERGE by adding counters and
  * re-decrementing to k−1, so the per-partition pass is one
  * `mapPartitions` (genuine per-partition imperative state — the
  * documented last-resort case) and the driver merge touches ≤
  * partitions × (k−1) rows.
  *
  * Pass 2 makes the answer EXACT, not approximate: the ≤ 2k−1 candidates
  * broadcast back and one filtered re-count (map-side combined over a
  * k-bounded key space) recovers true frequencies; the guarantee means
  * recall is 1, the recount makes precision 1 — so the operator sits
  * under the bit-exact oracle gate like everything else here.
  */
object Frequent {

  /** One MG insert step (shared by [[mgFold]] and the multi-column
    * single-pass fold in [[SketchCatalog]]): add weight `w` for `key`,
    * keeping ≤ k−1 counters by the decrement-all rule.
    */
  private[graft] def mgAdd(m: scala.collection.mutable.HashMap[String, Long],
                           key: String, w: Long, k: Int): Unit =
    if (m.contains(key)) m(key) += w
    else {
      m(key) = w
      if (m.size >= k) {
        // decrement all by the smallest counter; drop zeros — one pass,
        // charges the decrement against >= k distinct keys at once
        val d = m.values.min
        val dead = m.collect { case (kk, v) if v <= d => kk }
        m.mapValuesInPlace((_, v) => v - d)
        dead.foreach(m.remove)
      }
    }

  /** The MG invariant, reusable for merging: fold (key, weight) pairs
    * into ≤ k−1 counters.
    */
  private[graft] def mgFold(rows: Iterator[(String, Long)], k: Int):
      Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    rows.foreach { case (key, w) => mgAdd(m, key, w, k) }
    m.toMap
  }

  /** Every key of `keyCol` with frequency STRICTLY greater than n/k,
    * with its EXACT count: (key, n_occurrences), by the two-pass MG
    * scheme above. Output is exact — gate it like any deterministic
    * operator. NULL keys are excluded (no defensible identity).
    */
  def heavyHitters(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = OpCaches.pin(
      df.select(keyCol.cast("string").as("__key")).where(col("__key").isNotNull))
    // pass 1: per-partition MG summaries merged on the driver by the same
    // fold. BOTH folds run at summary size 2k: each fold's total decrement
    // mass is ≤ (its input mass)/size, so the two phases together
    // under-count any key by ≤ n/(2k) + n/(2k) = n/k — and a key with
    // true frequency > n/k therefore keeps a positive counter (recall
    // exactly 1; a single-fold size-k summary would only bound the
    // combined undercount by 2n/k and could drop a boundary heavy hitter).
    // Collected volume: ≤ partitions × (2k−1) rows.
    val partials = keys.as[String]
      .mapPartitions(it => mgFold(it.map((_, 1L)), 2 * k).iterator)
      .collect()
    val candidates = mgFold(partials.iterator, 2 * k).keys.toSeq
    // pass 2: exact recount of the ≤ k−1 candidates only — the aggregate
    // key space is k-bounded regardless of input cardinality
    val total = keys.count()
    keys.where(col("__key").isin(candidates: _*))
      .groupBy(col("__key").as("key"))
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") * k > total)
      .select(col("key"), col("n_occurrences"))
  }
}
