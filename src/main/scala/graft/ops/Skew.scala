package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers for 100 TB-scale keyed operations.
  *
  * AQE's skew-join splitting (on by default) handles most cases at runtime;
  * these explicit forms cover the patterns AQE cannot fix:
  *
  *  - [[saltedJoin]]: a shuffle join where a handful of hot keys would pin
  *    single reducers — the large side gets a random-ish salt derived
  *    deterministically from row identity, the small side is replicated
  *    across all salt values, and the join key becomes (key, salt).
  *  - [[hotColdJoin]]: split the large side into hot-key and cold-key
  *    subsets (hot keys broadcast-joined, cold keys shuffle-joined) when the
  *    hot-key set is known or countable.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hashed from the given identity
    * columns (no rand() — keeps retries/replays idempotent, which the
    * at-least-once sink path requires).
    */
  def salt(buckets: Int, identityCols: Column*): Column =
    pmod(hash(identityCols: _*), lit(buckets))

  /** Join types whose semantics survive small-side replication: unmatched
    * SMALL-side rows never appear in these outputs, so replicating the
    * small side across salt buckets (or hot/cold branches) cannot
    * duplicate them. right/full joins would emit one row per replica.
    */
  private val replicationSafeJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  private def requireReplicationSafe(joinType: String): Unit =
    require(replicationSafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"join type '$joinType' is not replication-safe (unmatched small-side rows would duplicate); " +
        "use inner/left/left_semi/left_anti")

  /** Salted equi-join: `large` join `small` on `key`, with the large side
    * salted into `buckets` sub-keys and the small side exploded across all
    * buckets. Result columns = large.* ++ small.* minus the duplicate key.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    requireReplicationSafe(joinType)
    val idCols = large.columns.map(col)
    val l = large.withColumn("__salt", salt(buckets, idCols.toIndexedSeq: _*))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Split-join for known-hot keys: hot rows take a broadcast join (no
    * shuffle of the skewed partition), cold rows take the normal shuffle
    * join; results are unioned. `small` must be broadcastable.
    */
  def hotColdJoin(large: DataFrame, small: DataFrame, key: String, hotKeys: Seq[Any],
                  joinType: String = "inner"): DataFrame = {
    requireReplicationSafe(joinType)
    val hot = large.where(col(key).isInCollection(hotKeys))
      .join(broadcast(small), Seq(key), joinType)
    val cold = large.where(!col(key).isInCollection(hotKeys) || col(key).isNull)
      .join(small, Seq(key), joinType)
    hot.unionByName(cold)
  }

  /** Top-N key frequencies of a column — the driver-side probe used to pick
    * `hotKeys` (cheap: one partial-aggregated count + small top-k).
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topN)
}
