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
    require(replicationSafeJoinTypes.contains(
        joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "")),
      s"join type '$joinType' is not replication-safe (unmatched small-side rows would duplicate); " +
        "use inner/left/left_semi/left_anti")

  /** Salted equi-join: `large` join `small` on `key`, with the large side
    * salted into `buckets` sub-keys and the small side exploded across all
    * buckets. Result columns = large.* ++ small.* minus the duplicate key.
    *
    * The salt hashes `identityCols` when given (pick a few cheap columns
    * that distinguish rows of the same key — e.g. a line number); the
    * default hashes every hashable column of the large side, which is
    * correct but pays to hash wide payload columns per row. Map columns
    * are excluded from the default (Spark's `hash` rejects MapType).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, buckets: Int,
                 joinType: String = "inner", identityCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    requireReplicationSafe(joinType)
    val idCols =
      if (identityCols.nonEmpty) identityCols.map(col)
      else large.schema.fields
        .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
        .map(f => col(f.name)).toSeq
    require(idCols.nonEmpty, "no hashable columns to derive the salt from")
    val l = large.withColumn("__salt", salt(buckets, idCols: _*))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Split-join for known-hot keys: hot rows take a broadcast join (no
    * shuffle of the skewed partition), cold rows take the normal shuffle
    * join; results are unioned. `small` must be broadcastable.
    *
    * Null handling: a null in `hotKeys` routes the NULL-keyed rows through
    * the broadcast branch — null keys all hash to one reducer, so they are
    * often exactly the skew being mitigated (keyHistogram reports the null
    * group for this reason). The IN probe itself is null-stripped and
    * coalesced: three-valued `IN (…, null, …)` would otherwise evaluate to
    * SQL NULL for every non-hot key and silently drop the row from BOTH
    * branches.
    */
  def hotColdJoin(large: DataFrame, small: DataFrame, key: String, hotKeys: Seq[Any],
                  joinType: String = "inner"): DataFrame = {
    requireReplicationSafe(joinType)
    val nonNullHot = hotKeys.filter(_ != null)
    val inHot =
      if (nonNullHot.isEmpty) lit(false)
      else coalesce(col(key).isInCollection(nonNullHot), lit(false))
    val hotPred = // total (never SQL NULL): every row lands in exactly one branch
      if (hotKeys.exists(_ == null)) inHot || col(key).isNull else inHot
    val hot = large.where(hotPred)
      .join(broadcast(small), Seq(key), joinType)
    val cold = large.where(!hotPred)
      .join(small, Seq(key), joinType)
    hot.unionByName(cold)
  }

  /** Top-N key frequencies of a column — the driver-side probe used to pick
    * `hotKeys` (cheap: one partial-aggregated count + small top-k).
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(topN)
}
