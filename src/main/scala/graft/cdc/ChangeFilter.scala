package graft.cdc

import graft.functions.Canonical
import graft.model.Model
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture filter: keep an entity iff its id is absent from the
  * state table OR its content (minus `updatedOnMs`) differs from the cached
  * copy (reference app.js:50, cache.js:69-85 — SURVEY.md §2 rows F2/F3,
  * §2.5 J1/J2).
  *
  * Spark-first formulation: the reference's hash-map probe becomes a keyed
  * left join against the state DataFrame with a null-or-hash-differs
  * predicate. The join key is the entity id, so at scale this is a standard
  * shuffle join on a high-cardinality key; when the state side is small the
  * caller can pass `broadcastState = true` to pin a broadcast hash join.
  */
object ChangeFilter {

  /** Normalize a raw batch: drop rows with a missing id (reference
    * cache.js:71-74, F3) — log-and-exclude becomes a null filter.
    */
  def dropMissingId(batch: DataFrame, idCol: String): DataFrame =
    batch.where(col(idCol).isNotNull)

  /** New-or-updated rows of `batch` w.r.t. `state`.
    *
    * @param batch   columns: id (idCol), attrs map<string,string> payload
    * @param state   Model.stateSchema (id, ttl, entityJson, entityHash)
    * @param batchHash  canonical hash column for the batch row content
    *                   (use Canonical.canonicalHashExcept to strip
    *                   updatedOnMs — reference cache.js:53,84)
    */
  def newOrUpdated(
      batch: DataFrame,
      state: DataFrame,
      idCol: String,
      batchHash: Column,
      broadcastState: Boolean = false): DataFrame = {
    val hashed = dropMissingId(batch, idCol).withColumn("__hash", batchHash)
    val st = {
      val s = state.select(col("id").as("__sid"), col("entityHash").as("__shash"))
      if (broadcastState) broadcast(s) else s
    }
    hashed
      .join(st, hashed(idCol) === st("__sid"), "left")
      // new (no cached row, cache.js:75-77) or changed (digest differs,
      // cache.js:83-85). Null-safe: a null cached hash never suppresses.
      .where(col("__sid").isNull || !(col("__shash") <=> col("__hash")))
      .drop("__sid", "__shash", "__hash")
  }

  /** Convenience for the canonical batch shape (id, updatedOnMs, attrs). */
  def newOrUpdatedEntities(batch: DataFrame, state: DataFrame, broadcastState: Boolean = false): DataFrame =
    newOrUpdated(batch, state, "id",
      Canonical.canonicalHashExcept(col("attrs"), Model.IgnoredProps), broadcastState)
}
