package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate STRING matching by bounded edit distance — the entity-
  * resolution primitive (typo-tolerant record linkage, vocabulary
  * normalization, near-identical title/name matching). The reference keys
  * entities by exact id (`cache.js:53`); at corpus scale the ids worth
  * joining on (names, titles, normalized URLs) arrive misspelled, and the
  * naive formulation — `levenshtein(a, b) <= k` as a theta-join — is the
  * same quadratic trap as the Hamming case ([[graft.plans.HammingJoinRewrite]]).
  *
  * Spark-first shape: the deletion-neighborhood banding of SymSpell (Garbe's
  * symmetric-delete algorithm; same pigeonhole logic as Manku banding) —
  * two strings within edit distance 1 ALWAYS share at least one entry of
  * {s} ∪ {s minus one char}: a substitution shares the deletion at the
  * substituted position, an insert/delete shares the shorter string itself.
  * So candidates come from ONE codegen'd `transform`/`explode` projection
  * (L+1 keys per string, no UDF) and an equi-JOIN on the key — hash-
  * partitionable, linear while per-key occupancy is bounded — followed by
  * an exact `levenshtein` verification (codegen'd, threshold-bounded) that
  * makes recall exactly 1 with zero false positives.
  *
  * Scale posture: key space grows with vocab × length, so occupancy (and
  * with it Σ C(occ, 2) candidates) stays bounded for id-like strings;
  * keys are short-string-sized on the exchange. The degenerate bucket is
  * very SHORT strings (length ≤ 2: few keys, huge occupancy) — pre-filter
  * or length-partition those, as with any LSH skew key.
  */
object Fuzzy {

  /** The distance-1 deletion neighborhood of `s`: the string itself plus
    * every single-character deletion, deduplicated (repeated chars yield
    * repeated deletions). Pure codegen'd array expression — no UDF.
    */
  def deletionKeys(s: Column): Column =
    array_distinct(concat(array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** All id pairs whose strings are within edit distance `maxDist`
    * (currently 1 — the SymSpell recursion to deeper deletion
    * neighborhoods trades key volume (L choose k keys per string) for the
    * same equi-join shape; register a wider variant before raising the
    * bound, the Hamming-regime lesson). Output (id_a, id_b, dist) with
    * id_a < id_b, exact distances, recall 1 by the pigeonhole property.
    */
  def editNeighborPairs(df: DataFrame, idCol: String, strCol: Column,
                        maxDist: Int = 1): DataFrame = {
    require(maxDist == 1,
      s"deletion banding is registered for maxDist=1 only (got $maxDist); " +
        "deeper bounds need the recursive key set — see scaladoc")
    val keyed = df.where(strCol.isNotNull)
      .select(col(idCol).as("__id"), strCol.as("__s"))
      .select(col("__id"), col("__s"), explode(deletionKeys(col("__s"))).as("__k"))
    val a = keyed.select(col("__k"), col("__id").as("id_a"), col("__s").as("__sa"))
    val b = keyed.select(col("__k"), col("__id").as("id_b"), col("__s").as("__sb"))
    // pin SORT-MERGE: Catalyst's size estimate of an exploded projection
    // undercounts the L+1-fold fan-out, so auto-broadcast ships the whole
    // key table and OOMs the build at corpus scale (measured at 1.5M
    // names × 19 keys); shuffle-hash fails next — every concurrent task
    // must hold its partition's build map in execution memory at once
    // (measured: 28.5M key rows over 32 local threads). SMJ's sort of
    // short-string keys spills gracefully and AQE's skew split applies,
    // so it is the only strategy that degrades instead of dying
    // THRESHOLD-banded levenshtein (returns −1 past the bound): O(k·L)
    // per candidate instead of the full O(L²) DP — at 100M candidates the
    // verify dominates the query and this is the 10× term (measured)
    val lv = levenshtein(col("__sa"), col("__sb"), maxDist)
    a.join(b.hint("merge"), Seq("__k"))
      .where(col("id_a") < col("id_b"))
      .where(lv >= 0 && lv <= maxDist)
      .select(col("id_a"), col("id_b"), lv.cast("long").as("dist"))
      .distinct() // a pair can agree on several deletion keys
  }
}
