package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (minhash / simhash / RHP / jaccard, [[Dedup]] / [[Similarity]])
  * into dedup CLUSTERS: every document labeled with the smallest doc id
  * reachable through the pair graph, so "keep one per cluster" is a
  * trivial filter on `id == component`. Pairs alone delete nothing — if
  * A~B and B~C but A!~C, pairwise keep-min would keep A and C even though
  * they sit in one duplicate cluster.
  *
  * Algorithm: distributed min-label propagation with pointer jumping.
  * Each round does (1) a neighbor-min pass — every vertex takes the min of
  * its own and its neighbors' labels (one join + one map-side-combined
  * aggregation on vertex id), and (2) a pointer-jump — label :=
  * label(label), halving label-chain depths so convergence is
  * O(log(diameter)) rounds, not O(diameter). Labels only ever decrease, so
  * `sum(label)` is a monotone convergence certificate: one cheap agg per
  * round, stop when it stops falling. Per round: two shuffles over the
  * EDGE list + two over the vertex list — no step ever materializes
  * anything bigger than the input pair list, which is the scale contract
  * (the pair list itself was produced sub-quadratically by LSH).
  *
  * Near-dup graphs in practice are myriads of tiny components (dup pairs,
  * dup triangles), so rounds-to-converge is small; the `maxIter` cap
  * bounds pathological chains (default 20 ≈ diameters to ~2^20 with
  * jumping).
  *
  * The returned (id, component) table is backed by the final round's local
  * checkpoint — already materialized by the convergence actions; its blocks
  * are reclaimed by the context cleaner when the result is dereferenced.
  */
object Components {

  /** @param pairs   (aCol, bCol) undirected edges, any orientation
    * @return (id, component) for every vertex incident to an edge;
    *         component = min reachable id
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
                          maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Iteration state is EAGERLY localCheckpoint'ed, not just persisted:
    // each round references the previous round's frame several times (the
    // self-join in the jump), so without lineage truncation the logical
    // plan doubles per round — analysis cost alone becomes exponential.
    // The checkpoint stores the rows once per round and starts the next
    // round's plan from a leaf. (Local checkpoints trade fault re-compute
    // for speed — the standard choice for convergent iterative refinement,
    // where losing an executor just means redoing cheap rounds.) Blocks of
    // superseded rounds are dereferenced immediately and reclaimed by the
    // context cleaner.
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var certificate = labels.agg(sum(col("lbl"))).head().getLong(0)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // neighbor-min: min label over {self} ∪ neighbors
      val nbrMin = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("__nl"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("__nl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      // pointer jump: labels are always vertex ids (they start as ids and
      // only min-combine), so label(label) is total on this table
      val jumped = stepped.alias("x")
        .join(stepped.select(col("id").as("__jid"), col("lbl").as("__jl")),
          col("x.lbl") === col("__jid"))
        .select(col("x.id").as("id"), col("__jl").as("lbl"))
        .localCheckpoint(true)
      val next = jumped.agg(sum(col("lbl"))).head().getLong(0)
      labels = jumped
      converged = next == certificate // labels only decrease: equal sum <=> no change
      certificate = next
      it += 1
    }
    edges.unpersist(blocking = false)
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Dedup clusters with survivors: (id, component, is_keeper) — keeper is
    * the min-id member. Downstream "drop duplicates" = `where is_keeper`
    * plus the union of never-paired docs (not in the pair list).
    */
  def dedupClusters(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
                    maxIter: Int = 20): DataFrame =
    connectedComponents(pairs, aCol, bCol, maxIter)
      .select(col("id"), col("component"), (col("id") === col("component")).as("is_keeper"))
}
