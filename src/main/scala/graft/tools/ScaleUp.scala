package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: derive a ×N-scale copy of the `documents`, `embeddings`,
  * `events`, and TPC-H-side (`customer`/`orders`/`lineitem`) fixtures for
  * scale rehearsals (SCALING.md) without touching the read-only test data.
  *
  * The derivation is built so the WORKLOAD scales linearly — replica r of
  * the corpus preserves the original's internal similarity structure
  * exactly, while cross-replica rows never collide:
  *
  *  - documents: every word in replica r>0 gets the suffix `~r`. Two docs
  *    that were near-dups stay near-dups within the same replica (identical
  *    transformation on both sides), but share NO shingles with any other
  *    replica — pair counts scale exactly ×N, not ×N² (naive duplication
  *    would plant N exact copies of every doc and blow the verification
  *    stage up quadratically, measuring the fixture, not the engine).
  *  - embeddings: replica r's vectors are cyclically shifted by r
  *    dimensions. Cosine is permutation-invariant, so within-replica
  *    structure is EXACT; cross-replica cosines of unrelated layouts sit
  *    near zero, far below every registered threshold.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <destDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <destDir> <factor>")
    val Array(src, dest, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).select(col("id").cast("int").as("__r"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .crossJoin(broadcast(reps))
      .select(
        (col("doc_id") * factor + col("__r")).as("doc_id"),
        when(col("__r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1~"), col("__r")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(s"$dest/documents.parquet")

    // events: replica r maps every user (and event id) to a fresh key space
    // with the SAME per-user history — the w_sessionize / CDC / as-of
    // workload grows by user count, not per-user depth, exactly how a real
    // event stream scales. ts passes through unchanged whatever its
    // physical encoding (nanos-long or timestamp — EventTime adapts).
    val evSrc = s"$src/events.parquet"
    if (new java.io.File(evSrc).exists()) {
      spark.read.parquet(evSrc)
        .crossJoin(broadcast(reps))
        .select(
          (col("event_id") * factor + col("__r")).as("event_id"),
          col("ts"),
          (col("user_id") * factor + col("__r")).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(32).write.mode("overwrite").parquet(s"$dest/events.parquet")
    }

    // TPC-H side (customer/orders/lineitem): replica r maps every KEY into
    // a fresh key space while replicating both sides of every FK edge, so
    // referential structure is preserved EXACTLY — the x10 constraint
    // counts (0 violations) and PK uniqueness stay invariant while n_rows,
    // join sizes, and per-column distinct counts scale ×N. Non-key
    // attributes pass through, so selectivities and group counts
    // (returnflag/status/segment) are scale-stable, matching how a real
    // warehouse grows: more customers and orders, same schema physics.
    val cuSrc = s"$src/customer.parquet"
    if (new java.io.File(cuSrc).exists()) {
      spark.read.parquet(cuSrc)
        .crossJoin(broadcast(reps))
        .select(
          (col("c_custkey") * factor + col("__r")).as("c_custkey"),
          // replica names get a TRIPLED-digit suffix (r=35 → "~333555"):
          // any two distinct replica tags are ≥ 3 edits apart, so the
          // fuzzy-join workload (x2_fuzzy_names) keeps its within-replica
          // pair structure exactly and gains ZERO cross-replica pairs —
          // pairs scale ×N, same contract as the documents `~r` suffixing
          when(col("__r") === 0, col("c_name"))
            .otherwise(concat(col("c_name"), lit("~"),
              regexp_replace(col("__r").cast("string"), "(.)", "$1$1$1")))
            .as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .repartition(32).write.mode("overwrite").parquet(s"$dest/customer.parquet")
      spark.read.parquet(s"$src/orders.parquet")
        .crossJoin(broadcast(reps))
        .select(
          (col("o_orderkey") * factor + col("__r")).as("o_orderkey"),
          (col("o_custkey") * factor + col("__r")).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
        .repartition(32).write.mode("overwrite").parquet(s"$dest/orders.parquet")
      spark.read.parquet(s"$src/lineitem.parquet")
        .crossJoin(broadcast(reps))
        .select(
          (col("l_orderkey") * factor + col("__r")).as("l_orderkey"),
          col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
        .repartition(32).write.mode("overwrite").parquet(s"$dest/lineitem.parquet")
    }

    // supplier: pass-through copy — lineitem's l_suppkey is NOT rescaled,
    // so the dim stays fixed-size while fact fan-in grows ×N per supplier
    // (facts outgrow dims, the real-warehouse shape; also exactly the
    // regime Bloom-pruned selective joins exist for)
    val suSrc = s"$src/supplier.parquet"
    if (new java.io.File(suSrc).exists()) {
      spark.read.parquet(suSrc).write.mode("overwrite")
        .parquet(s"$dest/supplier.parquet")
    }
    // part: same pass-through as supplier — l_partkey is not rescaled, so
    // the part dim stays fixed-size under growing fact fan-in. (Its
    // absence made q7_promo_by_brand the ONLY red cell of the first r14
    // ×100 registry run — a fixture gap, not an engine one.)
    val paSrc = s"$src/part.parquet"
    if (new java.io.File(paSrc).exists()) {
      spark.read.parquet(paSrc).write.mode("overwrite")
        .parquet(s"$dest/part.parquet")
    }
    // nation: same pass-through — a 25-row static dim at any scale
    // (customer c_nationkey references it; q15's chain bottom)
    val naSrc = s"$src/nation.parquet"
    if (new java.io.File(naSrc).exists()) {
      spark.read.parquet(naSrc).write.mode("overwrite")
        .parquet(s"$dest/nation.parquet")
    }
    // region: same pass-through — the 5-row static dim above nation
    // (q19's uncatalogued chain top)
    val reSrc = s"$src/region.parquet"
    if (new java.io.File(reSrc).exists()) {
      spark.read.parquet(reSrc).write.mode("overwrite")
        .parquet(s"$dest/region.parquet")
    }

    val dim = 64
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .crossJoin(broadcast(reps))
      .select(
        (col("vec_id") * factor + col("__r")).as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => element_at(col("embedding"), (i + col("__r")) % dim + 1)).as("embedding"),
        // replicas are "new data": own blocks, so block sizes stay constant
        // and blocked-exact scaling measures the engine, not the fixture
        (col("label") * factor + col("__r")).cast("int").as("label"))
    emb.repartition(32).write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    println(s"SCALED factor=$factor docs=${spark.read.parquet(s"$dest/documents.parquet").count()} " +
      s"embeddings=${spark.read.parquet(s"$dest/embeddings.parquet").count()}")
    spark.stop()
  }
}
