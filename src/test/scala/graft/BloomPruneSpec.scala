package graft

import graft.ops.BloomPrune
import org.apache.spark.sql.functions._

/** The pruned join's load-bearing properties: result-identical to the
  * plain join (false positives re-verified), actual pre-shuffle pruning
  * (candidate count near matches + fpp tail, far below the probe side),
  * string-key dispatch parity, and the join-type guard.
  */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("pruned join result-identical to plain join; probe side actually pruned") {
    // probe: 200k rows keyed 0..9999; build: 50 selective keys
    val probe = spark.range(200000).select((col("id") % 10000).as("k"),
      (col("id") * 7 % 1000).as("v"))
    val build = spark.range(50).select((col("id") * 100).as("bk"),
      concat(lit("d_"), col("id")).as("name"))
    val pruned = BloomPrune.prunedEquiJoin(probe, build, col("k"), col("bk"),
      expectedItems = 1000L)
      .groupBy("bk", "name").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val plain = probe.join(build, col("k") === col("bk"))
      .groupBy("bk", "name").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // the bloom gate itself: candidates ~ 50 keys * 20 rows + fpp tail
    graft.functions.GraftFunctions.register(spark)
    val bf = build.agg(call_function("graft_bloom_agg", col("bk"), lit(1000L),
      lit(0.01)).as("__bf"))
    val candidates = probe.crossJoin(broadcast(bf))
      .where(call_function("graft_bloom_contains", col("__bf"), col("k"))).count()
    assert(candidates >= 1000, s"true matches must survive: $candidates")
    assert(candidates < 10000, s"pruning did nothing: $candidates of 200000")
  }

  test("string keys hash consistently between build and probe") {
    val probe = spark.range(5000).select(concat(lit("k_"), col("id") % 500).as("k"))
    val build = spark.range(20).select(concat(lit("k_"), col("id") * 25).as("bk"))
    val pruned = BloomPrune.prunedEquiJoin(probe, build, col("k"), col("bk"),
      expectedItems = 100L, joinType = "left_semi")
    val plain = probe.join(build, col("k") === col("bk"), "left_semi")
    assert(pruned.count() == plain.count() && plain.count() == 200)
  }

  test("semantics-changing join types are refused") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      BloomPrune.prunedEquiJoin(df, df, col("id"), col("id"),
        expectedItems = 10L, joinType = "left")
    }
  }
}
