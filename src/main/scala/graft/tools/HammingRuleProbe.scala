package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: what does [[graft.plans.HammingJoinRewrite]] buy at scale?
  *
  * Times the naive `bit_count(a ^ b) <= 3` self-join over N dHash-like
  * fingerprints twice in one JVM: with the rule active (banded equi-join)
  * and with it excluded via `spark.sql.optimizer.excludedRules` (Spark's
  * own BroadcastNestedLoopJoin). The fingerprint corpus mirrors the
  * registered fixtures: 25-doc near-dup blocks (small Hamming spread
  * inside a block via a few flipped low bits, md5-decorrelated across
  * blocks), so the pair volume — and the verification work — is the
  * linear regime every registered query runs in.
  *
  * Usage: runMain graft.tools.HammingRuleProbe <nRows> [nRowsNaiveCap]
  * The naive leg is capped separately (default 50k): above ~100k rows the
  * nested-loop leg is quadratic by construction and a single run would
  * hold the JVM for hours — which is the point being measured.
  */
object HammingRuleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val naiveCap = if (args.length > 1) args(1).toLong else 50000L
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fingerprints(rows: Long) = spark.range(rows).select(col("id"),
      // block base: portable 60-bit md5 slice of the block number;
      // member: flip (id mod 25 mod 4) low bits -> within-block hamming 0..3
      graft.ops.Dedup.md5Hash60(expr("CAST(id DIV 25 AS STRING)"))
        .bitwiseXOR(expr("CAST(shiftleft(1L, CAST(id % 25 % 4 AS INT)) - 1 AS BIGINT)"))
        .as("h"))

    def pairs(rows: Long) = {
      val fp = fingerprints(rows)
      val a = fp.select(col("id").as("id_a"), col("h").as("ha"))
      val b = fp.select(col("id").as("id_b"), col("h").as("hb"))
      a.join(b, bit_count(col("ha").bitwiseXOR(col("hb"))) <= lit(3) &&
        col("id_a") < col("id_b"))
    }

    def time(label: String, rows: Long): Unit = {
      val df = pairs(rows)
      val shape = // prove which plan each leg actually ran
        if (df.queryExecution.executedPlan.toString().contains("Expand")) "banded"
        else "nested-loop"
      val t0 = System.nanoTime()
      val cnt = df.count()
      println(f"$label($shape) rows=$rows pairs=$cnt time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("warm", 1000)
    Seq(n / 100, n / 10, n).foreach(time("rewritten", _))

    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.HammingJoinRewrite")
    val naive = math.min(n, naiveCap)
    Seq(naive / 100, naive / 10, naive).foreach(time("naive-BNLJ", _))
    spark.stop()
  }
}
