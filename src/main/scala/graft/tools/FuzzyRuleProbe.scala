package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: what does [[graft.plans.FuzzyJoinRewrite]] buy at scale?
  *
  * Times the naive `levenshtein(a, b) <= 1` self-join over N customer-like
  * names twice in one JVM: with the rule active (deletion-key equi-join)
  * and with it excluded via `spark.sql.optimizer.excludedRules` (Spark's
  * own BroadcastNestedLoopJoin). Names are zero-padded sequential ids —
  * the registered x2_fuzzy_names structure, where every name has a
  * bounded set of distance-1 neighbors, so pair volume is the linear
  * regime.
  *
  * Usage: runMain graft.tools.FuzzyRuleProbe <nRows> [nRowsNaiveCap]
  * The naive leg is capped separately (default 20k): the nested-loop leg
  * is O(N²) string DPs by construction — which is the point measured.
  */
object FuzzyRuleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val naiveCap = if (args.length > 1) args(1).toLong else 20000L
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def names(rows: Long) = spark.range(rows).select(col("id"),
      concat(lit("Customer#"), lpad(col("id").cast("string"), 9, "0")).as("s"))

    def pairs(rows: Long) = {
      val nm = names(rows)
      val a = nm.select(col("id").as("id_a"), col("s").as("sa"))
      val b = nm.select(col("id").as("id_b"), col("s").as("sb"))
      a.join(b, levenshtein(col("sa"), col("sb")) <= lit(1) &&
        col("id_a") < col("id_b"))
    }

    def time(label: String, rows: Long): Unit = {
      val df = pairs(rows)
      val shape = // prove which plan each leg actually ran
        if (df.queryExecution.executedPlan.toString().contains("Generate")) "banded"
        else "nested-loop"
      val t0 = System.nanoTime()
      val cnt = df.count()
      println(f"$label($shape) rows=$rows pairs=$cnt time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("warm", 1000)
    Seq(n / 100, n / 10, n).foreach(time("rewritten", _))

    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.FuzzyJoinRewrite")
    val naive = math.min(n, naiveCap)
    Seq(naive / 100, naive / 10, naive).foreach(time("naive-BNLJ", _))
    spark.stop()
  }
}
