package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated A/B decomposition of the FuzzyJoinRewrite vs direct-op gap
  * (VERDICT r11 "What's wrong #1"): times the rewritten theta-join, the
  * direct op, and ablated variants of the rewrite shape (no guards / no
  * DP / pinned merge strategy) in ONE JVM with shared warm input, and
  * prints the executed join strategy of each — so the fix (if any) is
  * chosen by measurement, not plausibility.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.FuzzyAb
  */
object FuzzyAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name")).cache()
    cust.count()

    def time(name: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"AB $name%-28s min=${runs.map(_._1).min}%7.3f s  rows=${runs.head._2}")
    }

    def joinKind(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan
      p.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => "SMJ"
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => "BHJ"
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => "SHJ"
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => "BNLJ"
      }.mkString("+")
    }

    // V0: the naive theta-join as the gate writes it (rewritten by the rule)
    def naive(): DataFrame = {
      val a = cust.select(col("c_custkey").as("id_a"), col("c_name").as("__na"))
      val b = cust.select(col("c_custkey").as("id_b"), col("c_name").as("__nb"))
      a.join(b, levenshtein(col("__na"), col("__nb")) <= lit(1) &&
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }
    // V1: direct op
    def direct(): DataFrame =
      graft.ops.Fuzzy.editNeighborPairs(cust, "c_custkey", col("c_name"))

    println(s"V0 naive-rewritten join kind: ${joinKind(naive())}")
    println(s"V1 direct-op join kind:      ${joinKind(direct())}")
    time("V0 rewritten-theta")(naive())
    time("V1 direct-op")(direct())

    // V2: rewrite shape, hand-built, WITHOUT the first-shared-key guards
    // (wrong multiplicity — timing only) — isolates guard cost
    def keys(s: org.apache.spark.sql.Column) = array_distinct(
      concat(array(s), transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))
    val ka = cust.select(col("c_custkey").as("id_a"), col("c_name").as("__na"),
      keys(col("c_name")).as("__kaA"))
      .select(col("id_a"), col("__na"), col("__kaA"),
        posexplode(col("__kaA")).as(Seq("__pa", "__k")))
    val kb = cust.select(col("c_custkey").as("id_b"), col("c_name").as("__nb"),
      keys(col("c_name")).as("__kaB"))
      .select(col("id_b"), col("__nb"), col("__kaB"),
        posexplode(col("__kaB")).as(Seq("__pb", "__k")))
    val lv = levenshtein(col("__na"), col("__nb"), 1)
    def guards = !arrays_overlap(slice(col("__kaA"), lit(1), col("__pa")), col("__kaB")) &&
      !array_contains(slice(col("__kaB"), lit(1), col("__pb")), col("__k"))

    time("V2 shape-noguards") {
      ka.join(kb, Seq("__k"))
        .where(col("id_a") < col("id_b") && lv >= 0)
        .select(col("id_a"), col("id_b"))
    }
    time("V3 shape-guards") {
      ka.join(kb, Seq("__k"))
        .where(col("id_a") < col("id_b") && lv >= 0 && guards)
        .select(col("id_a"), col("id_b"))
    }
    time("V4 shape-guards-merge") {
      ka.join(kb.hint("merge"), Seq("__k"))
        .where(col("id_a") < col("id_b") && lv >= 0 && guards)
        .select(col("id_a"), col("id_b"))
    }
    time("V5 shape-noDP-guards") {
      ka.join(kb, Seq("__k"))
        .where(col("id_a") < col("id_b") && guards)
        .select(col("id_a"), col("id_b"))
    }
    // V6: narrow exchange — arrays re-derived AFTER the join instead of
    // riding it (recompute-per-candidate, the documented 5×-slower form)
    val kaN = cust.select(col("c_custkey").as("id_a"), col("c_name").as("__na"))
      .select(col("id_a"), col("__na"),
        posexplode(keys(col("__na"))).as(Seq("__pa", "__k")))
    val kbN = cust.select(col("c_custkey").as("id_b"), col("c_name").as("__nb"))
      .select(col("id_b"), col("__nb"),
        posexplode(keys(col("__nb"))).as(Seq("__pb", "__k")))
    time("V6 narrow-recompute") {
      kaN.join(kbN, Seq("__k"))
        .where(col("id_a") < col("id_b") && lv >= 0 &&
          !arrays_overlap(slice(keys(col("__na")), lit(1), col("__pa")), keys(col("__nb"))) &&
          !array_contains(slice(keys(col("__nb")), lit(1), col("__pb")), col("__k")))
        .select(col("id_a"), col("id_b"))
    }
    spark.stop()
  }
}
