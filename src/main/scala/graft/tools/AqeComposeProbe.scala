package graft.tools

import graft.GraftSession
import graft.ops.SketchCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dev probe for the AQE-composition gate (r13 VERDICT #7): does AQE's
  * runtime skew split fire on the bare hot-key join at test scale under
  * lowered thresholds, does it leave the planner's salted exchange
  * alone, and what are the wall deltas in all four {salted?, AQE skew?}
  * cells. Also prints the final adaptive plan of the bare join so the
  * spec's probe (isSkewJoin flags) is written against reality.
  */
object AqeComposeProbe {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-aqeprobe").toString
    // distributed generation (same data law as the original driver-side
    // Seq) so the probe runs at the ×100 fixture class (10M rows) too
    spark.range(0L, scale.toLong)
      .select(
        when(col("id") % 5 < 2, 7L).otherwise(col("id") % 500L).as("s_key"),
        col("id").as("s_id"),
        (col("id") % 11).cast("double").as("s_val"))
      .repartition(4).write.mode("overwrite").parquet(s"$d/fact.parquet")
    (0L until 500L).map(k => (k, s"g${k % 5}")).toDF("m_key", "m_grp")
      .repartition(2).write.parquet(s"$d/mid.parquet")
    val cat = SketchCatalog.harvest(spark, s"$d/fact.parquet", Seq("s_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d/mid.parquet", Seq("m_key")))
    SketchCatalog.save(cat, s"$d/cat")
    def join(): DataFrame =
      spark.read.parquet(s"$d/fact.parquet")
        .join(spark.read.parquet(s"$d/mid.parquet"), col("s_key") === col("m_key"))
        .groupBy("m_grp").agg(count(lit(1)).as("n"), sum("s_val").cast("long").as("s"))
        .orderBy("m_grp")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(SketchCatalog.BroadcastBytesKey, "0")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    def finalPlan(df: DataFrame): org.apache.spark.sql.execution.SparkPlan = {
      df.collect()
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
    }
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[aqeprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    SketchCatalog.deactivate(spark)
    println("=== bare join, AQE skew armed: final plan ===")
    println(finalPlan(join()).toString.linesIterator.take(30).mkString("\n"))
    for (rep <- 1 to 2) {
      SketchCatalog.deactivate(spark)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      time(s"rep$rep bare,   aqeSkew=off")(join().collect())
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      time(s"rep$rep bare,   aqeSkew=on")(join().collect())
      SketchCatalog.activate(spark, s"$d/cat")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      time(s"rep$rep salted, aqeSkew=off")(join().collect())
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      time(s"rep$rep salted, aqeSkew=on")(join().collect())
      SketchCatalog.deactivate(spark)
    }
    spark.stop()
  }
}
