package graft

import org.apache.spark.sql.SparkSession

// temporary experiment harness — NOT part of the library; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val q = graft.queries.Queries.all("e7_batch_slices")
    println("=== plan ===")
    q(spark, sfDir).explain("formatted")
    (1 to 2).foreach { i =>
      time(s"e7_$i") { q(spark, sfDir).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
