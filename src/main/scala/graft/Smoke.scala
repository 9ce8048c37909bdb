package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: executes SparkEntry.entry (the flagship end-to-end
  * pipeline) the way the driver's smoke check does and prints the row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.chunkBase64String.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3, truncate = 60)
    // idempotence probe: a second run must also return rows
    println("ENTRY_AGAIN=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
