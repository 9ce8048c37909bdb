package graft


/** Dev smoke runner: executes SparkEntry.entry (the flagship end-to-end
  * pipeline) the way the driver's smoke check does and prints the row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3, truncate = 60)
    // idempotence probe: a second run must also return rows
    println("ENTRY_AGAIN=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
