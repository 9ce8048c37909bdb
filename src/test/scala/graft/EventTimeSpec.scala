package graft

import graft.functions.EventTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The events.ts physical encoding is producer-controlled and has changed
  * under the engine once already (nanos-as-long → micros NTZ, round 7→8).
  * These properties pin the contract: identical epoch-ms semantics across
  * encodings, and predicates that still reach the parquet scan.
  */
class EventTimeSpec extends SparkSpec {

  // 2024-01-12T00:00:00Z ± offsets, millis
  private val base = 1705017600000L
  private val msValues = Seq(base - 1, base, base + 1, base + 499, base + 500,
    base + 999, base + 1000, base + 86400000L)

  private def writeNanosLong(dir: String): DataFrame = {
    import spark.implicits._
    msValues.zipWithIndex.map { case (ms, i) => (i.toLong, ms * 1000000L) }
      .toDF("event_id", "ts").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def writeMicrosTs(dir: String): DataFrame = {
    import spark.implicits._
    // micros-precision NTZ timestamps with a sub-millisecond component, so
    // the floor/boundary rewrites are actually exercised
    msValues.zipWithIndex.map { case (ms, i) =>
      (i.toLong, java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ms).plusNanos(250000), java.time.ZoneOffset.UTC))
    }.toDF("event_id", "ts").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def writeInstantTs(dir: String): DataFrame = {
    import spark.implicits._
    // tz-adjusted TIMESTAMP (isAdjustedToUTC) — the third encoding a
    // producer can ship; Instant encodes as TimestampType
    msValues.zipWithIndex.map { case (ms, i) =>
      (i.toLong, java.time.Instant.ofEpochMilli(ms).plusNanos(250000))
    }.toDF("event_id", "ts").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def collectMs(df: DataFrame): Seq[(Long, Long)] = {
    val et = EventTime.bind(df)
    df.select(col("event_id"), et.ms.as("ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  test("ms extraction is identical across nanos-long and micros-timestamp encodings") {
    val tmp = java.nio.file.Files.createTempDirectory("evtime").toString
    val longDf = writeNanosLong(s"$tmp/long")
    val tsDf = writeMicrosTs(s"$tmp/ts")
    val expected = msValues.zipWithIndex.map { case (ms, i) => (i.toLong, ms) }
    assert(collectMs(longDf) == expected)
    assert(collectMs(tsDf) == expected) // micros floor to the same millis
    assert(collectMs(writeInstantTs(s"$tmp/inst")) == expected) // tz-adjusted flavor too
  }

  test("after/atLeast/before are exact millisecond-floor boundaries on all encodings") {
    val tmp = java.nio.file.Files.createTempDirectory("evtime").toString
    for (df <- Seq(writeNanosLong(s"$tmp/long"), writeMicrosTs(s"$tmp/ts"),
        writeInstantTs(s"$tmp/inst"))) {
      val et = EventTime.bind(df)
      def ids(c: org.apache.spark.sql.Column): Set[Long] =
        df.where(c).select("event_id").collect().map(_.getLong(0)).toSet
      val ms = msValues.zipWithIndex
      // floor(ms) > base
      assert(ids(et.after(base)) == ms.collect { case (v, i) if v > base => i.toLong }.toSet)
      // floor(ms) >= base
      assert(ids(et.atLeast(base)) == ms.collect { case (v, i) if v >= base => i.toLong }.toSet)
      // floor(ms) < base
      assert(ids(et.before(base)) == ms.collect { case (v, i) if v < base => i.toLong }.toSet)
    }
  }

  test("timestamp-literal predicates push into the parquet scan (row-group pruning preserved)") {
    val tmp = java.nio.file.Files.createTempDirectory("evtime").toString
    val tsDf = writeMicrosTs(s"$tmp/ts")
    val plan = tsDf.where(EventTime.bind(tsDf).after(base))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"timestamp predicate did not reach the scan:\n$plan")
  }
}
