package graft

import graft.ops.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def smallFileTable(n: Long, files: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    spark.range(n).select(col("id").as("a"), (col("id") % 100).as("g"))
      .repartition(files).write.mode("overwrite").parquet(dir)
    dir
  }

  test("X9cp FFD plan covers every file once, respects the target, is deterministic") {
    val dir = smallFileTable(50000, 40)
    val sizes = Compaction.fileSizes(spark, dir).cache()
    assert(sizes.count() == 40)
    val total = sizes.agg(sum("bytes")).as[Long].head()
    val target = total / 6
    val plan = Compaction.compactionPlan(sizes, target).cache()
    // cover: every file exactly once, byte totals preserved
    assert(plan.count() == 40 && plan.select("file").distinct().count() == 40)
    assert(plan.agg(sum("bytes")).as[Long].head() == total)
    // every multi-file bin within target
    val over = plan.groupBy("bin")
      .agg(sum("bytes").as("b"), count(lit(1)).as("n"))
      .where(col("n") > 1 && col("b") > target).count()
    assert(over == 0, s"$over multi-file bins exceed the target")
    // fewer bins than files
    assert(plan.select("bin").distinct().count() < 40)
    // determinism
    val again = Compaction.compactionPlan(sizes, target)
    assert(plan.orderBy("file").collect().toSeq ==
      again.orderBy("file").collect().toSeq)
  }

  test("X9cp oversize files get singleton bins, never split") {
    val dir = smallFileTable(20000, 4) // 4 biggish files
    val sizes = Compaction.fileSizes(spark, dir)
    val tiny = sizes.agg(min("bytes")).as[Long].head() / 2 // target below every file
    val plan = Compaction.compactionPlan(sizes, tiny)
    val binsPerFile = plan.groupBy("bin").count().where(col("count") > 1).count()
    assert(binsPerFile == 0 && plan.select("bin").distinct().count() == 4)
  }

  test("X9cp execution preserves the row multiset and leaves one file per bin") {
    val dir = smallFileTable(50000, 40)
    val sizes = Compaction.fileSizes(spark, dir)
    val total = sizes.agg(sum("bytes")).as[Long].head()
    val plan = Compaction.compactionPlan(sizes, total / 6).cache()
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    Compaction.compact(spark, dir, plan, out)
    val compacted = spark.read.parquet(out)
    val (n, s, d) = compacted.agg(count(lit(1)), sum("a"), countDistinct("a"))
      .as[(Long, Long, Long)].head()
    assert(n == 50000L && d == 50000L && s == (0L until 50000L).sum)
    // one physical file per bin
    val filesPerBin = compacted
      .select(col("bin"), input_file_name().as("f")).distinct()
      .groupBy("bin").count().where(col("count") > 1).count()
    assert(filesPerBin == 0)
    val nBins = plan.select("bin").distinct().count()
    assert(compacted.select(input_file_name()).distinct().count() == nBins)
  }
}
