package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    graft.functions.GraftFunctions.register(spark)
    df.groupBy("g")
      .agg(call_function("graft_topk", struct(col("s"), col("i")), lit(k)).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col.score"), col("col.id"))
  }

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("i"))))
      .where(col("rank") <= k)
      .select(col("g"), col("rank").cast("int").as("rank"),
        col("s").as("score"), col("i").as("id"))

  test("X7tk native top-k == window row_number on ties, dupes and short groups") {
    // heavy ties (s = i % 7) force the id tiebreak; group 99 has 2 rows < k
    val df = spark.range(20000).select((col("id") % 50).as("g"),
        (col("id") % 7).cast("double").as("s"), col("id").as("i"))
      .union(Seq((99L, 1.0, 1L), (99L, 1.0, 2L)).toDF("g", "s", "i"))
    val got = topk(df, 5).orderBy("g", "rank").collect().toSeq
    val want = windowed(df, 5).orderBy("g", "rank").collect().toSeq
    assert(got.size == want.size && got == want)
  }

  test("X7tk null scores are skipped; state stays k-bounded under merge") {
    val df = Seq[(Long, Option[Double], Long)](
      (1L, Some(3.0), 10L), (1L, None, 11L), (1L, Some(5.0), 12L), (1L, Some(4.0), 13L))
      .toDF("g", "s", "i")
    val got = topk(df.select(col("g"), col("s").as("s"), col("i")), 2)
      .orderBy("rank").as[(Long, Int, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 1, 5.0, 12L), (1L, 2, 4.0, 13L)))
    // serialized buffer is k entries, not input-sized
    val heap = new graft.functions.TopKHeap(3)
    (1 to 100000).foreach(i => heap.add(i.toDouble, i.toLong))
    assert(heap.size == 3)
    assert(heap.sorted.toSeq == Seq((100000.0, 100000L), (99999.0, 99999L), (99998.0, 99998L)))
  }
}
