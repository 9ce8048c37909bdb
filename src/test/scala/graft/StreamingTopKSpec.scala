package graft

import graft.streaming.StreamingTopK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.Files

object StreamingTopKSpec {
  case class Score(g: Long, s: Double, i: Long)
}

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._
  import StreamingTopKSpec.Score

  test("streaming leaderboard == batch window top-k after every arrival wave") {
    // adversarial order: best scores arrive scattered across waves; ties everywhere
    val rows = (0 until 30000).map(i =>
      Score(i % 8, ((i * 2654435761L) % 1000L).toDouble, i.toLong))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Score]
    val q = StreamingTopK.leaderboard(input.toDF(), col("g"), col("s"), col("i"), k = 5)
      .select(col("group"), posexplode(col("top")))
      .select(col("group"), (col("pos") + 1).as("rank"),
        col("col.score"), col("col.id"))
      .writeStream.format("memory").queryName("topk_out")
      .option("checkpointLocation", Files.createTempDirectory("topk-ckpt").toString)
      .outputMode("complete").start()
    var seen = Vector.empty[Score]
    rows.grouped(9000).foreach { b =>
      input.addData(b.toSeq: _*); q.processAllAvailable()
      seen = seen ++ b
      val got = spark.table("topk_out").orderBy("group", "rank")
        .as[(Long, Int, Double, Long)].collect().toSeq
      val want = seen.toDF("g", "s", "i")
        .withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(col("s").desc, col("i"))))
        .where(col("rank") <= 5)
        .select(col("g"), col("rank").cast("int"), col("s"), col("i"))
        .orderBy("g", "rank").as[(Long, Int, Double, Long)].collect().toSeq
      assert(got == want, s"wave with ${seen.size} rows diverged")
    }
    q.stop()
  }
}
