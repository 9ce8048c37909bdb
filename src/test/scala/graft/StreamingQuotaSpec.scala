package graft

import graft.streaming.StreamingQuota
import graft.streaming.StreamingQuota.{Admitted, Doc}
import graft.ops.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming budget admission: per-group caps hold across micro-batches,
  * token math matches the batch Column pipeline, replay-stable order.
  */
class StreamingQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Doc]], budget: Long): Seq[Admitted] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"quota_out_${System.nanoTime()}"
    val q = StreamingQuota.admitWithinBudget(input.toDS(), budget)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("q-ckpt").toString)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Admitted].collect().toSeq
  }

  test("budget caps hold per group across micro-batches; state carries over") {
    // each doc below is 5 tokens ("a b c d e" style); budget 12 admits 2/group
    def doc(g: String, id: Long) = Doc(g, id, ("tok " * 5).trim)
    val out = run(Seq(
      Seq(doc("s0", 1), doc("s1", 10)),
      Seq(doc("s0", 2), doc("s0", 3), doc("s1", 11)),
      Seq(doc("s0", 4)) // budget already exhausted for s0
    ), budget = 12)
    val byGroup = out.groupBy(_.group)
    assert(byGroup("s0").map(_.docId).sorted == Seq(1L, 2L))
    assert(byGroup("s1").map(_.docId).sorted == Seq(10L, 11L))
    assert(out.forall(_.cumTokens <= 12))
  }

  test("skip-and-continue: an oversized doc is dropped, later small ones admitted") {
    val out = run(Seq(
      Seq(Doc("g", 1, ("tok " * 4).trim)),          // 4 tokens, total 4
      Seq(Doc("g", 2, ("tok " * 50).trim)),          // 50 > remaining 6: skipped
      Seq(Doc("g", 3, ("tok " * 3).trim))            // 3 fits: total 7
    ), budget = 10)
    assert(out.map(_.docId).sorted == Seq(1L, 3L))
    assert(out.maxBy(_.docId).cumTokens == 7L)
  }

  test("intra-batch admission is smallest-first and deterministic") {
    val out = run(Seq(Seq(
      Doc("g", 1, ("tok " * 6).trim),  // 6 tokens
      Doc("g", 2, ("tok " * 2).trim),  // 2 tokens  -> admitted first
      Doc("g", 3, ("tok " * 5).trim)   // 5 tokens
    )), budget = 8)
    // smallest-first: 2 (2) then 3 (5) = 7; doc 1 (6) no longer fits
    assert(out.map(_.docId).sorted == Seq(2L, 3L))
  }

  test("JVM token counter is the twin of the batch Column pipeline") {
    val texts = Seq("Hello,  World 42!", "a-b.c", " x ", "99 bottles", "")
    val jvm = texts.map(StreamingQuota.tokenCount)
    val viaCol = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(TextAnalysis.tokenCount(col("text")).cast("long")).as[Long].collect().toSeq
    assert(jvm == viaCol)
  }
}
