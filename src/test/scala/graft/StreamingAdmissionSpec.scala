package graft

import graft.ops.TextAnalysis
import graft.streaming.StreamingAdmission
import graft.streaming.StreamingAdmission.{Doc, QualityRules}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stateless streaming quality admission: the stream's admitted set must
  * equal the batch gopherRules keep set on the same corpus — rule for
  * rule, rounding for rounding.
  */
class StreamingAdmissionSpec extends SparkSpec {
  import spark.implicits._

  test("stream admission set equals the batch gopherRules keep set on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => Doc(id, t) }.toSeq
    val rules = QualityRules(minWords = 30, minAlphaRatio = 0.8, maxTopWordFrac = 0.15)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingAdmission.admitQuality(input.toDS(), rules)
      .writeStream.format("memory").queryName("adm_out")
      .option("checkpointLocation", Files.createTempDirectory("adm-ckpt").toString)
      .outputMode("append").start()
    docs.grouped(40).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("adm_out").as[Doc].collect().map(_.docId).toSet

    val batch = TextAnalysis.gopherRules(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id", col("text"),
        minWords = 30, minAlphaRatio = 0.8, maxTopWordFrac = 0.15)
      .where(col("keep")).select("doc_id").as[Long].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.size < docs.size) // the gate genuinely splits
  }

  test("per-rule JVM twins: each rule trips on its own fixture") {
    val r = QualityRules(minWords = 3, minAlphaRatio = 0.8, maxTopWordFrac = 0.5,
      maxDup2gramFrac = 0.5)
    def keep(t: String) = StreamingAdmission.keep(t, r)
    assert(keep("the quick brown fox jumps"))
    assert(!keep("too short"))                       // word floor
    assert(!keep("a1 b2 c3 d4 e5 f6"))               // digits cut alpha ratio
    assert(!keep("zzz qqq www yyy xxx"))             // no stopwords
    assert(!keep("the the the the the the"))         // top-word fraction
    assert(!keep(null))                              // null-safe: rejected, no NPE
  }
}
