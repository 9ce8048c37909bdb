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

  test("calibrated admission: stream set equals the batch sweep-chosen-floor keep set") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // the batch-side calibration: highest sweep threshold keeping >= 60%
    // of tokens (the x8_curation_v10 decision), frozen as one double
    val chosen = TextAnalysis.thresholdSweep(fixture, "doc_id", col("text"),
        Seq(0.0, 0.2, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
      .where(col("token_frac") >= 0.6).agg(max(col("threshold")))
      .as[Double].head()
    assert(chosen > 0.0, "the fixture must let the calibration pick a real floor")

    val docs = fixture.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => Doc(id, t) }.toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingAdmission.admitCalibrated(input.toDS(), chosen)
      .writeStream.format("memory").queryName("cal_out")
      .option("checkpointLocation", Files.createTempDirectory("cal-ckpt").toString)
      .outputMode("append").start()
    docs.grouped(70).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cal_out").as[Doc].collect().map(_.docId).toSet

    val batch = TextAnalysis.qualityMetrics(fixture, "doc_id", col("text"))
      .where(col("quality_score") >= chosen).select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.size < docs.size) // the floor genuinely cuts

    // score twin is value-exact against the batch column, doc for doc
    val batchScores = TextAnalysis.qualityMetrics(fixture, "doc_id", col("text"))
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    docs.foreach { d =>
      assert(StreamingAdmission.qualityScore(d.text) == batchScores(d.docId),
        s"score twin drifts on doc ${d.docId}")
    }
  }

  test("non-BMP words: JVM mean-word-length counts code points like the batch length()") {
    // "ab😀" is 3 code points but 4 UTF-16 units; four of them + "the"
    // give mean word length 15/5 = 3.0 in code points (inside [3.0, 3.5])
    // but 19/5 = 3.8 in UTF-16 units (outside). Spark's length() counts
    // code points, so the batch keeps the doc — the JVM twin must agree.
    val emojiDoc = "the ab😀 ab😀 ab😀 ab😀"
    val plainDoc = "the cat sat on a mat"
    val r = QualityRules(minWords = 3, minMeanLen = 3.0, maxMeanLen = 3.5,
      minAlphaRatio = 0.5, maxTopWordFrac = 0.8, maxDup2gramFrac = 0.6)
    val batch = TextAnalysis.gopherRules(
        Seq((1L, emojiDoc), (2L, plainDoc)).toDF("doc_id", "text"), "doc_id", col("text"),
        minWords = 3, minMeanLen = 3.0, maxMeanLen = 3.5,
        minAlphaRatio = 0.5, maxTopWordFrac = 0.8, maxDup2gramFrac = 0.6)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(batch(1L), "batch must keep the non-BMP doc (length() = code points)")
    assert(StreamingAdmission.keep(emojiDoc, r) == batch(1L))
    assert(StreamingAdmission.keep(plainDoc, r) == batch(2L))
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
