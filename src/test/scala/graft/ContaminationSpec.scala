package graft

import graft.ops.Contamination
import org.apache.spark.sql.functions._

/** Decontamination semantics: gram-overlap detection, the minOverlap
  * threshold, and the anti-join complement.
  */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val benchmark = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs")
  ).toDF("doc_id", "text")

  private lazy val train = Seq(
    (1L, "a copied passage the quick brown fox jumps right here"), // shares 3-grams
    (2L, "completely unrelated text about spark catalyst plans"),
    (3L, "pack my box with different contents entirely"),           // shares 1 trigram
    (4L, "THE  QUICK   brown fox jumps over something")             // normalization still matches
  ).toDF("doc_id", "text")

  test("report flags overlapping docs with distinct-gram counts") {
    val rep = Contamination.contaminationReport(train, benchmark, "doc_id", $"text", n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1: "the quick brown", "quick brown fox", "brown fox jumps" = 3
    assert(rep(1L) == 3)
    // doc 3: "pack my box" + "my box with" = 2
    assert(rep(3L) == 2)
    // doc 4 normalizes to lowercase single-space: 4 shared trigrams
    assert(rep(4L) == 4)
    assert(!rep.contains(2L))
  }

  test("minOverlap raises the flag threshold") {
    val rep = Contamination.contaminationReport(train, benchmark, "doc_id", $"text",
      n = 3, minOverlap = 3)
    assert(rep.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("decontaminate keeps exactly the unflagged complement") {
    val clean = Contamination.decontaminate(train, benchmark, "doc_id", $"text", n = 3)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(2L))
    val lenient = Contamination.decontaminate(train, benchmark, "doc_id", $"text",
      n = 3, minOverlap = 3)
    assert(lenient.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("short docs fall back to the whole-text shingle") {
    val b = Seq((9L, "tiny")).toDF("doc_id", "text")
    val t = Seq((1L, "tiny"), (2L, "tiny doc that is long enough for grams")).toDF("doc_id", "text")
    val rep = Contamination.contaminationReport(t, b, "doc_id", $"text", n = 3)
    assert(rep.select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("batch admitClean equals decontaminate on the shared fixture") {
    val grams = Contamination.benchmarkGramSet(benchmark, "doc_id", $"text", n = 3)
    val viaSet = Contamination.admitClean(train, $"text", grams, n = 3)
      .select("doc_id").as[Long].collect().toSet
    val viaJoin = Contamination.decontaminate(train, benchmark, "doc_id", $"text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(viaSet == viaJoin)
  }

  test("admitClean is stateless-streamable: per-arrival admission matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val grams = Contamination.benchmarkGramSet(benchmark, "doc_id", $"text", n = 3)
    val input = MemoryStream[(Long, String)]
    val q = Contamination.admitClean(input.toDS().toDF("doc_id", "text"), $"text", grams, n = 3)
      .writeStream.format("memory").queryName("admit_out")
      .outputMode("append").start()
    val rows = train.select("doc_id", "text").as[(Long, String)].collect().toSeq
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("admit_out").select("doc_id").as[Long].collect().toSet
    assert(streamed == Set(2L)) // same survivor set as batch decontaminate
  }
}
