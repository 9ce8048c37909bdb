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
}
