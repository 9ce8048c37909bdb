package graft

import graft.ops.{Dedup, Multimodal}
import graft.streaming.StreamingHammingAdmit
import graft.streaming.StreamingHammingAdmit.Fp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming perceptual admission: verdicts streamed through the
  * stream-static chunk join against a frozen fingerprint corpus must equal
  * the brute-force "has a corpus hash within the bound" truth doc-for-doc,
  * independent of arrival batching; re-sent fingerprints emit no second
  * verdict. Exercised on REAL image fingerprints (parsed-P6 dHash over the
  * patched fixture), so the JVM chunk twin is checked against the Column
  * chunking end-to-end.
  */
class StreamingHammingAdmitSpec extends SparkSpec {
  import spark.implicits._

  test("stream verdicts equal brute-force corpus screening on dHash fingerprints, across waves") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = docs.select(col("doc_id"),
      Multimodal.encodePpmPatch(md5(expr("CAST(doc_id DIV 25 AS STRING)").cast("binary")),
        substring(col("text"), 1, 12), w = 13, h = 9, patchBytes = 78).as("media"))
    val hashes = Multimodal.ppmDHash(media, "doc_id")
    // corpus = even ids of the first 10 groups; incoming straddles the
    // group-250 boundary, so some docs share a corpus base image (dups at
    // small hamming) and the rest come from groups the corpus never saw
    val corpus = hashes.where(col("id") % 2 === 0 && col("id") < 250)
    val incoming = hashes.where(col("id") % 2 === 1 && col("id").between(200, 320))
      .as[(Long, Long)].collect().map { case (id, h) => Fp(id, h) }.toSeq

    val corpusHashes = corpus.as[(Long, Long)].collect().map(_._2)
    val truth = incoming.map(f => f.docId ->
      corpusHashes.exists(c => java.lang.Long.bitCount(c ^ f.hash) <= 3)).toMap
    assert(truth.values.exists(identity), "fixture must contain at least one corpus dup")
    assert(!truth.values.forall(identity), "fixture must contain admitted docs too")

    val chunked = StreamingHammingAdmit.frozenCorpusChunks(corpus, "id", "dhash", maxHamming = 3)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fp]
    val q = StreamingHammingAdmit.admissionStream(input.toDS(), chunked, maxHamming = 3)
      .writeStream.format("memory").queryName("hamming_admit_out")
      .option("checkpointLocation", Files.createTempDirectory("hadmit-ckpt").toString)
      .outputMode("append").start()
    val waves = incoming.grouped(25).toSeq
    waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }
    input.addData(waves.head: _*); q.processAllAvailable() // re-send: no re-emit
    q.stop()

    val out = spark.table("hamming_admit_out").select("docId", "corpus_dup")
      .as[(Long, Boolean)].collect()
    assert(out.length == incoming.length, "exactly one verdict per doc, re-sends ignored")
    assert(out.toMap == truth)
  }

  test("video temporal fingerprints flow through the same admission stream (modality-generic)") {
    // the admission machinery is fingerprint-agnostic by design; this pins
    // the VIDEO hash into that contract — ingest screening for clips uses
    // the exact plan images do, no video-specific streaming code
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val g = expr("CAST(doc_id DIV 25 AS STRING)")
    val base = concat((0 until 20).map(k => md5(concat(g, lit(s"-$k")).cast("binary"))): _*)
    val media = docs.select(col("doc_id"),
      Multimodal.encodeGvidPatch(base, substring(col("text"), 1, 12),
        expr("CAST(72 + (doc_id DIV 25) % 41 AS INT)"), w = 6, h = 5,
        patchFrames = 2).as("media"))
    val hashes = Multimodal.gvidTemporalHash(media, "doc_id")
    val corpus = hashes.where(col("id") % 2 === 0 && col("id") < 250)
    val incoming = hashes.where(col("id") % 2 === 1 && col("id").between(200, 320))
      .as[(Long, Long)].collect().map { case (id, h) => Fp(id, h) }.toSeq
    val corpusHashes = corpus.as[(Long, Long)].collect().map(_._2)
    val truth = incoming.map(f => f.docId ->
      corpusHashes.exists(c => java.lang.Long.bitCount(c ^ f.hash) <= 3)).toMap
    assert(truth.values.exists(identity) && !truth.values.forall(identity),
      "fixture must contain both dup and admitted clips")

    val chunked = StreamingHammingAdmit.frozenCorpusChunks(corpus, "id", "vhash", maxHamming = 3)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fp]
    val q = StreamingHammingAdmit.admissionStream(input.toDS(), chunked, maxHamming = 3)
      .writeStream.format("memory").queryName("vhash_admit_out")
      .option("checkpointLocation", Files.createTempDirectory("vadmit-ckpt").toString)
      .outputMode("append").start()
    incoming.grouped(40).foreach { w => input.addData(w: _*); q.processAllAvailable() }
    q.stop()
    val out = spark.table("vhash_admit_out").select("docId", "corpus_dup")
      .as[(Long, Boolean)].collect()
    assert(out.length == incoming.length && out.toMap == truth)
  }
}
