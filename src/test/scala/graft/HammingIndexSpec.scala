package graft

import graft.ops.{HammingIndex, Multimodal}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The partition-pruned fingerprint index: screening verdicts must equal
  * brute force, and the probe scan must actually touch only the probed
  * partition directories — the property that makes per-batch cost
  * independent of corpus size.
  */
class HammingIndexSpec extends SparkSpec {
  import spark.implicits._

  test("screen == brute force, and the scan reads only touched pbucket partitions") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = docs.select(col("doc_id"),
      Multimodal.encodePpmPatch(md5(expr("CAST(doc_id DIV 25 AS STRING)").cast("binary")),
        substring(col("text"), 1, 12), w = 13, h = 9, patchBytes = 78).as("media"))
    val hashes = Multimodal.ppmDHash(media, "doc_id")
    val corpus = hashes.where(col("id") % 2 === 0 && col("id") < 250)
    // a small batch — the contract's shape (corpus big, arrivals small);
    // also what makes the pruning assertion meaningful: 3 docs × 4 chunks
    // = ≤12 touched buckets against the corpus's full directory set
    val probes = hashes.where(col("id").isin(201L, 231L, 261L))

    val path = Files.createTempDirectory("hamming-index").toString + "/idx"
    HammingIndex.write(corpus, "id", "dhash", maxHamming = 3, path)

    val out = HammingIndex.screen(spark, path, probes, "id", "dhash", maxHamming = 3)
    val got = out.as[(Long, Boolean)].collect().toMap

    val corpusHashes = corpus.as[(Long, Long)].collect().map(_._2)
    val truth = probes.as[(Long, Long)].collect().map { case (id, h) =>
      id -> corpusHashes.exists(c => java.lang.Long.bitCount(c ^ h) <= 3)
    }.toMap
    assert(truth.values.exists(identity) && !truth.values.forall(identity),
      "fixture must contain both dups and admitted docs")
    assert(got == truth)

    // partition pruning is real: the probe batch touches a strict subset
    // of the corpus's bucket directories, and the EXECUTED scan reads only
    // those files (inputFiles ignores filters — use the scan metric)
    val allFiles = spark.read.parquet(path).inputFiles.length
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // populate metrics
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val probeChunks = graft.streaming.StreamingHammingAdmit
      .frozenCorpusChunks(probes, "id", "dhash", 3)
      .withColumn("pbucket",
        pmod(col("chunkVal") * 31L + col("chunk"), lit(256L)).cast("int"))
    val buckets = probeChunks.select("pbucket").distinct().collect().map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(path).where(col("pbucket").isin(buckets: _*))
    val prunedFiles = scannedFiles(pruned)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "bucket filter did not become a partition filter")
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"expected a pruned scan: $prunedFiles of $allFiles files")
  }

  test("flat-wave streaming admission via the index equals brute force across waves") {
    import graft.streaming.StreamingHammingAdmit
    import graft.streaming.StreamingHammingAdmit.Fp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = docs.select(col("doc_id"),
      Multimodal.encodePpmPatch(md5(expr("CAST(doc_id DIV 25 AS STRING)").cast("binary")),
        substring(col("text"), 1, 12), w = 13, h = 9, patchBytes = 78).as("media"))
    val hashes = Multimodal.ppmDHash(media, "doc_id")
    val corpus = hashes.where(col("id") % 2 === 0 && col("id") < 250)
    val incoming = hashes.where(col("id") % 2 === 1 && col("id").between(200, 320))
      .as[(Long, Long)].collect().map { case (id, h) => Fp(id, h) }.toSeq
    val path = Files.createTempDirectory("hamming-index-fw").toString + "/idx"
    HammingIndex.write(corpus, "id", "dhash", maxHamming = 3, path)

    val got = scala.collection.concurrent.TrieMap.empty[Long, Boolean]
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fp]
    val q = StreamingHammingAdmit.indexAdmissionWriter(input.toDS(), path, maxHamming = 3) {
      (verdicts, _) =>
        verdicts.collect().foreach(r => got.put(r.getLong(0), r.getBoolean(1)))
    }.option("checkpointLocation", Files.createTempDirectory("fw-ckpt").toString).start()
    incoming.grouped(25).foreach { w => input.addData(w: _*); q.processAllAvailable() }
    q.stop()

    val corpusHashes = corpus.as[(Long, Long)].collect().map(_._2)
    val truth = incoming.map(f => f.docId ->
      corpusHashes.exists(c => java.lang.Long.bitCount(c ^ f.hash) <= 3)).toMap
    assert(got.toMap == truth)
  }
}
