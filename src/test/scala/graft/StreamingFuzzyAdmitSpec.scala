package graft

import graft.streaming.StreamingFuzzyAdmit
import graft.streaming.StreamingFuzzyAdmit.Probe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming typo-tolerant admission: verdicts from the stream-static
  * deletion-key join against the frozen name corpus must equal the brute
  * "has a distance-≤1 corpus neighbor" truth doc-for-doc, across any
  * batching; re-sent probes emit no second verdict.
  */
class StreamingFuzzyAdmitSpec extends SparkSpec {
  import spark.implicits._

  private def refDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("stream verdicts equal brute-force fuzzy screening of mutated customer names") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_name")).as[(Long, String)].collect()
    val corpusNames = cust.filter(_._1 % 2 == 0)
    // probes: one-char mutations of corpus names (dup), names from the odd
    // half mangled beyond distance 1 (admitted), and exact corpus names
    val probes = corpusNames.take(20).map { case (k, n) =>
      Probe(100000L + k, n.dropRight(1) + "X") } ++          // substitution: dup
      cust.filter(_._1 % 2 == 1).take(20).map { case (k, n) =>
        Probe(200000L + k, "ZZ" + n + "ZZ") } ++             // far: admitted
      corpusNames.slice(20, 30).map { case (k, n) => Probe(300000L + k, n) } // exact dup
    val corpusSet = corpusNames.map(_._2)
    val truth = probes.map(p => p.docId ->
      corpusSet.exists(c => refDist(p.s, c) <= 1)).toMap
    assert(truth.values.exists(identity) && !truth.values.forall(identity),
      "fixture must contain both dups and admitted probes")

    val corpusKeys = StreamingFuzzyAdmit.frozenCorpusKeys(
      corpusNames.toSeq.toDF("c_custkey", "c_name"), "c_custkey", col("c_name"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Probe]
    val q = StreamingFuzzyAdmit.admissionStream(input.toDS(), corpusKeys)
      .writeStream.format("memory").queryName("fuzzy_admit_out")
      .option("checkpointLocation", Files.createTempDirectory("fadmit-ckpt").toString)
      .outputMode("append").start()
    val waves = probes.grouped(17).toSeq
    waves.foreach { w => input.addData(w.toSeq: _*); q.processAllAvailable() }
    input.addData(waves.head.toSeq: _*); q.processAllAvailable() // re-send: no re-emit
    q.stop()

    val out = spark.table("fuzzy_admit_out").select("docId", "corpus_dup")
      .as[(Long, Boolean)].collect()
    assert(out.length == probes.length, "exactly one verdict per probe, re-sends ignored")
    assert(out.toMap == truth)
  }
}
