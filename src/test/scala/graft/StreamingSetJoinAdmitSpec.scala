package graft

import graft.ops.SetJoin
import graft.streaming.StreamingSetJoinAdmit
import graft.streaming.StreamingSetJoinAdmit.Probe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming set-similarity admission: verdicts from the stream-static
  * prefix-token join against the frozen corpus must equal the batch
  * [[SetJoin.jaccardJoin]] corpus verdicts doc-for-doc, across any
  * batching; re-sent probes emit no second verdict. The fixture crosses
  * every pair class: above/at/below threshold, identical sets, token
  * shared with many corpus sets but every pair below t, no shared token
  * at all, and duplicate tokens in the raw probe input.
  */
class StreamingSetJoinAdmitSpec extends SparkSpec {
  import spark.implicits._

  test("stream verdicts equal batch jaccardJoin corpus verdicts across arrival waves") {
    val corpus = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("x", "y", "z", "w"),
      3L -> Seq("m", "n"),
      4L -> Seq("p", "q", "r", "s", "t", "u"),
      5L -> Seq("k", "l", "c", "d"))
    val probes = Seq(
      Probe(101L, Seq("a", "b", "c", "e")),      // J(·,1) = 3/5 ≥ 1/2: dup
      Probe(102L, Seq("x", "y")),                // J(·,2) = 2/4 = 1/2 exactly: dup
      Probe(103L, Seq("zz", "yy")),              // no shared token: admitted
      Probe(104L, Seq("p", "q", "r")),           // J(·,4) = 3/6 = 1/2: dup
      Probe(105L, Seq("m", "n")),                // identical to 3: dup
      Probe(106L, Seq("a", "x", "m", "p")),      // one token shared with four
                                                 // sets, every pair < t: admitted
      Probe(107L, Seq("d", "c", "c", "d")))      // raw dups; set {c,d}: dup via 5
    val (tNum, tDen) = (1, 2)

    // batch truth: the full jaccardJoin over corpus ∪ probes, verdict =
    // a pair crossing the corpus/probe halves exists for the probe
    val union = (corpus ++ probes.map(p => (p.docId, p.tokens)))
      .toDF("id", "toks")
    val pairs = SetJoin.jaccardJoin(union, "id", array_distinct(col("toks")),
        tNum, tDen)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    graft.ops.OpCaches.release()
    val truth = probes.map(p => p.docId -> pairs.exists { case (a, b) =>
      (a == p.docId && b <= 5L) || (b == p.docId && a <= 5L) }).toMap
    assert(truth.values.exists(identity) && !truth.values.forall(identity),
      s"fixture must contain both dups and admitted probes: $truth")

    val corpusDf = corpus.toDF("id", "toks")
    val prefix = StreamingSetJoinAdmit.frozenCorpusPrefix(
      corpusDf, "id", col("toks"), tNum, tDen)
    val sets = StreamingSetJoinAdmit.frozenCorpusSets(corpusDf, "id", col("toks"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Probe]
    val q = StreamingSetJoinAdmit.admissionStream(input.toDS(), prefix, sets,
        tNum, tDen)
      .writeStream.format("memory").queryName("setjoin_admit_out")
      .option("checkpointLocation", Files.createTempDirectory("sjadmit-ckpt").toString)
      .outputMode("append").start()
    val waves = probes.grouped(3).toSeq
    waves.foreach { w => input.addData(w.toSeq: _*); q.processAllAvailable() }
    input.addData(waves.head.toSeq: _*); q.processAllAvailable() // re-send: no re-emit
    q.stop()

    val out = spark.table("setjoin_admit_out").select("docId", "corpus_dup")
      .as[(Long, Boolean)].collect()
    assert(out.length == probes.length, "exactly one verdict per probe, re-sends ignored")
    assert(out.toMap == truth, s"stream=${out.toMap} batch=$truth")
  }
}
