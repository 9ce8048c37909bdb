package graft.tools

import graft.streaming.StreamingNearDupAdmit
import graft.streaming.StreamingNearDupAdmit.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dev tool: SCALING.md probe for [[StreamingNearDupAdmit]] under the
  * deployment contract — the corpus side grows (×1/×10/×100 ScaleUp
  * fixtures), the ARRIVAL side does not (a fixed 1000-doc wave set from
  * the base fixture: ingest rate is a property of the feed, not of how
  * much corpus has accumulated). Reported numbers:
  *
  *  - `corpus_build_s`: one-time cost of freezing the corpus band table
  *    (signature pipeline + persist) — expected linear in corpus;
  *  - `wave_s`: per-wave end-to-end latency through the running query
  *    (stream-static band join + verdict processor) — expected ~flat in
  *    corpus while bucket occupancy stays bounded, which is the whole
  *    scale claim of the operator.
  *
  * Usage: runMain graft.tools.StreamingAdmitProbe <corpusDocsSfDir> <probeSfDir>
  * Prints one JSON line.
  */
object StreamingAdmitProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StreamingAdmitProbe <corpusSfDir> <probeSfDir>")
    val Array(corpusDir, probeDir) = args
    val spark = graft.GraftSession.local(32)
    import spark.implicits._

    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet").select("doc_id", "text")
    val probeDocs = spark.read.parquet(s"$probeDir/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(1000)
      .as[(Long, String)].collect().map { case (id, t) => Doc(id, t) }.toSeq

    val t0 = System.nanoTime()
    val banded = StreamingNearDupAdmit.frozenCorpusBands(corpus, "doc_id", col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandRows = banded.count()
    val buildS = (System.nanoTime() - t0) / 1e9

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingNearDupAdmit.admissionStream(input.toDS(), banded)
      .writeStream.format("memory").queryName("admit_probe")
      .option("checkpointLocation", Files.createTempDirectory("admit-probe-ckpt").toString)
      .outputMode("append").start()

    // wave 0 pays codegen/stateful-init cold start; report it separately
    val waves = probeDocs.grouped(250).toSeq
    val waveS = waves.map { w =>
      val t = System.nanoTime()
      input.addData(w: _*)
      q.processAllAvailable()
      (System.nanoTime() - t) / 1e9
    }
    val verdicts = spark.table("admit_probe").count()
    q.stop()
    banded.unpersist()

    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"streaming_admit_probe","corpus":"$corpusDir","band_rows":$bandRows,""" +
      s""""corpus_build_s":${f3(buildS)},"wave_s":[${waveS.map(f3).mkString(",")}],""" +
      s""""verdicts":$verdicts}""")
    spark.stop()
  }
}
