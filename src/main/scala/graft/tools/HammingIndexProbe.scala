package graft.tools

import graft.ops.{HammingIndex, Multimodal}
import org.apache.spark.sql.functions._

/** Dev tool: SCALING.md probe for [[graft.ops.HammingIndex]] under the
  * deployment contract — corpus index grows (×1/×10/×100 ScaleUp docs,
  * dHashed), probe batch fixed at 250 base-fixture docs. Reports:
  *
  *  - `index_write_s`: one-time freeze (fingerprint + partitioned write) —
  *    expected linear in corpus;
  *  - `screen_s`: per-batch screening reps against the written index —
  *    the claim under test is that this is a function of batch size and
  *    bucket occupancy, NOT corpus size (partition-pruned scan).
  *
  * Usage: runMain graft.tools.HammingIndexProbe <corpusSfDir> <probeSfDir> <outDir>
  */
object HammingIndexProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: HammingIndexProbe <corpusSfDir> <probeSfDir> <outDir>")
    val Array(corpusDir, probeDir, outDir) = args
    val spark = graft.GraftSession.local(32)

    // the registered X4d fixture shape: per-25-doc-group base image with a
    // per-doc trailing patch (same construction as Queries.dhashMedia)
    def media(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        Multimodal.encodePpmPatch(md5(expr("CAST(doc_id DIV 25 AS STRING)").cast("binary")),
          substring(col("text"), 1, 12), w = 13, h = 9, patchBytes = 78).as("media"))

    val corpusHashes = Multimodal.ppmDHash(media(corpusDir), "doc_id")
    val probeHashes = Multimodal.ppmDHash(
      media(probeDir).orderBy("doc_id").limit(250), "doc_id")
      .persist()
    probeHashes.count() // probe fingerprints are fixed; exclude from timings

    val path = s"$outDir/idx"
    val t0 = System.nanoTime()
    HammingIndex.write(corpusHashes, "id", "dhash", maxHamming = 3, path)
    val writeS = (System.nanoTime() - t0) / 1e9

    val screenS = (1 to 3).map { _ =>
      val t = System.nanoTime()
      val n = HammingIndex.screen(spark, path, probeHashes, "id", "dhash", maxHamming = 3).count()
      require(n == 250, s"expected 250 verdicts, got $n")
      (System.nanoTime() - t) / 1e9
    }

    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"hamming_index_probe","corpus":"$corpusDir","index_write_s":${f3(writeS)},""" +
      s""""screen_s":[${screenS.map(f3).mkString(",")}]}""")
    spark.stop()
  }
}
