package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: where does pqTopK spend its time — the codebook fit (an
  * aggregate + collect over the corpus) or the ADC search (broadcast
  * cross join + rank)? Used to attribute the r9→r10 pq_topk delta after
  * the native sign-pack expression landed.
  */
object PqStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") % 100 === 0)
    emb.count(); q.count() // warm file scan
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      Similarity.pqFitCodebooks(emb, dim = 64, m = 32, bitsPerCode = 4)
      val fitS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val n = Similarity.pqTopK(q, emb, k = 5, dim = 64, m = 32, bitsPerCode = 4).count()
      val allS = (System.nanoTime() - t0) / 1e9
      println(f"[pqstage] rep=$rep fit=$fitS%.2fs full=$allS%.2fs (search ~= ${allS - fitS}%.2fs) rows=$n")
    }
    spark.stop()
  }
}
