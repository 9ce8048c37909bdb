package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: PQ recall vs brute-force truth across parameterizations. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") % 100 === 0)
    val truth = Similarity.cosineTopK(q, emb, k = 5).persist()
    truth.count()
    for ((m, b) <- Seq((8, 4), (16, 4), (8, 6), (16, 6), (32, 4))) {
      val approx = Similarity.pqTopK(q, emb, k = 5, dim = 64, m = m, bitsPerCode = b)
      val rec = Similarity.topKRecall(truth, approx, k = 5)
        .agg(avg("recall")).head.getDouble(0)
      println(f"[pqprobe] m=$m%2d bits=$b  mean_recall=$rec%.3f")
    }
    spark.stop()
  }
}
