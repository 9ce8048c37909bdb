package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe for SCALING.md: corpus-scaling behavior of the probe-side
  * operators (semantic decon, flat PQ, IVF-PQ) with the PROBE SIDE HELD
  * CONSTANT — the deployment contract (a decon benchmark is a fixed eval
  * suite; an ANN query batch doesn't grow because the corpus did). The
  * registered queries derive both sides from one fixture, so scaling that
  * fixture multiplies BOTH factors of the candidate product and measures
  * the fixture, not the engine — same trap ScaleUp's doc calls out for
  * naive near-dup replication, handled here by pinning the probe side to
  * the base fixture.
  *
  * Usage: runMain graft.tools.AnnScaleProbe <baseSfDir> <corpusDir> <reps>
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, corpusDir, repsS) = args
    val reps = repsS.toInt
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val corpus = spark.read.parquet(s"$corpusDir/embeddings.parquet")
    val bench = base.where(col("vec_id") % 25 === 0)     // fixed "eval suite"
    val queries = base.where(col("vec_id") % 100 === 0)  // fixed query batch

    def time(name: String)(mk: => DataFrame): Unit = {
      val mins = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        graft.ops.OpCaches.release()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[annprobe] $name corpus=$corpusDir min=${mins.min}%.3f runs=${mins.map(m => f"$m%.2f").mkString(",")}")
    }

    time("semantic_decon_fixed_bench") {
      Similarity.semanticContaminationReport(corpus, bench,
        threshold = 0.3, dim = 64, bands = 16, bitsPerBand = 8)
    }
    time("pq_topk_fixed_queries") {
      Similarity.pqTopK(queries, corpus, k = 5, dim = 64, m = 32, bitsPerCode = 4)
    }
    time("ivfpq_topk_fixed_queries") {
      Similarity.ivfPqTopK(queries, corpus, k = 5, nProbe = 3, dim = 64,
        bitsPerCell = 4, m = 32, bitsPerCode = 4)
    }
    spark.stop()
  }
}
