package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: where does the corpus-sized sign-LSH family spend its time
  * at ×100 — the bucket projection (bands × bits md5-seeded dots per
  * vector), the banded self-join, or the exact-cosine verify? Derived
  * bits collapsed the candidate count ~1000× at 200k vectors yet the
  * measured wall barely moved (r14: 174 s vs r13's fixed-8-bit 147 s),
  * so the bottleneck is NOT candidates. Stages timed separately:
  *
  *   buckets  = compute + materialize the banded (id, band, bkt) rows
  *   pairs    = full near-dup run (carryVectors = true, the registered
  *              r13 shape)
  *   rejoin   = full near-dup run with carryVectors = false (candidates
  *              then vector re-join)
  */
object RhpStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-x100")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val bits = Similarity.rhpBitsFor(n)
    println(s"[rhpstage] n=$n bits=$bits")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[rhpstage] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$rows")
    }
    for (_ <- 1 to 2) {
      time("buckets") {
        graft.functions.GraftFunctions.register(spark)
        val planes = Array.tabulate(8 * bits, 64)(Similarity.planeComponent)
        emb.select(col("vec_id"),
            posexplode(Similarity.signBucketArray(col("embedding"), planes, 8, bits))
              .as(Seq("band", "bkt")))
          .count()
      }
      time("pairs") {
        Similarity.randomHyperplaneNearDupPairs(emb, threshold = 0.45, dim = 64,
          bands = 8, bitsPerBand = bits).count()
      }
      time("rejoin") {
        Similarity.randomHyperplaneNearDupPairs(emb, threshold = 0.45, dim = 64,
          bands = 8, bitsPerBand = bits, carryVectors = false).count()
      }
      graft.ops.OpCaches.release()
    }
    spark.stop()
  }
}
