package graft.tools

import graft.functions.CmsCodec
import org.apache.spark.sql.functions._

/** Throwaway measurement probe for the x6_audit_demotion cost model:
  * prints the CMS edge estimates and Selinger costs the reorder pass
  * sees under the poisoned catalog at a given sf scratch dir.
  */
object DemoteProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val cat = spark.read.parquet(args(0)).collect()
    def cms(key: String) = cat.find(_.getString(1) == key).get.getAs[Array[Byte]](5)
    def n(key: String) = cat.find(_.getString(1) == key).get.getLong(2)
    val estOC = CmsCodec.innerProduct(CmsCodec.parse(cms("o_custkey")), CmsCodec.parse(cms("c_custkey")))
    val estOL = CmsCodec.innerProduct(CmsCodec.parse(cms("o_orderkey")), CmsCodec.parse(cms("l_orderkey")))
    val (no, nc, nl) = (n("o_custkey"), n("c_custkey"), n("l_orderkey"))
    println(s"PROBE est(o,c)=$estOC est(o,l)=$estOL n_o=$no n_c=$nc n_l=$nl")
    // chain1 good-first orig: e0=estOC, then attach lineitem
    val sel1 = estOL.toDouble / (no.toDouble * nl)
    val orig = estOC + estOC * nl * sel1
    // greedy alt: start (o,l), attach customer
    val sel0 = estOC.toDouble / (no.toDouble * nc)
    val alt = estOL + estOL * nc * sel0
    println(f"PROBE origCost=$orig%.0f altCost=$alt%.0f flip=${alt < orig}")
    spark.stop()
  }
}
