package graft

import graft.ops.SketchCatalog
import org.apache.spark.sql.functions._

/** The planning rule's global safety property, asserted over REAL
  * registered queries rather than fixtures: activating a statistics
  * catalog over every TPC table and join key must change NO registered
  * query's results — the rule reorders, hints, and injects filters, all
  * of which are result-invariant by contract, and any defect in any
  * pass (a dropped conjunct, an unsound Bloom class, a rotated
  * non-commuting join) shows up here as a row diff on a query written
  * with no knowledge of the catalog.
  *
  * The sample is the join-heavy slice of the registry: hinted joins
  * (the rule must defer), un-hinted joins (the rule may act), anti/semi
  * shapes (outside the rule's inner-only scope — must pass through),
  * and composed chains. The planner gates themselves (q13–q16) manage
  * activation internally and are excluded.
  */
class SketchPlanningRegistrySafetySpec extends SparkSpec {

  test("an activated catalog never changes a registered query's results") {
    val dir = "/root/testdata/sf0.001"
    val store = java.nio.file.Files.createTempDirectory("graft-safety").toString + "/cat"
    val cat = Seq(
      ("customer", Seq("c_custkey", "c_nationkey")),
      ("orders", Seq("o_orderkey", "o_custkey")),
      ("lineitem", Seq("l_orderkey", "l_suppkey", "l_partkey")),
      ("supplier", Seq("s_suppkey")),
      ("nation", Seq("n_nationkey")),
      ("events", Seq("user_id", "event_id")))
      .map { case (t, ks) => SketchCatalog.harvest(spark, s"$dir/$t.parquet", ks) }
      .reduce(_ unionByName _)
    SketchCatalog.save(cat, store)

    val names = Seq("q1_agg", "q3_top_orders", "q4_late_orders",
      "q5_region_revenue", "q7_promo_by_brand", "q8_salted_revenue",
      "q10_funnel", "q11_retention", "q12_bloom_revenue",
      "j_anti_no_orders", "j_semi_suppliers", "j_asof_attribution",
      "j_interval_errors", "w_topk_orders", "x8_entity_resolution")
    val qs = graft.queries.Queries.all

    names.foreach { name =>
      val q = qs(name)
      SketchCatalog.deactivate(spark)
      val plain = q(spark, dir).collect().map(_.toString).sorted.toSeq
      SketchCatalog.activate(spark, store)
      val planned = try q(spark, dir).collect().map(_.toString).sorted.toSeq
        finally SketchCatalog.deactivate(spark)
      assert(planned == plain,
        s"$name: results changed under an activated catalog")
    }
  }

  test("activated scan-prune manifests never change a registered query's results") {
    import graft.ops.{DataSkipping, ScanPrune}
    val dir = "/root/testdata/sf0.001"
    // manifests over the columns the registered queries actually filter
    // on — scan pruning must be invisible to every one of them
    val tables = Seq(
      ("events", Seq("event_id", "user_id")),
      ("orders", Seq("o_orderkey", "o_custkey", "o_totalprice")),
      ("lineitem", Seq("l_orderkey", "l_suppkey", "l_quantity")),
      ("customer", Seq("c_custkey", "c_acctbal")),
      ("supplier", Seq("s_suppkey", "s_acctbal")))
    val names = Seq("q1_agg", "q3_top_orders", "q4_late_orders",
      "q5_region_revenue", "q8_salted_revenue", "q10_funnel",
      "q11_retention", "q12_bloom_revenue", "s2_incremental_scan",
      "f2_cdc_filter", "j_anti_no_orders", "j_semi_suppliers",
      "w_topk_orders")
    val qs = graft.queries.Queries.all
    names.foreach { name =>
      val q = qs(name)
      ScanPrune.deactivateAll(spark)
      val plain = q(spark, dir).collect().map(_.toString).sorted.toSeq
      tables.foreach { case (tbl, cols) =>
        val p = s"$dir/$tbl.parquet"
        ScanPrune.activateManifest(spark, p,
          DataSkipping.statsManifest(spark, p, cols))
      }
      val pruned = try q(spark, dir).collect().map(_.toString).sorted.toSeq
        finally ScanPrune.deactivateAll(spark)
      assert(pruned == plain,
        s"$name: results changed under activated scan-prune manifests")
    }
  }
}
