package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Dev probe: how tight is the CMS inner-product join-cardinality
  * estimate ([[graft.ops.Sketches.cmsJoinCardinality]]) as the tables
  * grow past the sketch width? Expected inflation ≈ N_A·N_B/width from
  * pairwise hash collisions — the crossover where a fixed-geometry
  * store stops resolving a join size is a WIDTH question, not a depth
  * one, and this measures it at ×1/×10/×100 for the two registered
  * pairs plus a low-cardinality control (events self-F2, whose key
  * space never outgrows the width).
  *
  * Usage: runMain graft.tools.JoinCardProbe <sfDir> [eps]
  */
object JoinCardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val eps = if (args.length > 1) args(1).toDouble else 1e-4
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val ev = spark.read.parquet(s"$dir/events.parquet")

    def report(pair: String, est: org.apache.spark.sql.DataFrame, exact: Long): Unit = {
      val r = est.select("n_a", "n_b", "join_card_est").head()
      val (na, nb, e) = (r.getLong(0), r.getLong(1), r.getLong(2))
      println(f"$pair nA=$na nB=$nb exact=$exact est=$e " +
        f"rel=${e.toDouble / exact}%.3f boundSlack=${eps * na * nb}%.0f")
    }
    report("orders_lineitem",
      Sketches.cmsJoinCardinality(orders, col("o_orderkey"), lineitem,
        col("l_orderkey"), eps),
      orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count())
    report("events_self_f2",
      Sketches.cmsJoinCardinality(ev, col("user_id"), ev, col("user_id"), eps),
      ev.groupBy("user_id").count()
        .agg(sum(col("count") * col("count"))).head().getLong(0))
    spark.stop()
  }
}
