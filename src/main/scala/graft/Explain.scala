package graft


/** Plan-inspection tool: prints the formatted physical plan of the named
  * queries (all when none given). Used to audit pushdown/pruning/codegen
  * spans per SURVEY.md's 100 TB posture.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(4, logLevel = "ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      // constructing a query may pin operator-internal helper tables;
      // release per query like every other OpCaches consumer
      graft.ops.OpCaches.release()
    }
    spark.stop()
  }
}
