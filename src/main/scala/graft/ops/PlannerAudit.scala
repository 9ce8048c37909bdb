package graft.ops

import graft.functions.CmsCodec
import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Planner self-audit: estimated vs ACTUAL join cardinalities, recorded
  * from real executions into an artifact table — the feedback loop every
  * cost-based planner needs and most never close. The estimate is the
  * same AMS inner product of stored Count-Min sketches the planning rule
  * consumes ([[graft.plans.SketchJoinPlanning]]); the actual count rides
  * the audited query itself via Spark's `Observation` (a CollectMetrics
  * node drained through a QueryExecutionListener — the count costs no
  * second job and no extra scan), so the audit measures the execution it
  * claims to measure, not a replay.
  *
  * Contract audited (the x6_cms_join_card posture, now verified on real
  * executions): the CMS inner product NEVER undercounts the true join
  * output (every cell is an over-approximation of its keys' counts —
  * minimum over depth rows keeps it one), and overcounts by at most
  * ε·|A|·|B| per depth row with the sketch's own confidence — both ride
  * the audit report as per-join booleans.
  */
object PlannerAudit {

  val recordSchema: StructType = StructType(Seq(
    StructField("table_a", StringType, nullable = false),
    StructField("key_a", StringType, nullable = false),
    StructField("table_b", StringType, nullable = false),
    StructField("key_b", StringType, nullable = false),
    StructField("est_rows", LongType, nullable = false),
    StructField("actual_rows", LongType, nullable = false),
    StructField("n_a", LongType, nullable = false),
    StructField("n_b", LongType, nullable = false),
    StructField("eps", DoubleType, nullable = false)))

  /** Execute `a ⋈ b` on `keyA = keyB` to completion with an attached
    * observation and return the (estimate, actual) audit row. `catalog`
    * must hold both (table, key) entries (same geometry/seed); `eps` is
    * the geometry the estimate's error bound is stated against.
    */
  def auditEquiJoin(spark: SparkSession, catalog: SketchCatalog.Catalog,
                    dirA: String, keyA: String, dirB: String, keyB: String,
                    eps: Double = 1e-3): Row = {
    val ta = SketchCatalog.normalizePath(spark, dirA)
    val tb = SketchCatalog.normalizePath(spark, dirB)
    val ea = catalog.byTableKey.getOrElse((ta, keyA),
      throw new IllegalArgumentException(s"auditEquiJoin: ($ta, $keyA) not catalogued"))
    val eb = catalog.byTableKey.getOrElse((tb, keyB),
      throw new IllegalArgumentException(s"auditEquiJoin: ($tb, $keyB) not catalogued"))
    val est = CmsCodec.innerProduct(CmsCodec.parse(ea.cms), CmsCodec.parse(eb.cms))
    val obs = Observation()
    // keys aliased apart: bare col(keyA) === col(keyB) is ambiguous for
    // self-joins (dirA == dirB — the shape the skew pass targets) or
    // whenever the key name exists on both sides; column-pruned to the
    // keys, which is all a count needs
    val joined = spark.read.parquet(dirA).select(col(keyA).as("__audit_ka"))
      .join(spark.read.parquet(dirB).select(col(keyB).as("__audit_kb")),
        col("__audit_ka") === col("__audit_kb"))
      .observe(obs, count(lit(1)).as("rows"))
    joined.write.mode("overwrite").format("noop").save()
    val actual = obs.get("rows").asInstanceOf[Long]
    Row(ta, keyA, tb, keyB, est, actual, ea.nRows, eb.nRows, eps)
  }

  /** Append audit rows to the artifact store at `path` (the same
    * append-then-report cadence as every maintenance artifact here).
    */
  def record(spark: SparkSession, path: String, rows: Seq[Row],
             append: Boolean = true): Unit =
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), recordSchema)
      .write.mode(if (append) "append" else "overwrite").parquet(path)

  /** The estimate-error report over a recorded artifact store: one row
    * per audited join with the estimate, the actual, the ratio, and the
    * two contract booleans — `never_undercount` (est ≥ actual, the
    * property that keeps artifact-driven broadcasts safe) and
    * `overcount_bounded` (est ≤ actual + ⌈ε·n_a·n_b⌉, the CMS inner
    * product's own error bound — saturating, so a huge pair cannot wrap
    * into a vacuous bound).
    */
  def report(spark: SparkSession, path: String): DataFrame = {
    // the bound compares in DOUBLE space end to end: a Long-space
    // `actual + slack` would re-overflow exactly where the slack
    // saturates (eps·n_a·n_b past 2^63) and wrap negative — a false
    // alarm from the artifact meant to certify the estimator. Double
    // ulps at that magnitude are dwarfed by the slack itself.
    val slackD = col("n_a").cast("double") * col("n_b").cast("double") * col("eps")
    spark.read.schema(recordSchema).parquet(path)
      .select(
        concat_ws("|", col("table_a"), col("key_a"), col("table_b"),
          col("key_b")).as("pair"),
        col("key_a"), col("key_b"),
        col("est_rows"), col("actual_rows"),
        round(col("est_rows").cast("double") /
          greatest(col("actual_rows").cast("double"), lit(1.0)), 6).as("est_ratio"),
        (col("est_rows") >= col("actual_rows")).as("never_undercount"),
        (col("est_rows").cast("double") <=
          col("actual_rows").cast("double") + ceil(slackD)).as("overcount_bounded"))
      .orderBy("pair")
  }
}
