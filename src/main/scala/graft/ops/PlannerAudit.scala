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
    StructField("eps", DoubleType, nullable = false),
    // md5 of each side's CMS bytes at audit time — the artifact-identity
    // column that lets [[SketchCatalog.activate]] attribute a violation
    // to the EXACT sketch it audited: demotion keys on the fingerprint,
    // so a re-harvest (new bytes) recovers automatically while the bad
    // artifact stays demoted however often it is re-activated. Nullable:
    // stores written before the column existed read as null and are
    // never matched (conservative — an unattributable violation demotes
    // nothing).
    StructField("cms_a_md5", StringType, nullable = true),
    StructField("cms_b_md5", StringType, nullable = true)))

  /** Hex md5 of a CMS artifact's serialized bytes — the audit store's
    * artifact-identity key (null-safe for legacy entries).
    */
  def cmsFingerprint(cms: Array[Byte]): String =
    if (cms == null) null
    else java.security.MessageDigest.getInstance("MD5").digest(cms)
      .map("%02x".format(_)).mkString

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
    Row(ta, keyA, tb, keyB, est, actual, ea.nRows, eb.nRows, eps,
      cmsFingerprint(ea.cms), cmsFingerprint(eb.cms))
  }

  /** Execute `GROUP BY groupCols` over the table at `dir` to completion
    * and audit the AGGREGATE-output bound the planner prices
    * pre-aggregated dims with ([[SketchCatalog.aggGroupBound]] — the
    * shared definition, so estimator and auditor cannot drift): one
    * audit row PER CONSUMED ENTRY (a violation must impugn every sketch
    * that fed the bound — the tuple artifact AND each constituent, or
    * each per-column entry of the product fallback), keyed by the
    * entry's OWN key (`key_a`, so a report reader can attribute a
    * violating row to the exact sketch) with the audited grouping's
    * tuple name as context (`key_b`); est = the bound, actual = the
    * observed group count from the audited execution itself. The
    * contract under audit is never-understate (`est ≥ actual` — what
    * keeps an artifact-driven aggregate broadcast inside executor
    * memory); the overcount column is parameterized vacuously true
    * (eps = 1, n_b = 1, n_a = max(1, rows) ⇒ slack ≥ any bound — the
    * floor matters on an EMPTY table, where rows = 0 would zero the
    * slack and record false overcount violations against an honest
    * sketch) because the bound's designed overcount — the HLL safety
    * margin, the null-group terms and the row-count cap — is not a
    * defect to demote on. A violating row lands in
    * [[demotedFingerprints]] like any join audit, and
    * [[SketchCatalog.activate]]'s demotion then makes
    * `aggGroupBound` decline the entry — the same closed loop, one more
    * estimator inside it.
    */
  def auditAggBound(spark: SparkSession, catalog: SketchCatalog.Catalog,
                    dir: String, groupCols: Seq[String]): Seq[Row] = {
    val t = SketchCatalog.normalizePath(spark, dir)
    val (bound, consumed) = SketchCatalog.aggGroupBound(catalog, t, groupCols)
      .getOrElse(throw new IllegalArgumentException(
        s"auditAggBound: ($t, ${groupCols.mkString(",")}) not fully catalogued"))
    val nRows = catalog.byTable.get(t).map(_.nRows).getOrElse(0L)
    val obs = Observation()
    import org.apache.spark.sql.functions.{col => fcol}
    spark.read.parquet(dir)
      .groupBy(groupCols.map(fcol): _*).agg(count(lit(1)).as("__audit_n"))
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").format("noop").save()
    val actual = obs.get("rows").asInstanceOf[Long]
    consumed.map { e =>
      Row(t, e.key, t, SketchCatalog.tupleKeyName(groupCols),
        bound, actual, math.max(1L, nRows), 1L, 1.0,
        cmsFingerprint(e.cms), null)
    }
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
  /** CMS fingerprints whose artifacts should no longer drive plan
    * decisions: fingerprints appearing on ≥ `minViolations` recorded
    * audit rows that violate EITHER estimator contract (est < actual —
    * the never-undercount inversion that makes artifact broadcasts
    * unsafe; or est > actual + ⌈ε·n_a·n_b⌉ — an overcount past the
    * sketch's own bound, the stale-artifact signature). A violating row
    * impugns BOTH sides' sketches (the inner product cannot attribute
    * blame), so both fingerprints count — conservative: a demotion
    * costs plan quality, never results. Legacy rows without
    * fingerprints demote nothing. The count is per-fingerprint, so a
    * re-harvest (new bytes → new fingerprint) starts clean while the
    * bad artifact stays demoted no matter how often it re-activates —
    * recency via identity, no clock column needed.
    */
  def demotedFingerprints(spark: SparkSession, path: String,
                          minViolations: Int): Set[String] = {
    val slackD = col("n_a").cast("double") * col("n_b").cast("double") * col("eps")
    val violating =
      !(col("est_rows") >= col("actual_rows")) ||
      !(col("est_rows").cast("double") <=
        col("actual_rows").cast("double") + ceil(slackD))
    spark.read.schema(recordSchema).parquet(path)
      .where(violating)
      // array_distinct BEFORE explode: a self-join audit carries the
      // same fingerprint on both sides, and double-counting it would
      // reach the "three audits is a verdict" threshold after only two
      // audits — one violating ROW is one violation per fingerprint
      .select(explode(array_distinct(array(col("cms_a_md5"), col("cms_b_md5")))).as("fp"))
      .where(col("fp").isNotNull)
      .groupBy("fp").count()
      .where(col("count") >= minViolations.toLong)
      .collect().map(_.getString(0)).toSet
  }

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
