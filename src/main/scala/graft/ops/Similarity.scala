package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2.12 X3).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, score with higher-order functions (`zip_with` +
  * `aggregate`, codegen'd, no UDF), rank with a window per query. At scale
  * the corpus side stays partitioned and never shuffles for scoring; the
  * only shuffle is the per-query top-k (tiny after per-partition pruning).
  *
  * Scale path: IVF — partition the corpus by a coarse quantizer (here the
  * pre-clustered `label`, in general k-means cells), search only the probe
  * cells nearest the query centroid. Turns a full scan into a
  * `#probes/#cells` fraction of the data.
  */
object Similarity {

  /** Deterministic dot product of two float-array columns: products are
    * exact in double (24-bit mantissas), summed in index order. Uses the
    * codegen'd native expression when the session has graft functions
    * registered (all pipeline entry points register them); the HOF fallback
    * has identical semantics but interpreted per-element evaluation.
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Interpreted fallback with the same semantics (for sessions where
    * registration is undesirable).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, e) => acc + e)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each row of `queries`, the `k` nearest
    * corpus rows (excluding self-matches by id).
    *
    * Output: (query_id, neighbor_id, rank, cosine rounded to 6dp).
    */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    // norms are materialized per ROW (once for the 1 query side, once for
    // the corpus side) so the pair loop computes a single dot product —
    // not three — and the expensive fold never re-evaluates per pair side
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    // rank on the ROUNDED score: ranking must not depend on sub-6dp noise
    // (keeps top-k stable across engines and summation orders)
    val scored = c.crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        col("__cos").as("cosine"))
  }

  /** IVF-style approximate top-k: corpus rows are grouped into cells
    * (`cellCol` — a pre-clustered label or quantizer output); per-cell
    * centroids are the mean embedding; each query searches only its
    * `nProbe` nearest cells. Approximate (recall < 1) by design — the scale
    * path for 100 TB corpora.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    // per-cell centroid: element-wise mean via posexplode + pivot-free agg
    val cent = corpus
      .select(col(cellCol).as("__cell"), posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .groupBy("__cell", "__i").agg(avg("__x").as("__m"))
      .groupBy("__cell").agg(array_sort(collect_list(struct(col("__i"), col("__m")))).as("__ims"))
      .select(col("__cell"), transform(col("__ims"), s => s.getField("__m")).as("__centroid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    // nProbe nearest cells per query (centroid table is tiny: broadcast)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("__d", cosine(col("__qv"), col("__centroid")))
      .withColumn("__pr", row_number().over(Window.partitionBy("query_id").orderBy(col("__d").desc, col("__cell"))))
      .where(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__cell"))
    // search only probed cells: join keyed on cell, not a cross join
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      col(cellCol).as("__cell"), norm(col(vecCol)).as("__cn"))
    val scored = broadcast(probes.withColumn("__qn", norm(col("__qv")))).join(c, "__cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__cos").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        col("__cos").as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (X2 flavor): all pairs above a
    * cosine threshold, blocked by a cell column to avoid the full cross
    * join (exact within blocks).
    */
  def embeddingNearDupPairs(
      df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blockCol: Option[String] = None): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val base = df.select(col(idCol) +: norm(col(vecCol)).as("__norm") +:
      col(vecCol) +: blockCol.map(col).toSeq: _*)
    def side(suffix: String) = {
      val cols = Seq(col(idCol).as(s"id_$suffix"), col(vecCol).as(s"__v$suffix"),
        col("__norm").as(s"__n$suffix")) ++ blockCol.map(col)
      base.select(cols: _*)
    }
    val joined = blockCol match {
      case Some(b) => side("a").join(side("b"), Seq(b))
      case None    => side("a").crossJoin(side("b"))
    }
    joined.where(col("id_a") < col("id_b"))
      .withColumn("cosine", round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
