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
  * Scale path: IVF — partition the corpus by a coarse quantizer
  * ([[kmeansCells]], or any pre-existing cell column), search only the
  * probe cells nearest the query centroid. Turns a full scan into a
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

  /** Deterministic pseudo-random hyperplane component in [-1, 1): dyadic
    * rational derived from md5("hp_<k>_<i>") — the first 8 hex chars as an
    * integer, divided by 2^31, shifted to be zero-centered. Portable to any
    * engine with md5 (the DuckDB oracle twin computes the identical value),
    * so RHP-LSH bucket keys are engine-independent, exactly like the md5
    * base hash of the minhash family.
    */
  private[graft] def planeComponent(k: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp_${k}_${i}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = digest.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xFFL))
    v / 2147483648.0 - 1.0
  }

  /** X2 at scale: embedding near-duplicate pairs via random-hyperplane LSH
    * (sign-random-projection) — the sub-quadratic path that replaces the
    * within-block all-pairs join. Per vector, `bands * bitsPerBand` sign
    * bits of md5-seeded hyperplane projections; vectors meet ONLY when they
    * agree on every bit of some band, then candidates are verified with the
    * exact cosine. Join keys are (band, bucket) — fan-out depends on bucket
    * occupancy, never on a cross join — and the candidate set shrinks
    * geometrically in bitsPerBand, so at 100 TB the knobs trade recall for
    * candidate volume explicitly.
    *
    * Recall for a pair at angle θ: per-bit collision p = 1 - θ/π, recall =
    * 1-(1-p^bits)^bands. Defaults (16 bands x 4 bits) target moderate
    * thresholds (~0.94 recall at cosine 0.4); production near-dup sweeps at
    * cosine >= 0.8 should raise bitsPerBand to 8-16, which collapses the
    * background candidate rate to ~L/2^bits.
    *
    * Projections are rounded to 6 dp before the sign test so bucket bits are
    * reproducible across engines regardless of last-ulp summation noise; the
    * base (id, vec, norm) table is pinned in [[OpCaches]] (consumed by the
    * banding pass and both verify sides) — callers release after the action.
    */
  def randomHyperplaneNearDupPairs(
      df: DataFrame, threshold: Double, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bands: Int = 16, bitsPerBand: Int = 4): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val base = OpCaches.pin(df.select(col(idCol), col(vecCol).as("__v"),
      norm(col(vecCol)).as("__n")))
    val planes = Array.tabulate(bands * bitsPerBand, dim)(planeComponent)
    val bandBuckets = array((0 until bands).map { b =>
      (0 until bitsPerBand).map { j =>
        val k = b * bitsPerBand + j
        when(round(dot(col("__v"), typedlit(planes(k).toSeq)), 6) >= 0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val banded = base.select(col(idCol), posexplode(bandBuckets).as(Seq("__band", "__bkt")))
    val cand = banded.alias("a").join(banded.alias("b"), Seq("__band", "__bkt"))
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b")).distinct()
    cand
      .join(base.select(col(idCol).as("id_a"), col("__v").as("__va"), col("__n").as("__na")), "id_a")
      .join(base.select(col(idCol).as("id_b"), col("__v").as("__vb"), col("__n").as("__nb")), "id_b")
      .withColumn("cosine", round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Deterministic spherical k-means (Lloyd) over the embedding column —
    * the data-driven coarse quantizer for [[ivfTopKKmeans]] when no
    * pre-clustered cell column exists (real corpora have no `label`).
    *
    * Spark-first formulation: every iteration is two hash aggregations —
    * assignment = `max_by(cell, cosine)` against the BROADCAST centroid
    * table (k * dim doubles, trivially small), re-centering =
    * posexplode + per-(cell, index) avg. Centroids are collected between
    * iterations (k rows — a constant-size aggregation result, not a data
    * collect). Seeding is deterministic farthest-point (maxmin) traversal —
    * the k-means++ idea without its RNG: start from the row with the
    * smallest md5(id), then repeatedly add the row most dissimilar to every
    * chosen seed. Uniform-hash seeding was measured at 0.55 IVF recall on
    * the planted-cluster fixture (duplicate seeds collapse cells); maxmin
    * reaches 1.0.
    *
    * At 100 TB: fit the centroids on a deterministic sample (pass
    * `sampleMod` > 1 to keep ids with md5(id) mod sampleMod == 0), then the
    * full corpus pays only the final assignment pass.
    *
    * Returns (id, cell) assignments.
    */
  def kmeansCells(
      corpus: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sampleMod: Int = 1): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("__kid"), col(vecCol).as("__kv"))
    val fit = if (sampleMod <= 1) base
      else base.where(Dedup.md5Hash60(col("__kid").cast("string")) % sampleMod === 0)
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Any](0).map {
        case f: Float => f.toDouble // exact widening, like graft_dot
        case d: Double => d
        case x => x.toString.toDouble
      }
    val firstSeed = vecOf(
      fit.orderBy(md5(col("__kid").cast("string")), col("__kid")).select(col("__kv")).limit(1).head())
    var seeds = Seq(firstSeed)
    while (seeds.size < k) {
      val seedDf = broadcast(seeds.zipWithIndex.map(_.swap).toDF("__cell", "__centroid"))
      val next = fit.crossJoin(seedDf)
        .withColumn("__cos", dot(col("__kv"), col("__centroid")) /
          (norm(col("__kv")) * norm(col("__centroid"))))
        .groupBy(col("__kid")).agg(max(col("__cos")).as("__near"), first(col("__kv")).as("__kv"))
        .orderBy(col("__near").asc, col("__kid")) // farthest from every seed; id tiebreak
        .select(col("__kv")).limit(1).head()
      seeds = seeds :+ vecOf(next)
    }
    var centroids: Seq[(Int, Seq[Double])] = seeds.zipWithIndex.map(_.swap)
    def assign(df: DataFrame): DataFrame = {
      val centDf = broadcast(centroids.toDF("__cell", "__centroid"))
      df.crossJoin(centDf)
        .withColumn("__cos", dot(col("__kv"), col("__centroid")) /
          (norm(col("__kv")) * norm(col("__centroid"))))
        .groupBy(col("__kid"))
        // ties broken toward the larger cell id via lexicographic struct max
        .agg(max_by(col("__cell"), struct(col("__cos"), col("__cell"))).as("__cell"),
          first(col("__kv")).as("__kv"))
    }
    for (_ <- 1 to iters) {
      centroids = assign(fit)
        .select(col("__cell"), posexplode(col("__kv")).as(Seq("__i", "__x")))
        .groupBy("__cell", "__i").agg(avg("__x").as("__m"))
        .groupBy("__cell").agg(array_sort(collect_list(struct(col("__i"), col("__m")))).as("__ims"))
        .select(col("__cell"), transform(col("__ims"), s => s.getField("__m")).as("__c"))
        .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    }
    assign(base).select(col("__kid").as(idCol), col("__cell").as("cell"))
  }

  /** IVF top-k with data-driven cells: k-means the corpus (no `label`
    * column required), then probe as in [[ivfTopK]]. Approximate by design
    * — recall depends on nProbe/kCells; OpsSpec asserts recall against the
    * brute-force result on the sf0.001 fixture.
    */
  def ivfTopKKmeans(
      queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int,
      kCells: Int = 10, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = kmeansCells(corpus, kCells, iters, idCol, vecCol)
    ivfTopK(queries, corpus.join(cells, idCol), k, nProbe, idCol, vecCol, "cell")
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
