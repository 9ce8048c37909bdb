package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval (SURVEY.md §2.12 X6 family): BM25
  * keyword ranking and brute-force cosine ranking fused with reciprocal
  * rank fusion (RRF, Cormack et al. SIGIR'09) — the standard hybrid-search
  * shape of every modern retrieval stack (Elasticsearch/OpenSearch hybrid
  * queries, Vespa/Weaviate fusion): the lexical side catches exact-term
  * matches embeddings smear out, the vector side catches paraphrases
  * keywords miss, and RRF combines them WITHOUT score calibration because
  * it only consumes the two integer rank columns:
  * rrf(d) = Σ_retrievers 1/(k + rank_r(d)).
  *
  * For a training-data engine this is the eval-set leakage hunt at its
  * most practical: "find the documents most like this eval example" wants
  * both the verbatim half (BM25) and the paraphrased half (cosine) of the
  * candidate set, and RRF's calibration-free fusion means neither score
  * distribution has to be normalized against the other.
  *
  * Scale posture: each retriever keeps its own posture (BM25's candidates
  * come from the term-keyed inner join — the inverted-index access path;
  * the cosine side is the brute-force baseline with the query batch
  * broadcast, swappable for [[Similarity.ivfPqTopK]] at corpus scale);
  * fusion then runs on the two top-`poolK` lists, whose size is
  * queries × poolK — constant in the corpus, so the full-outer fusion
  * join never touches corpus-scale data.
  *
  * Determinism: ranks are integers, 1/(k+rank) is one IEEE division, the
  * two-term sum is evaluated in fixed (text, vector) order, rounded to
  * 6 dp; ties in the fused ranking break by document id.
  */
object Retrieval {

  /** Hybrid top-k: each query is (query_id, query text, probe vector id) —
    * the probe id designates the embedding that stands in for the query
    * vector (the fixture carries no query-side encoder, and serving stacks
    * routinely query by exemplar). Returns the fused top-`topK` per query
    * with both per-retriever ranks (NULL when the document reached the
    * fused list through one retriever only).
    */
  def hybridRrf(docs: DataFrame, embeds: DataFrame,
                queries: Seq[(String, String, Long)],
                topK: Int = 10, poolK: Int = 20, rrfK: Int = 60,
                idCol: String = "doc_id", text: Column = col("text"),
                vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val textRanks = TextAnalysis.bm25Search(docs, idCol, text,
        queries.map(q => (q._1, q._2)), topK = poolK)
      .select(col("query_id"), col(idCol).as("__id"), col("rank").as("bm25_rank"))
    val probeIds = queries.map(_._3)
    // cosineTopK's query_id is the probe VECTOR id — remap to the caller's
    // query label through the tiny (label, probe) table
    val vecRanks = Similarity.cosineTopK(
        embeds.where(col(vecIdCol).isin(probeIds: _*)), embeds, poolK, vecIdCol, vecCol)
      .join(broadcast(queries.map(q => (q._1, q._3)).toDF("__qid", "__pvid")),
        col("query_id") === col("__pvid"))
      .select(col("__qid").as("query_id"), col("neighbor_id").as("__id"),
        col("rank").as("cosine_rank"))
    // fusion over two (queries × poolK)-row lists — corpus-scale data
    // never reaches this join
    val fused = textRanks.join(vecRanks, Seq("query_id", "__id"), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("cosine_rank")), lit(0.0)), 6))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_score").desc, col("__id").asc)
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("__id").as(idCol), col("rrf_score"), col("bm25_rank"), col("cosine_rank"))
  }
}
