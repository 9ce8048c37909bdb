package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated corpus and a training
  * run: documents are concatenated in a deterministic order and chunked
  * into fixed-length token sequences (the GPT-style "concat and chunk"
  * pack). This operator computes the PLACEMENT — for every document, its
  * token offset in the packed stream and the sequence ids it spans — as
  * pure window arithmetic, so the actual tensor writer can shard work by
  * sequence id with no further coordination.
  *
  * Scale contract: a single global pack order would funnel the corpus
  * through one reducer, so packing is per-SHARD (`groupCols` — source,
  * language, or an explicit shard column): each shard is an independent
  * packed stream with its own sequence numbering, which is exactly how
  * multi-file training datasets are laid out. Within a shard, order is
  * (md5(id), id) — reproducible, engine-independent, and stable against
  * upstream reshuffling.
  */
object Packing {

  /** Placement of each document in its shard's packed token stream.
    *
    * Output: groupCols + (idCol, n_tokens, start_offset, first_seq,
    * last_seq) where `start_offset` is the document's first token's
    * position in the shard stream and `first_seq`/`last_seq` =
    * `offset div seqLen` of its first/last token — a doc spans
    * `last_seq - first_seq + 1` training sequences (boundary-crossing
    * docs are split by the chunker, as in standard pretraining packing).
    * Zero-token documents are dropped (they occupy no positions).
    */
  def concatChunkPack(df: DataFrame, idCol: String, text: Column, seqLen: Long,
                      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "packing needs shard columns: a global pack order is one reducer at scale")
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val staged = df.select(groupCols.map(col) :+ col(idCol) :+
      TextAnalysis.tokenCount(text).cast("long").as("n_tokens"): _*)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(Sampling.hashUnit(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged.where(col("n_tokens") > 0)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", col("__cum") - col("n_tokens"))
      .select(groupCols.map(col) :+ col(idCol) :+ col("n_tokens") :+ col("start_offset") :+
        expr(s"start_offset div $seqLen").as("first_seq") :+
        expr(s"(__cum - 1) div $seqLen").as("last_seq"): _*)
  }

  /** Per-sequence occupancy: how many documents contribute to each packed
    * sequence and how full it is — the shard-level sanity report (the
    * final sequence of a shard is usually partial; everything before it
    * must be exactly `seqLen`). Derived from [[concatChunkPack]] by
    * exploding each doc's spanned-sequence range; a doc spans
    * ceil(n_tokens / seqLen) + 1 sequences at most, so the fan-out is
    * bounded by token counts, not corpus size.
    */
  def sequenceOccupancy(placed: DataFrame, seqLen: Long, groupCols: Seq[String]): DataFrame = {
    val spanned = placed.select(groupCols.map(col) :+ col("n_tokens") :+ col("start_offset") :+
      explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"): _*)
    // tokens of this doc landing in sequence s: overlap of
    // [start_offset, start_offset + n_tokens) with [s*L, (s+1)*L)
    val tokensHere = least(col("start_offset") + col("n_tokens"), (col("seq_id") + 1) * seqLen) -
      greatest(col("start_offset"), col("seq_id") * seqLen)
    spanned.withColumn("__t", tokensHere)
      .groupBy(groupCols.map(col) :+ col("seq_id"): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
  }
}
