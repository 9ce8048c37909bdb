package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking (SURVEY.md §2.12 X5 family): split
  * each document's token stream into fixed-size windows advanced by a
  * stride <= size, the standard preprocessing for context-window training
  * and retrieval indexing (every token appears in up to ⌈size/stride⌉
  * chunks, so no span is ever cut at only one boundary). The reference's
  * analog is batch slicing before the HTTP sink
  * (`/root/reference/app.js:44-60` slices ENTITIES into maxBatchSize
  * groups); chunking slices each document's CONTENT the same way, with
  * overlap.
  *
  * Scale posture: pure map-side explode — no shuffle, no window, no state.
  * Output volume is input × (size/stride) amplification, an explicit knob;
  * each task streams its documents and emits chunks inline, so the
  * operator pipelines into whatever follows (tokenize, pack, embed)
  * without materializing the chunk table. Word arrays are staged in their
  * own projection before the slice lambda touches them (the
  * [[TextAnalysis]] interpreted-lambda staging rule).
  */
object Chunking {

  /** Chunks of `chunkSize` word-tokens every `stride` tokens, keeping tail
    * chunks (shorter than `chunkSize`) so coverage is total.
    *
    * Output: (idCol, chunk_idx, start_tok, n_tokens_chunk, chunk_text) —
    * `chunk_idx` numbers a doc's chunks from 0 in stride order,
    * `start_tok` is the 0-based token offset of the chunk's first token.
    * Empty documents (no word tokens) emit no chunks.
    */
  def chunkOverlap(df: DataFrame, idCol: String, text: Column,
                   chunkSize: Int = 64, stride: Int = 32): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val staged = df.select(col(idCol), TextAnalysis.words(text).as("__w"))
      .select(col(idCol), col("__w"), size(col("__w")).as("__nw"))
      .where(col("__nw") > 0)
    staged
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), col("__nw") - 1, lit(stride))).as(Seq("__ci", "__s")))
      .select(col(idCol),
        col("__ci").cast("long").as("chunk_idx"),
        col("__s").cast("long").as("start_tok"),
        slice(col("__w"), col("__s") + 1, lit(chunkSize)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("__chunk")).cast("long").as("n_tokens_chunk"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
