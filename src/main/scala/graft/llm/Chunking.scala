package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document chunking for retrieval / context-window pipelines: split
 * each document into fixed-size token windows with overlap — the
 * prepare-for-RAG / prepare-for-training primitive ("512-token chunks,
 * 64-token overlap"). Whitespace tokens (the [[TextAnalysis.tokens]]
 * convention) stand in for model tokens; swap the splitter for a real
 * tokenizer upstream if byte-exact budgets matter.
 */
object Chunking {

  /**
   * One output row per chunk: chunk `i` covers token positions
   * `[i·stride, i·stride + chunkTokens)` with
   * `stride = chunkTokens − overlapTokens`. The chunk count is
   * `max(1, ⌈(n − overlap)/stride⌉)` for non-empty documents — every
   * token is covered, consecutive chunks share exactly
   * `overlapTokens` tokens, and no chunk is generated that lies
   * entirely inside its predecessor (a tail shorter than the overlap
   * folds into the final chunk's window instead of duplicating it).
   * Documents with zero tokens emit no row. All-integer chunk
   * geometry — engine-independent.
   *
   * Output: (idCol, chunk_id, token_start, n_tokens, chunk_text).
   *
   * Scale posture: one shuffle-free codegen'd scan — tokenize,
   * explode the chunk-index sequence, slice; per-row cost is the
   * document length, no state, no join. (The explode fans out rows
   * but never widens beyond the document's own token count.)
   */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlapTokens")
    val stride = (chunkTokens - overlapTokens).toLong
    val toks = TextAnalysis.cleanTokens(col(textCol))
    // ⌈(n − overlap)/stride⌉ via exact integer floor-div (Column./ is
    // double division); ≥ 1 when n > 0
    val a = col("__n") - lit(overlapTokens.toLong) - 1L
    val nChunks = greatest(lit(1L),
      ((a - pmod(a, lit(stride))) / lit(stride)).cast("long") + 1L)
    df.select(col(idCol), toks.as("__toks"), size(toks).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0L), nChunks.cast("long") - 1L)))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("token_start"),
        least(lit(chunkTokens.toLong),
          col("__n") - col("chunk_id") * stride).as("n_tokens"),
        concat_ws(" ", slice(col("__toks"),
          (col("chunk_id") * stride + 1L).cast("int"),
          lit(chunkTokens))).as("chunk_text"))
  }
}
