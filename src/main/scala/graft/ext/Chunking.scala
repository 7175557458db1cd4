package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window document chunking: split each document into
  * overlapping ~maxTokens-token windows — the step that turns a
  * curated corpus into model-sized training sequences (and the
  * retrieval-index unit for RAG corpora). Chunk k of a document
  * covers tokens [k·step, k·step + maxTokens) with
  * step = maxTokens − overlap, so consecutive chunks share `overlap`
  * tokens and no content is lost at window boundaries; the last
  * window is the only short one.
  *
  * Scale shape: pure map-side fan-out — tokens come from one split,
  * windows from one explode(sequence(...)), slices from the builtin
  * `slice` — all codegen'd, no UDF, no shuffle. Output rows ≈
  * corpus tokens / step regardless of document skew: a single giant
  * document costs its own chunks, never a partition-wide sort or
  * window. Deterministic: chunk boundaries are arithmetic on the
  * token count, so the same document chunks identically on any
  * engine, run, or partitioning (the DuckDB oracle recomputes them).
  */
object Chunking {

  /** Explode `df` into one row per (document, chunk). Adds
    * `chunk_id` (0-based), `chunk_text` (space-joined token slice)
    * and `chunk_tokens` (its token count); every input column is
    * kept. A document with at most maxTokens tokens yields exactly
    * one chunk (its full text).
    *
    * TOKENIZER CONTRACT: the token unit here is the WHITESPACE token
    * — the same unit as [[TextStats.tokenCount]] and the unit
    * `Packing.packShards` budgets by default, so chunk sizes, token
    * counts and shard budgets all measure the same thing end-to-end.
    * This is inherent to the operator, not a stub: chunk_text is
    * rebuilt by joining the sliced tokens, which only round-trips for
    * a whitespace split. For model (BPE) budgets, chunk by
    * whitespace with a maxTokens sized to the corpus's
    * BPE-per-whitespace ratio, then pass a real tokenizer count
    * column as Packing's `tokensCol` — packing is token-definition
    * agnostic; only chunk BOUNDARIES are whitespace-based. */
  def chunkDocuments(df: DataFrame, textCol: Column,
                     maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    require(!df.columns.exists(Set("chunk_id", "chunk_text", "chunk_tokens")),
      "input already has a chunk_id/chunk_text/chunk_tokens column")
    val step = maxTokens - overlap
    val toks = split(textCol, " ")
    val n = size(toks)
    // chunks = 1 + ceil((n - maxTokens) / step) for n > maxTokens;
    // the double division is exact for any realistic token count
    // (< 2^53) and mirrors bit-for-bit in the oracle's SQL
    val nChunks = when(n <= maxTokens, lit(1)).otherwise(
      floor((n - lit(maxTokens) + lit(step - 1)) / lit(step.toDouble)).cast("int") + 1)
    df.withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("chunk_text",
        array_join(slice(toks, col("chunk_id") * step + 1, lit(maxTokens)), " "))
      .withColumn("chunk_tokens", least(lit(maxTokens), n - col("chunk_id") * step))
  }
}
