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

  /** Content-defined chunking (the rsync/LBFS rolling-boundary
    * primitive): a 1-based character position `p` of a document OPENS
    * a chunk iff `p == 1` or the md5 of the `window`-char substring
    * starting at `p` lands in `1/mask` of hash space (first 16 digest
    * bits `% mask == 0`) — boundaries move WITH content, so an
    * insertion re-chunks only its own neighborhood where fixed-width
    * blocks would shift every later block. Positions run 1 ..
    * max(len − window + 1, 1); the last chunk extends to the end of
    * the document.
    *
    * SCALE SHAPE — this is deliberately a constant-memory
    * `mapPartitions` kernel, not a per-position explode + lead()
    * window: the expression formulation carries the FULL document
    * text on every boundary row through the window exchange
    * (~len/mask rows × len bytes — QUADRATIC in document length; a
    * 1 MB doc would push ~31 GB through one exchange). Here the text
    * crosses the wire exactly once inside its scan task, the
    * boundary scan is one O(len) pass (md5 of `window` chars per
    * position), and chunks are emitted directly — no shuffle at all
    * below the caller's first aggregate. Document COUNT scales out
    * across executors; document LENGTH streams through the task.
    *
    * EXACTNESS CONTRACT: positions, windows and chunk spans are
    * CODEPOINT-indexed (Spark's `substring`/`length` semantics, ==
    * DuckDB's), md5 is over the window's UTF-8 bytes — so the
    * boundary set and every chunk replay bit-for-bit as
    * `md5(substring(text, p, window))` in either engine; the q251
    * oracle recomputes them boundary-for-boundary.
    *
    * Output: one row per chunk — `keepCols` pass through, plus
    * `chunk_ix` (0-based within the document, in document order) and
    * `chunk` (the span text). Concatenating a document's chunks in
    * `chunk_ix` order rebuilds the document exactly (spec-pinned).
    */
  def contentDefinedChunks(df: DataFrame, textCol: String,
                           keepCols: Seq[String], window: Int = 8,
                           mask: Int = 32): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(mask >= 2 && mask <= 0x10000,
      "mask must be in [2, 65536] (boundary rule reads 16 digest bits)")
    require(!keepCols.contains(textCol), "keepCols must not include textCol")
    val in = df.select((keepCols :+ textCol).map(col): _*)
    val textIdx = keepCols.size
    val outSchema = org.apache.spark.sql.types.StructType(
      in.schema.fields.take(textIdx) ++ Seq(
        org.apache.spark.sql.types.StructField("chunk_ix",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("chunk",
          org.apache.spark.sql.types.StringType, nullable = false)))
    val w = window; val m = mask
    in.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val text = r.getString(textIdx)
        val keep = (0 until textIdx).map(r.get)
        if (text == null) Iterator.empty
        else {
          val utf8 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          // byte offset of each codepoint (identity for pure ASCII);
          // off(n) == utf8.length closes the last span
          val ascii = utf8.length == text.length &&
            text.length == text.codePointCount(0, text.length)
          val off: Array[Int] =
            if (ascii) null
            else {
              val n = text.codePointCount(0, text.length)
              val a = new Array[Int](n + 1)
              var ci = 0; var bi = 0; var cp = 0
              while (ci < text.length) {
                a(cp) = bi
                val c = text.codePointAt(ci)
                bi += (if (c < 0x80) 1 else if (c < 0x800) 2
                       else if (c < 0x10000) 3 else 4)
                ci += Character.charCount(c)
                cp += 1
              }
              a(n) = utf8.length
              a
            }
          val len = if (ascii) utf8.length else off.length - 1
          def byteOff(cp: Int): Int = if (ascii) cp else off(cp)
          // boundary scan: one md5 of `w` chars per position
          val bounds = new scala.collection.mutable.ArrayBuffer[Int]
          val maxP = math.max(len - w + 1, 1)
          var p = 1
          while (p <= maxP) {
            var isB = p == 1
            if (!isB) {
              val from = byteOff(p - 1)
              val to = byteOff(math.min(p - 1 + w, len))
              md.reset()
              md.update(utf8, from, to - from)
              val d = md.digest()
              isB = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % m == 0
            }
            if (isB) bounds += p
            p += 1
          }
          (0 until bounds.size).iterator.map { i =>
            val from = byteOff(bounds(i) - 1)
            val to = if (i + 1 < bounds.size) byteOff(bounds(i + 1) - 1)
                     else utf8.length
            val chunk = new String(utf8, from, to - from,
              java.nio.charset.StandardCharsets.UTF_8)
            org.apache.spark.sql.Row.fromSeq(keep :+ i :+ chunk)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
