package graft.ext

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — tokenizer TRAINING as a
  * distributed pipeline (Sennrich et al. 2016's corpus step, the one
  * a 100-TB text stack actually runs; encoding with a trained merge
  * list is the cheap map-side part).
  *
  * Scale shape: the corpus collapses once to a WORD-TYPE frequency
  * table (one token-keyed shuffle with map-side combine — the only
  * pass whose cost scales with corpus size; everything after is
  * vocab-sized). Each of the `k` merge rounds is then one pair-keyed
  * aggregation over the vocab plus a 1-row argmax collect to the
  * driver (the PageRank-sweep idiom: iterative algorithms keep only
  * the iteration SCALAR on the driver, never data). The symbol
  * rewrite is a narrow map.
  *
  * Determinism conventions (both engines replay them exactly):
  * - pair counts weight every adjacent symbol position by word-type
  *   frequency, overlaps included (the classic counting);
  * - ties on count break lexicographically on (left, right) — ASCII
  *   tokens, so binary collation agrees cross-engine;
  * - the merge rewrite runs THREE left-to-right non-overlapping
  *   `replace` passes over the delimited symbol string ('|a|b|' ->
  *   '|ab|'). A single pass misses pair occurrences whose leading
  *   delimiter was consumed by the previous match (e.g. 'a a a a');
  *   three passes reach the true left-to-right-merge fixpoint for
  *   any practical run length, and both engines' replace() scan
  *   identically, so the convention is exact cross-engine whatever
  *   the input.
  */
object Bpe {

  /** Learn the first `k` BPE merges over `textCol`'s subword tokens
    * ([a-z]+|[0-9]+). Returns one row per merge:
    * (step, left_sym, right_sym, pair_count), step 1-based in merge
    * order. Stops early if no pair remains.
    */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one merge step")
    val spark = docs.sparkSession
    import spark.implicits._

    // corpus -> word-type frequencies -> '|'-delimited symbol strings
    val words0 = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|")).as("sym"),
              col("freq"))
    var words = graft.ops.Staging.stage(words0)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (step <- 1 to k if !exhausted) {
      val pairs = words
        .select(col("freq"),
          F.filter(split(col("sym"), "\\|"), x => x =!= "").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l, r, c))
        val pat = lit("|" + l + "|" + r + "|")
        val rep = lit("|" + l + r + "|")
        def rp(e: org.apache.spark.sql.Column) = F.replace(e, pat, rep)
        words = words.select(rp(rp(rp(col("sym")))).as("sym"), col("freq"))
      }
    }
    merges.toSeq.toDF("step", "left_sym", "right_sym", "pair_count")
  }

  /** ENCODE with a trained merge list — the map-side half of the
    * tokenizer: every word rewrites through the merges in training
    * order (same triple-replace convention as [[learnMerges]]), then
    * the corpus token frequencies come out of one token-keyed
    * aggregation. `merges` is the (left, right) list in merge order —
    * tiny, driver-held, applied as literal rewrites inside the scan;
    * the corpus is never shuffled except for the final vocab count.
    * Returns (token, freq).
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .select(concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|")).as("sym"))
    val rewritten = merges.foldLeft(words) { case (df, (l, r)) =>
      val pat = lit("|" + l + "|" + r + "|")
      val rep = lit("|" + l + r + "|")
      def rp(e: org.apache.spark.sql.Column) = F.replace(e, pat, rep)
      df.select(rp(rp(rp(col("sym")))).as("sym"))
    }
    rewritten
      .select(explode(F.filter(split(col("sym"), "\\|"), x => x =!= ""))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
  }

  /** PER-DOCUMENT BPE token counts under a trained merge list — the
    * budget feed for [[Packing.packShards]] (r16 verdict item 7: a
    * token-budget shard is only as real as its token counter, and
    * whitespace counts over-budget short-token text by 2-4x vs the
    * tokenizer the training run actually pays for). Same map-side
    * shape as [[encode]] — the merge list is driver-held literals
    * applied inside the scan — but keyed by `idCol`, and the count is
    * summed per document (one id-keyed aggregate). Documents with NO
    * subword tokens are absent (join back with a zero default).
    * Returns (idCol, n_bpe_tokens). */
  def docTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol),
          lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .select(col(idCol),
        concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|")).as("sym"))
    val rewritten = merges.foldLeft(words) { case (df, (l, r)) =>
      val pat = lit("|" + l + "|" + r + "|")
      val rep = lit("|" + l + r + "|")
      def rp(e: org.apache.spark.sql.Column) = F.replace(e, pat, rep)
      df.select(col(idCol), rp(rp(rp(col("sym")))).as("sym"))
    }
    rewritten
      .select(col(idCol),
        size(F.filter(split(col("sym"), "\\|"), x => x =!= ""))
          .cast("long").as("__n"))
      .groupBy(idCol).agg(sum("__n").as("n_bpe_tokens"))
  }

  /** The DuckDB replay of [[learnMerges]]: `k` unrolled CTE rounds of
    * the identical split -> adjacent-pair count -> (cnt desc, l, r)
    * argmax -> triple-replace rewrite. Generated so the two sides
    * cannot drift round-wise.
    */
  def oracleSql(k: Int): String =
    cteRounds(k, rewriteLast = false) +
      "\nSELECT step, l AS left_sym, r AS right_sym, cnt AS pair_count\nFROM (" +
      (1 to k)
        .map(i => s"SELECT $i AS step, l, r, cnt FROM m$i")
        .mkString("\n  ", "\n  UNION ALL ", "") +
      ") ORDER BY step"

  /** The DuckDB replay of train-then-[[encode]]: the same `k` rounds
    * WITH the final rewrite, then the freq-weighted symbol count over
    * the rewritten word types (identical to the occurrence-exploded
    * Spark shape because every occurrence of a word type rewrites the
    * same way).
    */
  def encodeOracleSql(k: Int): String =
    cteRounds(k, rewriteLast = true) +
      s""",
         |v AS (
         |  SELECT freq, list_filter(string_split(sym, '|'), x -> x <> '') AS syms
         |  FROM w$k),
         |u AS (SELECT freq, unnest(syms) AS token FROM v)
         |SELECT token, CAST(sum(freq) AS BIGINT) AS freq FROM u
         |GROUP BY token ORDER BY freq DESC, token""".stripMargin

  /** The DuckDB replay of train-then-[[docTokenCounts]]-then-
    * [[Packing.packShards]]: the same `k` learn rounds, the merges
    * applied per DOCUMENT word instance in merge order, zero-filled
    * for wordless documents, then q71's exact cumsum/cut arithmetic
    * (the shared floor((cum - n) / budget.0) rule). Generated so the
    * three stages cannot drift between engines. */
  def packingOracleSql(k: Int, budget: Long, buckets: Int): String =
    perDocCountsCtes(k) + s""",
       |alldocs AS (
       |  SELECT d.doc_id, CAST(d.doc_id % $buckets AS INT) AS pack_bucket,
       |    coalesce(cnt.n_tokens, 0) AS n_tokens
       |  FROM documents d LEFT JOIN cnt USING (doc_id)),
       |c AS (
       |  SELECT *, sum(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM alldocs)
       |SELECT pack_bucket,
       |  CAST(floor((cum - n_tokens) / $budget.0) AS BIGINT) AS pack_shard,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY pack_bucket, pack_shard
       |ORDER BY pack_bucket, pack_shard""".stripMargin

  /** Shared CTE chain: the `k` learn rounds, the merges applied per
    * DOCUMENT word instance in merge order, ending at
    * `cnt(doc_id, n_tokens)` — per-doc BPE token counts (docs with no
    * subword tokens ABSENT, callers zero-fill). Both the q345 packing
    * oracle and the q350 fertility oracle build on this generator so
    * the per-doc counting text cannot drift between them. */
  def perDocCountsCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= cteRounds(k, rewriteLast = false)
    sb ++= ",\ndw AS (\n"
    sb ++= "  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS w\n"
    sb ++= "  FROM documents),\n"
    sb ++= "d0 AS (\n"
    sb ++= "  SELECT doc_id, '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS sym\n"
    sb ++= "  FROM dw)"
    for (i <- 1 to k) {
      val pat = s"('|' || m$i.l || '|' || m$i.r || '|')"
      val rep = s"('|' || m$i.l || m$i.r || '|')"
      sb ++= s",\nd$i AS (\n"
      sb ++= s"  SELECT doc_id, replace(replace(replace(sym, $pat, $rep), $pat, $rep), $pat, $rep) AS sym\n"
      sb ++= s"  FROM d${i - 1}, m$i)"
    }
    sb ++= s""",
       |cnt AS (
       |  SELECT doc_id,
       |    CAST(sum(len(list_filter(string_split(sym, '|'), x -> x <> ''))) AS BIGINT)
       |      AS n_tokens
       |  FROM d$k GROUP BY doc_id)""".stripMargin
    sb.toString
  }

  private def cteRounds(k: Int, rewriteLast: Boolean): String = {
    val sb = new StringBuilder
    sb ++= "WITH toks AS (\n"
    sb ++= "  SELECT unnest(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS w\n"
    sb ++= "  FROM documents),\n"
    sb ++= "w0 AS (\n"
    sb ++= "  SELECT '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS sym,\n"
    sb ++= "    CAST(count(*) AS BIGINT) AS freq\n"
    sb ++= "  FROM toks GROUP BY w)"
    for (i <- 1 to k) {
      val prev = s"w${i - 1}"
      sb ++= s",\ns$i AS (\n"
      sb ++= s"  SELECT freq, list_filter(string_split(sym, '|'), x -> x <> '') AS syms\n"
      sb ++= s"  FROM $prev),\n"
      sb ++= s"e$i AS (\n"
      sb ++= s"  SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS j\n"
      sb ++= s"  FROM s$i WHERE len(syms) >= 2),\n"
      sb ++= s"p$i AS (\n"
      sb ++= s"  SELECT syms[j] AS l, syms[j + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt\n"
      sb ++= s"  FROM e$i GROUP BY 1, 2),\n"
      sb ++= s"m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1)"
      if (i < k || rewriteLast) {
        val pat = s"('|' || m$i.l || '|' || m$i.r || '|')"
        val rep = s"('|' || m$i.l || m$i.r || '|')"
        sb ++= s",\nw$i AS (\n"
        sb ++= s"  SELECT replace(replace(replace(sym, $pat, $rep), $pat, $rep), $pat, $rep) AS sym,\n"
        sb ++= s"    freq\n"
        sb ++= s"  FROM $prev, m$i)"
      }
    }
    sb.toString
  }
}
