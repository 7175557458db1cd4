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
