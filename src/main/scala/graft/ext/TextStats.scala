package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: token
  * counting, quality scoring, language identification, and document
  * fingerprinting. All built-in-function expressions (codegen'd, no
  * UDFs), so they run at full scan speed over 100 TB of text.
  */
object TextStats {

  /** Whitespace token count without materializing the token array:
    * chars minus non-space chars + 1. Pure string arithmetic — stays
    * in codegen and avoids array allocation per row on wide scans.
    */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, 0)
      .otherwise(length(text) - length(regexp_replace(text, " ", "")) + 1)

  /** BPE-ish subword count: maximal runs of letters or digits. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0)))

  /** Stopword ratio over whitespace tokens. Numerator is the native
    * [[graft.functions.TokenSetCount]] expression (codegen'd, set
    * hashed once per task) — the `filter(t.isin(...))` lambda it
    * replaces is interpreted per token, per row, on the scan path. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    graft.functions.GraftFunctions.tokenSetCount(text, stopwords).cast("double") /
      size(split(text, " "))

  /** Heuristic quality score in [0,1]: length credit (saturating at
    * `fullTokens`) blended with non-stopword density.
    */
  def qualityScore(text: Column, stopwords: Seq[String], fullTokens: Int = 100): Column = {
    val n = tokenCount(text).cast("double")
    val sw = stopwordRatio(text, stopwords)
    least(n / fullTokens, lit(1.0)) * 0.5 + (lit(1.0) - sw) * 0.5
  }

  /** Marker-word language scores: for each (lang, markers) profile,
    * emits a column `score_<lang>` counting marker occurrences via the
    * native token-set-count expression (no interpreted lambdas on the
    * scan). Real deployments would load per-language character-n-gram
    * profiles; the mechanism (count markers, argmax) is the same.
    */
  def withLangScores(df: DataFrame, textCol: String,
                     profiles: Seq[(String, Seq[String])]): DataFrame =
    profiles.foldLeft(df) { case (acc, (lang, markers)) =>
      acc.withColumn(s"score_$lang",
        graft.functions.GraftFunctions.tokenSetCount(col(textCol), markers))
    }

  /** Deterministic argmax over the `<prefix><lang>` score columns
    * with first-listed-wins tie-breaking.
    */
  def predictLang(profiles: Seq[(String, Seq[String])],
                  prefix: String = "score_"): Column = {
    val langs = profiles.map(_._1)
    langs.init.foldRight(lit(langs.last)) { (l, elseCol) =>
      val mine = col(s"$prefix$l")
      val laterMax = langs.drop(langs.indexOf(l) + 1).map(o => col(s"$prefix$o"))
        .reduce((a, b) => greatest(a, b))
      when(mine >= laterMax, l).otherwise(elseCol)
    }
  }

  /** Content fingerprint: md5 of the text (portable across engines).
    * For shift-resistant fingerprints use Dedup.withSimHash.
    */
  def fingerprint(text: Column): Column = md5(text)

  /** Sequential pattern redaction — the PII-scrub stage of a text
    * pipeline: each (label, regex) pair rewrites every match to
    * `[label]`, applied in list order (later patterns see earlier
    * replacements, so order the specific before the general).
    * Codegen'd regexp_replace chain, map-side; the pattern list is a
    * plan-time constant. Cross-engine deterministic: the DuckDB
    * oracle applies the identical chain with the 'g' flag.
    */
  def redact(text: Column, patterns: Seq[(String, String)]): Column =
    patterns.foldLeft(text) { case (acc, (label, re)) =>
      regexp_replace(acc, re, s"[$label]")
    }

  /** Repetition/structure quality signals (the Gopher-rules family —
    * boilerplate and low-quality generated text shows up as token and
    * n-gram repetition, symbol noise, or degenerate word lengths):
    *
    *  - rep_ratio: 1 - distinct/total whitespace tokens
    *  - dup_bigram_ratio: 1 - distinct/total word bigrams (distinct
    *    via the native [[graft.functions.WordShingles]], which dedups;
    *    total bigrams = tokens - 1)
    *  - symbol_ratio: chars outside [a-z0-9 ] over all chars
    *  - mean_word_len: non-space chars per token
    *
    * All built-in/codegen'd per-row expressions — no shuffle, no
    * UDFs; ratios are emitted UNROUNDED (round only aggregates, and
    * compare thresholds on unrounded values, the q58 rule). Empty
    * texts score 0 everywhere.
    */
  def withRepetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t).cast("double")
    val distinctToks = size(array_distinct(split(t, " "))).cast("double")
    val distinctBigrams = size(
      graft.functions.GraftFunctions.wordShingles(df.sparkSession, t, 2)).cast("double")
    df.withColumn("rep_ratio",
        when(toks > 0, lit(1.0) - distinctToks / toks).otherwise(0.0))
      .withColumn("dup_bigram_ratio",
        when(toks > 1, lit(1.0) - distinctBigrams / (toks - 1)).otherwise(0.0))
      .withColumn("symbol_ratio",
        when(length(t) > 0,
          (length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))).cast("double")
            / length(t)).otherwise(0.0))
      .withColumn("mean_word_len",
        when(toks > 0,
          length(regexp_replace(t, " ", "")).cast("double") / toks).otherwise(0.0))
  }

  /** Keep documents passing the repetition/structure gates — the
    * composable filter form of [[withRepetitionStats]] (thresholds
    * compare UNROUNDED values so the decision is cross-engine
    * deterministic). */
  def repetitionFilter(df: DataFrame, textCol: String,
                       maxRepRatio: Double = 0.3,
                       maxDupBigramRatio: Double = 0.3,
                       maxSymbolRatio: Double = 0.1,
                       minMeanWordLen: Double = 2.0,
                       maxMeanWordLen: Double = 12.0): DataFrame =
    withRepetitionStats(df, textCol)
      .filter(col("rep_ratio") <= maxRepRatio &&
              col("dup_bigram_ratio") <= maxDupBigramRatio &&
              col("symbol_ratio") <= maxSymbolRatio &&
              col("mean_word_len") >= minMeanWordLen &&
              col("mean_word_len") <= maxMeanWordLen)
      .drop("rep_ratio", "dup_bigram_ratio", "symbol_ratio", "mean_word_len")

  /** The q67 GATE PREDICATE as one Column — the default-threshold
    * pass bit the eval-cadence queries (q67/q367/q370–q375, the
    * streaming census) and their shared GateCtesSql oracle all key
    * on. ONE copy so a threshold edit cannot silently diverge one
    * query's Spark plan from its siblings and the shared oracle text
    * (r19 review). Apply over [[withRepetitionStats]] columns. */
  val repetitionGate: Column =
    col("rep_ratio") <= 0.3 && col("dup_bigram_ratio") <= 0.3 &&
      col("symbol_ratio") <= 0.1 && col("mean_word_len").between(2.0, 12.0)

  /** q142's sub-word token array ([a-z]+ | [0-9]+ runs). */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0))

  /** q142's hashed-feature integer score: each sub-word hashes to a
    * weight ((md5 first-8-hex mod 1001) − 500; a deterministic
    * stand-in with the storage/compute shape of trained weights) and
    * the doc score is the exact integer sum, folded map-side inside
    * the scan. ONE copy mirroring the oracle side's single
    * HashScoreCtesSql (r19 review); the interpreted-lambda trade is
    * documented at q142 — the path is md5-bound, not array-op-bound. */
  def hashedTokenScore(toks: Column): Column =
    aggregate(
      transform(toks, t =>
        conv(substring(md5(t), 1, 8), 16, 10).cast("long") % 1001L - 500L),
      lit(0L), (acc, x) => acc + x)

  /** Character-n-gram profile score: total occurrence count of the
    * profile's n-grams in the text, via length arithmetic (codegen'd,
    * no arrays): count(g) = (len(text) - len(remove(text, g))) / len(g).
    * The standard n-gram language-ID signal; pair with
    * [[predictLang]]-style argmax over per-language profiles.
    */
  def charNgramScore(text: Column, profile: Seq[String]): Column =
    profile.map { g =>
      val lit_g = java.util.regex.Pattern.quote(g)
      ((length(text) - length(regexp_replace(text, lit_g, ""))) / g.length).cast("int")
    }.reduce(_ + _)

  /** Per-language char-n-gram scores as `cscore_<lang>` columns. */
  def withCharNgramScores(df: DataFrame, textCol: String,
                          profiles: Seq[(String, Seq[String])]): DataFrame =
    profiles.foldLeft(df) { case (acc, (lang, grams)) =>
      acc.withColumn(s"cscore_$lang", charNgramScore(col(textCol), grams))
    }

  /** SUBSTRING-level duplication stats — the signal behind
    * exact-substring dedup (Lee et al. 2022, arXiv:2107.06499: memorized
    * spans recur verbatim across documents even when no whole document
    * duplicates): a token POSITION is duplicated when its k-gram occurs
    * at least `minOccurrences` times corpus-wide. Adds `n_positions`
    * (token count − k + 1, floored at 0), `n_dup_positions` and the
    * unrounded `dup_span_ratio` (0 for docs too short to have a
    * position) — gate on the ratio to drop boilerplate-heavy documents,
    * or feed the positions to a span-cutting rewrite.
    *
    * Scale shape: all-position k-grams (native [[graft.functions.WordShingles]]
    * with dedupe=false, one pass) explode to one row per position — the
    * corpus's token count, the inherent cost of substring-level
    * signals (published implementations pay the same via suffix
    * arrays). The occurrence count is a hash aggregate with map-side
    * partials; the count join-back and the per-doc aggregate reuse the
    * same gram/id partitionings. With `hashGramKey` (the default) the
    * k-word gram STRING exists only inside the map stage: the staged
    * frame, the occurrence aggregate and the join-back all key on
    * xxhash64(gram) — 8 bytes per position through both shuffles
    * instead of ~k words (at 100 TB that is ~k× corpus bytes of
    * shuffle I/O saved). A 64-bit collision merges two grams'
    * occurrence counts — odds ~n²/2⁶⁵, far below corpus noise; pass
    * `hashGramKey = false` for the exact string-keyed plan (the
    * equivalence spec pins identical results at test scale).
    */
  def withDupSpanStats(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 20, minOccurrences: Long = 2L,
                       hashGramKey: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(minOccurrences >= 2L, "minOccurrences below 2 marks every position")
    val clash = df.columns.intersect(
      Seq("n_positions", "n_dup_positions", "dup_span_ratio"))
    require(clash.isEmpty,
      s"withDupSpanStats reserves output columns ${clash.mkString(", ")} — rename them upstream")
    val spark = df.sparkSession
    val raw = df.select(col(idCol),
      explode(graft.functions.GraftFunctions.wordShinglesAll(
        spark, col(textCol), k)).as("__gram"))
    // hash BEFORE the persist/shuffle: the staged frame carries 8-byte
    // keys, never the k-word strings
    val grams = graft.ops.Staging.stage(
      raw.select(col(idCol), gramKey(hashGramKey).as("__gk")))
    val dupGrams = grams.groupBy("__gk")
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minOccurrences)
      .select("__gk")
    val perDoc = grams.join(dupGrams, Seq("__gk"))
      .groupBy(idCol).agg(count(lit(1)).as("n_dup_positions"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_dup_positions", coalesce(col("n_dup_positions"), lit(0L)))
      .withColumn("n_positions",
        greatest(tokenCount(col(textCol)) - lit(k - 1), lit(0)).cast("long"))
      .withColumn("dup_span_ratio",
        when(col("n_positions") > 0,
          col("n_dup_positions") / col("n_positions")).otherwise(lit(0.0)))
  }

  private def gramKey(hashGramKey: Boolean): Column =
    if (hashGramKey) xxhash64(col("__gram")) else col("__gram")

  /** Exact-substring duplicate-span CUTTING (the rewrite the
    * [[withDupSpanStats]] signal implies — Lee et al. 2022,
    * arXiv:2107.06499 remove all but one occurrence of any duplicated
    * length-≥k substring): a position whose k-gram occurs at least
    * `minOccurrences` times corpus-wide is CUT unless it is the
    * gram's FIRST occurrence (lowest (id, position) — so exactly one
    * copy of every duplicated substring survives, deterministically).
    * Cut positions merge into maximal spans (a cut at p covers tokens
    * [p, p+k-1]; overlapping or touching spans coalesce) and the text
    * is rebuilt from the tokens outside them. Adds:
    *  - `text_cut`: the rebuilt text ('' if everything was cut)
    *  - `n_cut_spans`: merged span count (0 for untouched docs)
    *  - `n_tokens_removed`: tokens dropped
    *
    * Scale shape: the same two hash-keyed shuffles as
    * [[withDupSpanStats]] (occurrence aggregate + join-back) plus a
    * per-doc collect of CUT positions only (bounded by the doc's own
    * token count, and only for docs that have dup spans); the span
    * merge + text rebuild is the one-pass native
    * [[graft.functions.CutTokenSpans]] expression, map-side after the
    * per-doc aggregate. First-occurrence selection is a min(struct)
    * inside the same occurrence aggregate — no extra shuffle.
    */
  def cutDupSpans(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 20, minOccurrences: Long = 2L,
                  hashGramKey: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(minOccurrences >= 2L, "minOccurrences below 2 cuts every position")
    val clash = df.columns.intersect(
      Seq("text_cut", "n_cut_spans", "n_tokens_removed"))
    require(clash.isEmpty,
      s"cutDupSpans reserves output columns ${clash.mkString(", ")} — rename them upstream")
    val spark = df.sparkSession
    val raw = df.select(col(idCol),
      posexplode(graft.functions.GraftFunctions.wordShinglesAll(
        spark, col(textCol), k)).as(Seq("__pos", "__gram")))
    val grams = graft.ops.Staging.stage(
      raw.select(col(idCol), col("__pos"), gramKey(hashGramKey).as("__gk")))
    // one aggregate carries both signals: the occurrence count (dup
    // gate) and the arg-min first occurrence (the kept copy)
    val firsts = grams.groupBy("__gk")
      .agg(count(lit(1)).as("__occ"),
           min(struct(col(idCol).as("__fid"), col("__pos").as("__fpos"))).as("__first"))
      .filter(col("__occ") >= minOccurrences)
      .select(col("__gk"), col("__first"))
    val cuts = grams.join(firsts, Seq("__gk"))
      .filter(!(col(idCol) === col("__first.__fid") &&
                col("__pos") === col("__first.__fpos")))
    val perDoc = cuts.groupBy(idCol)
      .agg(sort_array(collect_list(col("__pos"))).as("__cuts"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("__cs", graft.functions.GraftFunctions.cutTokenSpans(
        spark, col(textCol),
        coalesce(col("__cuts"), typedLit(Seq.empty[Int])), k))
      .withColumn("text_cut", col("__cs.text_cut"))
      .withColumn("n_cut_spans", col("__cs.n_spans"))
      .withColumn("n_tokens_removed", col("__cs.n_removed"))
      .drop("__cs", "__cuts")
  }

  /** Cross-document BOILERPLATE removal — the rewrite the q289 census
    * implies, and the cleaning step the CCNet/RefinedWeb pipelines run
    * after dedup (Wenzek et al. 2019, arXiv:1911.00359; Penedo et al.
    * 2023, arXiv:2306.01116: template text — headers, footers, licence
    * blocks — recurs across documents of a source and is stripped
    * before training). A token position is boilerplate when its
    * k-gram occurs in at least `minDocFrequency` DISTINCT documents;
    * unlike [[cutDupSpans]] there is NO surviving first copy — shared
    * template text is noise everywhere, so every occurrence is cut
    * (the within-corpus dedup keeps one copy because the text itself
    * is signal; boilerplate is not). Cut positions merge into maximal
    * spans and the text is rebuilt from the tokens outside them via
    * the same native [[graft.functions.CutTokenSpans]]. Adds the same
    * three columns as [[cutDupSpans]]: `text_cut`, `n_cut_spans`,
    * `n_tokens_removed`.
    *
    * Scale shape: one all-position shingle pass (8-byte xxhash64 gram
    * keys through every shuffle — the q78 rule), a (doc, gram)
    * distinct bounded by distinct grams per doc, the vocabulary-sized
    * doc-frequency aggregate, a semi join-back on the gram key, and a
    * per-doc collect of CUT positions only (bounded by the doc's own
    * token count); the span merge + rebuild is map-side.
    */
  def cutBoilerplate(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minDocFrequency: Long = 2L,
                     hashGramKey: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(minDocFrequency >= 2L,
      "minDocFrequency below 2 cuts every position of every document")
    val clash = df.columns.intersect(
      Seq("text_cut", "n_cut_spans", "n_tokens_removed"))
    require(clash.isEmpty,
      s"cutBoilerplate reserves output columns ${clash.mkString(", ")} — rename them upstream")
    val spark = df.sparkSession
    val raw = df.select(col(idCol),
      posexplode(graft.functions.GraftFunctions.wordShinglesAll(
        spark, col(textCol), k)).as(Seq("__pos", "__gram")))
    val grams = graft.ops.Staging.stage(
      raw.select(col(idCol), col("__pos"), gramKey(hashGramKey).as("__gk")))
    // doc frequency over the distinct (doc, gram) pairs — a repeat
    // inside one document is repetition (q78's axis), not boilerplate
    val boiler = grams.select(col(idCol), col("__gk")).distinct()
      .groupBy("__gk").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFrequency)
      .select("__gk")
    val cuts = grams.join(boiler, Seq("__gk"), "left_semi")
    val perDoc = cuts.groupBy(idCol)
      .agg(sort_array(collect_list(col("__pos"))).as("__cuts"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("__cs", graft.functions.GraftFunctions.cutTokenSpans(
        spark, col(textCol),
        coalesce(col("__cuts"), typedLit(Seq.empty[Int])), k))
      .withColumn("text_cut", col("__cs.text_cut"))
      .withColumn("n_cut_spans", col("__cs.n_spans"))
      .withColumn("n_tokens_removed", col("__cs.n_removed"))
      .drop("__cs", "__cuts")
  }

  /** Bigram collocation mining by pointwise mutual information:
    * `pmi(w1,w2) = ln(c_xy * N / (c_x * c_y))` over whitespace
    * tokens, where N is the corpus token count — the phrase-induction
    * signal ("new york" scores high because its parts rarely occur
    * apart). Returns (w1, w2, c_xy, c_x, c_y, pmi) for bigrams with
    * `c_xy >= minCount`.
    *
    * Scale shape: two explode+aggregate passes (map-side partial
    * combine collapses each to ~vocab rows per task), the bigram tail
    * pruned by `minCount` BEFORE the two word-keyed joins back to the
    * unigram counts (AQE broadcasts the unigram side when the vocab
    * is small; at web scale both sides shuffle on the word key, which
    * is the right plan). N rides along as a broadcast single-row
    * aggregate, not a driver collect.
    *
    * Determinism: counts are exact longs; the one double expression
    * is `(c_xy * N) / (c_x * c_y)` followed by one ln — consumers
    * that ORDER BY the score must order on the ROUNDED value with a
    * (w1, w2) tie-break (the q80 rule).
    */
  def collocationsPmi(df: DataFrame, textCol: String,
                      minCount: Long = 10L): DataFrame = {
    val spark = df.sparkSession
    val docs = df.filter(length(col(textCol)) > 0)
    val uni = docs
      .select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    val total = docs.agg(
      sum(tokenCount(col(textCol)).cast("long")).as("__n"))
    val bi = docs
      .select(explode(graft.functions.GraftFunctions.wordShinglesAll(
        spark, col(textCol), 2)).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .select(substring_index(col("__g"), " ", 1).as("w1"),
              substring_index(col("__g"), " ", -1).as("w2"),
              col("c_xy"))
    bi.join(uni.withColumnsRenamed(Map("__w" -> "w1", "__c" -> "c_x")), Seq("w1"))
      .join(uni.withColumnsRenamed(Map("__w" -> "w2", "__c" -> "c_y")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("pmi",
        log((col("c_xy").cast("double") * col("__n").cast("double")) /
            (col("c_x").cast("double") * col("c_y").cast("double"))))
      .select("w1", "w2", "c_xy", "c_x", "c_y", "pmi")
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local fingerprinting scheme, public
    * literature): k-token grams at every position, and each sliding
    * window of `w` consecutive gram positions selects its MIN-hash
    * gram (rightmost on hash ties — the paper's robust tie rule). The
    * selection guarantee: any shared token run of length >= w + k - 1
    * between two documents yields at least one shared selected
    * fingerprint, while expected density is only ~2/(w+1) of
    * positions — the property that makes cross-doc overlap detection
    * work on a SAMPLE of grams instead of all of them.
    *
    * Hash order is md5 hex — engine-portable (the oracle replays the
    * identical selection), uniform enough for the density bound. The
    * window min rides ONE string key `md5(gram) || zero-padded
    * (1e8 - pos)`: lexicographic min of that key IS (min hash,
    * rightmost pos), so both engines express the whole selection as a
    * plain frame-min — no argmin plumbing, no tie re-derivation.
    * Positions must stay below 1e8 for the 9-digit pad (any real
    * document is orders of magnitude under).
    *
    * Returns one row per distinct fingerprint: all input columns
    * except the text, plus (fp_pos, fp_hash). Scale shape: gram
    * build + window min are per-document (one exchange on the id;
    * the window frame is w rows inside a doc partition), the distinct
    * is fingerprint-sized (~2/(w+1) of token positions), and the text
    * column never leaves the gram-build scan. Docs with fewer than
    * k + w - 1 tokens have no full window and yield no fingerprints
    * (the paper's domain; census callers count them separately). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "gram size and window must be >= 1")
    val clash = Seq("fp_pos", "fp_hash").filter(df.columns.contains)
    require(clash.isEmpty,
      s"winnowFingerprints reserves output columns ${clash.mkString(", ")} — rename them upstream")
    val keep = df.columns.filter(c => c != textCol).toSeq
    val t = df
      .withColumn("__tk", split(col(textCol), " "))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") >= k) // sequence(1, n-k+1) must ascend
    val g = t.select(
        keep.map(col) :+ posexplode(expr(
          s"transform(sequence(1, __n - ${k - 1}), i -> concat_ws(' ', slice(__tk, i, $k)))"))
          .as(Seq("__p0", "__gram")): _*)
      .withColumn("__pos", col("__p0") + 1)
    val winFrame = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos").rowsBetween(-(w - 1), 0)
    g.withColumn("__key",
        concat(md5(col("__gram")),
          lpad((lit(100000000L) - col("__pos")).cast("string"), 9, "0")))
      .withColumn("__mk", min(col("__key")).over(winFrame))
      .filter(col("__pos") >= w) // full windows only
      .select(keep.map(col) :+
        (lit(100000000L) - substring(col("__mk"), 33, 9).cast("long"))
          .as("fp_pos") :+
        substring(col("__mk"), 1, 32).as("fp_hash"): _*)
      .distinct()
  }

  /** APPROXIMATE longest-common-substring pairs — suffix-automaton-
    * free (r17 verdict item 8): [[winnowFingerprints]] gives the
    * candidates, DIAGONAL CHAINING gives the length estimate. Two
    * documents sharing a token run of length L >= w + k - 1 share
    * winnowed fingerprints at a CONSTANT position offset (the run's
    * alignment), one per w-window of the run's interior — so grouping
    * shared fingerprints by `pos_a - pos_b` (the diagonal) and taking
    * the widest per-diagonal span `max(pos_a) - min(pos_a) + k`
    * estimates the longest shared run in TOKENS: a lower bound up to
    * the w-window edge slack on real runs, an upper bound only when
    * two separate runs land on one diagonal (same alignment twice —
    * the standard fingerprint-chaining approximation, deterministic
    * and engine-replayable either way).
    *
    * Scale shape: fingerprints are ~2/(w+1) of token positions and
    * the pair join carries (id, pos, hash) rows keyed by hash — the
    * MOSS shape, never all-pairs and never full gram sets.
    * `maxFpDocs` excludes fingerprints selected in more than that
    * many documents (boilerplate hashes are the quadratic hazard, the
    * PPJoin hot-shingle argument); the DROP set — hashes hotter than
    * the cap — is the small side (bounded by corpus/maxFpDocs by a
    * counting argument), so THAT is what broadcasts, removed with a
    * left_anti join; the corpus-sized keep universe never reaches
    * the driver (the exactJaccardPairs guard convention,
    * [[graft.ext.Dedup.exactJaccardPairs]]).
    * Returns (id_a, id_b, lcs_est_tokens, best_diag,
    * n_shared_fps) for pairs with lcs_est_tokens >= minSpan;
    * best_diag is the smallest diagonal achieving the estimate (a
    * total tie rule). */
  def approxLcsPairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 4, w: Int = 4, minSpan: Int = 8,
                     maxFpDocs: Long = Long.MaxValue): DataFrame = {
    require(minSpan >= 1, "minSpan must be >= 1")
    require(maxFpDocs >= 2, "maxFpDocs < 2 would exclude every shared hash")
    val fps0 = graft.ops.Staging.stage(
      winnowFingerprints(
          docs.select(col(idCol).as("__id"), col(textCol).as("__text")),
          "__id", "__text", k, w)
        .select(col("__id"), col("fp_pos"), col("fp_hash")))
    val fps =
      if (maxFpDocs == Long.MaxValue) fps0
      else {
        // hot hashes only: |drop| <= total_fp_rows / maxFpDocs, the
        // broadcastable side; anti-join keeps everything else without
        // ever materializing the corpus-sized keep universe
        val dropHash = fps0.groupBy("fp_hash")
          .agg(countDistinct("__id").as("__nd"))
          .filter(col("__nd") > maxFpDocs).select("fp_hash")
        fps0.join(broadcast(dropHash), Seq("fp_hash"), "left_anti")
      }
    fps.select(col("__id").as("id_a"), col("fp_pos").as("pa"), col("fp_hash"))
      .join(fps.select(col("__id").as("id_b"), col("fp_pos").as("pb"),
          col("fp_hash").as("__h")),
        col("fp_hash") === col("__h") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), (col("pa") - col("pb")).as("diag"))
      .agg((max("pa") - min("pa") + lit(k.toLong)).as("__span"),
           count(lit(1)).as("__nf"))
      .groupBy("id_a", "id_b")
      .agg(max("__span").as("lcs_est_tokens"),
           min_by(col("diag"), struct((-col("__span")).as("ns"),
             col("diag"))).as("best_diag"),
           sum("__nf").as("n_shared_fps"))
      .filter(col("lcs_est_tokens") >= minSpan)
  }
}
