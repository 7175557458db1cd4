package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Calibration, Dedup, TextStats}
import graft.tables.Tables
import TextQueries.{Stopwords, LangProfiles, simhashCompCtes, bm25Ctes}

/** CURATION queries: quality scoring + deciles, language id, token
  * counts/budgets, BPE, DSIR + bucket LM scoring, perplexity filter,
  * sampling/folds/mixtures/packing/sharding, curation pipelines,
  * chunking, redaction, expectations, dataset cards.
  *
  * Split from the single TextQueries object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[TextQueries]].
  */
object TextCurationQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Hashed-feature linear classifier (the fastText-style quality
    // scorer every corpus-curation stack runs): each subword token
    // hashes to an INTEGER weight ((md5 first 8 hex digits mod 1001)
    // - 500 — a deterministic stand-in for trained weights with the
    // exact storage/compute shape of the real thing), and a doc's
    // score is the sum. Entirely MAP-SIDE: transform+aggregate fold
    // the token array inside the scan — zero exchange at any corpus
    // size, vs the explode + groupBy(doc) shape whose shuffle carries
    // one row per TOKEN. Integer weights keep the sum bit-exact
    // cross-engine; the margin is a FLOORED ppm integer, not a
    // rounded ratio — score/(500n) has a small denominator, so its
    // true value can sit exactly on a 6dp half (the round() trap).
    // The lambda is interpreted (documented trade: this path
    // is per-doc compute-bound on md5, not array-op-bound, so a
    // native expression would buy little).
    "q142_hash_classifier" -> ((s, d) => {
      val toks = TextStats.subwordTokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
                size(toks).as("n_subwords"),
                TextStats.hashedTokenScore(toks).as("score"))
        .select(col("doc_id"), col("source"), col("n_subwords"), col("score"),
                // margin = score/(500n) in ppm, FLOORED: the rational
                // has a small denominator, so round(..., 6) sits on
                // exact halves (observed at sf0.1) — floor of the
                // bit-identical double is half-free
                when(col("n_subwords") > 0,
                  floor(col("score") * 2000.0 / col("n_subwords"))
                    .cast("long")).as("margin_ppm"),
                (col("score") > 0L).as("label"))
        .orderBy("doc_id")
    }),

    // Token-budget WATERFILLING across sources — mixture planning:
    // given per-source token supplies (caps) and a global budget
    // T = 60% of the corpus, find the water level L such that
    // sum(min(cap, L)) = T and allocate min(cap, floor-at-level) per
    // source. Closed form over the cap-sorted prefix scan (one
    // window over the |sources|-row frame): the first k sources are
    // fully taken, the rest get the level. Allocation emitted as the
    // FLOOR of the exact rational level — integer waterfill
    // (undershoots the budget by < |sources| tokens, documented).
    // Complements q72/q75's fixed-weight mixtures with the
    // budget-driven solver.
    "q161_token_waterfill" -> ((s, d) => {
      val caps = Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(TextStats.tokenCount(col("text"))).as("cap"))
      // budget = 60% of total tokens in EXACT integer arithmetic
      // ((3*sum) div 5 — a float 0.6 product floors differently
      // across engines when the true product is an integer)
      val tot = caps.agg(expr("(3 * sum(cap)) div 5").as("budget"))
      val wPfx = Window.orderBy("cap", "source")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.orderBy("cap", "source")
      val scan = caps.crossJoin(broadcast(tot))
        .withColumn("prefix", coalesce(sum("cap").over(wPfx), lit(0L)))
        .withColumn("rank", row_number().over(wAll))
        .withColumn("n_src", count(lit(1)).over(
          Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .withColumn("full_take",
          col("prefix") + (col("n_src") - col("rank") + 1) * col("cap")
            <= col("budget"))
        .withColumn("cand",
          floor((col("budget") - col("prefix")).cast("double") /
                (col("n_src") - col("rank") + 1)).cast("long"))
      // the shared level is the FIRST non-full row's candidate (later
      // non-full rows' own candidates are below the true level)
      val lvl = scan.agg(min(when(!col("full_take"),
          struct(col("rank"), col("cand")))).as("__s"))
        .select(coalesce(col("__s.cand"), lit(0L)).as("level"))
      scan.crossJoin(broadcast(lvl))
        .select(col("source"), col("cap"),
          when(col("full_take"), col("cap"))
            .otherwise(least(col("cap"), greatest(col("level"), lit(0L))))
            .as("allocated"))
        .orderBy("source")
    }),

    // The pure-SQL front door over the NATIVE expressions: a SQL
    // string calling the graft_* functions the SparkSessionExtensions
    // registry injects (q47 shows plain SQL; this shows the
    // EXTENSION surface under the driver gate — previously only
    // spec-pinned). token_set_count is codegen'd inside the scan;
    // word_shingles feeds size() without materializing elsewhere.
    "q159_sql_native_functions" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      Tables.documents(s, d).createOrReplaceTempView("v_docs_q159")
      s.sql("""
        SELECT doc_id,
          graft_token_set_count(text, array('data', 'the', 'row'))
            AS stop_hits,
          size(graft_word_shingles(text, 3)) AS n_shingles
        FROM v_docs_q159 ORDER BY doc_id""")
    }),

    // BPE merge induction (Bpe.learnMerges) — tokenizer TRAINING on
    // the corpus: 4 merge rounds, each one vocab-sized pair count +
    // a 1-row argmax collect (the PageRank-sweep idiom). The corpus
    // is touched exactly once (word-type frequency shuffle); see the
    // determinism conventions in the Bpe scaladoc. The oracle unrolls
    // all 4 rounds as generated CTEs.
    "q143_bpe_merges" -> ((s, d) =>
      graft.ext.Bpe.learnMerges(Tables.documents(s, d), "text", k = 4)
        .orderBy("step")),

    // Tokenizer APPLY (Bpe.encode): train the 4 merges, then encode
    // the corpus with them map-side (the merge list is a driver-held
    // literal rewrite chain) and emit the resulting vocabulary with
    // frequencies — the end-to-end train->encode lifecycle.
    "q144_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.ext.Bpe.learnMerges(docs, "text", k = 4).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.ext.Bpe.encode(docs, "text", merges)
        .orderBy(col("freq").desc, col("token"))
    }),

    // Quality scoring aggregated per language label.
    "q28_text_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
        .withColumn("stop_ratio",
          round(TextStats.stopwordRatio(col("text"), Stopwords), 6))
        .withColumn("quality",
          round(TextStats.qualityScore(col("text"), Stopwords), 6))
      docs.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             round(avg("n_tokens"), 6).as("avg_tokens"),
             round(avg("stop_ratio"), 6).as("avg_stop_ratio"),
             round(avg("quality"), 6).as("avg_quality"))
        .orderBy("lang")
    }),

    // Quality-DECILE binning — the "keep the top X% by quality"
    // curation step. Deciles are RANK arithmetic ((rn-1)*10 DIV cnt,
    // integer division) rather than interpolated percentile value
    // thresholds: rank arithmetic is bit-exact across engines, while
    // cross-libm interpolation can move a value threshold by an ulp
    // and flip boundary documents. Ordering is on the 6dp-ROUNDED
    // quality with doc_id tiebreak, so ranks are engine-independent.
    // Scale note: this window sorts per source (the verification
    // shape); at 100 TB compute decile thresholds from a sorted
    // sample/tail and assign map-side instead.
    "q84_quality_deciles" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("source")
      Tables.documents(s, d)
        .withColumn("quality",
          round(TextStats.qualityScore(col("text"), Stopwords), 6))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .withColumn("decile", expr("CAST(((rn - 1) * 10) DIV cnt AS INT)"))
        .groupBy("source", "decile")
        // sum, not avg: per-doc quality is 6dp-rounded, so the SUM's
        // true value lies ON the 6dp grid (rounding safe), while an
        // AVG can sit exactly on a rounding half (the q14 trap —
        // observed: 0.5014215 rounding differently per engine)
        .agg(count(lit(1)).as("n_docs"),
             round(min("quality"), 6).as("min_q"),
             round(max("quality"), 6).as("max_q"),
             round(sum("quality"), 6).as("sum_q"))
        .orderBy("source", "decile")
    }),

    // Language-id confusion matrix: fixed marker profiles, argmax
    // with first-listed-wins ties (deterministic; mirrored in SQL).
    "q29_langid_confusion" -> ((s, d) => {
      val scored = TextStats.withLangScores(Tables.documents(s, d), "text", LangProfiles)
      scored.withColumn("predicted", TextStats.predictLang(LangProfiles))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // Character-n-gram language-ID (the n-gram-frequency mechanism;
    // q29 is the marker-word variant). Scores are overlap counts of
    // fixed per-language trigram profiles, computed with pure length
    // arithmetic so the oracle mirrors exactly.
    "q46_langid_chargram" -> ((s, d) => {
      val profiles = Seq(
        "de" -> Seq("agg", "tch", "mer"),
        "en" -> Seq("row", "lin", "tab"),
        "es" -> Seq("dat", "que", "smal"),
        "fr" -> Seq("joi", "ord", "key"),
        "zh" -> Seq("sca", "has", "par"))
      TextStats.withCharNgramScores(Tables.documents(s, d), "text", profiles)
        .withColumn("predicted", TextStats.predictLang(profiles, "cscore_"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // Token counting: whitespace tokens + BPE-ish subword regex.
    "q30_token_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
        .withColumn("n_subwords", TextStats.subwordCount(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").as("total_tokens"),
             sum("n_subwords").as("total_subwords"),
             round(avg("n_tokens"), 6).as("avg_tokens"))
        .orderBy("source")),

    // Token-budget ("nucleus") curation: per source, greedily keep
    // the LARGEST documents (n_chars desc, doc_id tie-break) until
    // the kept mass reaches 60% of the source's total characters —
    // the fixed-budget data-mixture selection step (keep the densest
    // 60% of each source's token mass). Cumulative windows are
    // PARTITIONED by source (never a global single-partition window);
    // the budget test is exact integer cross-multiplication
    // (cum·10 ≤ tot·6 — no float share), and the output shares are
    // exact ppm integer division.
    "q211_token_budget" -> ((s, d) => {
      val wCum = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("source")
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("__cum", sum("n_chars").over(wCum))
        .withColumn("__tot", sum("n_chars").over(wTot))
        .filter(col("__cum") * 10 <= col("__tot") * 6)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("kept_chars"),
             max("__tot").as("total_chars"))
        .select(col("source"), col("n_kept"), col("kept_chars"),
          col("total_chars"),
          expr("(kept_chars * 1000000) div total_chars").as("share_ppm"))
        .orderBy("source")
    }),

    // Per-SOURCE data-quality report (Kernels.expectations with
    // groupCols — q125's global gate becomes the per-tenant table in
    // the same single pass, one exchange on source): text rules over
    // documents, NULL predicate = violation.
    "q126_expectations_by_source" -> ((s, d) =>
      graft.ops.Kernels.expectations(Tables.documents(s, d), Seq(
          "text_nonempty" -> (length(col("text")) > 0),
          "chars_consistent" -> (col("n_chars") === length(col("text"))),
          "lang_known" -> col("lang").isin("en", "es", "zh", "de", "fr")),
          groupCols = Seq("source"))
        .orderBy("source", "rule")),

    // Gopher-style top-n-gram dominance (Rae et al. 2021 repetition
    // filters): per doc, the fraction of 3-gram positions occupied by
    // the SINGLE most frequent 3-gram — the boilerplate/listicle
    // signal q37's distinct-ratio family can't see (a doc repeating
    // one sentence has high top-gram dominance but may keep a modest
    // duplicate-gram ratio). Entirely MAP-SIDE per doc: native
    // positional shingles -> native TopElementFreq (sort-a-copy + max
    // run length, codegen'd) — a per-doc statistic never needs the
    // explode -> gram-keyed count -> per-doc max shape (two shuffles
    // whose width is the gram table); the only exchange here is the
    // final per-source aggregate. The flag threshold compares
    // UNROUNDED ratios (single IEEE division, identical both
    // engines); only the avg is rounded.
    "q122_top_ngram_coverage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
        .filter(col("n_tokens") >= 3)
      docs.select(col("source"),
          (graft.functions.GraftFunctions.topElementFreq(s,
            graft.functions.GraftFunctions.wordShinglesAll(s, col("text"), 3))
            .cast("double") /
            (col("n_tokens") - 2).cast("double")).as("ratio"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             round(avg(col("ratio")), 6).as("avg_top3gram_ratio"),
             sum(when(col("ratio") > 0.18, 1L).otherwise(0L)).as("n_flagged"))
        .orderBy("source")
    }),

    // Deterministic 80/10/10 train/val/test split (Sampling.hashSplit)
    // — content-keyed so the same doc lands in the same slice on any
    // engine under any partitioning (the eval-decontamination
    // property randomSplit does not have). The per-(source, split)
    // counts + token mass pin both the band arithmetic and the
    // md5-hex comparison; the oracle replays the cumulative
    // thresholds as hex-string literals.
    "q123_dataset_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      graft.ext.Sampling.hashSplit(docs, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sp11")
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens").cast("long")).as("total_tokens"))
        .orderBy("source", "split")
    }),

    // One-call document-prep composite (ext.DocPrep): exact dedup
    // (keep-lowest-id per content hash) -> marker lang-ID -> quality
    // scoring -> token counting -> quality/language filter, then a
    // small per-(source, lang) aggregate so every stage's effect is
    // hash-visible. The filter compares UNROUNDED quality on both
    // engines (identical IEEE expression); only outputs are rounded.
    "q58_docprep_pipeline" -> ((s, d) =>
      graft.ext.DocPrep.prepare(Tables.documents(s, d), "doc_id", "text",
          stopwords = Stopwords, profiles = LangProfiles,
          minQuality = 0.6, keepLangs = Seq("en", "es", "zh"))
        .groupBy("source", "predicted_lang")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").cast("long").as("total_tokens"),
             round(avg("quality"), 6).as("avg_quality"))
        .orderBy("source", "predicted_lang")),

    // Corpus n-gram statistics: top-5 bigrams per language by DOCUMENT
    // frequency (WordShingles dedups within a document, so the count
    // is #docs containing the bigram — the standard corpus-stats
    // semantics, mirrored by the oracle's list_distinct). Shape:
    // native shingles -> explode -> hash-aggregate (shuffle 1) ->
    // TopKByScoreStr partial aggregate (shuffle 2 moves FIVE rows per
    // partition per language, not every distinct (lang, ngram, n)
    // triple). Round 3's row_number window partitioned on ~5 langs
    // sorted a whole language's distinct ngrams in ONE task — at
    // corpus scale that's billions of rows through a single sort; the
    // partial aggregate is the repo's own q34/q35 fix applied here.
    // Count-as-double is exact (counts < 2^53); ngram tie-break is
    // byte-lexicographic on both engines.
    "q62_top_ngrams" -> ((s, d) => {
      val counts = Dedup.withShingles(Tables.documents(s, d), "text", k = 2)
        .select(col("lang"), explode(col("shingles")).as("ngram"))
        .groupBy("lang", "ngram").agg(count(lit(1)).as("n"))
      counts.groupBy("lang")
        .agg(graft.functions.GraftFunctions.topKByScoreStr(s,
          col("n").cast("double"), col("ngram"), 5).as("hits"))
        .select(col("lang"), posexplode(col("hits")).as(Seq("pos", "hit")))
        .select(col("lang"), col("hit.id").as("ngram"),
                col("hit.score").cast("long").as("n"),
                (col("pos") + 1).cast("int").as("rk"))
        .orderBy("lang", "rk")
    }),

    // The FULL curation pipeline in one call (DocPrep.prepareFull):
    // exact dedup -> 64-bit SimHash near-dup components (keep each
    // cluster's lowest id) -> repetition gates -> lang-ID/quality
    // filter -> deterministic fold split. The oracle mirrors every
    // stage (dedup window, SimHash closure, gate formulas, q58's
    // score CASEs, fold thresholds) — the strongest cross-engine
    // check in the repo: one hash over the composition of six
    // operators.
    "q69_curation_pipeline" -> ((s, d) =>
      graft.ext.DocPrep.prepareFull(Tables.documents(s, d), "doc_id", "text",
          stopwords = Stopwords, profiles = LangProfiles,
          minQuality = 0.5, keepLangs = Seq("de", "en", "es", "fr", "zh"),
          foldSalt = "r5")
        .groupBy("fold", "predicted_lang")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").cast("long").as("total_tokens"),
             round(avg("quality"), 6).as("avg_quality"),
             min("doc_id").as("min_id"))
        .orderBy("fold", "predicted_lang")),

    // Deterministic stratified sampling (ext.Sampling): the keep
    // decision is a pure function of md5(doc_id || salt), so the
    // sample is identical across runs, engines and partitionings —
    // the DuckDB oracle recomputes the EXACT same membership (hex
    // thresholds: 0.8 -> cccccccd, 0.5 -> 80000000, 0.2 -> 33333333,
    // default 0.1 -> 1999999a, all = math.round(f * 2^32) in hex).
    "q61_stratified_sample" -> ((s, d) =>
      graft.ext.Sampling.stratifiedSample(
          Tables.documents(s, d), col("doc_id"), col("source"),
          fractions = Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.2),
          defaultFraction = 0.1, salt = "r3")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
             min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source")),

    // Deterministic train/val/test fold assignment: fold is a pure
    // function of md5(doc_id || salt) against cumulative thresholds
    // (0.7/0.2/0.1), so membership is stable across runs, engines and
    // corpus growth; the oracle recomputes the identical CASE chain.
    // Out-of-vocabulary rate against a FROZEN reference vocab — the
    // tokenizer-coverage audit run before committing a vocab: the
    // top-500 tokens (count desc, token asc — deterministic at the
    // cut) of the even-id half play the frozen vocab; the odd-id half
    // plays new data scored against it. OOV share in floor-ppm per
    // source (exact integer counts; the vocab broadcast is the only
    // small side). The oracle replays the rank cut and the anti-join.
    "q311_oov_rate" -> ((s, d) => {
      val toks = graft.ops.Staging.stage(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), " ")).as("tok")))
      val vocab = toks.filter(pmod(col("doc_id"), lit(2L)) === 0L)
        .groupBy("tok").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("tok")).limit(500)
        .select("tok")
      toks.filter(pmod(col("doc_id"), lit(2L)) =!= 0L)
        .join(broadcast(vocab.withColumn("__in", lit(1))),
          Seq("tok"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
             sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 1000000) div n_tokens").as("oov_ppm"))
        .orderBy("source")
    }),

    "q66_fold_split" -> ((s, d) =>
      graft.ext.Sampling.withFold(Tables.documents(s, d), col("doc_id"),
          folds = Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1), salt = "r5")
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
             min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("fold")),

    // Repetition/structure quality signals (Gopher-rules family):
    // per-source averages of token/bigram repetition, symbol noise
    // and mean word length, plus the count passing the default
    // filter gates. Per-doc ratios stay UNROUNDED (only the
    // aggregates round; the filter compares unrounded values — the
    // q58 rule), so the oracle mirrors bit-for-bit.
    "q67_repetition_stats" -> ((s, d) => {
      val docs = TextStats.withRepetitionStats(Tables.documents(s, d), "text")
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             round(avg("rep_ratio"), 6).as("avg_rep_ratio"),
             round(avg("dup_bigram_ratio"), 6).as("avg_dup_bigram_ratio"),
             round(avg("symbol_ratio"), 6).as("avg_symbol_ratio"),
             round(avg("mean_word_len"), 6).as("avg_word_len"),
             sum(when(TextStats.repetitionGate, 1L)
               .otherwise(0L)).as("n_pass"))
        .orderBy("source")
    }),

    // Sequential pattern redaction (the PII-scrub mechanism on this
    // corpus's vocabulary): word-boundary patterns rewrite to
    // [LABEL] tokens in list order; the aggregate hashes both the
    // change accounting and the resulting lengths, so any divergence
    // in regex semantics or application order turns the row red.
    "q70_redaction" -> ((s, d) => {
      val patterns = Seq("SECRET" -> "\\b(key|hash)\\b", "TOOL" -> "\\bspark\\b")
      Tables.documents(s, d)
        .withColumn("redacted", TextStats.redact(col("text"), patterns))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("redacted") =!= col("text"), 1L).otherwise(0L)).as("n_redacted"),
             sum(length(col("text")).cast("long")).as("chars_before"),
             sum(length(col("redacted")).cast("long")).as("chars_after"))
        .orderBy("source")
    }),

    // Deterministic token-budget shard packing: 8 independent packing
    // lanes (bucket = doc_id % 8), documents concatenated in doc_id
    // order within a lane and cut every 5000 tokens — a document
    // starts in shard floor(cum_before / 5000). The per-shard
    // aggregate pins the cut points exactly.
    "q71_shard_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      graft.ext.Packing.packShards(docs, col("doc_id"), col("n_tokens"),
          tokenBudget = 5000L, bucket = pmod(col("doc_id"), lit(8)).cast("int"))
        .groupBy("pack_bucket", "pack_shard")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").cast("long").as("shard_tokens"),
             min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("pack_bucket", "pack_shard")
    }),

    // Domain-mixture resampling (ext.Sampling.mixtureResample): keep
    // fractions are (budget * share) / domain_count clamped to 1 —
    // src0's 0.8 share exceeds its sf0.01 population, exercising the
    // downsample-only clamp — and membership is the same md5 hash as
    // q61, so the oracle recomputes counts, fractions, thresholds and
    // membership identically (frac >= 1 means keep-all, sidestepping
    // the 9-hex-digit threshold a clamped fraction would print).
    "q72_mixture_resample" -> ((s, d) =>
      graft.ext.Sampling.mixtureResample(
          Tables.documents(s, d), col("doc_id"), col("source"),
          targetShares = Map("src0" -> 0.8, "src1" -> 0.1,
                             "src2" -> 0.05, "src3" -> 0.05),
          totalBudget = 40L, salt = "r7")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
             min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source")),

    // Context-window chunking (ext.Chunking): 40-token windows with
    // 8-token overlap (step 32) — map-side explode, no shuffle before
    // the final aggregate. The per-source totals pin chunk counts,
    // the boundary arithmetic (max_chunk_id, token sums) and the
    // exact slice content (char totals include the overlap copies).
    "q74_doc_chunking" -> ((s, d) =>
      graft.ext.Chunking.chunkDocuments(Tables.documents(s, d), col("text"),
          maxTokens = 40, overlap = 8)
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
             countDistinct("doc_id").as("n_docs"),
             sum("chunk_tokens").cast("long").as("total_chunk_tokens"),
             max("chunk_id").cast("long").as("max_chunk_id"),
             sum(length(col("chunk_text"))).cast("long").as("total_chunk_chars"))
        .orderBy("source")),

    // Token-weighted mixture resampling: same operator as q72 but the
    // budget and shares are in TOKEN units (weight = n_tokens), the
    // unit real training budgets are written in. Whole-document keep
    // decisions, so kept_tokens approximates the target share.
    "q75_token_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      graft.ext.Sampling.mixtureResample(docs, col("doc_id"), col("source"),
          targetShares = Map("src0" -> 0.4, "src1" -> 0.4, "src2" -> 0.2),
          totalBudget = 1000L, salt = "r7t", weight = col("n_tokens"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
             sum("n_tokens").cast("long").as("kept_tokens"),
             min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source")
    }),

    // The COMPLETE corpus-to-training-shards pipeline: prepareFull
    // (dedup -> near-dup CC -> gates -> lang/quality -> folds), then
    // context-window chunking (40/8), then token-budget packing into
    // ~500-token shards laned by (fold, doc_id%4). One call chain over
    // nine operators; the oracle replays every stage in one SQL.
    "q77_curation_to_shards" -> ((s, d) => {
      val prepped = graft.ext.DocPrep.prepareFull(Tables.documents(s, d),
          "doc_id", "text", stopwords = Stopwords, profiles = LangProfiles,
          minQuality = 0.5, keepLangs = Seq("de", "en", "es", "fr", "zh"),
          foldSalt = "r5")
      val chunks = graft.ext.Chunking.chunkDocuments(prepped, col("text"),
          maxTokens = 40, overlap = 8)
      graft.ext.Packing.packShards(chunks,
          orderCol = struct(col("doc_id"), col("chunk_id")),
          tokensCol = col("chunk_tokens"), tokenBudget = 500L,
          bucket = concat(col("fold"), lit(":"),
                          pmod(col("doc_id"), lit(4)).cast("string")))
        .groupBy("pack_bucket", "pack_shard")
        .agg(count(lit(1)).as("n_chunks"),
             countDistinct("doc_id").as("n_docs"),
             sum("chunk_tokens").cast("long").as("shard_tokens"),
             min("doc_id").as("min_doc"))
        .orderBy("pack_bucket", "pack_shard")
    }),

    // DSIR importance weights (Dsir.withImportanceWeights, Xie et al.
    // arXiv:2302.03169): hashed uni+bigram buckets (md5 3-hex prefix,
    // 4096 cells), Laplace-smoothed log-ratio toward the lang='en'
    // target, per-doc summed LLR. Top-20 by per-gram LLR; ordering is
    // on the ROUNDED value with doc_id tie-break, so a sub-6dp libm
    // divergence cannot flip the limit boundary.
    "q80_dsir_weights" -> ((s, d) =>
      graft.ext.Dsir.withImportanceWeights(Tables.documents(s, d),
          "doc_id", "text", isTarget = col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("source"), col("n_grams"),
                round(col("llr"), 6).as("llr"),
                round(col("llr_per_gram"), 6).as("llr_pg"))
        .orderBy(col("llr_pg").desc, col("doc_id"))
        .limit(20)),

    // Bucket-LM cross-entropy (Dsir.withCrossEntropy): nats-per-gram
    // negative log-likelihood under the corpus's own smoothed bucket
    // unigram model — the "how typical is this document" quality
    // signal, aggregated per (lang, source).
    "q81_bucket_lm_xent" -> ((s, d) =>
      graft.ext.Dsir.withCrossEntropy(Tables.documents(s, d), "doc_id", "text")
        .filter(col("n_grams") > 0)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
             round(avg("xent"), 6).as("avg_xent"),
             round(min("xent"), 6).as("min_xent"),
             round(max("xent"), 6).as("max_xent"))
        .orderBy("lang", "source")),

    // Efraimidis-Spirakis weighted sampling without replacement
    // (Sampling.weightedSampleK): exactly 8 docs per source with
    // selection probability proportional to token count, priorities
    // content-derived (md5 -> exact 52-bit uniform) so the sample is
    // a pure function of the corpus — reproducible on any engine,
    // under any partitioning.
    "q107_weighted_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      graft.ext.Sampling.weightedSampleK(docs, col("doc_id"), col("n_tokens"),
          "source", k = 8, salt = "r9es")
        .select(col("source"), col("rnk"), col("doc_id"),
                col("n_tokens").cast("long").as("n_tokens"), col("priority_h"))
        .orderBy("source", "rnk")
    }),

    // Deterministic negative sampling — contrastive-pair generation:
    // each doc draws 3 pseudo-random OTHER docs, indices md5-derived
    // (the q107 exact-integer move) mod corpus size, self-collisions
    // bumped +1. Indices are drawn in DENSE POSITION space
    // (Kernels.denseIndex: rank of doc_id in sorted order), never
    // against doc_id itself — so sparse or string ids sample
    // correctly (the r9 form silently sampled nothing off a dense-id
    // corpus). One extra staged pass builds the index; the draw stays
    // map-side and the only join is the position→doc enrichment.
    // On this testdata doc_id IS 0..n-1, so dense == doc_id and the
    // output matches the r9 form bit-for-bit.
    "q119_negative_sampling" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "source")
      graft.ext.Sampling.negativeSamples(docs, "doc_id", negsPerDoc = 3,
          salt = "neg9")
        .join(docs.select(col("doc_id").as("neg_id"),
                          col("source").as("neg_source")), "neg_id")
        .groupBy("source", "neg_source")
        .agg(count(lit(1)).as("n_pairs"),
             countDistinct("neg_id").as("n_distinct_negs"))
        .orderBy("source", "neg_source")
    }),

    // Corpus-trained bigram language model → per-source NLL — the
    // LM-quality signal (train an n-gram LM on the corpus, score each
    // document's negative log-likelihood; outliers are boilerplate or
    // garbage). Add-1-smoothed p(w2|w1) = (c12+1)/(c1+V) from EXACT
    // global counts (the model "training" is two aggregates; the
    // count frames broadcast — vocabulary-sized); each bigram's
    // ln p is FLOORED to integer nano-nats before summing (the q208
    // cross-cell rule — a float sum of logs is partial-agg-order
    // dependent, a sum of floored integers is not). DSIR's bucket
    // xent (q81) is the hashed-feature sibling; this is the token-
    // bigram LM itself.
    "q252_bigram_lm_nll" -> ((s, d) => {
      val wi = Window.partitionBy("doc_id").orderBy("p")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          posexplode(split(col("text"), " ")).as(Seq("p", "w")))
        .filter(length(col("w")) > 0)
      val bi = graft.ops.Staging.stage(
        toks.withColumn("w2", lead("w", 1).over(wi))
          .filter(col("w2").isNotNull)
          .select(col("doc_id"), col("source"), col("w").as("w1"),
                  col("w2")))
      val cxy = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val cx = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = toks.agg(countDistinct("w").as("v"))
      bi.join(broadcast(cxy), Seq("w1", "w2"))
        .join(broadcast(cx), Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"), col("source"),
          // explicit DOUBLE casts (the q293/q291 rule): a bare 1.0 is
          // a DECIMAL literal and Spark's decimal division quantizes
          // at a clamped scale where DuckDB's returns double
          expr("CAST(floor(1000000000.0 * " +
            "ln((CAST(c12 AS DOUBLE) + 1.0) / CAST(c1 + v AS DOUBLE))) " +
            "AS BIGINT)").as("nano"))
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
             count(lit(1)).as("n_bigrams"),
             (-sum("nano")).as("total_nll_nano"))
        .select(col("source"), col("n_docs"), col("n_bigrams"),
          col("total_nll_nano"),
          expr("total_nll_nano div n_bigrams").as("avg_nll_nano"))
        .orderBy("source")
    }),

    // Content-defined chunking (the rolling-boundary primitive under
    // rsync/LBFS/storage dedup, and the chunk-level dedup signal a
    // training-data lake uses to price re-crawls): a position opens a
    // chunk iff the md5 of its 8-char window lands in 1/32 of hash
    // space — boundaries move WITH content, so an insertion re-chunks
    // only its neighborhood where fixed-width blocks would shift
    // every later block. The boundary scan + chunk cut is the
    // Chunking.contentDefinedChunks mapPartitions kernel (the
    // holtLinear secondary-sort idiom minus the sort — chunking is
    // per-document): the text crosses the wire ONCE inside its scan
    // task and chunks are emitted directly, where the per-position
    // explode + lead() window formulation shipped the FULL document
    // text on every boundary row through the window exchange —
    // quadratic in document length (the r13 weak flag). Chunks are
    // then keyed by content hash and the per-source dedup ledger
    // (total vs unique bytes) falls out of one aggregate. Work is
    // O(total chars) map-side + one exchange per rollup; everything
    // is exact integers and md5 — the oracle replays
    // boundary-for-boundary (ChunkingSpec pins kernel ≡ the
    // expression replay; PlanShapeSpec pins no Window/Generate).
    "q251_cdc_chunking" -> ((s, d) => {
      val chunks = graft.ext.Chunking.contentDefinedChunks(
        Tables.documents(s, d).select("source", "text"),
        "text", Seq("source"))
      chunks
        .select(col("source"), md5(col("chunk")).as("ch"),
                length(col("chunk")).cast("long").as("clen"))
        .groupBy("source", "ch")
        .agg(count(lit(1)).as("n"), max("clen").as("clen"))
        .groupBy("source")
        .agg(sum("n").as("n_chunks"), count(lit(1)).as("n_unique"),
             sum(col("n") * col("clen")).as("bytes_total"),
             sum("clen").as("bytes_unique"))
        .withColumn("dup_ratio_ppm",
          expr("((bytes_total - bytes_unique) * 1000000) div bytes_total"))
        .orderBy("source")
    }),

    // Rendezvous (highest-random-weight) shard assignment + rebalance
    // census — the consistent-hashing primitive a 100 TB lake uses to
    // place documents on shards so that GROWING the shard count moves
    // only ~1/(k+1) of the corpus (plain `hash mod k` moves
    // (k-1)/k — a full reshuffle). shard(doc) = argmax over shards of
    // md5(doc#shard); the argmax needs only a TOTAL ORDER, so both
    // engines compare the fixed-length hex strings directly (no
    // numeric parse). Emits the k=32 occupancy spread and the
    // measured moved fraction at k=33 — HRW guarantees movers are
    // exactly the docs whose k=33 argmax IS the new shard. Scale: the
    // 33x explode is map-side, the argmax is one map-side-combining
    // exchange on doc_id, everything after is shard-bounded.
    "q263_rendezvous_shards" -> ((s, d) => {
      val hh = Tables.documents(s, d).select(col("doc_id"))
        .select(col("doc_id"), explode(expr("sequence(0, 32)")).as("sh"))
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit("#"),
          col("sh").cast("string"))))
      val a32 = hh.filter(col("sh") < 32).groupBy("doc_id")
        .agg(max(struct(col("h"), col("sh"))).as("m"))
        .select(col("doc_id"), col("m.sh").as("s32"))
      val a33 = hh.groupBy("doc_id")
        .agg(max(struct(col("h"), col("sh"))).as("m"))
        .select(col("doc_id"), col("m.sh").as("s33"))
      val j = graft.ops.Staging.stage(a32.join(a33, "doc_id"))
      val occ = j.groupBy("s32").agg(count(lit(1)).as("c"))
        .agg(min("c").as("occ_min"), max("c").as("occ_max"),
             count(lit(1)).as("n_shards"))
      j.agg(count(lit(1)).as("n_docs"),
            sum(when(col("s33") =!= col("s32"), 1L).otherwise(0L))
              .as("n_moved"))
        .crossJoin(broadcast(occ))
        .select(col("n_docs"), col("n_shards"), col("occ_min"),
          col("occ_max"), col("n_moved"),
          expr("(n_moved * 1000000) div n_docs").as("moved_ppm"))
        .orderBy("n_docs")
    }),

    // Dataset-card crosstab — the (source × lang) composition table a
    // corpus release ships first (q154's manifest is per-shard; this
    // is the content-mix margin): docs, exact token mass, floor-mean
    // tokens per doc, and each cell's share of the corpus token mass
    // in floor-ppm. One token-count scan, cell frame bounded by
    // |sources|×|langs|.
    "q306_dataset_card" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          expr("CAST(size(filter(split(text, ' '), " +
            "x -> length(x) > 0)) AS BIGINT)").as("__n"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_tokens"))
      val tot = cells.agg(sum("n_tokens").as("__tt"))
      cells.crossJoin(broadcast(tot))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          expr("n_tokens div n_docs").as("mean_tokens_floor"),
          expr("(n_tokens * 1000000) div __tt").as("token_share_ppm"))
        .orderBy("source", "lang")
    }),

    // Lexical-diversity census per source — type-token ratio and
    // hapax share, the vocabulary-health dials beside q98's entropy
    // and q196's Zipf slope (template-generated text shows low TTR;
    // OCR noise shows hapax inflation). One token scan, per-source
    // word-count frames bound everything, floor-ppm ratios.
    "q298_lexical_diversity" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("__c"))
      words.groupBy("source")
        .agg(sum("__c").as("n_tokens"), count(lit(1)).as("n_types"),
             sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          expr("(n_types * 1000000) div n_tokens").as("ttr_ppm"),
          expr("(n_hapax * 1000000) div n_types").as("hapax_ppm"))
        .orderBy("source")
    }),

    // Readability census per source — Flesch reading ease (Flesch
    // 1948, the standard document-quality dial next to q28's Gopher
    // rules) computed corpus-level from summed INTEGER counts: words
    // = non-space runs, syllables = the vowel-group heuristic
    // ([aeiouy]+ runs — the classic approximation), sentences =
    // terminal punctuation with a max(1, ·) per-doc fallback (the
    // fragment convention — this synthetic corpus carries none, so
    // the fallback is load-bearing and tested). The score itself is
    // the SHARED floored-milli expression over those integers, so
    // both engines run one IEEE sequence. One map-side scan, a
    // source-sized aggregate.
    "q323_readability" -> ((s, d) => {
      Tables.documents(s, d).select(col("source"),
          expr("CAST(regexp_count(text, '\\\\S+') AS BIGINT)").as("w"),
          expr("CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)").as("syl"),
          expr("CAST(greatest(1, regexp_count(text, '[.!?]')) AS BIGINT)").as("st"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
             sum("syl").as("syllables"), sum("st").as("sentences"))
        .select(col("source"), col("n_docs"), col("words"),
          col("syllables"), col("sentences"),
          expr(FleschMilli).as("flesch_milli"))
        .orderBy("source")
    }),

    // HEAPS'-LAW vocabulary growth fit per source — V(N) ~ K * N^beta
    // estimated by log-log OLS over the vocabulary-size curve sampled
    // at POWER-OF-TWO document prefixes: the corpus-scaling diagnostic
    // ("how fast does new text stop bringing new words") that q328's
    // point-estimate unseen mass extends to a curve. The power-of-two
    // sampling is the scale trick: <= log2(n_docs)+1 points per source
    // at ANY corpus size, so the log-sum OLS runs on a bounded frame
    // (the q196 form) while V and N at each point are exact integers
    // (first-occurrence ranks joined to the point thresholds — vocab x
    // ~40 rows through one shuffle, linear in vocabulary). Doc order =
    // doc_id (deterministic prefix definition on both engines).
    "q342_heaps_law" -> ((s, d) => {
      val wS = Window.partitionBy("source").orderBy("doc_id")
      val docs = graft.ops.Staging.stage(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            expr("filter(split(text, ' '), t -> length(t) > 0)").as("__ws"))
          .withColumn("r", row_number().over(wS))
          .withColumn("cum_n",
            sum(size(col("__ws")).cast("long"))
              .over(wS.rowsBetween(Window.unboundedPreceding, 0))))
      val points = docs
        .filter(expr("(r & (r - 1)) = 0") && col("cum_n") > 0)
        .select(col("source"), col("r").as("pr"), col("cum_n"))
      val fo = docs.select(col("source"), col("r"),
          explode(col("__ws")).as("w"))
        .groupBy("source", "w").agg(min("r").as("fo"))
      val v = fo.join(points, Seq("source"))
        .filter(col("fo") <= col("pr"))
        .groupBy("source", "pr").agg(count(lit(1)).as("vsz"))
      points.join(v, Seq("source", "pr"))
        .withColumn("__x", log(col("cum_n").cast("double")))
        .withColumn("__y", log(col("vsz").cast("double")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_points"),
             sum("__x").as("__sx"), sum("__y").as("__sy"),
             sum(col("__x") * col("__x")).as("__sxx"),
             sum(col("__x") * col("__y")).as("__sxy"))
        .select(col("source"), col("n_points"),
          round((col("n_points") * col("__sxy") - col("__sx") * col("__sy")) /
                (col("n_points") * col("__sxx") - col("__sx") * col("__sx")), 6)
            .as("heaps_beta"),
          round((col("__sy") - ((col("n_points") * col("__sxy") -
                  col("__sx") * col("__sy")) /
                 (col("n_points") * col("__sxx") - col("__sx") * col("__sx"))) *
                col("__sx")) / col("n_points"), 6).as("heaps_logk"))
        .orderBy("source")
    }),

    // Pairwise SOURCE-LM KL divergence — KL(P_a || P_b) between every
    // ordered source pair's Laplace(+1)-smoothed unigram LMs over the
    // JOINT vocabulary: the directional corpus-shift matrix behind
    // "which source least represents which" (q269's PSI is the
    // symmetrized two-bucket cousin; this is the full asymmetric
    // measure on the real vocabulary). Per-term contributions are
    // floored nano-nats (the q269 rule — no float sum-order hazard),
    // products go through DOUBLE before multiplying (BIGINT
    // c*(n+V) would overflow at corpus scale), and ln(p/q) is the
    // ratio-of-integers form shared textually with the oracle. Scale
    // shape: everything after the token count is (sources x vocab)-
    // bounded — the corpus is scanned once.
    "q331_source_kl" -> ((s, d) =>
      // default valve settings (minCount=1, no topV) == the full
      // joint vocabulary, matching the oracle's un-cut replay; the
      // operator's scaladoc documents the sources×|V| grid bound and
      // the top-V/min-count valve for web-scale vocabularies
      graft.ext.Dsir.sourceKlMatrix(Tables.documents(s, d), "source", "text")
        .orderBy("source_a", "source_b")),

    // Token-budget shard packing under the TRAINED BPE tokenizer
    // (r16 verdict item 7): q71 packs on whitespace counts, but a
    // training run's shard budget is in TOKENIZER tokens — whitespace
    // under-counts subword-heavy text 2-4x, so whitespace-packed
    // shards blow the real budget. Trains the q143 merges (k=4,
    // driver-held literals), counts per-doc BPE tokens map-side
    // (Bpe.docTokenCounts — wordless docs zero-filled), and runs the
    // q71 packShards lanes/cut rule on those counts. The oracle
    // (Bpe.packingOracleSql) replays train -> per-doc count -> pack
    // from one generator so the three stages cannot drift.
    "q345_bpe_shard_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.ext.Bpe.learnMerges(docs, "text", k = 4)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val counts = graft.ext.Bpe.docTokenCounts(docs, "doc_id", "text", merges)
      val withTok = docs.select(col("doc_id"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bpe_tokens"), lit(0L)).as("n_tokens"))
      graft.ext.Packing.packShards(withTok, col("doc_id"), col("n_tokens"),
          tokenBudget = 5000L, bucket = pmod(col("doc_id"), lit(8)).cast("int"))
        .groupBy("pack_bucket", "pack_shard")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").cast("long").as("shard_tokens"),
             min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("pack_bucket", "pack_shard")
    }),

    // Tokenizer FERTILITY per language — BPE tokens per whitespace
    // token, the ratio that drives per-language token budgeting (a
    // language the tokenizer fragments 2x eats 2x the training budget
    // for the same text): q345's trained-merge per-doc counts joined
    // to the language column, integer floor-milli ratio. The oracle
    // reuses the q345 per-doc-count CTE generator verbatim.
    "q350_tokenizer_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.ext.Bpe.learnMerges(docs, "text", k = 4)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val bpe = graft.ext.Bpe.docTokenCounts(docs, "doc_id", "text", merges)
      docs.select(col("doc_id"), col("lang"),
          TextStats.tokenCount(col("text")).cast("long").as("ws"))
        .join(bpe, Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             sum("ws").as("ws_tokens"),
             sum(coalesce(col("n_bpe_tokens"), lit(0L))).as("bpe_tokens"))
        .select(col("lang"), col("n_docs"), col("ws_tokens"),
          col("bpe_tokens"),
          expr("CASE WHEN ws_tokens > 0 THEN " +
            "(bpe_tokens * 1000) div ws_tokens " +
            "ELSE CAST(NULL AS BIGINT) END").as("fertility_milli"))
        .orderBy("lang")
    }),

    // Good-Turing unseen-mass census per source (Good 1953): the
    // probability mass an LM should reserve for UNSEEN words is
    // N1/N (singleton types over tokens), and the smoothed count for
    // once-seen words is r* = 2*N2/N1 — the frequency-of-frequencies
    // arithmetic behind every Katz/SGT smoother and the
    // vocabulary-saturation dial of corpus collection (N1/N falling
    // means new text repeats known words). All-integer outputs
    // (floor-ppm / floor-milli on exact counts); two tiny aggregates
    // over the token-count frame.
    "q328_good_turing" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("__c"))
      wc.groupBy("source")
        .agg(sum("__c").as("n_tokens"), count(lit(1)).as("n_types"),
             sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n1"),
             sum(when(col("__c") === 2, 1L).otherwise(0L)).as("n2"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n1"), col("n2"),
          expr("(n1 * 1000000) div n_tokens").as("gt_unseen_ppm"),
          expr("CASE WHEN n1 > 0 THEN (2000 * n2) div n1 " +
            "ELSE CAST(NULL AS BIGINT) END").as("r1_star_milli"))
        .orderBy("source")
    }),

    // Perplexity FILTERING (the CCNet/CC-100 pipeline step q252's
    // corpus NLL implies): train the +1-smoothed bigram LM on the
    // even-doc half, score each odd-half document's per-bigram NLL,
    // and keep documents at or below the TRAIN corpus's own average
    // — a self-calibrating threshold, no tuned constant. Unseen
    // odd-half bigrams smooth to 1/(c1+V) through the same shared
    // floored-nano-nat term (left joins + coalesce(0)), so OOV text
    // scores high NLL and drops — exactly the filter's job. Census
    // per source: docs kept at the threshold, floor-ppm keep rate.
    // Count frames are vocabulary-sized broadcasts; the corpus is
    // scanned once per side.
    "q291_perplexity_filter" -> ((s, d) => {
      val wi = Window.partitionBy("doc_id").orderBy("p")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          posexplode(split(col("text"), " ")).as(Seq("p", "w")))
        .filter(length(col("w")) > 0)
      val bi = graft.ops.Staging.stage(
        toks.withColumn("w2", lead("w", 1).over(wi))
          .filter(col("w2").isNotNull)
          .select(col("doc_id"), col("source"),
                  pmod(col("doc_id"), lit(2L)).as("par"),
                  col("w").as("w1"), col("w2")))
      val train = bi.filter(col("par") === 0)
      val cxy = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val cx = train.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = toks.filter(pmod(col("doc_id"), lit(2L)) === 0)
        .agg(countDistinct("w").as("v"))
      // explicit DOUBLE casts (the q293 rule): Spark's bare 1.0 is a
      // DECIMAL literal and decimal division quantizes where DuckDB's
      // returns double — double + 1.0 stays double on both engines
      val nanoTerm = "CAST(floor(1000000000.0 * " +
        "ln((CAST(coalesce(c12, 0) AS DOUBLE) + 1.0) / CAST(coalesce(c1, 0) + v AS DOUBLE))) AS BIGINT)"
      val thr = train
        .join(broadcast(cxy), Seq("w1", "w2"), "left")
        .join(broadcast(cx), Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .select(expr(nanoTerm).as("nano"))
        .agg(expr("(-sum(nano)) div count(1)").as("thr_nano"))
      val docs = bi.filter(col("par") === 1)
        .join(broadcast(cxy), Seq("w1", "w2"), "left")
        .join(broadcast(cx), Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .select(col("doc_id"), col("source"), expr(nanoTerm).as("nano"))
        .groupBy("doc_id", "source")
        .agg(expr("(-sum(nano)) div count(1)").as("__doc_nll"))
      docs.crossJoin(broadcast(thr))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("__doc_nll") <= col("thr_nano"), 1L)
               .otherwise(0L)).as("n_kept"),
             max("thr_nano").as("thr_nano"))
        .withColumn("kept_ppm", expr("(n_kept * 1000000) div n_docs"))
        .orderBy("source")
    }),

    // Sequence-length bucketing pad-waste audit — the batch-shape
    // dial of training-data packing (q71 packs shards; this prices
    // PADDING): pad-to-max within a power-of-two length bucket
    // (integer bit-length, the q286 rule) vs pad-to-global-max, per
    // bucket: docs, real tokens, padded slots, waste in floor-ppm —
    // the number that says whether length-bucketed batching is worth
    // the shuffle. All exact integers off one token-count scan.
    "q294_pad_waste" -> ((s, d) => {
      val lens = Tables.documents(s, d)
        .select(expr("CAST(size(filter(split(text, ' '), " +
          "x -> length(x) > 0)) AS BIGINT)").as("n"))
        .filter(col("n") > 0)
      val buckets = lens
        .select((length(expr("bin(n)")) - 1).cast("long").as("bucket"),
                col("n"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_tokens"),
             max("n").as("max_tokens"))
        .select(col("bucket"), col("n_docs"), col("sum_tokens"),
          col("max_tokens"),
          (col("n_docs") * col("max_tokens") - col("sum_tokens"))
            .as("pad_tokens"),
          expr("((n_docs * max_tokens - sum_tokens) * 1000000) " +
            "div (n_docs * max_tokens)").as("waste_ppm"))
      buckets.orderBy("bucket")
    }),

    // Interpolated KNESER-NEY bigram NLL — the smoother the KenLM
    // perplexity filters (CCNet, CC-100, RedPajama) actually run,
    // where q252/q291 use add-1: p(w2|w1) = (max(c12-D,0) + D·N1+(w1·)
    // ·pcont(w2)) / c1 with absolute discount D = 0.75 and the
    // CONTINUATION probability pcont(w2) = N1+(·w2)/B — "how many
    // contexts does w2 complete", the fix for high-frequency words
    // that only ever follow one context. Training is four aggregates
    // over the staged bigram frame (pair counts, left counts +
    // follower fan-out, predecessor fan-in, distinct-bigram total) —
    // all vocabulary-sized broadcasts like q252 (at web scale the
    // count frames flip to shuffle joins; the plan is otherwise
    // unchanged). Per-bigram ln p is floored to integer nano-nats
    // before any sum (the q208 cross-cell rule), so per-doc NLL,
    // the global per-bigram mean, and the flagged-docs census are
    // exact integers end to end. Flag = doc's avg NLL above the
    // corpus's own per-bigram average — the same self-calibrating
    // threshold shape as q291, under the production smoother.
    "q351_kneser_ney_nll" -> ((s, d) => {
      val wi = Window.partitionBy("doc_id").orderBy("p")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          posexplode(split(col("text"), " ")).as(Seq("p", "w")))
        .filter(length(col("w")) > 0)
      val bi = graft.ops.Staging.stage(
        toks.withColumn("w2", lead("w", 1).over(wi))
          .filter(col("w2").isNotNull)
          .select(col("doc_id"), col("source"), col("w").as("w1"),
                  col("w2")))
      val cxy = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val cx = bi.groupBy("w1")
        .agg(count(lit(1)).as("c1"), countDistinct("w2").as("nfol"))
      val pre = bi.groupBy("w2").agg(countDistinct("w1").as("npre"))
      val bt = cxy.agg(count(lit(1)).as("bt"))
      val perDoc = graft.ops.Staging.stage(bi
        .join(broadcast(cxy), Seq("w1", "w2"))
        .join(broadcast(cx), Seq("w1"))
        .join(broadcast(pre), Seq("w2"))
        .crossJoin(broadcast(bt))
        .select(col("doc_id"), col("source"), expr(KnTermNano).as("nano"))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("nb"), (-sum("nano")).as("doc_nll"))
        .withColumn("doc_avg", expr("doc_nll div nb")))
      val g = perDoc.agg(
        expr("CAST(sum(doc_nll) div sum(nb) AS BIGINT)").as("g_avg"))
      perDoc.crossJoin(broadcast(g))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nb").as("n_bigrams"),
             sum("doc_nll").as("total_nll_nano"),
             sum(when(col("doc_avg") > col("g_avg"), 1L).otherwise(0L))
               .as("n_flagged"))
        .select(col("source"), col("n_docs"), col("n_bigrams"),
          col("total_nll_nano"),
          expr("total_nll_nano div n_bigrams").as("avg_nll_nano"),
          col("n_flagged"),
          expr("(n_flagged * 1000000) div n_docs").as("flagged_ppm"))
        .orderBy("source")
    }),

    // INTER-JUDGE AGREEMENT — Cohen's kappa and linear-weighted kappa
    // per source between two deterministic 3-level quality raters
    // (judge A: token-count bands; judge B: stopword-density bands —
    // integer-threshold stand-ins with the exact compute shape of two
    // LLM-judge / heuristic-rater columns). This is the
    // agreement-beyond-chance audit every labeling/RLHF pipeline runs
    // before trusting a judge ensemble: kappa = (p_o - p_e)/(1 - p_e)
    // computed entirely in INTEGER cell counts — kappa_ppm =
    // floor(1e6 * (a*n - S)/(n^2 - S)) with S = sum_i r_i*c_i, and
    // the linear-weighted form 1 - n*D_o/E from the disagreement
    // distance D_o = sum |i-j|*o_ij — so the only float op is the
    // final shared-text division (products stay < 2^53 to ~1e7 docs
    // per source; the q305 DECIMAL cast is the valve beyond). One
    // map-side classification pass + one exchange on source; NULL
    // when the chance denominator degenerates (all mass in one band).
    "q355_judge_agreement" -> ((s, d) => {
      val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
      val base = Tables.documents(s, d).select(col("source"),
        expr("CAST(size(filter(split(text, ' '), x -> length(x) > 0)) " +
          "AS BIGINT)").as("ntok"),
        expr(s"CAST(size(filter(split(text, ' '), x -> x IN ($stopList)))" +
          " AS BIGINT)").as("nstop"))
      val graded = base.select(col("source"),
        expr("CAST(CASE WHEN ntok >= 60 THEN 2 WHEN ntok >= 35 THEN 1 " +
          "ELSE 0 END AS BIGINT)").as("ga"),
        expr("CAST(CASE WHEN 6 * nstop >= ntok THEN 2 " +
          "WHEN 9 * nstop >= ntok THEN 1 ELSE 0 END AS BIGINT)").as("gb"))
      graded.groupBy("source")
        .agg(count(lit(1)).as("n"),
             sum(when(col("ga") === col("gb"), 1L).otherwise(0L)).as("a"),
             sum(abs(col("ga") - col("gb"))).as("dd"),
             sum(when(col("ga") === 0, 1L).otherwise(0L)).as("ra0"),
             sum(when(col("ga") === 1, 1L).otherwise(0L)).as("ra1"),
             sum(when(col("ga") === 2, 1L).otherwise(0L)).as("ra2"),
             sum(when(col("gb") === 0, 1L).otherwise(0L)).as("cb0"),
             sum(when(col("gb") === 1, 1L).otherwise(0L)).as("cb1"),
             sum(when(col("gb") === 2, 1L).otherwise(0L)).as("cb2"))
        .withColumn("s", expr("ra0*cb0 + ra1*cb1 + ra2*cb2"))
        .withColumn("e", expr("ra0*cb1 + 2*ra0*cb2 + ra1*(cb0+cb2) + " +
          "2*ra2*cb0 + ra2*cb1"))
        .select(col("source"), col("n").as("n_docs"),
          col("a").as("n_agree"), expr(KappaPpm).as("kappa_ppm"),
          expr(WkappaPpm).as("wkappa_ppm"))
        .orderBy("source")
    }),

    // DIFFERENTIALLY-PRIVATE noisy census (Dwork et al. 2006): the
    // (source, lang) count release with Laplace(1/eps) noise — the
    // privacy valve a corpus publisher runs before sharing
    // composition stats, completing the suite's privacy ladder
    // (k-anonymity q152, generalization q265, l-diversity q283).
    // Count queries have sensitivity 1, so noise is b = 1/eps; the
    // inverse-CDF draw X = sgn(u-1/2) * (-b * ln(1 - 2|u-1/2|)) runs
    // on a per-group uniform u = (h + 1/2)/2^52 derived from the
    // md5 of the group key — a SEEDED stand-in for the CSPRNG with
    // the exact compute shape of the real mechanism (the q142
    // hashed-weights convention: deterministic so the gate can
    // hash-compare; swap in rand() and the plan is unchanged). The
    // group-keyed seed makes the noise STICKY across re-releases —
    // repeated queries don't average it away (the RAPPOR memoization
    // rule). Two eps points (1 and 1/4) show the budget dial. One
    // exchange; noise is map-side shared text over the exact count.
    "q356_dp_noisy_census" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("c"))
        .withColumn("h", conv(substring(md5(concat(col("source"),
            lit("|"), col("lang"), lit("|dp18"))), 1, 13), 16, 10)
          .cast("long"))
        .select(col("source"), col("lang"),
          expr(DpNoisyMilli("1")).as("noisy_eps1_milli"),
          expr(DpNoisyMilli("0.25")).as("noisy_eps025_milli"))
        .orderBy("source", "lang")),

    // EMPIRICAL-BAYES shrinkage of per-group quality rates
    // (ext.EmpiricalBayes — the Robbins/Efron-Morris construction):
    // the (source, lang) keep rate under the ntok >= 35 gate, pulled
    // toward the population mean with force inversely proportional
    // to group size — the fix for the tiny-domain 100%-keep-rate
    // mirage every curation dashboard hits. Beta prior fit by method
    // of moments ON THE RATE POPULATION: each group's rate floors to
    // integer nanos BEFORE the cross-group sums (the cross-cell
    // rule), so m1/m2/prior-strength derive from exact integer
    // aggregates and both engines run the identical shared texts.
    // Two exchanges (group agg, 1-row moment frame broadcast back);
    // PropertySpec pins the shrinkage contracts (between raw and the
    // population mean; equal raw rates — smaller n shrinks harder).
    "q360_eb_shrunk_rates" -> ((s, d) => {
      val groups = graft.ops.Staging.stage(Tables.documents(s, d)
        .select(col("source"), col("lang"),
          expr("CAST(CASE WHEN size(filter(split(text, ' '), " +
            "x -> length(x) > 0)) >= 35 THEN 1 ELSE 0 END AS BIGINT)")
            .as("kept"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n"), sum("kept").as("k"))
        .withColumn("r", expr(graft.ext.EmpiricalBayes.RateNano))
        .withColumn("r2", expr(graft.ext.EmpiricalBayes.Rate2Nano)))
      val mom = groups.agg(sum("r").as("sr"), sum("r2").as("sr2"),
        count(lit(1)).as("g"))
      groups.crossJoin(broadcast(mom))
        .select(col("source"), col("lang"), col("n"), col("k"),
          expr("CAST(floor(1000000.0 * CAST(k AS DOUBLE) / " +
            "CAST(n AS DOUBLE)) AS BIGINT)").as("raw_ppm"),
          expr(graft.ext.EmpiricalBayes.AbMilli).as("prior_ab_milli"),
          expr(graft.ext.EmpiricalBayes.ShrunkPpm).as("shrunk_ppm"))
        .orderBy("source", "lang")
    }),

    // CHAO1 species-richness floor + Good-Turing sample coverage per
    // source (Chao 1984; Good 1953) — the "how much vocabulary
    // remains unseen" dial of corpus-collection planning, one step
    // past q328's unseen-MASS estimate: Chao1 lower-bounds the number
    // of unseen TYPES from the singleton/doubleton census, and
    // coverage C = 1 - f1/N says what fraction of future tokens will
    // be known words. The bias-corrected form
    // V + f1(f1-1)/(2(f2+1)) is defined even at f2 = 0 and is PURE
    // INTEGER arithmetic in floor-milli — no float anywhere in the
    // query (products bounded by f1^2 <= V^2; DECIMAL valve beyond
    // ~3e9 types). Same two-aggregate shape as q328: a
    // frequency-of-frequencies census never materializes the corpus.
    "q361_chao1_richness" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("__c"))
      wc.groupBy("source")
        .agg(sum("__c").as("n_tokens"), count(lit(1)).as("n_types"),
             sum(when(col("__c") === 1, 1L).otherwise(0L)).as("f1"),
             sum(when(col("__c") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("f1"), col("f2"),
          expr("1000 * n_types + (1000 * f1 * (f1 - 1)) " +
            "div (2 * (f2 + 1))").as("chao1_milli"),
          expr("(1000 * f1 * (f1 - 1)) div (2 * (f2 + 1))")
            .as("unseen_types_milli"),
          expr("((n_tokens - f1) * 1000000) div n_tokens")
            .as("coverage_ppm"))
        .orderBy("source")
    }),

    // BURROWS' DELTA stylometric distance between sources (Burrows
    // 2002) — the authorship/register fingerprint over FUNCTION-word
    // rates that a provenance audit runs when two "different" crawl
    // sources are suspected of being the same generator: take the
    // top-20 corpus words by global count (deterministic (count,
    // word) tiebreak), per-source rates in floor-ppm (exact
    // integers), z-score each word ACROSS sources — z = (g*f - sf) /
    // sqrt(g*sf2 - sf^2), numerator and radicand exact integers, the
    // zero-variance guard an INTEGER compare — and Delta(a,b) = mean
    // |z_a - z_b|, each term floored to nano before the integer sum
    // (the cross-cell rule). Everything after the (source, word)
    // count shuffle is bounded by sources x 20; the pair frame is
    // source-pairs sized. Zero-filled grid via a broadcast cross of
    // totals x top words so absent combos score f = 0, not missing.
    "q363_burrows_delta" -> ((s, d) => {
      val sw = graft.ops.Staging.stage(
        Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("source", "w").agg(count(lit(1)).as("c")))
      val totals = sw.groupBy("source").agg(sum("c").as("tot"))
      // top-20 cut rides TakeOrderedAndProject (the ops/Kernels topK
      // idiom — per-partition heaps, no single-partition window
      // exchange over the vocabulary-sized frame); the (gc desc,
      // w asc) tiebreak matches the oracle's row_number ordering
      val top = sw.groupBy("w").agg(sum("c").as("gc"))
        .orderBy(col("gc").desc, col("w")).limit(20).select("w")
      val grid = graft.ops.Staging.stage(
        totals.crossJoin(broadcast(top))
          .join(sw, Seq("source", "w"), "left")
          .select(col("source"), col("w"),
            expr("(coalesce(c, 0) * 1000000) div tot").as("f")))
      val st = grid.groupBy("w").agg(sum("f").as("sf"),
        sum(col("f") * col("f")).as("sf2"), count(lit(1)).as("g"))
      val z = graft.ops.Staging.stage(
        grid.join(broadcast(st), "w")
          .select(col("source"), col("w"), expr(BurrowsZ).as("z")))
      z.join(z.select(col("source").as("source_b"), col("w"),
          col("z").as("zb")), Seq("w"))
        .filter(col("source") < col("source_b"))
        .select(col("source").as("source_a"), col("source_b"),
          expr("CAST(floor(1000000000.0 * abs(z - zb)) AS BIGINT)")
            .as("t"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_words"), sum("t").as("sum_nano"))
        .select(col("source_a"), col("source_b"), col("n_words"),
          col("sum_nano"), expr("sum_nano div n_words").as("delta_nano"))
        .orderBy("source_a", "source_b")
    }),

    // TEMPERATURE-SAMPLED mixture shares (the mT5 / XLM-R α-sampling
    // rule, arXiv:1910.10683 §3.4.2 convention w_i ∝ n_i^α at
    // α = 0.3): the multilingual/multi-source reweighting that lifts
    // low-resource sources without the fixed-share guesswork of
    // q72/q75 — shares DERIVE from the supply counts. Per source:
    // exact token supply, natural share, α-share (n^0.3 floored to
    // integer micros ONCE — shared exp/ln text — then exact integer
    // share division), the token allocation at the q161-convention
    // 60% budget, and the implied epochs over the source's own
    // supply in floor-milli (epochs > 1000 marks the upsampled
    // low-resource tail). Everything after the per-source token
    // aggregate is a |sources|-row frame; the 1-row totals broadcast.
    // BIGINT headroom: the binding product is w_micro * budget ≈
    // 6e5 * N^1.3 for a dominant source, which crosses 2^63 at
    // N ≈ 1.4e10 corpus tokens — flip the product to DECIMAL(38,0)
    // beyond that (the Bradley-Terry valve convention).
    "q369_temperature_mixture" -> ((s, d) => {
      // staged: caps fans out to the totals row AND the final select —
      // without the persist the corpus scan + aggregate run twice
      // (r19 review; the CLAUDE.md stage-before-fanout invariant)
      val caps = graft.ops.Staging.stage(Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(TextStats.tokenCount(col("text"))).as("n_tokens"))
        .withColumn("w_micro", expr(TempWMicro)))
      val tot = caps.agg(sum("n_tokens").as("tot_n"),
        sum("w_micro").as("tot_w"))
      caps.crossJoin(broadcast(tot))
        .select(col("source") +: col("n_tokens") +:
          tempMixCols("div").map { case (n, t) => expr(t).as(n) }: _*)
        .orderBy("source")
    }),

    // POISSON BOOTSTRAP of the gate pass rate — the DISTRIBUTED
    // bootstrap (Chamandy et al., Google 2012): classical resampling
    // needs the whole corpus addressable per replicate, impossible at
    // 100 TB; the Poisson form gives every document an independent
    // Poisson(1) weight per replicate in the SAME single scan, so 40
    // replicates cost one pass with 40x map-side row amplification
    // into a 40-key partial aggregate — no resample shuffle, no
    // second scan. Weights are seeded integers: the md5 first-8-hex
    // value of (doc_id, replicate) compared against the Poisson(1)
    // inverse-CDF thresholds PRE-SCALED to 2^32 and written as
    // integer literals (capped at 7, ~1e-7 tail mass — the literals
    // ARE the definition, so no float enters the weight step in
    // either engine). Per replicate: effective doc mass, weighted
    // pass mass, rate in floored ppm; the bootstrap SE over the 40
    // integer rates rides along (one shared sqrt text over exact
    // integer sums), next to the unweighted point rate.
    "q371_poisson_bootstrap" -> ((s, d) => {
      val base = graft.ops.Staging.stage(
        TextStats.withRepetitionStats(Tables.documents(s, d), "text")
          .select(col("doc_id"), TextStats.repetitionGate.as("pass")))
      val rates = graft.ops.Staging.stage(base
        .select(col("doc_id"), col("pass"),
          explode(sequence(lit(0), lit(39))).as("replicate"))
        .select(col("replicate"), col("pass"),
          expr(PoissonWSpark).as("w"))
        .groupBy("replicate")
        .agg(sum("w").as("w_tot"),
             sum(when(col("pass"), col("w")).otherwise(0L)).as("pass_w"))
        .select(col("replicate").cast("long").as("replicate"),
          col("w_tot"), col("pass_w"),
          expr("CASE WHEN w_tot > 0 THEN (pass_w * 1000000) div w_tot " +
            "ELSE CAST(NULL AS BIGINT) END").as("rate_ppm")))
      val se = rates.agg(sum("rate_ppm").as("sum_r"),
          sum(col("rate_ppm") * col("rate_ppm")).as("sum_r2"))
        .select(expr(BootSeMilli).as("se_milli_ppm"))
      val point = base.agg(
        expr("(sum(CASE WHEN pass THEN 1 ELSE 0 END) * 1000000) " +
          "div count(1)").as("point_rate_ppm"))
      rates.crossJoin(broadcast(se)).crossJoin(broadcast(point))
        .orderBy("replicate")
    }),

    // McNEMAR'S PAIRED TEST (McNemar 1947, the continuity-corrected
    // form) — the significance companion to q355's kappa and q367's
    // calibration: given TWO cheap predictors of the q67 gate on the
    // SAME documents — A = the q142 hashed classifier's sign, B = a
    // doc-length heuristic (n_subwords >= 20) — are their error
    // rates actually different, or is the observed gap coin-flip
    // noise? Only the DISCORDANT cells matter: b = A right, B wrong;
    // c = A wrong, B right; chi2 = (|b-c|-1)^2 / (b+c) in floored
    // milli (one shared text over exact integer cells), significant
    // at the 3.841 chi-square(1) 95% cut — read off the integer
    // lattice. ONE map-side scan folds both predictors and the
    // truth; the aggregate is a single row.
    "q370_mcnemar" -> ((s, d) => {
      val toks = TextStats.subwordTokens(col("text"))
      TextStats.withRepetitionStats(Tables.documents(s, d), "text")
        .select(
          (TextStats.hashedTokenScore(toks) > 0L).as("a_pred"),
          (size(toks) >= 20).as("b_pred"),
          TextStats.repetitionGate.as("pass"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("a_pred") === col("pass") &&
                   col("b_pred") =!= col("pass"), 1L).otherwise(0L))
            .as("b_cnt"),
          sum(when(col("a_pred") =!= col("pass") &&
                   col("b_pred") === col("pass"), 1L).otherwise(0L))
            .as("c_cnt"))
        .select(col("n_docs"), col("n_pass"), col("b_cnt"), col("c_cnt"),
          expr(McNemarMilli).as("chi2_milli"))
        .withColumn("significant", col("chi2_milli") >= 3841L)
        .orderBy("n_docs")
    }),

    // CALIBRATION CENSUS of the hashed-feature quality classifier
    // (r18 verdict 6b) — the reliability diagram + expected
    // calibration error (Naeini AAAI'15 / Guo ICML'17) every learned
    // corpus filter ships with: does the cheap q142 margin PREDICT
    // the expensive q67 repetition-gate decision, and is its
    // confidence honest? The margin maps to a confidence by a
    // clamped-LINEAR integer link conf = 1/2 + margin/4, computed as
    // ONE shared floor text floor(score*500/n) then clamped to
    // [0, 1e6] ppm — a deterministic stand-in with the exact
    // storage/compute shape of a trained calibrated head (the q142
    // hashed-weights convention). Docs bin by confidence decile;
    // each bin reports mean confidence vs empirical pass rate (exact
    // integer ppm, floored), gap, and the doc-weighted ECE =
    // sum(n_b * |acc_b - conf_b|) div N rides along. Scale shape:
    // score, gates, and link are all map-side in ONE scan; the
    // census is a 10-row hash aggregate with map-side partials; ECE
    // reduces the staged 10-row frame and broadcasts back onto it.
    "q367_calibration_ece" -> ((s, d) => {
      val bins = graft.ops.Staging.stage(
        Calibration.confidenceCensus(Tables.documents(s, d), "text"))
      val ece = bins.agg(
        expr("sum(n_docs * abs(acc_ppm - mean_conf_ppm)) div sum(n_docs)")
          .as("ece_ppm"))
      bins.crossJoin(broadcast(ece))
        .select(col("bin"), col("n_docs"), col("n_pass"),
          col("mean_conf_ppm"), col("acc_ppm"),
          (col("acc_ppm") - col("mean_conf_ppm")).as("gap_ppm"),
          col("ece_ppm"))
        .orderBy("bin")
    }),

    // BENJAMINI-HOCHBERG FDR census (Benjamini & Hochberg JRSS-B'95)
    // — the multiplicity control every per-source drift dashboard
    // needs: |sources| simultaneous "is this source's gate pass rate
    // different from the rest of the corpus?" tests, where a plain
    // per-test 5% cut expects a false alarm every round. Per source:
    // the pooled two-proportion z^2 from the EXACT integer cells
    // (n_pass/n_docs vs the complement), two-sided p via the
    // Abramowitz-Stegun 7.1.26 erfc polynomial (|err| < 1.5e-7 —
    // sub-micro, so the FLOORED-micro p IS the statistic, the
    // clamped-linear-link convention) in ONE shared text; then the BH
    // step-up on the per-source frame: reject ranks 1..k where k =
    // max{ i : p_(i) <= floor(i*q/m) } at q = 0.05 in exact integer
    // micros (floored threshold — the conservative side). Ties in
    // floored p break on the source id, shared by both engines.
    // Scale shape: gate + cells are ONE map-side scan into a
    // |sources|-row aggregate; the rank window is over that provably
    // tiny frame (the q362 rule) and everything downstream is
    // sources-sized.
    "q372_bh_fdr" -> ((s, d) => {
      val per = graft.ops.Staging.stage(
        TextStats.withRepetitionStats(Tables.documents(s, d), "text")
          .select(col("source"), TextStats.repetitionGate.as("pass"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass")))
      val tot = per.agg(sum("n_docs").as("tot_n"), sum("n_pass").as("tot_p"),
        count(lit(1)).as("m_src"))
      val ranked = graft.ops.Staging.stage(per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_pass"), col("m_src"),
          expr("(n_pass * 1000000) div n_docs").as("rate_ppm"),
          expr(BhPMicro).as("p_micro"))
        .withColumn("rk",
          row_number().over(Window.orderBy(col("p_micro"), col("source")))
            .cast("long"))
        .withColumn("bh_cut_micro", expr("(rk * 50000) div m_src")))
      val kmax = ranked.agg(
        max(when(col("p_micro") <= col("bh_cut_micro"), col("rk"))
          .otherwise(0L)).as("__k"))
      ranked.crossJoin(broadcast(kmax))
        .select(col("source"), col("n_docs"), col("n_pass"), col("rate_ppm"),
          col("p_micro"), col("rk"), col("bh_cut_micro"),
          (col("rk") <= col("__k")).as("rejected"))
        .orderBy("rk")
    }),

    // ISOTONIC RECALIBRATION (PAV; Zadrozny & Elkan KDD'02) of the
    // q367 reliability census — the monotone repair every calibration
    // audit feeds back into serving: the q142 margin ORDERS documents
    // well, but its linear link is over/under-confident per decile;
    // the n_docs-weighted isotonic fit of per-bin pass rate onto bin
    // order is the least-squares monotone map. Computed CLOSED-FORM
    // via the minimax characterization (graft.ext.Calibration — floor
    // commutes with max/min, so the floored-ppm interval averages
    // yield EXACTLY floor(PAV)): no pooling loop, no driver, three
    // broadcast joins over the 10-row bins frame. Both ECEs ride
    // along; the isotonic map is fit on the SAME frame it scores, so
    // ece_iso_ppm <= ece_raw_ppm here is guaranteed BY CONSTRUCTION —
    // this query demonstrates the operator; q379 is the honest eval
    // (train-fit on q368's leakage-safe split, test-scored). Scale
    // shape: one map-side scan -> 10-row census; everything
    // downstream is bins-sized.
    "q373_isotonic_calibration" -> ((s, d) => {
      val bins = graft.ops.Staging.stage(
        Calibration.confidenceCensus(Tables.documents(s, d), "text"))
      val iso = Calibration.isotonicFitPpm(bins, "bin", "n_docs", "n_pass")
      val full = graft.ops.Staging.stage(bins.join(broadcast(iso), Seq("bin")))
      val ece = full.agg(
        expr("sum(n_docs * abs(acc_ppm - mean_conf_ppm)) div sum(n_docs)")
          .as("ece_raw_ppm"),
        expr("sum(n_docs * abs(acc_ppm - iso_ppm)) div sum(n_docs)")
          .as("ece_iso_ppm"))
      full.crossJoin(broadcast(ece))
        .select(col("bin"), col("n_docs"), col("n_pass"),
          col("mean_conf_ppm"), col("acc_ppm"), col("iso_ppm"),
          col("ece_raw_ppm"), col("ece_iso_ppm"))
        .orderBy("bin")
    }),

    // BRIER SCORE + MURPHY DECOMPOSITION (Murphy J.Appl.Met.'73) of
    // the q142 confidence link — the proper-score companion to q367's
    // ECE: BS = uncertainty - resolution + reliability (+ within-bin
    // confidence variance when the components come from binned
    // summaries). Every squared term runs at MILLI scale:
    // (conf_milli - y_milli)^2 <= 1e6, so BIGINT partial sums hold to
    // ~9e12 docs (ppm squares would cap at ~9e6 — beyond either bound
    // the q369 DECIMAL-valve note applies). The Murphy identity
    // closes only up to the floor-lattice residue plus the within-bin
    // variance; both land in wv_resid_m2, documented rather than
    // hidden. Scale shape: ONE map-side scan into a staged per-doc
    // frame consumed by the global and the 10-bin aggregates; the
    // components join as 1-row broadcasts.
    "q374_brier_decomposition" -> ((s, d) => {
      val doc = graft.ops.Staging.stage(
        Calibration.confidencePerDoc(Tables.documents(s, d), "text")
          .select(expr("conf_ppm div 1000").as("cm"),
            expr("CASE WHEN pass THEN CAST(1000 AS BIGINT) " +
              "ELSE CAST(0 AS BIGINT) END").as("ym")))
      val g = doc.agg(count(lit(1)).as("n_docs"),
          sum(when(col("ym") === 1000L, 1L).otherwise(0L)).as("n_pass"),
          sum((col("cm") - col("ym")) * (col("cm") - col("ym")))
            .as("se_sum"))
        .withColumn("ybar_m", expr("(n_pass * 1000) div n_docs"))
      val comp = doc
        .groupBy(expr("least(CAST(9 AS BIGINT), cm div 100)").as("bin"))
        .agg(count(lit(1)).as("nb"), sum("cm").as("sum_cm"),
             sum(when(col("ym") === 1000L, 1L).otherwise(0L)).as("pb"))
        .select(col("nb"), expr("sum_cm div nb").as("mcb"),
          expr("(pb * 1000) div nb").as("accb"))
        .crossJoin(broadcast(g.select(col("ybar_m"))))
        .agg(expr("sum(nb * (mcb - accb) * (mcb - accb))").as("rel_sum"),
             expr("sum(nb * (accb - ybar_m) * (accb - ybar_m))")
               .as("res_sum"))
      g.crossJoin(broadcast(comp))
        .select(col("n_docs"), col("n_pass"), col("ybar_m").as("ybar_milli"),
          expr("se_sum div n_docs").as("brier_m2"),
          expr("rel_sum div n_docs").as("rel_m2"),
          expr("res_sum div n_docs").as("res_m2"),
          expr("ybar_m * (1000 - ybar_m)").as("unc_m2"),
          expr("se_sum div n_docs - ybar_m * (1000 - ybar_m) " +
            "+ res_sum div n_docs - rel_sum div n_docs").as("wv_resid_m2"))
        .orderBy("n_docs")
    }),

    // FAIRNESS AUDIT of the q142 predictor across sources — the
    // disparate-impact census (Feldman KDD'15; Hardt et al.
    // NeurIPS'16) every learned corpus filter ships with: per source,
    // the SELECTION rate (demographic parity), and TPR / FPR against
    // the q67 gate truth (equalized odds), each a floored-ppm integer
    // with NULL where the stratum lacks the relevant outcome (the
    // ANSI /0 rule), plus the gap to the corpus-wide rate. Pure
    // integer arithmetic end to end — no float anywhere, so no
    // rounding traps. The six derived columns come from ONE generator
    // parameterized on the integer-division token (the q369 rule).
    // Scale shape: ONE map-side scan folds predictor + truth into a
    // |sources|-row contingency frame (the q358 convention); the
    // totals row broadcasts back onto it.
    "q375_fairness_audit" -> ((s, d) => {
      val per = graft.ops.Staging.stage(
        TextStats.withRepetitionStats(Tables.documents(s, d), "text")
          .select(col("source"),
            (TextStats.hashedTokenScore(
              TextStats.subwordTokens(col("text"))) > 0L).as("a_pred"),
            TextStats.repetitionGate.as("pass"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
            sum(when(col("a_pred"), 1L).otherwise(0L)).as("n_sel"),
            sum(when(col("a_pred") && col("pass"), 1L).otherwise(0L))
              .as("n_tp"),
            sum(when(col("a_pred") && !col("pass"), 1L).otherwise(0L))
              .as("n_fp")))
      val tot = per.agg(sum("n_docs").as("t_n"), sum("n_pass").as("t_pass"),
        sum("n_sel").as("t_sel"), sum("n_tp").as("t_tp"),
        sum("n_fp").as("t_fp"))
      per.crossJoin(broadcast(tot))
        .select(col("source") +: col("n_docs") +:
          fairnessCols("div").map { case (n, t) => expr(t).as(n) }: _*)
        .orderBy("source")
    }),

    // HELD-OUT CALIBRATION EVAL (r19 verdict item 2) — q373's honest
    // twin: the isotonic map and the Brier score are FIT on the train
    // side of q368's leakage-safe split and SCORED on the test side,
    // so ece_iso <= ece_raw is no longer true by construction — the
    // eval can now catch an overfit recalibration, which is the whole
    // point of holding data out, and the cluster-aware split becomes
    // load-bearing (a per-doc split would leak near-duplicates into
    // the eval and score memorization). The split is EXACTLY q368's
    // (shared generators: splitNearDupPairs/clusterSplits — one copy
    // of the simhash params and the cluster-hash assignment). The
    // train-fit monotone map applies to test bins as the standard
    // step extension: a test bin takes the iso value of the LARGEST
    // train bin <= it (rightward piecewise-constant), falling back to
    // the smallest train bin's value below the fitted range. Test
    // Brier scores both confidences per document at milli scale
    // (raw link vs iso-mapped), exact integers throughout. Scale
    // shape: pairs ride the pigeonhole band join, components
    // pointer-jump, the per-doc frame is ONE scan joined to the
    // doc-keyed label frame, censuses are 10-row aggregates, and the
    // PAV fit + step extension are broadcast joins over bins-sized
    // frames.
    "q379_heldout_calibration" -> ((s, d) => {
      val docs = graft.ops.Staging.stage(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      val pairs = graft.ops.Staging.stage(
        TextDedupQueries.splitNearDupPairs(docs))
      val lab = TextDedupQueries.clusterSplits(docs.select("doc_id"), pairs)
        .select("doc_id", "split")
      // r21: the per-doc confidence chain reads the STAGED docs frame
      // (exactly the two columns it needs), not a second
      // Tables.documents scan — at 100 TB the old shape was one
      // avoidable full-corpus parquet scan (r20 verdict #1).
      // Hash-invisible: the staged frame is the same (doc_id, text).
      val perDoc = graft.ops.Staging.stage(
        Calibration.confidencePerDocKeyed(docs, "doc_id", "text")
          .join(lab, Seq("doc_id")))
      val trainBins = Calibration.censusOfConfidence(
        perDoc.filter(col("split") === "train"))
      val iso = graft.ops.Staging.stage(
        Calibration.isotonicFitPpm(trainBins, "bin", "n_docs", "n_pass"))
      val testBins = Calibration.censusOfConfidence(
        perDoc.filter(col("split") === "test"))
      // step extension of the train-fit map onto the test bins
      val below = testBins.select(col("bin"))
        .join(broadcast(iso.select(col("bin").as("tb"),
          col("iso_ppm").as("tv"))), col("tb") <= col("bin"))
        .groupBy("bin").agg(max_by(col("tv"), col("tb")).as("iso_below"))
      val minIso = iso.agg(min_by(col("iso_ppm"), col("bin")).as("iso_floor"))
      val applied = graft.ops.Staging.stage(testBins
        .join(broadcast(below), Seq("bin"), "left")
        .crossJoin(broadcast(minIso))
        .select(col("bin"), col("n_docs"), col("n_pass"),
          col("mean_conf_ppm"), col("acc_ppm"),
          coalesce(col("iso_below"), col("iso_floor")).as("iso_ppm")))
      val ece = applied.agg(
        expr("sum(n_docs * abs(acc_ppm - mean_conf_ppm)) div sum(n_docs)")
          .as("ece_raw_ppm"),
        expr("sum(n_docs * abs(acc_ppm - iso_ppm)) div sum(n_docs)")
          .as("ece_iso_ppm"))
      // per-doc test Brier at milli scale, raw link vs the iso map
      // the doc's bin carries (exact integer squares, the q374 bound)
      val brier = perDoc.filter(col("split") === "test")
        .select(expr("conf_ppm div 1000").as("cm"),
          expr("CASE WHEN pass THEN CAST(1000 AS BIGINT) " +
            "ELSE CAST(0 AS BIGINT) END").as("ym"),
          expr("least(CAST(9 AS BIGINT), conf_ppm div 100000)").as("bin"))
        .join(broadcast(applied.select(col("bin"),
          expr("iso_ppm div 1000").as("im"))), Seq("bin"))
        .agg(expr("sum((cm - ym) * (cm - ym)) div count(1)")
            .as("brier_raw_m2"),
          expr("sum((im - ym) * (im - ym)) div count(1)")
            .as("brier_iso_m2"))
      applied.crossJoin(broadcast(ece)).crossJoin(broadcast(brier))
        .select(col("bin"), col("n_docs"), col("n_pass"),
          col("mean_conf_ppm"), col("acc_ppm"), col("iso_ppm"),
          col("ece_raw_ppm"), col("ece_iso_ppm"),
          col("brier_raw_m2"), col("brier_iso_m2"))
        .orderBy("bin")
    }),
  )

  // q367's confidence link lives with the operator
  // (graft.ext.Calibration.ConfPpm — cycle-free, so the streaming
  // twin can interpolate it without touching this object's eager
  // init); the oracle interpolates the SAME string.
  private val CalibConfPpm = graft.ext.Calibration.ConfPpm

  /** Shared oracle CTE text for q367/q370/q371: the per-doc q67 gate
    * stats and the pass bit (+ n_subwords) in ONE copy, so the gate
    * replay cannot drift between the calibration, McNemar, and
    * bootstrap oracles (the approxLcsOracleSql convention). */
  private val GateCtesSql =
    """m AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT)
      |      AS n_subwords,
      |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS toks,
      |    len(list_distinct(string_split(text, ' '))) AS dtoks,
      |    len(list_distinct(list_transform(range(1, len(string_split(text,' '))),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))) AS dbg,
      |    length(text) AS chars,
      |    length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS syms,
      |    length(replace(text, ' ', '')) AS nonspace
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, n_subwords,
      |    (CASE WHEN toks > 0 THEN 1.0 - CAST(dtoks AS DOUBLE) / toks ELSE 0.0 END) <= 0.3 AND
      |    (CASE WHEN toks > 1 THEN 1.0 - CAST(dbg AS DOUBLE) / (toks - 1) ELSE 0.0 END) <= 0.3 AND
      |    (CASE WHEN chars > 0 THEN CAST(syms AS DOUBLE) / chars ELSE 0.0 END) <= 0.1 AND
      |    (CASE WHEN toks > 0 THEN CAST(nonspace AS DOUBLE) / toks ELSE 0.0 END) BETWEEN 2.0 AND 12.0
      |      AS pass
      |  FROM m)""".stripMargin

  /** Shared oracle CTE text for q367/q370: the q142 hashed score
    * chain (digit-sum hex replay), ONE copy. */
  private val HashScoreCtesSql =
    """tk AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS tok
      |  FROM documents),
      |w AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(1, 9),
      |      i -> CAST(strpos('0123456789abcdef',
      |                       substring(md5(tok), CAST(i AS INTEGER), 1)) - 1
      |             AS DOUBLE)
      |           * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) AS BIGINT)
      |      % 1001 - 500 AS wt
      |  FROM tk),
      |sc AS (
      |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM w
      |  GROUP BY doc_id)""".stripMargin

  /** q371's Poisson(1) weight ladder over the 2^32-scaled integer
    * thresholds (floor(CDF(k) * 2^32), capped at 7). The hash value
    * k is engine-specific text (Spark conv vs the DuckDB digit-sum
    * replay) with identical integer semantics — the q142 convention;
    * the ladder GENERATOR takes the hash text as a parameter, so
    * both engines share it verbatim (never substring-rewritten). */
  private def poissonLadder(hv: String): String =
    s"CASE WHEN $hv < 1580030168 THEN 0 WHEN $hv < 3160060337 THEN 1 " +
      s"WHEN $hv < 3950075421 THEN 2 WHEN $hv < 4213413783 THEN 3 " +
      s"WHEN $hv < 4279248373 THEN 4 WHEN $hv < 4292415291 THEN 5 " +
      s"WHEN $hv < 4294609777 THEN 6 ELSE 7 END"
  private val PoissonWSpark = poissonLadder(
    "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '_r', " +
      "CAST(replicate AS STRING))), 1, 8), 16, 10) AS BIGINT)")

  /** q371's bootstrap SE over the 40 integer replicate rates in
    * floored milli-ppm — ONE shared sqrt text over exact integer
    * sums: sqrt((R*Σr² - (Σr)²) / (R(R-1))). */
  private val BootSeMilli =
    "CAST(floor(CAST(1000 AS DOUBLE) * " +
      "sqrt(CAST(40 * sum_r2 - sum_r * sum_r AS DOUBLE) / " +
      "CAST(40 * 39 AS DOUBLE))) AS BIGINT)"

  /** q370's continuity-corrected McNemar statistic in floored milli —
    * ONE shared text over the exact integer discordant cells; NULL
    * when no discordant pair exists (the test is undefined). The
    * correction clamps at 0 (max(|b-c|-1, 0), the Edwards form) so
    * b = c scores exactly 0 rather than 1/(b+c) — r19 review. */
  private val McNemarMilli =
    "CASE WHEN b_cnt + c_cnt > 0 THEN CAST(floor(CAST(1000 AS DOUBLE) * " +
      "CAST(greatest(abs(b_cnt - c_cnt) - 1, 0) AS DOUBLE) * " +
      "CAST(greatest(abs(b_cnt - c_cnt) - 1, 0) AS DOUBLE) / " +
      "CAST(b_cnt + c_cnt AS DOUBLE)) AS BIGINT) " +
      "ELSE CAST(NULL AS BIGINT) END"

  /** q372's two-sided p-value in floored micro — ONE shared text over
    * the exact integer cells (n_pass, n_docs, tot_p, tot_n): pooled
    * two-proportion z, then p = erfc(z/sqrt(2)) via the
    * Abramowitz-Stegun 7.1.26 polynomial (|err| < 1.5e-7, sub-micro —
    * the approximation IS the statistic). Every literal is
    * CAST(... AS DOUBLE) (the q293 DECIMAL rule); negative
    * coefficients enter through binary minus (the DpNoisyMilli
    * convention). Degenerate strata guard to p = 1e6: a single-source
    * corpus (tot_n = n_docs) has no complement, and an all-pass /
    * all-fail corpus has zero pooled variance AND zero rate
    * difference.
    *
    * LIBM ASSUMPTION (r19 advice): the erfc polynomial's exp is the
    * one transcendental in this chain — the floored micro relies on
    * JVM Math.exp and DuckDB libm agreeing to the last ulp (the
    * division/multiplication steps are IEEE-deterministic). The A&S
    * approximation's own |err| < 1.5e-7 dominates any last-ulp libm
    * wobble by ~9 orders of magnitude at micro scale, so only a
    * p-value landing within ~1e-15 of an exact micro boundary could
    * flip — the HbEstMilliText/MmdKernNano lattice-distance argument
    * (LibmLatticeSpec) applies. */
  private[graft] val BhPMicro: String = {
    val p1 = "(CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val p2 = "(CAST(tot_p - n_pass AS DOUBLE) / " +
      "CAST(tot_n - n_docs AS DOUBLE))"
    val pp = "(CAST(tot_p AS DOUBLE) / CAST(tot_n AS DOUBLE))"
    val den = s"($pp * (CAST(1 AS DOUBLE) - $pp) * " +
      "(CAST(1 AS DOUBLE) / CAST(n_docs AS DOUBLE) + " +
      "CAST(1 AS DOUBLE) / CAST(tot_n - n_docs AS DOUBLE)))"
    val x = s"((abs($p1 - $p2) / sqrt($den)) * " +
      "CAST(0.7071067811865476 AS DOUBLE))"
    val t = s"(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + " +
      s"CAST(0.3275911 AS DOUBLE) * $x))"
    val poly = s"($t * CAST(0.254829592 AS DOUBLE) " +
      s"- $t * $t * CAST(0.284496736 AS DOUBLE) " +
      s"+ $t * $t * $t * CAST(1.421413741 AS DOUBLE) " +
      s"- $t * $t * $t * $t * CAST(1.453152027 AS DOUBLE) " +
      s"+ $t * $t * $t * $t * $t * CAST(1.061405429 AS DOUBLE))"
    val p = s"($poly * exp(CAST(0 AS DOUBLE) - $x * $x))"
    "CASE WHEN tot_n = n_docs OR tot_p = 0 OR tot_p = tot_n " +
      "THEN CAST(1000000 AS BIGINT) " +
      s"ELSE least(CAST(1000000 AS BIGINT), " +
      s"CAST(floor(CAST(1000000 AS DOUBLE) * $p) AS BIGINT)) END"
  }

  /** q375's six derived rate/gap columns, parameterized on the
    * integer-division token (Spark `div`, DuckDB `//` — identical
    * truncation on the non-negative operands here) so both engines
    * share one generator; every division is zero-guarded to NULL (a
    * stratum with no positives has no TPR; the ANSI /0 rule). */
  private def fairnessCols(idiv: String): Seq[(String, String)] = Seq(
    "sel_ppm" -> s"(n_sel * 1000000) $idiv n_docs",
    "tpr_ppm" -> (s"CASE WHEN n_pass > 0 THEN (n_tp * 1000000) $idiv " +
      "n_pass ELSE CAST(NULL AS BIGINT) END"),
    "fpr_ppm" -> (s"CASE WHEN n_docs - n_pass > 0 THEN (n_fp * 1000000) " +
      s"$idiv (n_docs - n_pass) ELSE CAST(NULL AS BIGINT) END"),
    "sel_gap_ppm" -> (s"((n_sel * 1000000) $idiv n_docs) - " +
      s"((t_sel * 1000000) $idiv t_n)"),
    "tpr_gap_ppm" -> (s"CASE WHEN n_pass > 0 AND t_pass > 0 THEN " +
      s"((n_tp * 1000000) $idiv n_pass) - ((t_tp * 1000000) $idiv t_pass) " +
      "ELSE CAST(NULL AS BIGINT) END"),
    "fpr_gap_ppm" -> (s"CASE WHEN n_docs - n_pass > 0 AND t_n - t_pass > 0 " +
      s"THEN ((n_fp * 1000000) $idiv (n_docs - n_pass)) - " +
      s"((t_fp * 1000000) $idiv (t_n - t_pass)) " +
      "ELSE CAST(NULL AS BIGINT) END"))

  /** q369's derived columns, parameterized on the integer-division
    * token (Spark `div`, DuckDB `//` — identical truncation on the
    * non-negative operands here) so both engines share one generator.
    * Every division is zero-guarded (empty source → NULL epochs;
    * empty corpus → NULL shares) — the ANSI /0 oracle trap. */
  private def tempMixCols(idiv: String): Seq[(String, String)] = Seq(
    "nat_share_ppm" ->
      (s"CASE WHEN tot_n > 0 THEN (n_tokens * 1000000) $idiv tot_n " +
        "ELSE CAST(NULL AS BIGINT) END"),
    "alpha_share_ppm" ->
      (s"CASE WHEN tot_w > 0 THEN (w_micro * 1000000) $idiv tot_w " +
        "ELSE CAST(NULL AS BIGINT) END"),
    "alloc_tokens" ->
      (s"CASE WHEN tot_w > 0 THEN (w_micro * ((3 * tot_n) $idiv 5)) " +
        s"$idiv tot_w ELSE CAST(NULL AS BIGINT) END"),
    "epochs_milli" ->
      (s"CASE WHEN tot_w > 0 AND n_tokens > 0 THEN ((w_micro * " +
        s"((3 * tot_n) $idiv 5)) $idiv tot_w * 1000) $idiv n_tokens " +
        "ELSE CAST(NULL AS BIGINT) END"))

  /** q369's α-sampling weight n^0.3 in floored integer micros — ONE
    * shared exp/ln text over the exact token count (the
    * PowerLawTermNano convention); 0 for an empty source so ln never
    * sees 0. */
  private val TempWMicro =
    "CASE WHEN n_tokens > 0 THEN CAST(floor(CAST(1000000 AS DOUBLE) * " +
      "exp(CAST(0.3 AS DOUBLE) * ln(CAST(n_tokens AS DOUBLE)))) " +
      "AS BIGINT) ELSE CAST(0 AS BIGINT) END"

  /** q323's corpus-level Flesch reading ease in floored milli-units —
    * SHARED text over the summed integer count columns (words,
    * syllables, sentences), so Spark and the oracle run the identical
    * IEEE sequence. Every literal is CAST(... AS DOUBLE): Spark would
    * otherwise parse 206.835 / 1000.0 as DECIMAL (the q293 rule), and
    * decimal arithmetic quantizes where DuckDB's double does not. */
  private val FleschMilli =
    "CAST(floor(CAST(1000 AS DOUBLE) * (CAST(206.835 AS DOUBLE) " +
      "- CAST(1.015 AS DOUBLE) * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)) " +
      "- CAST(84.6 AS DOUBLE) * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)))) AS BIGINT)"

  // q331's per-vocab-term KL contribution — lives with the operator
  // (graft.ext.Dsir.KlTermNano) since r18; the oracle interpolates
  // the SAME string, so the term text cannot drift between engines.
  private val KlTermNano = graft.ext.Dsir.KlTermNano

  /** q351's interpolated Kneser-Ney per-bigram ln p in floored
    * nano-nats — ONE string for both engines (the q252 contract), so
    * every IEEE op runs in the identical order. D = 0.75 and 0 are
    * exact in binary; all other operands are exact integer counts
    * cast to DOUBLE. greatest() is never binding when scoring the
    * training corpus itself (c12 >= 1 > D) but states the formula. */
  // q355's kappa statistics live with the operator
  // (graft.ext.Agreement — cycle-free, so specs can init it without
  // touching this object's eager oracle map); the oracle interpolates
  // the SAME strings.
  private val KappaPpm = graft.ext.Agreement.KappaPpm
  private val WkappaPpm = graft.ext.Agreement.WkappaPpm

  /** q356's noisy count in floor-milli — ONE generated string per eps
    * on both engines, over the exact count `c` and the 52-bit group
    * hash `h` (each engine parses the md5 prefix to the SAME integer
    * its own way; everything after `h` is this shared text). u =
    * (h+1/2)/2^52 lands strictly inside (0,1), so ln's argument is
    * >= 2^-51 and never 0. */
  private[graft] def DpNoisyMilli(eps: String): String = {
    val u = "((CAST(h AS DOUBLE) + CAST(0.5 AS DOUBLE)) / " +
      "4.503599627370496E15)"
    s"CAST(floor(1000.0 * (CAST(c AS DOUBLE) + " +
      s"(CASE WHEN $u >= CAST(0.5 AS DOUBLE) THEN CAST(1 AS DOUBLE) " +
      s"ELSE CAST(-1 AS DOUBLE) END) * " +
      s"(CAST(0 AS DOUBLE) - ln(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE) * " +
      s"abs($u - CAST(0.5 AS DOUBLE)))) / CAST($eps AS DOUBLE))) AS BIGINT)"
  }

  /** q363's per-word cross-source z — numerator and radicand are
    * EXACT integers (g*f - sf, g*sf2 - sf^2 over floor-ppm rates), so
    * the zero-variance guard is an integer compare and the only float
    * ops are the final division and sqrt — ONE string, both
    * engines. */
  private[graft] val BurrowsZ =
    "CASE WHEN g * sf2 - sf * sf = 0 THEN CAST(0 AS DOUBLE) " +
      "ELSE CAST(g * f - sf AS DOUBLE) / " +
      "sqrt(CAST(g * sf2 - sf * sf AS DOUBLE)) END"

  private[graft] val KnTermNano =
    "CAST(floor(1000000000.0 * ln((greatest(CAST(c12 AS DOUBLE) - 0.75, " +
      "CAST(0 AS DOUBLE)) + 0.75 * CAST(nfol AS DOUBLE) * " +
      "CAST(npre AS DOUBLE) / CAST(bt AS DOUBLE)) / " +
      "CAST(c1 AS DOUBLE))) AS BIGINT)"

  // LAZY: the q355 oracle block evaluates TextQueries.Stopwords, and
  // TextQueries' own init reads this map — eager evaluation here
  // would NPE whenever this object initializes FIRST (a spec touching
  // a shared term string does exactly that). Lazy defers the block to
  // first use, by which point TextQueries.Stopwords (declared before
  // its map fields) is always assigned.
  lazy val oracles: Map[String, String] = Map(
    // Heaps replay: identical power-of-two prefix points (row_number
    // by doc_id), exact integer (cum_n, V) per point, the q196-form
    // log-log OLS over the bounded point frame.
    "q342_heaps_law" ->
      """WITH dws AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), t -> length(t) > 0) AS ws,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
        |  FROM documents),
        |cn AS (
        |  SELECT doc_id, source, ws, r,
        |    CAST(sum(len(ws)) OVER (PARTITION BY source ORDER BY r
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_n
        |  FROM dws),
        |pts AS (
        |  SELECT source, r AS pr, cum_n FROM cn
        |  WHERE (r & (r - 1)) = 0 AND cum_n > 0),
        |fo AS (
        |  SELECT source, w, min(r) AS fo FROM (
        |    SELECT source, r, unnest(ws) AS w FROM cn) GROUP BY 1, 2),
        |v AS (
        |  SELECT fo.source, pts.pr, CAST(count(*) AS BIGINT) AS vsz
        |  FROM fo JOIN pts ON fo.source = pts.source AND fo.fo <= pts.pr
        |  GROUP BY 1, 2),
        |xy AS (
        |  SELECT pts.source, ln(CAST(pts.cum_n AS DOUBLE)) AS x,
        |    ln(CAST(v.vsz AS DOUBLE)) AS y
        |  FROM pts JOIN v ON pts.source = v.source AND pts.pr = v.pr),
        |agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_points,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy
        |  FROM xy GROUP BY source)
        |SELECT source, n_points,
        |  round((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx), 6)
        |    AS heaps_beta,
        |  round((sy - ((n_points * sxy - sx * sy) /
        |    (n_points * sxx - sx * sx)) * sx) / n_points, 6) AS heaps_logk
        |FROM agg ORDER BY source""".stripMargin,

    // KL replay: same (source x joint-vocab) zero-filled grid, the
    // SHARED floored nano-nat term, exact integer sums.
    "q331_source_kl" ->
      s"""WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM w WHERE length(w) > 0 GROUP BY 1, 2),
        |vocab AS (SELECT DISTINCT w FROM wc),
        |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |        FROM wc GROUP BY source),
        |grid AS (
        |  SELECT t.source, vocab.w, t.n, CAST(coalesce(wc.c, 0) AS BIGINT) AS c
        |  FROM tot t CROSS JOIN vocab
        |  LEFT JOIN wc ON wc.source = t.source AND wc.w = vocab.w),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    a.n AS na, a.c AS ca, b.n AS nb, b.c AS cb, vv.v
        |  FROM grid a JOIN grid b ON a.w = b.w AND a.source <> b.source,
        |    vv)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum($KlTermNano) AS BIGINT) AS kl_nano
        |FROM pairs GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,

    // Good-Turing replay: q298's word-count frame, the
    // frequency-of-frequency integer census and floor ratios.
    "q328_good_turing" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM w WHERE length(w) > 0 GROUP BY 1, 2),
        |a AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM wc GROUP BY source)
        |SELECT source, n_tokens, n_types, n1, n2,
        |  (n1 * 1000000) // n_tokens AS gt_unseen_ppm,
        |  CASE WHEN n1 > 0 THEN (2000 * n2) // n1
        |       ELSE CAST(NULL AS BIGINT) END AS r1_star_milli
        |FROM a ORDER BY source""".stripMargin,

    // Readability replay: identical integer counts (non-space runs,
    // vowel-group runs, max(1, terminal punctuation)), then the SHARED
    // floored-milli Flesch expression over the per-source sums.
    "q323_readability" ->
      s"""WITH t AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syl,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS BIGINT) AS st
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(w) AS BIGINT) AS words,
        |    CAST(sum(syl) AS BIGINT) AS syllables,
        |    CAST(sum(st) AS BIGINT) AS sentences
        |  FROM t GROUP BY source)
        |SELECT source, n_docs, words, syllables, sentences,
        |  $FleschMilli AS flesch_milli
        |FROM a ORDER BY source""".stripMargin,
    // Hashed-classifier replay: per-token weight = (first-8-hex-digit
    // md5 value mod 1001) - 500 via the established digit-sum
    // hex-to-int replay (q107's pattern; 8 digits < 2^32 so the
    // double sum is exact before the BIGINT cast). Docs whose token
    // list is empty keep score 0 via the LEFT JOIN + coalesce.
    "q142_hash_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS tok
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |                       substring(md5(tok), CAST(i AS INTEGER), 1)) - 1
        |             AS DOUBLE)
        |           * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) AS BIGINT)
        |      % 1001 - 500 AS wt
        |  FROM t),
        |agg AS (
        |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score FROM w
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.source,
        |  CAST(len(regexp_extract_all(d.text, '[a-z]+|[0-9]+')) AS INTEGER)
        |    AS n_subwords,
        |  coalesce(a.score, 0) AS score,
        |  CASE WHEN len(regexp_extract_all(d.text, '[a-z]+|[0-9]+')) > 0
        |    THEN CAST(floor(coalesce(a.score, 0) * 2000.0
        |               / len(regexp_extract_all(d.text, '[a-z]+|[0-9]+')))
        |         AS BIGINT)
        |    END AS margin_ppm,
        |  (coalesce(a.score, 0) > 0) AS label
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Waterfill replay: the same cap-sorted prefix scan, integer
    // budget, and first-non-full-row level.
    "q161_token_waterfill" ->
      """WITH caps AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT) AS cap
        |  FROM documents GROUP BY source),
        |t AS (SELECT (3 * CAST(sum(cap) AS BIGINT)) // 5 AS budget FROM caps),
        |s AS (SELECT source, cap, budget,
        |    coalesce(sum(cap) OVER (ORDER BY cap, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
        |    row_number() OVER (ORDER BY cap, source) AS rank,
        |    count(*) OVER () AS n_src
        |  FROM caps, t),
        |s2 AS (SELECT *,
        |    (prefix + (n_src - rank + 1) * cap <= budget) AS full_take,
        |    CAST(floor(CAST(budget - prefix AS DOUBLE) / (n_src - rank + 1))
        |      AS BIGINT) AS cand
        |  FROM s),
        |lvl AS (SELECT coalesce((SELECT cand FROM s2 WHERE NOT full_take
        |                         ORDER BY rank LIMIT 1), 0) AS level)
        |SELECT source, cap,
        |  CASE WHEN full_take THEN cap
        |    ELSE least(cap, greatest(level, 0)) END AS allocated
        |FROM s2, lvl ORDER BY source""".stripMargin,

    // Native-function SQL replay: token membership over the same
    // space split; distinct word 3-shingles (q65's construction).
    "q159_sql_native_functions" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> x IN ('data', 'the', 'row'))) AS INTEGER) AS stop_hits,
        |  CAST(CASE WHEN len(string_split(text, ' ')) >= 3
        |    THEN len(list_distinct(list_transform(
        |      range(1, len(string_split(text, ' ')) - 1),
        |      i -> string_split(text, ' ')[i] || ' ' ||
        |           string_split(text, ' ')[i + 1] || ' ' ||
        |           string_split(text, ' ')[i + 2])))
        |    ELSE 0 END AS INTEGER) AS n_shingles
        |FROM documents ORDER BY doc_id""".stripMargin,

    // BPE replay: k=4 unrolled rounds generated by Bpe.oracleSql so
    // the two sides cannot drift round-wise.
    "q143_bpe_merges" -> graft.ext.Bpe.oracleSql(4),
    "q144_bpe_encode" -> graft.ext.Bpe.encodeOracleSql(4),
    // train -> per-doc BPE count -> pack, one generator (see q345's
    // query comment); q71's cumsum/cut arithmetic on BPE counts
    "q345_bpe_shard_packing" -> graft.ext.Bpe.packingOracleSql(4, 5000L, 8),

    // fertility replay: the q345 per-doc-count CTEs, the q71
    // whitespace-count expression, integer floor-milli ratio
    "q350_tokenizer_fertility" ->
      (graft.ext.Bpe.perDocCountsCtes(4) + """,
        |f AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST((CASE WHEN length(d.text) = 0 THEN 0
        |      ELSE length(d.text) - length(replace(d.text, ' ', '')) + 1
        |      END) AS BIGINT) AS ws,
        |    coalesce(cnt.n_tokens, 0) AS bpe
        |  FROM documents d LEFT JOIN cnt USING (doc_id))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |  CASE WHEN sum(ws) > 0
        |    THEN CAST((sum(bpe) * 1000) // sum(ws) AS BIGINT)
        |    ELSE NULL END AS fertility_milli
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin),

    "q211_token_budget" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS tot
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
        |  CAST(max(tot) AS BIGINT) AS total_chars,
        |  (CAST(sum(n_chars) AS BIGINT) * 1000000) // CAST(max(tot) AS BIGINT)
        |    AS share_ppm
        |FROM d WHERE cum * 10 <= tot * 6
        |GROUP BY source ORDER BY source""".stripMargin,

    // q27's positional shingles WITHOUT list_distinct (every 3-gram
    // position counts), mode count per doc, single-division ratio.
    "q122_top_ngram_coverage" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens,
        |    string_split(text, ' ') AS s
        |  FROM documents
        |  WHERE (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) >= 3),
        |g AS (
        |  SELECT doc_id, source, n_tokens,
        |    unnest(list_transform(range(1, len(s) - 1),
        |      i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2])) AS g
        |  FROM d),
        |c AS (SELECT doc_id, source, n_tokens, g, count(*) AS c
        |      FROM g GROUP BY doc_id, source, n_tokens, g),
        |m AS (SELECT doc_id, source, n_tokens, max(c) AS top_c
        |      FROM c GROUP BY doc_id, source, n_tokens),
        |t AS (SELECT source,
        |        CAST(top_c AS DOUBLE) / (n_tokens - 2) AS ratio
        |      FROM m)
        |SELECT source, count(*) AS n_docs,
        |  round(avg(ratio), 6) AS avg_top3gram_ratio,
        |  CAST(sum(CASE WHEN ratio > 0.18 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    // One row per (source, rule); violation = NOT rule OR NULL.
    "q126_expectations_by_source" -> Seq(
      ("chars_consistent", "n_chars = length(text)"),
      ("lang_known", "lang IN ('en', 'es', 'zh', 'de', 'fr')"),
      ("text_nonempty", "length(text) > 0")).map { case (name, pred) =>
        s"""SELECT source, '$name' AS rule, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN coalesce($pred, false) THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
           |  round(CAST(sum(CASE WHEN coalesce($pred, false) THEN 0 ELSE 1 END) AS DOUBLE) / count(*), 6) AS violation_rate
           |FROM documents GROUP BY source""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY source, rule"),

    // Cumulative 0.8/0.9 bands as hex literals: round(0.8 * 2^32) =
    // 0xcccccccd, round(0.9 * 2^32) = 0xe6666666 — the same 8-hex
    // lexicographic compare Sampling.thresholdHex emits.
    "q123_dataset_split" ->
      """WITH d AS (
        |  SELECT source,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens,
        |    substring(md5(CAST(doc_id AS VARCHAR) || 'sp11'), 1, 8) AS h
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN h < 'cccccccd' THEN 'train'
        |       WHEN h < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM d GROUP BY 1, 2 ORDER BY source, split""".stripMargin,

    "q28_text_quality" ->
      """WITH t AS (
        |  SELECT lang,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens,
        |    round(CAST(len(list_filter(string_split(text,' '),
        |      t -> t IN ('a','the','data','value','row'))) AS DOUBLE)
        |      / len(string_split(text,' ')), 6) AS stop_ratio,
        |    round(least(((CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)) / 100.0, 1.0) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text,' '),
        |          t -> t IN ('a','the','data','value','row'))) AS DOUBLE)
        |          / len(string_split(text,' '))) * 0.5, 6) AS quality
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, round(avg(n_tokens), 6) AS avg_tokens,
        | round(avg(stop_ratio), 6) AS avg_stop_ratio, round(avg(quality), 6) AS avg_quality
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    // Same q28 quality formula, row_number over (rounded quality
    // DESC, doc_id), integer-division decile — // is DuckDB's
    // integer division, matching Spark's DIV exactly.
    "q84_quality_deciles" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    round(least(((CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)) / 100.0, 1.0) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text,' '),
        |          t -> t IN ('a','the','data','value','row'))) AS DOUBLE)
        |          / len(string_split(text,' '))) * 0.5, 6) AS quality
        |  FROM documents),
        |r AS (
        |  SELECT source, quality,
        |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM t),
        |b AS (SELECT source, quality, CAST(((rn - 1) * 10) // cnt AS INT) AS decile FROM r)
        |SELECT source, decile, count(*) AS n_docs,
        |  round(min(quality), 6) AS min_q,
        |  round(max(quality), 6) AS max_q,
        |  round(sum(quality), 6) AS sum_q
        |FROM b GROUP BY source, decile ORDER BY source, decile""".stripMargin,

    "q29_langid_confusion" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), t -> t IN ('key','merge','batch'))) AS s_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('a','the','table'))) AS s_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('data','query','row'))) AS s_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('join','line','order'))) AS s_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('scan','hash','part'))) AS s_zh
        |  FROM documents),
        |p AS (
        |  SELECT lang,
        |    CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS predicted
        |  FROM s)
        |SELECT lang, predicted, count(*) AS n FROM p
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    "q46_langid_chargram" ->
      """WITH s AS (
        |  SELECT lang,
        |    CAST((length(text)-length(replace(text,'agg','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'tch','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'mer','')))/3 AS INT) AS c_de,
        |    CAST((length(text)-length(replace(text,'row','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'lin','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'tab','')))/3 AS INT) AS c_en,
        |    CAST((length(text)-length(replace(text,'dat','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'que','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'smal','')))/4 AS INT) AS c_es,
        |    CAST((length(text)-length(replace(text,'joi','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'ord','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'key','')))/3 AS INT) AS c_fr,
        |    CAST((length(text)-length(replace(text,'sca','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'has','')))/3 AS INT)
        |      + CAST((length(text)-length(replace(text,'par','')))/3 AS INT) AS c_zh
        |  FROM documents),
        |p AS (
        |  SELECT lang,
        |    CASE WHEN c_de >= greatest(c_en, c_es, c_fr, c_zh) THEN 'de'
        |         WHEN c_en >= greatest(c_es, c_fr, c_zh) THEN 'en'
        |         WHEN c_es >= greatest(c_fr, c_zh) THEN 'es'
        |         WHEN c_fr >= c_zh THEN 'fr'
        |         ELSE 'zh' END AS predicted
        |  FROM s)
        |SELECT lang, predicted, count(*) AS n FROM p
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    "q30_token_counts" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum((CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)) AS BIGINT) AS total_tokens,
        | CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS total_subwords,
        | round(avg((CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)), 6) AS avg_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Mirrors every DocPrep stage: rn=1 dedup per md5(text) keyed on
    // the lowest doc_id, the q29 marker scores/argmax, the q28
    // token/stopword/quality formulas, the unrounded-quality filter.
    "q58_docprep_pipeline" ->
      """WITH dd AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |s AS (
        |  SELECT source,
        |    len(list_filter(string_split(text,' '), t -> t IN ('key','merge','batch'))) AS s_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('a','the','table'))) AS s_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('data','query','row'))) AS s_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('join','line','order'))) AS s_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('scan','hash','part'))) AS s_zh,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens,
        |    least(((CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)) / 100.0, 1.0) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text,' '),
        |          t -> t IN ('a','the','data','value','row'))) AS DOUBLE)
        |          / len(string_split(text,' '))) * 0.5 AS quality
        |  FROM dd),
        |p AS (
        |  SELECT source, n_tokens, quality,
        |    CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS predicted_lang
        |  FROM s)
        |SELECT source, predicted_lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(quality), 6) AS avg_quality
        |FROM p
        |WHERE quality >= 0.6 AND predicted_lang IN ('en', 'es', 'zh')
        |GROUP BY source, predicted_lang
        |ORDER BY source, predicted_lang""".stripMargin,

    "q62_top_ngrams" ->
      """WITH sh AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS shingles
        |  FROM documents WHERE len(string_split(text,' ')) >= 2),
        |c AS (SELECT lang, unnest(shingles) AS ngram FROM sh),
        |g AS (SELECT lang, ngram, count(*) AS n FROM c GROUP BY lang, ngram),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY n DESC, ngram) AS rk FROM g)
        |SELECT lang, ngram, n, rk FROM r WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin,

    // Stage-for-stage mirror of prepareFull: rn=1 dedup -> 64-bit
    // SimHash pairs over the DEDUPED set -> recursive closure ->
    // keep-lowest-representative -> q67 gate formulas (defaults) ->
    // q58 score/argmax CASEs -> 0.8/0.9 cumulative fold thresholds.
    "q69_curation_pipeline" ->
      """WITH RECURSIVE dd AS (
        |  SELECT doc_id, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |bits AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN i <= 32
        |             THEN CASE WHEN substr(md5(t.tok), i, 1) IN ('8','9','a','b','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |             ELSE CASE WHEN substr(md5(t.tok), i - 32, 1) IN ('4','5','6','7','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |        END) AS vote
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM dd) t
        |  CROSS JOIN range(1, 65) r(i)
        |  GROUP BY doc_id, i),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vote > 0 AND i <= 32 THEN power(2, 32 - i) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN vote > 0 AND i > 32 THEN power(2, 64 - i) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (
        |  SELECT src AS id, least(src, min(dst)) AS component
        |  FROM reach GROUP BY src),
        |kept AS (
        |  SELECT dd.* FROM dd LEFT JOIN comp ON dd.doc_id = comp.id
        |  WHERE comp.id IS NULL OR comp.component = dd.doc_id),
        |gm AS (
        |  SELECT doc_id, text,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS toks,
        |    len(list_distinct(string_split(text, ' '))) AS dtoks,
        |    len(list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))) AS dbg,
        |    length(text) AS chars,
        |    length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS syms,
        |    length(replace(text, ' ', '')) AS nonspace
        |  FROM kept),
        |g AS (
        |  SELECT doc_id, text FROM gm
        |  WHERE (CASE WHEN toks > 0 THEN 1.0 - CAST(dtoks AS DOUBLE) / toks ELSE 0.0 END) <= 0.3
        |    AND (CASE WHEN toks > 1 THEN 1.0 - CAST(dbg AS DOUBLE) / (toks - 1) ELSE 0.0 END) <= 0.3
        |    AND (CASE WHEN chars > 0 THEN CAST(syms AS DOUBLE) / chars ELSE 0.0 END) <= 0.1
        |    AND (CASE WHEN toks > 0 THEN CAST(nonspace AS DOUBLE) / toks ELSE 0.0 END) BETWEEN 2.0 AND 12.0),
        |s AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text,' '), t -> t IN ('key','merge','batch'))) AS s_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('a','the','table'))) AS s_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('data','query','row'))) AS s_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('join','line','order'))) AS s_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('scan','hash','part'))) AS s_zh,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens,
        |    least(((CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)) / 100.0, 1.0) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text,' '),
        |          t -> t IN ('a','the','data','value','row'))) AS DOUBLE)
        |          / len(string_split(text,' '))) * 0.5 AS quality
        |  FROM g),
        |p2 AS (
        |  SELECT doc_id, n_tokens, quality,
        |    CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS predicted_lang
        |  FROM s),
        |f AS (
        |  SELECT *, substr(md5(CAST(doc_id AS VARCHAR) || 'r5'), 1, 8) AS h
        |  FROM p2
        |  WHERE quality >= 0.5 AND predicted_lang IN ('de','en','es','fr','zh'))
        |SELECT CASE WHEN h < 'cccccccd' THEN 'train'
        |            WHEN h < 'e6666666' THEN 'val'
        |            ELSE 'test' END AS fold,
        |  predicted_lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(quality), 6) AS avg_quality,
        |  min(doc_id) AS min_id
        |FROM f GROUP BY 1, predicted_lang ORDER BY fold, predicted_lang""".stripMargin,

    // Cumulative thresholds: 0.7 -> b3333333, 0.9 -> e6666666 (both
    // = round(f * 2^32) in hex, the Sampling.thresholdHex rule);
    // fixed-width lowercase hex compares lexicographically ==
    // numerically in both engines.
    // Rank cut replay: row_number over (count DESC, token); the odd
    // half's tokens anti-join the 500 survivors.
    "q311_oov_rate" ->
      """WITH t AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (
        |  SELECT tok FROM (
        |    SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
        |    FROM t WHERE doc_id % 2 = 0 GROUP BY tok) WHERE rn <= 500),
        |b AS (
        |  SELECT t.source, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM t LEFT JOIN v ON t.tok = v.tok WHERE t.doc_id % 2 <> 0)
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  CAST(sum(oov) AS BIGINT) * 1000000 // count(*) AS oov_ppm
        |FROM b GROUP BY source ORDER BY source""".stripMargin,

    "q66_fold_split" ->
      """WITH s AS (
        |  SELECT *, substr(md5(CAST(doc_id AS VARCHAR) || 'r5'), 1, 8) AS h
        |  FROM documents),
        |f AS (
        |  SELECT *, CASE WHEN h < 'b3333333' THEN 'train'
        |                 WHEN h < 'e6666666' THEN 'val'
        |                 ELSE 'test' END AS fold FROM s)
        |SELECT fold, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM f GROUP BY fold ORDER BY fold""".stripMargin,

    // Recomputes the content-hash membership exactly: fixed-width
    // lowercase hex compares lexicographically == numerically in both
    // engines.
    "q61_stratified_sample" ->
      """WITH s AS (
        |  SELECT *, substr(md5(CAST(doc_id AS VARCHAR) || 'r3'), 1, 8) AS h
        |  FROM documents),
        |k AS (
        |  SELECT * FROM s
        |  WHERE h < CASE source WHEN 'src0' THEN 'cccccccd'
        |                        WHEN 'src1' THEN '80000000'
        |                        WHEN 'src2' THEN '33333333'
        |                        ELSE '1999999a' END)
        |SELECT source, count(*) AS n_kept,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    // Mirrors every per-doc formula unrounded (guards match the Spark
    // when() branches: 1-token docs contribute 0 bigram repetition).
    "q67_repetition_stats" ->
      """WITH m AS (
        |  SELECT source,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS toks,
        |    len(list_distinct(string_split(text, ' '))) AS dtoks,
        |    len(list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))) AS dbg,
        |    length(text) AS chars,
        |    length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS syms,
        |    length(replace(text, ' ', '')) AS nonspace
        |  FROM documents),
        |r AS (
        |  SELECT source,
        |    CASE WHEN toks > 0 THEN 1.0 - CAST(dtoks AS DOUBLE) / toks ELSE 0.0 END AS rep_ratio,
        |    CASE WHEN toks > 1 THEN 1.0 - CAST(dbg AS DOUBLE) / (toks - 1) ELSE 0.0 END AS dup_bigram_ratio,
        |    CASE WHEN chars > 0 THEN CAST(syms AS DOUBLE) / chars ELSE 0.0 END AS symbol_ratio,
        |    CASE WHEN toks > 0 THEN CAST(nonspace AS DOUBLE) / toks ELSE 0.0 END AS mean_word_len
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        |  round(avg(rep_ratio), 6) AS avg_rep_ratio,
        |  round(avg(dup_bigram_ratio), 6) AS avg_dup_bigram_ratio,
        |  round(avg(symbol_ratio), 6) AS avg_symbol_ratio,
        |  round(avg(mean_word_len), 6) AS avg_word_len,
        |  CAST(sum(CASE WHEN rep_ratio <= 0.3 AND dup_bigram_ratio <= 0.3
        |                 AND symbol_ratio <= 0.1
        |                 AND mean_word_len BETWEEN 2.0 AND 12.0
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // Identical chain order with the 'g' flag; RE2 and Java agree on
    // \b word boundaries over this lowercase-word corpus.
    "q70_redaction" ->
      """WITH r AS (
        |  SELECT source, text,
        |    regexp_replace(regexp_replace(text, '\b(key|hash)\b', '[SECRET]', 'g'),
        |                   '\bspark\b', '[TOOL]', 'g') AS redacted
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN redacted <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
        |  CAST(sum(length(text)) AS BIGINT) AS chars_before,
        |  CAST(sum(length(redacted)) AS BIGINT) AS chars_after
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // Same lanes, order, and cut rule; the 5000.0 divisor keeps the
    // floor boundary in exact double arithmetic on both engines.
    "q71_shard_packing" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS pack_bucket,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT pack_bucket,
        |  CAST(floor((cum - n_tokens) / 5000.0) AS BIGINT) AS pack_shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY pack_bucket, pack_shard
        |ORDER BY pack_bucket, pack_shard""".stripMargin,

    // Recomputes counts -> fractions -> integer thresholds with the
    // same literals in the same IEEE order as mixtureResample
    // ((40.0 * share) / cnt, round(frac * 2^32)); DuckDB round() is
    // half-away-from-zero and JVM Math.round is floor(x + 0.5) —
    // identical for the positive values here. frac >= 1.0 short-
    // circuits to keep-all, matching thresholdHex's "ffffffff~".
    "q72_mixture_resample" ->
      """WITH c AS (
        |  SELECT source, count(*) AS cnt FROM documents GROUP BY source),
        |f AS (
        |  SELECT source, CASE source
        |      WHEN 'src0' THEN least(1.0, 40.0 * 0.8 / cnt)
        |      WHEN 'src1' THEN least(1.0, 40.0 * 0.1 / cnt)
        |      WHEN 'src2' THEN least(1.0, 40.0 * 0.05 / cnt)
        |      WHEN 'src3' THEN least(1.0, 40.0 * 0.05 / cnt)
        |      ELSE 0.0 END AS frac
        |  FROM c),
        |k AS (
        |  SELECT d.source, d.doc_id
        |  FROM documents d JOIN f USING (source)
        |  WHERE f.frac >= 1.0
        |     OR substr(md5(CAST(d.doc_id AS VARCHAR) || 'r7'), 1, 8)
        |        < printf('%08x', CAST(round(f.frac * 4294967296.0) AS BIGINT)))
        |SELECT source, count(*) AS n_kept,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    // Same chunk arithmetic: n_chunks = 1 + ceil((n-40)/32) via the
    // identical floor((n - 40 + 31) / 32.0) double expression; DuckDB
    // list slices clamp at the list end exactly like Spark's slice.
    "q74_doc_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT *, CASE WHEN n <= 40 THEN 1
        |                 ELSE CAST(floor((n - 40 + 31) / 32.0) AS INT) + 1 END AS nch
        |  FROM t),
        |x AS (
        |  SELECT doc_id, source, n, toks, unnest(range(0, nch)) AS k
        |  FROM c),
        |ch AS (
        |  SELECT doc_id, source, k,
        |    least(40, n - k * 32) AS chunk_tokens,
        |    array_to_string(toks[k * 32 + 1 : k * 32 + 40], ' ') AS chunk_text
        |  FROM x)
        |SELECT source, count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(chunk_tokens) AS BIGINT) AS total_chunk_tokens,
        |  CAST(max(k) AS BIGINT) AS max_chunk_id,
        |  CAST(sum(length(chunk_text)) AS BIGINT) AS total_chunk_chars
        |FROM ch GROUP BY source ORDER BY source""".stripMargin,

    // q72's threshold recomputation with token-sum weights: fractions
    // divide by the exact BIGINT token sum per domain, same literals,
    // same IEEE order.
    "q75_token_mixture" ->
      """WITH w AS (
        |  SELECT *, (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS cnt FROM w GROUP BY source),
        |f AS (
        |  SELECT source, CASE source
        |      WHEN 'src0' THEN least(1.0, 1000.0 * 0.4 / cnt)
        |      WHEN 'src1' THEN least(1.0, 1000.0 * 0.4 / cnt)
        |      WHEN 'src2' THEN least(1.0, 1000.0 * 0.2 / cnt)
        |      ELSE 0.0 END AS frac
        |  FROM c),
        |k AS (
        |  SELECT d.source, d.doc_id, d.n_tokens
        |  FROM w d JOIN f USING (source)
        |  WHERE f.frac >= 1.0
        |     OR substr(md5(CAST(d.doc_id AS VARCHAR) || 'r7t'), 1, 8)
        |        < printf('%08x', CAST(round(f.frac * 4294967296.0) AS BIGINT)))
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    // q69's stage-for-stage replay (dedup window, SimHash closure,
    // gates, scores, folds) extended with q74's chunk arithmetic and
    // q71's lane cumsum — the longest single cross-engine check in
    // the repo: one hash over eleven composed stages.
    "q77_curation_to_shards" ->
      """WITH RECURSIVE dd AS (
        |  SELECT doc_id, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |bits AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN i <= 32
        |             THEN CASE WHEN substr(md5(t.tok), i, 1) IN ('8','9','a','b','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |             ELSE CASE WHEN substr(md5(t.tok), i - 32, 1) IN ('4','5','6','7','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |        END) AS vote
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM dd) t
        |  CROSS JOIN range(1, 65) r(i)
        |  GROUP BY doc_id, i),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vote > 0 AND i <= 32 THEN power(2, 32 - i) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN vote > 0 AND i > 32 THEN power(2, 64 - i) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (
        |  SELECT src AS id, least(src, min(dst)) AS component
        |  FROM reach GROUP BY src),
        |kept AS (
        |  SELECT dd.* FROM dd LEFT JOIN comp ON dd.doc_id = comp.id
        |  WHERE comp.id IS NULL OR comp.component = dd.doc_id),
        |gm AS (
        |  SELECT doc_id, text,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS toks,
        |    len(list_distinct(string_split(text, ' '))) AS dtoks,
        |    len(list_distinct(list_transform(range(1, len(string_split(text,' '))),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))) AS dbg,
        |    length(text) AS chars,
        |    length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS syms,
        |    length(replace(text, ' ', '')) AS nonspace
        |  FROM kept),
        |g AS (
        |  SELECT doc_id, text FROM gm
        |  WHERE (CASE WHEN toks > 0 THEN 1.0 - CAST(dtoks AS DOUBLE) / toks ELSE 0.0 END) <= 0.3
        |    AND (CASE WHEN toks > 1 THEN 1.0 - CAST(dbg AS DOUBLE) / (toks - 1) ELSE 0.0 END) <= 0.3
        |    AND (CASE WHEN chars > 0 THEN CAST(syms AS DOUBLE) / chars ELSE 0.0 END) <= 0.1
        |    AND (CASE WHEN toks > 0 THEN CAST(nonspace AS DOUBLE) / toks ELSE 0.0 END) BETWEEN 2.0 AND 12.0),
        |s AS (
        |  SELECT doc_id, text,
        |    len(list_filter(string_split(text,' '), t -> t IN ('key','merge','batch'))) AS s_de,
        |    len(list_filter(string_split(text,' '), t -> t IN ('a','the','table'))) AS s_en,
        |    len(list_filter(string_split(text,' '), t -> t IN ('data','query','row'))) AS s_es,
        |    len(list_filter(string_split(text,' '), t -> t IN ('join','line','order'))) AS s_fr,
        |    len(list_filter(string_split(text,' '), t -> t IN ('scan','hash','part'))) AS s_zh,
        |    least(((CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)) / 100.0, 1.0) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text,' '),
        |          t -> t IN ('a','the','data','value','row'))) AS DOUBLE)
        |          / len(string_split(text,' '))) * 0.5 AS quality
        |  FROM g),
        |p2 AS (
        |  SELECT doc_id, text, quality,
        |    CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS predicted_lang
        |  FROM s),
        |fd AS (
        |  SELECT doc_id, text,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'r5'), 1, 8) < 'cccccccd' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'r5'), 1, 8) < 'e6666666' THEN 'val'
        |         ELSE 'test' END AS fold
        |  FROM p2
        |  WHERE quality >= 0.5 AND predicted_lang IN ('de','en','es','fr','zh')),
        |t2 AS (
        |  SELECT doc_id, fold, len(string_split(text, ' ')) AS n FROM fd),
        |c2 AS (
        |  SELECT *, CASE WHEN n <= 40 THEN 1
        |                 ELSE CAST(floor((n - 40 + 31) / 32.0) AS INT) + 1 END AS nch
        |  FROM t2),
        |x2 AS (
        |  SELECT doc_id, fold, n, unnest(range(0, nch)) AS k FROM c2),
        |ch AS (
        |  SELECT doc_id, fold, k, least(40, n - k * 32) AS ctoks FROM x2),
        |cm AS (
        |  SELECT *, fold || ':' || CAST(doc_id % 4 AS VARCHAR) AS pack_bucket,
        |    sum(ctoks) OVER (PARTITION BY fold || ':' || CAST(doc_id % 4 AS VARCHAR)
        |      ORDER BY doc_id, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM ch)
        |SELECT pack_bucket,
        |  CAST(floor((cum - ctoks) / 500.0) AS BIGINT) AS pack_shard,
        |  count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(ctoks) AS BIGINT) AS shard_tokens,
        |  min(doc_id) AS min_doc
        |FROM cm GROUP BY pack_bucket, pack_shard
        |ORDER BY pack_bucket, pack_shard""".stripMargin,

    // Mirrors Dsir.withImportanceWeights stage for stage: uni+bigram
    // occurrences (q62's bigram construction, all positions), 3-hex
    // md5 bucket, smoothed log-ratio in the IDENTICAL IEEE order
    // ((c+1.0)/(TOT+4096.0), ln, subtract), per-doc sum, left join
    // back. ORDER BY the rounded value + doc_id so the LIMIT boundary
    // is libm-divergence-proof.
    "q80_dsir_weights" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, lang, unnest(tk) AS gram FROM d
        |  WHERE text IS NOT NULL AND text <> ''
        |  UNION ALL
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS gram
        |  FROM d WHERE text IS NOT NULL AND len(tk) >= 2),
        |b AS (SELECT doc_id, lang, substr(md5(gram), 1, 3) AS bk FROM g),
        |c AS (SELECT bk, count(*) AS r,
        |        sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
        |      FROM b GROUP BY bk),
        |t AS (SELECT CAST(sum(r) AS DOUBLE) AS rr, CAST(sum(tc) AS DOUBLE) AS tt FROM c),
        |w AS (SELECT bk, ln((tc + 1.0) / (tt + 4096.0)) - ln((r + 1.0) / (rr + 4096.0)) AS delta
        |      FROM c, t),
        |s AS (SELECT doc_id, count(*) AS n_grams, sum(delta) AS llr
        |      FROM b JOIN w USING (bk) GROUP BY doc_id)
        |SELECT d2.doc_id, d2.lang, d2.source,
        |  COALESCE(s.n_grams, 0) AS n_grams,
        |  round(COALESCE(s.llr, 0.0), 6) AS llr,
        |  round(COALESCE(s.llr / s.n_grams, 0.0), 6) AS llr_pg
        |FROM documents d2 LEFT JOIN s USING (doc_id)
        |ORDER BY llr_pg DESC, doc_id LIMIT 20""".stripMargin,

    // Mirrors Dsir.withCrossEntropy: same gram/bucket construction,
    // -ln((r+1.0)/(RR+4096.0)) per bucket, per-doc mean; docs without
    // grams are excluded on both sides (inner join here, the
    // n_grams > 0 filter there).
    "q81_bucket_lm_xent" ->
      """WITH d AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(tk) AS gram FROM d
        |  WHERE text IS NOT NULL AND text <> ''
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS gram
        |  FROM d WHERE text IS NOT NULL AND len(tk) >= 2),
        |b AS (SELECT doc_id, substr(md5(gram), 1, 3) AS bk FROM g),
        |c AS (SELECT bk, count(*) AS r FROM b GROUP BY bk),
        |t AS (SELECT CAST(sum(r) AS DOUBLE) AS rr FROM c),
        |w AS (SELECT bk, -ln((r + 1.0) / (rr + 4096.0)) AS nll FROM c, t),
        |s AS (SELECT doc_id, count(*) AS n_grams, sum(nll) / count(*) AS xent
        |      FROM b JOIN w USING (bk) GROUP BY doc_id)
        |SELECT d2.lang, d2.source, count(*) AS n_docs,
        |  round(avg(s.xent), 6) AS avg_xent,
        |  round(min(s.xent), 6) AS min_xent,
        |  round(max(s.xent), 6) AS max_xent
        |FROM documents d2 JOIN s USING (doc_id)
        |GROUP BY d2.lang, d2.source
        |ORDER BY lang, source""".stripMargin,

    // Reconstructs the exact E-S priority: the 13-hex md5 prefix is
    // rebuilt digit by digit against exact powers of two (every term
    // and every partial sum an exact double), u = (h + 0.5) / 2^52
    // exactly, then ln(u)/n_tokens ranks within source. Zero-token
    // docs are dropped on both sides by construction. The EMITTED
    // priority column is the exact integer h, never the ln — JVM and
    // DuckDB libm differ by an ulp on some ln inputs, so any hashed
    // function of ln (even rounded) is cross-engine fragile.
    "q107_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n_tokens,
        |    substring(md5(CAST(doc_id AS VARCHAR) || 'r9es'), 1, 13) AS hx
        |  FROM documents),
        |hv AS (
        |  SELECT doc_id, source, n_tokens,
        |    list_sum(list_transform(range(1, 14),
        |      i -> CAST(strpos('0123456789abcdef', substring(hx, CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) AS h
        |  FROM w WHERE n_tokens > 0),
        |pr AS (
        |  SELECT doc_id, source, n_tokens, CAST(h AS BIGINT) AS priority_h,
        |    ln((h + 0.5) / 4503599627370496.0) / n_tokens AS pri
        |  FROM hv),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY pri DESC, CAST(doc_id AS VARCHAR)) AS rnk
        |  FROM pr)
        |SELECT source, rnk, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  priority_h
        |FROM r WHERE rnk <= 8 ORDER BY source, rnk""".stripMargin,

    // Same 13-hex digit-sum integer, % corpus size, +1 self-bump,
    // enrichment join, summary — every negative index replayed. The
    // index space is the DENSE RANK of doc_id (row_number - 1), the
    // sparse-id-safe form; on this testdata dense == doc_id.
    "q119_negative_sampling" ->
      """WITH d AS (SELECT doc_id, source,
        |             row_number() OVER (ORDER BY doc_id) - 1 AS dense
        |           FROM documents),
        |n AS (SELECT count(*) AS nn FROM d),
        |p AS (
        |  SELECT d.doc_id, d.source, d.dense, j,
        |    CAST(list_sum(list_transform(range(1, 14),
        |      i -> CAST(strpos('0123456789abcdef', substring(
        |             substring(md5(CAST(d.doc_id AS VARCHAR) || '|' || CAST(j AS VARCHAR) || 'neg9'), 1, 13),
        |             CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) AS BIGINT) % nn AS raw
        |  FROM d CROSS JOIN (SELECT unnest(range(3)) AS j) jj, n),
        |q AS (
        |  SELECT doc_id, source,
        |    CASE WHEN raw = dense THEN (raw + 1) % (SELECT nn FROM n) ELSE raw END AS neg_pos
        |  FROM p)
        |SELECT q.source, d2.source AS neg_source, count(*) AS n_pairs,
        |  count(DISTINCT d2.doc_id) AS n_distinct_negs
        |FROM q JOIN d d2 ON d2.dense = q.neg_pos
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Bigram-LM replay: token positions renumbered after the empty
    // filter, the same lead() bigrams, add-1 counts, and the
    // floored nano-nat terms.
    "q252_bigram_lm_nll" ->
      """WITH tt AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS arr
        |  FROM documents),
        |tok0 AS (
        |  SELECT doc_id, source, unnest(arr) AS w,
        |    generate_subscripts(arr, 1) AS i
        |  FROM tt),
        |tok AS (SELECT * FROM tok0 WHERE length(w) > 0),
        |seqd AS (
        |  SELECT doc_id, source, w,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
        |  FROM tok),
        |bi AS (
        |  SELECT doc_id, source, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY rn) AS w2
        |  FROM seqd),
        |b2 AS (SELECT * FROM bi WHERE w2 IS NOT NULL),
        |cxy AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |        FROM b2 GROUP BY 1, 2),
        |cx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
        |       FROM b2 GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok),
        |t AS (
        |  SELECT b.doc_id, b.source,
        |    CAST(floor(1000000000.0 * ln((CAST(cxy.c12 AS DOUBLE) + 1.0)
        |      / CAST(cx.c1 + vv.v AS DOUBLE)))
        |      AS BIGINT) AS nano
        |  FROM b2 b
        |  JOIN cxy ON cxy.w1 = b.w1 AND cxy.w2 = b.w2
        |  JOIN cx ON cx.w1 = b.w1
        |  CROSS JOIN vv)
        |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(-sum(nano) AS BIGINT) AS total_nll_nano,
        |  CAST(-sum(nano) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS avg_nll_nano
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    // Kneser-Ney replay: q252's tokenization/bigram CTEs + the
    // follower/predecessor fan-out counts and the distinct-bigram
    // total, then the SAME shared KnTermNano text, per-doc integer
    // NLL, the global per-bigram mean, and the flagged census.
    "q351_kneser_ney_nll" ->
      s"""WITH tt AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS arr
        |  FROM documents),
        |tok0 AS (
        |  SELECT doc_id, source, unnest(arr) AS w,
        |    generate_subscripts(arr, 1) AS i
        |  FROM tt),
        |tok AS (SELECT * FROM tok0 WHERE length(w) > 0),
        |seqd AS (
        |  SELECT doc_id, source, w,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
        |  FROM tok),
        |bi0 AS (
        |  SELECT doc_id, source, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY rn) AS w2
        |  FROM seqd),
        |b2 AS (SELECT * FROM bi0 WHERE w2 IS NOT NULL),
        |cxy AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |        FROM b2 GROUP BY 1, 2),
        |cx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1,
        |         CAST(count(DISTINCT w2) AS BIGINT) AS nfol
        |       FROM b2 GROUP BY 1),
        |pre AS (SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS npre
        |        FROM b2 GROUP BY 1),
        |bb AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM cxy),
        |t AS (
        |  SELECT b.doc_id, b.source, $KnTermNano AS nano
        |  FROM b2 b
        |  JOIN cxy ON cxy.w1 = b.w1 AND cxy.w2 = b.w2
        |  JOIN cx ON cx.w1 = b.w1
        |  JOIN pre ON pre.w2 = b.w2
        |  CROSS JOIN bb),
        |pd AS (
        |  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(-sum(nano) AS BIGINT) AS doc_nll
        |  FROM t GROUP BY 1, 2),
        |pd2 AS (SELECT *, doc_nll // nb AS doc_avg FROM pd),
        |g AS (SELECT CAST(sum(doc_nll) AS BIGINT)
        |        // CAST(sum(nb) AS BIGINT) AS g_avg FROM pd2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nb) AS BIGINT) AS n_bigrams,
        |  CAST(sum(doc_nll) AS BIGINT) AS total_nll_nano,
        |  CAST(sum(doc_nll) AS BIGINT) // CAST(sum(nb) AS BIGINT)
        |    AS avg_nll_nano,
        |  CAST(sum(CASE WHEN doc_avg > g_avg THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  (CAST(sum(CASE WHEN doc_avg > g_avg THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS flagged_ppm
        |FROM pd2 CROSS JOIN g
        |GROUP BY source ORDER BY source""".stripMargin,

    // Kappa replay: identical integer grade bands, the same cell /
    // marginal aggregation, and the shared ppm statistics.
    "q355_judge_agreement" -> {
      val stopList = TextQueries.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)) AS BIGINT) AS ntok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ($stopList))) AS BIGINT) AS nstop
        |  FROM documents),
        |g AS (
        |  SELECT source,
        |    CAST(CASE WHEN ntok >= 60 THEN 2 WHEN ntok >= 35 THEN 1
        |         ELSE 0 END AS BIGINT) AS ga,
        |    CAST(CASE WHEN 6 * nstop >= ntok THEN 2
        |         WHEN 9 * nstop >= ntok THEN 1 ELSE 0 END AS BIGINT) AS gb
        |  FROM t),
        |m AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ga = gb THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(abs(ga - gb)) AS BIGINT) AS dd,
        |    CAST(sum(CASE WHEN ga = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ra0,
        |    CAST(sum(CASE WHEN ga = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ra1,
        |    CAST(sum(CASE WHEN ga = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ra2,
        |    CAST(sum(CASE WHEN gb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb0,
        |    CAST(sum(CASE WHEN gb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb1,
        |    CAST(sum(CASE WHEN gb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS cb2
        |  FROM g GROUP BY source),
        |k AS (
        |  SELECT *, ra0*cb0 + ra1*cb1 + ra2*cb2 AS s,
        |    ra0*cb1 + 2*ra0*cb2 + ra1*(cb0+cb2) + 2*ra2*cb0 + ra2*cb1 AS e
        |  FROM m)
        |SELECT source, n AS n_docs, a AS n_agree,
        |  $KappaPpm AS kappa_ppm,
        |  $WkappaPpm AS wkappa_ppm
        |FROM k ORDER BY source""".stripMargin
    },

    // DP-census replay: the q119 strpos 13-hex md5 parse reproduces
    // Spark's conv() integer exactly (powers-of-two terms, all
    // partial sums < 2^53), then the SAME DpNoisyMilli texts.
    "q356_dp_noisy_census" ->
      s"""WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |hh AS (
        |  SELECT source, lang, c,
        |    CAST(list_sum(list_transform(range(1, 14),
        |      i -> CAST(strpos('0123456789abcdef', substring(
        |             substring(md5(source || '|' || lang || '|dp18'), 1, 13),
        |             CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) AS BIGINT)
        |      AS h
        |  FROM c)
        |SELECT source, lang,
        |  ${DpNoisyMilli("1")} AS noisy_eps1_milli,
        |  ${DpNoisyMilli("0.25")} AS noisy_eps025_milli
        |FROM hh ORDER BY source, lang""".stripMargin,

    // EB replay: same gate, same nano-floored rate moments, same
    // shared shrinkage texts over the exact integer aggregates.
    "q360_eb_shrunk_rates" ->
      s"""WITH gr AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN len(list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)) >= 35 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM documents GROUP BY 1, 2),
        |gr2 AS (
        |  SELECT *, ${graft.ext.EmpiricalBayes.RateNano} AS r FROM gr),
        |gr3 AS (
        |  SELECT *, ${graft.ext.EmpiricalBayes.Rate2Nano} AS r2 FROM gr2),
        |mom AS (
        |  SELECT CAST(sum(r) AS BIGINT) AS sr,
        |    CAST(sum(r2) AS BIGINT) AS sr2,
        |    CAST(count(*) AS BIGINT) AS g
        |  FROM gr3)
        |SELECT source, lang, n, k,
        |  CAST(floor(1000000.0 * CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS BIGINT) AS raw_ppm,
        |  ${graft.ext.EmpiricalBayes.AbMilli} AS prior_ab_milli,
        |  ${graft.ext.EmpiricalBayes.ShrunkPpm} AS shrunk_ppm
        |FROM gr3 CROSS JOIN mom ORDER BY source, lang""".stripMargin,

    // Chao1 replay: q328's frequency-of-frequencies census + the
    // all-integer bias-corrected estimator.
    "q361_chao1_richness" ->
      """WITH wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) t
        |  WHERE length(w) > 0 GROUP BY 1, 2),
        |f AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM wc GROUP BY source)
        |SELECT source, n_tokens, n_types, f1, f2,
        |  1000 * n_types + (1000 * f1 * (f1 - 1)) // (2 * (f2 + 1))
        |    AS chao1_milli,
        |  (1000 * f1 * (f1 - 1)) // (2 * (f2 + 1)) AS unseen_types_milli,
        |  ((n_tokens - f1) * 1000000) // n_tokens AS coverage_ppm
        |FROM f ORDER BY source""".stripMargin,

    // Burrows replay: same top-20 selection, zero-filled ppm grid,
    // integer z pieces through the shared text, nano-floored pair
    // terms.
    "q363_burrows_delta" ->
      s"""WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |sw AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM toks
        |  WHERE length(w) > 0 GROUP BY 1, 2),
        |totals AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM sw GROUP BY 1),
        |top AS (
        |  SELECT w FROM (
        |    SELECT w, row_number() OVER (ORDER BY sum(c) DESC, w) AS rk
        |    FROM sw GROUP BY w) WHERE rk <= 20),
        |grid AS (
        |  SELECT t.source, top.w,
        |    (coalesce(sw.c, 0) * 1000000) // t.tot AS f
        |  FROM totals t CROSS JOIN top
        |  LEFT JOIN sw ON sw.source = t.source AND sw.w = top.w),
        |st AS (
        |  SELECT w, CAST(sum(f) AS BIGINT) AS sf,
        |    CAST(sum(f * f) AS BIGINT) AS sf2,
        |    CAST(count(*) AS BIGINT) AS g
        |  FROM grid GROUP BY w),
        |z AS (
        |  SELECT grid.source, grid.w, $BurrowsZ AS z
        |  FROM grid JOIN st ON grid.w = st.w),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(floor(1000000000.0 * abs(a.z - b.z)) AS BIGINT) AS t
        |  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(t) AS BIGINT) AS sum_nano,
        |  CAST(sum(t) AS BIGINT) // CAST(count(*) AS BIGINT) AS delta_nano
        |FROM pairs GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    // CDC replay: identical 8-char-window boundary rule (4-hex md5
    // parse, the q156 idiom), chunk spans via lead(), and the same
    // content-hash dedup ledger.
    "q251_cdc_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, length(text) AS len FROM documents),
        |pos AS (
        |  SELECT doc_id, source, text, len,
        |    unnest(range(1, greatest(len - 7, 1) + 1)) AS p
        |  FROM d),
        |b AS (
        |  SELECT * FROM pos
        |  WHERE p = 1 OR
        |    CAST(list_sum(list_transform(range(1, 5),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(substring(text, CAST(p AS INTEGER), 8)),
        |                       CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (4 - i) AS DOUBLE)))) AS BIGINT)
        |      % 32 = 0),
        |c AS (
        |  SELECT source,
        |    substring(text, CAST(p AS INTEGER),
        |      CAST(coalesce(lead(p) OVER (PARTITION BY doc_id ORDER BY p),
        |                    len + 1) - p AS INTEGER)) AS chunk
        |  FROM b),
        |h AS (SELECT source, md5(chunk) AS ch,
        |        CAST(length(chunk) AS BIGINT) AS clen FROM c),
        |g AS (SELECT source, ch, CAST(count(*) AS BIGINT) AS n,
        |        CAST(max(clen) AS BIGINT) AS clen
        |      FROM h GROUP BY 1, 2)
        |SELECT source, CAST(sum(n) AS BIGINT) AS n_chunks,
        |  CAST(count(*) AS BIGINT) AS n_unique,
        |  CAST(sum(n * clen) AS BIGINT) AS bytes_total,
        |  CAST(sum(clen) AS BIGINT) AS bytes_unique,
        |  ((CAST(sum(n * clen) AS BIGINT) - CAST(sum(clen) AS BIGINT))
        |    * 1000000) // CAST(sum(n * clen) AS BIGINT) AS dup_ratio_ppm
        |FROM g GROUP BY source ORDER BY source""".stripMargin,

    // HRW replay: identical md5 hex-string argmax (h DESC, sh DESC =
    // Spark's max(struct)) at k=32 and k=33, occupancy and movers.
    "q263_rendezvous_shards" ->
      """WITH hh AS (
        |  SELECT doc_id, s.sh,
        |    md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s.sh AS VARCHAR))
        |      AS h
        |  FROM documents, (SELECT unnest(range(0, 33)) AS sh) s),
        |a32 AS (
        |  SELECT doc_id, sh AS s32 FROM (
        |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY h DESC, sh DESC) AS rn
        |    FROM hh WHERE sh < 32) WHERE rn = 1),
        |a33 AS (
        |  SELECT doc_id, sh AS s33 FROM (
        |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY h DESC, sh DESC) AS rn
        |    FROM hh) WHERE rn = 1),
        |j AS (
        |  SELECT a32.doc_id, s32, s33
        |  FROM a32 JOIN a33 ON a32.doc_id = a33.doc_id),
        |occ AS (
        |  SELECT CAST(min(c) AS BIGINT) AS occ_min,
        |    CAST(max(c) AS BIGINT) AS occ_max,
        |    CAST(count(*) AS BIGINT) AS n_shards
        |  FROM (SELECT s32, count(*) AS c FROM j GROUP BY s32)),
        |mv AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN s33 <> s32 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_moved
        |  FROM j)
        |SELECT n_docs, n_shards, occ_min, occ_max, n_moved,
        |  (n_moved * 1000000) // n_docs AS moved_ppm
        |FROM mv CROSS JOIN occ ORDER BY n_docs""".stripMargin,

    // Card replay: same non-empty token counts, cell censuses and
    // floor shares.
    "q306_dataset_card" ->
      """WITH t AS (
        |  SELECT source, lang,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM cells)
        |SELECT source, lang, n_docs, n_tokens,
        |  n_tokens // n_docs AS mean_tokens_floor,
        |  (n_tokens * 1000000) // tt AS token_share_ppm
        |FROM cells CROSS JOIN tot ORDER BY source, lang""".stripMargin,

    // Diversity replay: same per-source word counts and ratios.
    "q298_lexical_diversity" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM w WHERE length(w) > 0 GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  (CAST(count(*) AS BIGINT) * 1000000) // CAST(sum(c) AS BIGINT)
        |    AS ttr_ppm,
        |  (CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS hapax_ppm
        |FROM wc GROUP BY source ORDER BY source""".stripMargin,

    // Perplexity-filter replay: the q252 bigram construction split on
    // doc parity — counts from the even half, LEFT joins + coalesce(0)
    // for unseen odd-half bigrams, the SHARED floored nano-nat term,
    // integer threshold and keep census.
    "q291_perplexity_filter" ->
      """WITH tt AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS arr
        |  FROM documents),
        |tok0 AS (
        |  SELECT doc_id, source, unnest(arr) AS w,
        |    generate_subscripts(arr, 1) AS i
        |  FROM tt),
        |tok AS (SELECT * FROM tok0 WHERE length(w) > 0),
        |seqd AS (
        |  SELECT doc_id, source, w,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
        |  FROM tok),
        |bi AS (
        |  SELECT doc_id, source, doc_id % 2 AS par, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY rn) AS w2
        |  FROM seqd),
        |b2 AS (SELECT * FROM bi WHERE w2 IS NOT NULL),
        |tr AS (SELECT * FROM b2 WHERE par = 0),
        |cxy AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |        FROM tr GROUP BY 1, 2),
        |cx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
        |       FROM tr GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        |       FROM tok WHERE doc_id % 2 = 0),
        |thr AS (
        |  SELECT (-sum(CAST(floor(1000000000.0 *
        |      ln((CAST(coalesce(c12, 0) AS DOUBLE) + 1.0) / CAST(coalesce(c1, 0) + v AS DOUBLE)))
        |      AS BIGINT))) // CAST(count(*) AS BIGINT) AS thr_nano
        |  FROM tr b
        |  LEFT JOIN cxy ON cxy.w1 = b.w1 AND cxy.w2 = b.w2
        |  LEFT JOIN cx ON cx.w1 = b.w1
        |  CROSS JOIN vv),
        |docs AS (
        |  SELECT b.doc_id, b.source,
        |    (-sum(CAST(floor(1000000000.0 *
        |      ln((CAST(coalesce(c12, 0) AS DOUBLE) + 1.0) / CAST(coalesce(c1, 0) + v AS DOUBLE)))
        |      AS BIGINT))) // CAST(count(*) AS BIGINT) AS doc_nll
        |  FROM b2 b
        |  LEFT JOIN cxy ON cxy.w1 = b.w1 AND cxy.w2 = b.w2
        |  LEFT JOIN cx ON cx.w1 = b.w1
        |  CROSS JOIN vv
        |  WHERE b.par = 1
        |  GROUP BY b.doc_id, b.source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_nll <= thr_nano THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(max(thr_nano) AS BIGINT) AS thr_nano,
        |  (CAST(sum(CASE WHEN doc_nll <= thr_nano THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS kept_ppm
        |FROM docs CROSS JOIN thr
        |GROUP BY source ORDER BY source""".stripMargin,

    // Pad-waste replay: same non-empty token counts, bit-length
    // buckets, exact padded-slot arithmetic.
    "q294_pad_waste" ->
      """WITH lens AS (
        |  SELECT CAST(len(list_filter(string_split(text, ' '),
        |    x -> length(x) > 0)) AS BIGINT) AS n
        |  FROM documents),
        |lz AS (SELECT n FROM lens WHERE n > 0),
        |b AS (
        |  SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n) AS BIGINT) AS sum_tokens,
        |    CAST(max(n) AS BIGINT) AS max_tokens
        |  FROM lz GROUP BY 1)
        |SELECT bucket, n_docs, sum_tokens, max_tokens,
        |  n_docs * max_tokens - sum_tokens AS pad_tokens,
        |  ((n_docs * max_tokens - sum_tokens) * 1000000)
        |    // (n_docs * max_tokens) AS waste_ppm
        |FROM b ORDER BY bucket""".stripMargin,

    // Poisson-bootstrap replay: q67's gate formulas, the SAME integer
    // threshold ladder over the digit-sum md5 replay, and the shared
    // SE text over exact integer replicate-rate sums.
    "q371_poisson_bootstrap" ->
      ("WITH " + GateCtesSql + ",\n" +
       s"""wts AS (
        |  SELECT r.replicate, g.pass,
        |    ${poissonLadder(
             "CAST(list_sum(list_transform(range(1, 9), " +
               "i -> CAST(strpos('0123456789abcdef', " +
               "substring(md5(CAST(g.doc_id AS VARCHAR) || '_r' || " +
               "CAST(r.replicate AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 " +
               "AS DOUBLE) * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) " +
               "AS BIGINT)")} AS w
        |  FROM g CROSS JOIN range(0, 40) r(replicate)),
        |rt AS (
        |  SELECT CAST(replicate AS BIGINT) AS replicate,
        |    CAST(sum(w) AS BIGINT) AS w_tot,
        |    CAST(sum(CASE WHEN pass THEN w ELSE 0 END) AS BIGINT) AS pass_w
        |  FROM wts GROUP BY replicate),
        |rr AS (
        |  SELECT replicate, w_tot, pass_w,
        |    CASE WHEN w_tot > 0 THEN (pass_w * 1000000) // w_tot
        |      ELSE NULL END AS rate_ppm
        |  FROM rt),
        |sums AS (
        |  SELECT CAST(sum(rate_ppm) AS BIGINT) AS sum_r,
        |    CAST(sum(rate_ppm * rate_ppm) AS BIGINT) AS sum_r2
        |  FROM rr),
        |se AS (SELECT $BootSeMilli AS se_milli_ppm FROM sums),
        |pt AS (
        |  SELECT (CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS point_rate_ppm
        |  FROM g)
        |SELECT rr.replicate, rr.w_tot, rr.pass_w, rr.rate_ppm,
        |  se.se_milli_ppm, pt.point_rate_ppm
        |FROM rr, se, pt ORDER BY rr.replicate""").stripMargin,

    // McNemar replay: q142's score chain, q67's gate formulas, the
    // discordant-cell aggregate, and the shared statistic text
    // (zero-token docs keep score 0 via LEFT JOIN + coalesce, the
    // q142 convention).
    "q370_mcnemar" ->
      ("WITH " + HashScoreCtesSql + ",\n" + GateCtesSql + ",\n" +
       s"""j AS (
        |  SELECT coalesce(sc.score, 0) > 0 AS a_pred,
        |    g.n_subwords >= 20 AS b_pred, g.pass
        |  FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |    CAST(sum(CASE WHEN a_pred = pass AND b_pred <> pass
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
        |    CAST(sum(CASE WHEN a_pred <> pass AND b_pred = pass
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt
        |  FROM j)
        |SELECT n_docs, n_pass, b_cnt, c_cnt, $McNemarMilli AS chi2_milli,
        |  $McNemarMilli >= 3841 AS significant
        |FROM a ORDER BY n_docs""").stripMargin,

    // α-sampling replay: the q161 token-count text, the shared
    // TempWMicro weight, and the exact integer share/allocation/
    // epochs chain.
    "q369_temperature_mixture" ->
      (s"""WITH caps AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_tokens, $TempWMicro AS w_micro FROM caps),
        |t AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_n,
        |    CAST(sum(w_micro) AS BIGINT) AS tot_w
        |  FROM w)
        |SELECT source, n_tokens,
        |${tempMixCols("//").map { case (n, t) => s"  $t AS $n" }
            .mkString(",\n")}
        |FROM w, t ORDER BY source""").stripMargin,

    // Calibration replay: q142's hashed score chain (digit-sum hex
    // replay), q67's gate formulas as the truth bit, the SHARED
    // CalibConfPpm link text, decile bins, and the integer ECE.
    "q367_calibration_ece" ->
      ("WITH " + HashScoreCtesSql + ",\n" + GateCtesSql + ",\n" +
       s"""base AS (
        |  SELECT g.pass, $CalibConfPpm AS conf_ppm
        |  FROM g JOIN sc ON g.doc_id = sc.doc_id
        |  WHERE g.n_subwords > 0),
        |b AS (
        |  SELECT pass, conf_ppm,
        |    least(CAST(9 AS BIGINT), conf_ppm // 100000) AS bin
        |  FROM base),
        |c AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(conf_ppm) AS BIGINT) AS sum_conf,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |  FROM b GROUP BY bin),
        |r AS (
        |  SELECT bin, n_docs, n_pass,
        |    sum_conf // n_docs AS mean_conf_ppm,
        |    (n_pass * 1000000) // n_docs AS acc_ppm
        |  FROM c),
        |e AS (
        |  SELECT CAST(sum(n_docs * abs(acc_ppm - mean_conf_ppm)) AS BIGINT)
        |    // CAST(sum(n_docs) AS BIGINT) AS ece_ppm
        |  FROM r)
        |SELECT r.bin, r.n_docs, r.n_pass, r.mean_conf_ppm, r.acc_ppm,
        |  r.acc_ppm - r.mean_conf_ppm AS gap_ppm, e.ece_ppm
        |FROM r, e ORDER BY bin""").stripMargin,

    // BH-FDR replay: q67's gate formulas, per-source exact cells, the
    // SHARED A&S erfc p-value text, and the integer step-up (floored
    // threshold, ties broken on source — both engines sort the same).
    "q372_bh_fdr" ->
      ("WITH " + GateCtesSql + ",\n" +
       s"""per AS (
        |  SELECT dd.source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN g.pass THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pass
        |  FROM g JOIN documents dd ON dd.doc_id = g.doc_id
        |  GROUP BY dd.source),
        |tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS tot_n,
        |    CAST(sum(n_pass) AS BIGINT) AS tot_p,
        |    CAST(count(*) AS BIGINT) AS m_src
        |  FROM per),
        |sc2 AS (
        |  SELECT source, n_docs, n_pass, m_src,
        |    (n_pass * 1000000) // n_docs AS rate_ppm,
        |    $BhPMicro AS p_micro
        |  FROM per, tot),
        |rk AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY p_micro, source)
        |    AS BIGINT) AS rk
        |  FROM sc2),
        |rk2 AS (SELECT *, (rk * 50000) // m_src AS bh_cut_micro FROM rk),
        |km AS (
        |  SELECT max(CASE WHEN p_micro <= bh_cut_micro THEN rk ELSE 0 END)
        |    AS k FROM rk2)
        |SELECT source, n_docs, n_pass, rate_ppm, p_micro, rk, bh_cut_micro,
        |  rk <= km.k AS rejected
        |FROM rk2, km ORDER BY rk""").stripMargin,

    // Isotonic replay: q367's bins verbatim, the interval / minimax
    // CTEs mirroring graft.ext.Calibration's joins, and both ECEs.
    "q373_isotonic_calibration" ->
      ("WITH " + HashScoreCtesSql + ",\n" + GateCtesSql + ",\n" +
       s"""base AS (
        |  SELECT g.pass, $CalibConfPpm AS conf_ppm
        |  FROM g JOIN sc ON g.doc_id = sc.doc_id
        |  WHERE g.n_subwords > 0),
        |b AS (
        |  SELECT pass, conf_ppm,
        |    least(CAST(9 AS BIGINT), conf_ppm // 100000) AS bin
        |  FROM base),
        |c AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(conf_ppm) AS BIGINT) AS sum_conf,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |  FROM b GROUP BY bin),
        |r AS (
        |  SELECT bin, n_docs, n_pass,
        |    sum_conf // n_docs AS mean_conf_ppm,
        |    (n_pass * 1000000) // n_docs AS acc_ppm
        |  FROM c),
        |iv AS (
        |  SELECT j.bin AS jb, k.bin AS kb,
        |    (CAST(sum(x.n_pass) AS BIGINT) * 1000000)
        |      // CAST(sum(x.n_docs) AS BIGINT) AS avg_ppm
        |  FROM r j, r k, r x
        |  WHERE j.bin <= k.bin AND x.bin BETWEEN j.bin AND k.bin
        |  GROUP BY 1, 2),
        |mins AS (
        |  SELECT i.bin AS ib, v.jb, min(v.avg_ppm) AS mn
        |  FROM r i JOIN iv v ON v.jb <= i.bin AND v.kb >= i.bin
        |  GROUP BY 1, 2),
        |iso AS (SELECT ib, max(mn) AS iso_ppm FROM mins GROUP BY ib),
        |f AS (SELECT r.*, iso.iso_ppm FROM r JOIN iso ON r.bin = iso.ib),
        |e AS (
        |  SELECT
        |    CAST(sum(n_docs * abs(acc_ppm - mean_conf_ppm)) AS BIGINT)
        |      // CAST(sum(n_docs) AS BIGINT) AS ece_raw_ppm,
        |    CAST(sum(n_docs * abs(acc_ppm - iso_ppm)) AS BIGINT)
        |      // CAST(sum(n_docs) AS BIGINT) AS ece_iso_ppm
        |  FROM f)
        |SELECT f.bin, f.n_docs, f.n_pass, f.mean_conf_ppm, f.acc_ppm,
        |  f.iso_ppm, e.ece_raw_ppm, e.ece_iso_ppm
        |FROM f, e ORDER BY bin""").stripMargin,

    // Brier replay: q367's confidence link at milli scale, the exact
    // integer squared-error sums, and the Murphy components.
    "q374_brier_decomposition" ->
      ("WITH " + HashScoreCtesSql + ",\n" + GateCtesSql + ",\n" +
       s"""base AS (
        |  SELECT g.pass, $CalibConfPpm AS conf_ppm
        |  FROM g JOIN sc ON g.doc_id = sc.doc_id
        |  WHERE g.n_subwords > 0),
        |doc AS (
        |  SELECT conf_ppm // 1000 AS cm,
        |    CASE WHEN pass THEN CAST(1000 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS ym
        |  FROM base),
        |ga AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN ym = 1000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pass,
        |    CAST(sum((cm - ym) * (cm - ym)) AS BIGINT) AS se_sum
        |  FROM doc),
        |g2 AS (SELECT *, (n_pass * 1000) // n_docs AS ybar_m FROM ga),
        |bn AS (
        |  SELECT least(CAST(9 AS BIGINT), cm // 100) AS bin,
        |    CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(cm) AS BIGINT) AS sum_cm,
        |    CAST(sum(CASE WHEN ym = 1000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pb
        |  FROM doc GROUP BY 1),
        |bm AS (
        |  SELECT nb, sum_cm // nb AS mcb, (pb * 1000) // nb AS accb
        |  FROM bn),
        |comp AS (
        |  SELECT
        |    CAST(sum(nb * (mcb - accb) * (mcb - accb)) AS BIGINT)
        |      AS rel_sum,
        |    CAST(sum(nb * (accb - g2.ybar_m) * (accb - g2.ybar_m))
        |      AS BIGINT) AS res_sum
        |  FROM bm, g2)
        |SELECT g2.n_docs, g2.n_pass, g2.ybar_m AS ybar_milli,
        |  g2.se_sum // g2.n_docs AS brier_m2,
        |  comp.rel_sum // g2.n_docs AS rel_m2,
        |  comp.res_sum // g2.n_docs AS res_m2,
        |  g2.ybar_m * (1000 - g2.ybar_m) AS unc_m2,
        |  g2.se_sum // g2.n_docs - g2.ybar_m * (1000 - g2.ybar_m)
        |    + comp.res_sum // g2.n_docs - comp.rel_sum // g2.n_docs
        |    AS wv_resid_m2
        |FROM g2, comp ORDER BY n_docs""").stripMargin,

    // Fairness replay: q142's score chain (zero-token docs keep score
    // 0 via LEFT JOIN + coalesce, the q142 convention), q67's gate
    // truth, the per-source contingency cells, and the SHARED
    // rate/gap generator at the DuckDB division token.
    "q375_fairness_audit" ->
      ("WITH " + HashScoreCtesSql + ",\n" + GateCtesSql + ",\n" +
       s"""j AS (
        |  SELECT dd.source, coalesce(sc.score, 0) > 0 AS a_pred, g.pass
        |  FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id
        |  JOIN documents dd ON dd.doc_id = g.doc_id),
        |per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pass,
        |    CAST(sum(CASE WHEN a_pred THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_sel,
        |    CAST(sum(CASE WHEN a_pred AND pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_tp,
        |    CAST(sum(CASE WHEN a_pred AND NOT pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_fp
        |  FROM j GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS t_n,
        |    CAST(sum(n_pass) AS BIGINT) AS t_pass,
        |    CAST(sum(n_sel) AS BIGINT) AS t_sel,
        |    CAST(sum(n_tp) AS BIGINT) AS t_tp,
        |    CAST(sum(n_fp) AS BIGINT) AS t_fp
        |  FROM per)
        |SELECT source, n_docs,
        |${fairnessCols("//").map { case (n, t) => s"  $t AS $n" }
            .mkString(",\n")}
        |FROM per, tot ORDER BY source""").stripMargin,

    // Held-out replay: q368's split CTEs (simhash components + the
    // SHARED cluster-hash split case), q367's confidence chain, the
    // per-split censuses, the q373 minimax PAV over the TRAIN bins
    // only, the step extension onto test bins (arg_max over ib <= bin
    // mirroring Spark's max_by), and the test-side ECE/Brier.
    "q379_heldout_calibration" ->
      (simhashCompCtes + ",\n" +
       HashScoreCtesSql + ",\n" + GateCtesSql + ",\n" +
       s"""asg AS (
        |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |slab AS (
        |  SELECT doc_id, ${TextDedupQueries.SplitCaseDuck} AS split
        |  FROM asg),
        |base AS (
        |  SELECT g.pass, $CalibConfPpm AS conf_ppm, l.split
        |  FROM g JOIN sc ON g.doc_id = sc.doc_id
        |  JOIN slab l ON l.doc_id = g.doc_id
        |  WHERE g.n_subwords > 0),
        |b2 AS (
        |  SELECT split, pass, conf_ppm,
        |    least(CAST(9 AS BIGINT), conf_ppm // 100000) AS bin
        |  FROM base),
        |cen AS (
        |  SELECT split, bin, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(conf_ppm) AS BIGINT) AS sum_conf,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |  FROM b2 GROUP BY split, bin),
        |r AS (
        |  SELECT split, bin, n_docs, n_pass,
        |    sum_conf // n_docs AS mean_conf_ppm,
        |    (n_pass * 1000000) // n_docs AS acc_ppm
        |  FROM cen),
        |tr AS (SELECT * FROM r WHERE split = 'train'),
        |te AS (SELECT * FROM r WHERE split = 'test'),
        |iv AS (
        |  SELECT j2.bin AS jb, k.bin AS kb,
        |    (CAST(sum(x.n_pass) AS BIGINT) * 1000000)
        |      // CAST(sum(x.n_docs) AS BIGINT) AS avg_ppm
        |  FROM tr j2, tr k, tr x
        |  WHERE j2.bin <= k.bin AND x.bin BETWEEN j2.bin AND k.bin
        |  GROUP BY 1, 2),
        |mins AS (
        |  SELECT i.bin AS ib, v.jb, min(v.avg_ppm) AS mn
        |  FROM tr i JOIN iv v ON v.jb <= i.bin AND v.kb >= i.bin
        |  GROUP BY 1, 2),
        |iso AS (SELECT ib, max(mn) AS iso_ppm FROM mins GROUP BY ib),
        |below AS (
        |  SELECT t.bin AS bin, arg_max(i.iso_ppm, i.ib) AS iso_below
        |  FROM te t JOIN iso i ON i.ib <= t.bin GROUP BY t.bin),
        |mini AS (SELECT arg_min(iso_ppm, ib) AS iso_floor FROM iso),
        |ap AS (
        |  SELECT te.bin, te.n_docs, te.n_pass, te.mean_conf_ppm,
        |    te.acc_ppm, coalesce(b.iso_below, mini.iso_floor) AS iso_ppm
        |  FROM te LEFT JOIN below b ON te.bin = b.bin, mini),
        |e AS (
        |  SELECT
        |    CAST(sum(n_docs * abs(acc_ppm - mean_conf_ppm)) AS BIGINT)
        |      // CAST(sum(n_docs) AS BIGINT) AS ece_raw_ppm,
        |    CAST(sum(n_docs * abs(acc_ppm - iso_ppm)) AS BIGINT)
        |      // CAST(sum(n_docs) AS BIGINT) AS ece_iso_ppm
        |  FROM ap),
        |bd AS (
        |  SELECT conf_ppm // 1000 AS cm,
        |    CASE WHEN pass THEN CAST(1000 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS ym,
        |    least(CAST(9 AS BIGINT), conf_ppm // 100000) AS bin
        |  FROM base WHERE split = 'test'),
        |br AS (
        |  SELECT
        |    CAST(sum((bd.cm - bd.ym) * (bd.cm - bd.ym)) AS BIGINT)
        |      // CAST(count(*) AS BIGINT) AS brier_raw_m2,
        |    CAST(sum((ap.iso_ppm // 1000 - bd.ym)
        |      * (ap.iso_ppm // 1000 - bd.ym)) AS BIGINT)
        |      // CAST(count(*) AS BIGINT) AS brier_iso_m2
        |  FROM bd JOIN ap ON bd.bin = ap.bin)
        |SELECT ap.bin, ap.n_docs, ap.n_pass, ap.mean_conf_ppm,
        |  ap.acc_ppm, ap.iso_ppm, e.ece_raw_ppm, e.ece_iso_ppm,
        |  br.brier_raw_m2, br.brier_iso_m2
        |FROM ap, e, br ORDER BY bin""").stripMargin,
  )
}
