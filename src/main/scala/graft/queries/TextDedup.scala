package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextStats}
import graft.tables.Tables
import TextQueries.{Stopwords, LangProfiles, simhashCompCtes, bm25Ctes}

/** Document DEDUP queries: exact/fingerprint dedup, MinHash-LSH /
  * SimHash / containment / edit-distance near-dup, dup components,
  * decontamination, dup-span stats + span/boilerplate cutting,
  * corpus novelty, dataset fingerprints, greedy coverage.
  *
  * Split from the single TextQueries object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[TextQueries]].
  */
object TextDedupQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** q368/q379's near-dup pair frame (the split unit's edge set) —
    * ONE copy of the simhash parameters, so the held-out calibration
    * eval (q379) scores on exactly the split q368 audits. `docs` must
    * carry (doc_id, text). */
  private[queries] def splitNearDupPairs(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Dedup.simHashNearDups(docs, "doc_id", "text",
        maxHamming = 3, bits = 64)
      .select("id_a", "id_b")

  /** q368/q379's cluster-aware split assignment: each doc joins its
    * near-dup component (singletons self-cluster on doc_id), and the
    * CLUSTER id hashes to the 80/20 side via [[SplitCaseSpark]] —
    * members inherit the cluster's side, so near-duplicates can never
    * straddle the boundary. Carries every non-key column of `docs`
    * through. */
  private[queries] def clusterSplits(
      docs: org.apache.spark.sql.DataFrame,
      pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .join(Dedup.connectedComponents(pairs)
          .select(col("id").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(docs.columns.map(col) :+
        coalesce(col("component"), col("doc_id")).as("cluster"): _*)
      .withColumn("split", expr(SplitCaseSpark))

  /** The split hash over `cluster`, Spark text: md5 first-8-hex as an
    * integer (conv), mod 5 — bucket 4 is 'test'. The DuckDB twin
    * [[SplitCaseDuck]] replays the SAME integer via the digit-sum
    * (the q142 convention: engine-specific hash texts, identical
    * integer semantics). */
  private[queries] val SplitCaseSpark: String =
    "CASE WHEN CAST(conv(substring(md5(CAST(cluster AS STRING)), " +
      "1, 8), 16, 10) AS BIGINT) % 5 = 4 THEN 'test' " +
      "ELSE 'train' END"

  /** [[SplitCaseSpark]]'s DuckDB twin — shared by the q368 and q379
    * oracles so the split replay cannot drift between them. */
  private[queries] val SplitCaseDuck: String =
    """CASE WHEN CAST(list_sum(list_transform(range(1, 9),
      |    i -> CAST(strpos('0123456789abcdef',
      |             substring(md5(CAST(cluster AS VARCHAR)),
      |                       CAST(i AS INTEGER), 1)) - 1
      |           AS DOUBLE)
      |         * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) AS BIGINT)
      |    % 5 = 4
      |  THEN 'test' ELSE 'train' END""".stripMargin

  /** q348/q349's synthesized crawl log (the corpus carries no URL
    * column): deterministic raw-URL variants — scheme case, www,
    * default port, trailing slash, unsorted/tracking params, fragment
    * — plus a non-URL junk class every 101st row. Shared by both
    * queries; the oracles share the matching SQL text through
    * [[CrawlUrlSql]]. */
  private def crawlUrl = {
    when(pmod(col("o_orderkey"), lit(101)) === 0,
        lit("junk line, not a url")) // exercises the (invalid) bin
      .otherwise(concat(
        when(pmod(col("o_orderkey"), lit(2)) === 0, lit("https://"))
          .otherwise(lit("HTTPS://")),
        when(pmod(col("o_orderkey"), lit(3)) === 0, lit("www."))
          .otherwise(lit("")),
        lit("shop"), pmod(col("o_custkey"), lit(40)).cast("string"),
        element_at(
          array(lit(".com"), lit(".co.uk"), lit(".org"),
                lit(".com.au"), lit(".io")),
          (pmod(col("o_custkey"), lit(5)) + 1).cast("int")),
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit(":443"))
          .otherwise(lit("")),
        lit("/item/"), pmod(col("o_orderkey"), lit(97)).cast("string"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit("/"))
          .otherwise(lit("")),
        lit("?id="), pmod(col("o_orderkey"), lit(13)).cast("string"),
        when(pmod(col("o_orderkey"), lit(2)) === 0,
          lit("&utm_source=mail")).otherwise(lit("")),
        when(pmod(col("o_orderkey"), lit(4)) === 0, lit("&b=2&a=1"))
          .otherwise(lit("")),
        when(pmod(col("o_orderkey"), lit(11)) === 0, lit("#frag"))
          .otherwise(lit(""))))
  }

  val queries: Map[String, Q] = Map(

    // Near-dup pair matrix WITHIN vs ACROSS sources — the dedup
    // diagnostic that tells you whether duplication is intra-source
    // boilerplate or cross-source syndication (they need different
    // fixes). MinHash-LSH pair set (q31's verified path) joined to
    // each side's source, counted per ordered source pair.
    "q162_dup_source_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashNearDups(docs, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.5)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("source", "src_a"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("source", "src_b"), "id_b")
        .groupBy(least(col("src_a"), col("src_b")).as("source_lo"),
                 greatest(col("src_a"), col("src_b")).as("source_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_lo", "source_hi")
    }),

    // Exact dedup stats per source (hash-groupBy family).
    "q25_exact_dedup_docs" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct("text").as("n_unique_texts"))
        .withColumn("n_dup_docs", col("n_docs") - col("n_unique_texts"))
        .orderBy("source")),

    // Content fingerprint (md5 — portable, verifiable cross-engine).
    "q26_fingerprint_md5" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fingerprint"),
                col("n_chars"))
        .orderBy("doc_id")),

    // Exact n-gram (3-shingle) Jaccard near-dup pairs within source,
    // via the posting-list join (work scales with co-occurring
    // shingles, not document pairs); q31 is the LSH path that also
    // drops the per-group restriction.
    // LEAKAGE-SAFE fold split (Sampling.leakageSafeFolds): q66's
    // hash-fold split keyed on the near-dup CLUSTER representative, so
    // no q27 near-dup pair straddles train/test — the contamination
    // hole a row split leaves open. n_straddling is COMPUTED (pairs
    // joined to both ends' folds), not asserted: the hash pins the
    // guarantee at 0 alongside the per-fold census. The oracle replays
    // the q27 pairs, the q64 recursive closure, and the q66 md5
    // thresholds on the cluster key.
    "q309_leakage_safe_folds" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = graft.ops.Staging.stage(
        Dedup.exactJaccardPairs(docs, "doc_id", "text",
            groupCol = "source", k = 3, threshold = 0.5)
          .select("id_a", "id_b"))
      val folded = graft.ops.Staging.stage(
        graft.ext.Sampling.leakageSafeFolds(docs, "doc_id", pairs,
          "id_a", "id_b",
          Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1), salt = "r16"))
      val straddle = pairs
        .join(folded.select(col("doc_id").as("id_a"), col("fold").as("fa")),
          "id_a")
        .join(folded.select(col("doc_id").as("id_b"), col("fold").as("fb")),
          "id_b")
        .agg(coalesce(sum(when(col("fa") =!= col("fb"), 1L).otherwise(0L)),
          lit(0L)).as("n_straddling"))
      folded.groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct("cluster").as("n_clusters"),
             min("doc_id").as("min_id"))
        .crossJoin(broadcast(straddle))
        .orderBy("fold")
    }),

    // Quality-aware dedup representative (keep-BEST, not keep-first):
    // within each q27 near-dup cluster keep the LONGEST copy (ties to
    // the lower id) — the most-complete-variant rule curation
    // pipelines use where q76's keep-lowest-id is arbitrary. One
    // min_by aggregate over the node-sized clustered frame; the
    // oracle replays the closure and picks rn=1 over
    // (length DESC, doc_id).
    "q310_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.exactJaccardPairs(docs, "doc_id", "text",
          groupCol = "source", k = 3, threshold = 0.5)
        .select("id_a", "id_b")
      val comp = Dedup.connectedComponents(pairs)
      val clustered = graft.ops.Staging.stage(
        docs.join(comp, docs("doc_id") === comp("id"), "left")
          .select(col("doc_id"), col("source"), length(col("text")).as("len"),
            coalesce(col("component"), col("doc_id")).as("cluster")))
      val keep = clustered.groupBy("cluster")
        .agg(min_by(col("doc_id"),
          struct((-col("len")).as("nl"), col("doc_id"))).as("keep_id"))
      clustered
        .join(keep, clustered("doc_id") === keep("keep_id"), "left_semi")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
             sum(col("len").cast("long")).as("chars_kept"),
             min("doc_id").as("min_kept_id"))
        .join(clustered.groupBy("source").agg(count(lit(1)).as("n_docs")),
          Seq("source"))
        .select("source", "n_docs", "n_kept", "chars_kept", "min_kept_id")
        .orderBy("source")
    }),

    "q27_ngram_jaccard_neardup" -> ((s, d) =>
      Dedup.exactJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          groupCol = "source", k = 3, threshold = 0.5)
        .withColumnsRenamed(Map("id_a" -> "doc_id_a", "id_b" -> "doc_id_b"))
        .select("doc_id_a", "doc_id_b", "source", "jaccard")
        .orderBy("doc_id_a", "doc_id_b")),

    // MinHash+LSH near-dup detection (scale path). Verified candidates
    // at jaccard>=0.5 coincide with the exact global pair set on this
    // data, so the oracle is the exact pairwise computation.
    "q31_minhash_lsh_neardup" -> ((s, d) =>
      Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
          k = 3, numHashes = 16, bands = 4, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // Portable 32-bit SimHash signatures (md5-bit construction).
    "q32_simhash" -> ((s, d) =>
      Dedup.withSimHash(Tables.documents(s, d), "text")
        .select("doc_id", "simhash")
        .orderBy("doc_id")),

    // SimHash near-dup pairs (hamming <= 3) through the pigeonhole
    // banding on the 64-BIT signature: 4 bands of 16 bits — a pair
    // within distance 3 MUST collide in some band, so the banded join
    // is EXACTLY the all-pairs result the oracle recomputes (no
    // probabilistic recall caveat, unlike MinHash/hyperplane LSH).
    // 16-bit bands put the unrelated-pair collision floor at ~4*2^-16
    // per pair, 256x below round 3's 32-bit/8-bit configuration (the
    // verdict's flagged corpus-scale cost cliff).
    "q59_simhash_neardup" -> ((s, d) =>
      Dedup.simHashNearDups(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 3, bits = 64)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")),

    // Dup-cluster connected components: q59's near-dup PAIRS are not
    // transitive (hamming <= 3 can chain A~B~C with A,C at distance
    // 6), so corpus curation needs the components of the pair graph —
    // one keep-lowest-id representative per cluster. The operator is
    // iterative min-label propagation (one equi-join + min aggregate
    // per sweep, sweeps = cluster diameter); the oracle recomputes
    // the same components with a recursive transitive closure over
    // the identical 64-bit simhash pair set.
    "q64_dup_components" -> ((s, d) => {
      val pairs = Dedup.simHashNearDups(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3, bits = 64)
      Dedup.connectedComponents(pairs)
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"), max("id").as("max_id"))
        .orderBy("component")
    }),

    // DEDUP WATERFALL — the per-source accounting report a curation
    // pipeline publishes with every corpus release: documents and
    // tokens surviving each tier (raw -> exact keep-min-id per
    // md5(text) -> near-dup keep-min-id per simhash cluster, clusters
    // from the corpus-wide q64 component structure), plus the total
    // token-removal ppm. Composes the tiers the suite checks
    // individually (q25/q64/q146) into the marginal-effect view;
    // all-integer outputs. Scale: one md5-keyed window, the CC
    // itself, one cluster-keyed window — each tier a partitioned
    // window, never a global one.
    "q338_dedup_waterfall" -> ((s, d) => {
      val docs = graft.ops.Staging.stage(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          col("text"),
          expr("size(filter(split(text, ' '), t -> length(t) > 0))")
            .cast("long").as("toks"),
          md5(col("text")).as("__h")))
      val wH = org.apache.spark.sql.expressions.Window
        .partitionBy("__h").orderBy("doc_id")
      val exact = graft.ops.Staging.stage(
        docs.withColumn("__rn", row_number().over(wH))
          .filter(col("__rn") === 1)
          .select("doc_id", "source", "toks"))
      val comp = Dedup.connectedComponents(
        Dedup.simHashNearDups(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 3, bits = 64))
      val wC = org.apache.spark.sql.expressions.Window
        .partitionBy("__cl").orderBy("doc_id")
      val nd = exact.join(comp, col("doc_id") === col("id"), "left")
        .withColumn("__cl", coalesce(col("component"), col("doc_id")))
        .withColumn("__rn2", row_number().over(wC))
        .filter(col("__rn2") === 1)
      def census(df: DataFrame, dCol: String, tCol: String) =
        df.groupBy("source").agg(count(lit(1)).as(dCol),
          sum("toks").as(tCol))
      census(docs, "n_docs", "tokens_raw")
        .join(census(exact, "docs_exact", "tokens_exact"), Seq("source"))
        .join(census(nd, "docs_neardup", "tokens_neardup"), Seq("source"))
        .select(col("source"), col("n_docs"), col("tokens_raw"),
          col("docs_exact"), col("tokens_exact"),
          col("docs_neardup"), col("tokens_neardup"),
          expr("((tokens_raw - tokens_neardup) * 1000000) div tokens_raw")
            .as("removed_ppm"))
        .orderBy("source")
    }),

    // Dup-cluster CANONICALIZATION — the step after q64's component
    // discovery that actually fixes the corpus: per near-dup cluster,
    // keep the best representative (longest text, doc_id tie-break)
    // and account for what the collapse drops. One window over the
    // component-joined members; at scale the cost is the CC itself
    // (adaptive, see Dedup.connectedComponents) — the canonical pick
    // adds a single component-keyed exchange.
    "q146_dup_canonical" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.simHashNearDups(docs, "doc_id", "text",
        maxHamming = 3, bits = 64)
      val members = Dedup.connectedComponents(pairs)
        .join(docs.select("doc_id", "n_chars"), col("id") === col("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("component").orderBy(col("n_chars").desc, col("doc_id"))
      members.withColumn("__rn", row_number().over(w))
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"),
             sum("n_chars").as("total_chars"),
             max(when(col("__rn") === 1, col("doc_id"))).as("canonical_id"),
             max(when(col("__rn") === 1, col("n_chars"))).as("kept_chars"))
        .orderBy("component")
    }),

    // Train-benchmark n-gram decontamination: src0 documents play the
    // benchmark/eval suite, everything else is the training corpus; a
    // (train, bench) pair is contaminated when it shares >= 2 distinct
    // RARE word trigrams (bench document frequency <= 3 — the
    // stop-shingle guard; this corpus's ~30-word vocabulary makes
    // common trigrams ubiquitous, and an unguarded cross-corpus join
    // is quadratic in corpus growth). Posting-list join across the
    // two corpora — the benchmark side broadcasts, the training side
    // never shuffles.
    "q65_decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.ngramContamination(
          train = docs.filter(col("source") =!= "src0"),
          bench = docs.filter(col("source") === "src0"),
          idCol = "doc_id", textCol = "text", k = 3, minShared = 2,
          maxBenchDf = 3L)
        .orderBy("train_id", "bench_id")
    }),

    // Substring-level duplication stats (TextStats.withDupSpanStats):
    // a token position is duplicated when its 5-gram occurs >= 2
    // times corpus-wide — the exact-substring dedup signal. Ratios
    // stay unrounded for the <= 0.5 gate (the q58 rule); only the
    // aggregate average rounds.
    "q78_dup_span_stats" -> ((s, d) =>
      graft.ext.TextStats.withDupSpanStats(Tables.documents(s, d),
          "doc_id", "text", k = 5)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_positions").cast("long").as("total_positions"),
             sum("n_dup_positions").cast("long").as("dup_positions"),
             round(avg("dup_span_ratio"), 6).as("avg_dup_ratio"),
             sum(when(col("dup_span_ratio") <= 0.5, 1L).otherwise(0L)).as("n_pass"))
        .orderBy("source")),

    // PREFIX-FILTERED Jaccard join (Dedup.prefixJaccardPairs — the
    // PPJoin candidate scheme): 3-token-shingle pairs at J >= 0.5,
    // with candidates drawn ONLY from each doc's
    // |x| - ceil(t|x|) + 1 rarest shingles — the third exact near-dup
    // engine next to full posting lists (q27) and banded signatures
    // (q31/q59), and the one whose candidate volume carries the (1-t)
    // prefix sliver instead of every co-occurrence. All-integer
    // verify (inter*1e6 >= t_ppm*uni), so the O(n^2) all-pairs oracle
    // is exact — the prefix filter prunes candidates, never results.
    "q327_prefix_jaccard_join" -> ((s, d) =>
      graft.ext.Dedup.prefixJaccardPairs(Tables.documents(s, d),
          "doc_id", "text", k = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // WINNOWING fingerprint census (TextStats.winnowFingerprints —
    // Schleimer et al. 2003, the MOSS scheme): k=4-token grams, each
    // sliding window of w=4 gram positions selects its min-md5 gram
    // (rightmost on ties), giving ~2/(w+1) density with the guarantee
    // that any shared run of >= w+k-1 tokens between two docs shares
    // a fingerprint. Census per source: docs, full windows,
    // fingerprints selected, floor-ppm density, and docs FLAGGED by a
    // fingerprint selected in >= 2 distinct docs — the overlap signal
    // the scheme exists to surface at a sample's cost. All-integer
    // outputs; the selection itself replays exactly in the oracle via
    // the shared md5||reversed-pos min-key.
    "q325_winnow_fingerprints" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val fps = graft.ops.Staging.stage(
        graft.ext.TextStats.winnowFingerprints(
          docs.select(col("doc_id"), col("source"), col("text")),
          "doc_id", "text", k = 4, w = 4))
      val shared = fps.groupBy("fp_hash")
        .agg(countDistinct("doc_id").as("__nd")).filter(col("__nd") >= 2)
      val flagged = fps.join(shared, "fp_hash")
        .select("doc_id", "source").distinct()
        .groupBy("source").agg(count(lit(1)).as("n_docs_flagged"))
      val perSrc = fps.groupBy("source").agg(count(lit(1)).as("n_fps"))
      val base = docs
        .select(col("source"), size(split(col("text"), " ")).as("__n"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(greatest(col("__n") - 6, lit(0))).cast("long")
               .as("n_windows"))
      base.join(perSrc, Seq("source"), "left")
        .join(flagged, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_windows"),
          coalesce(col("n_fps"), lit(0L)).as("n_fps"),
          expr("CASE WHEN n_windows > 0 THEN " +
            "(coalesce(n_fps, CAST(0 AS BIGINT)) * 1000000) div n_windows " +
            "ELSE CAST(0 AS BIGINT) END").as("density_ppm"),
          coalesce(col("n_docs_flagged"), lit(0L)).as("n_docs_flagged"))
        .orderBy("source")
    }),

    // MOSS similarity pairs over the winnowing fingerprints (the
    // match-scoring half of Schleimer et al.'s scheme, composing
    // q325's selection): doc pairs sharing >= 2 selected fingerprint
    // HASHES, scored by shared count and overlap ppm of the smaller
    // fingerprint set — the plagiarism/overlap ranking MOSS serves,
    // at the cost of the ~2/(w+1)-density fingerprint sample instead
    // of full gram sets. Scale shape: the pair join carries (doc,
    // hash) fingerprint rows only; a hash selected in many docs is
    // the boilerplate signal itself (bounded by the same density).
    "q332_winnow_similarity" -> ((s, d) => {
      val f = graft.ops.Staging.stage(
        graft.ext.TextStats.winnowFingerprints(
            Tables.documents(s, d).select(col("doc_id"), col("text")),
            "doc_id", "text", k = 4, w = 4)
          .select(col("doc_id"), col("fp_hash")).distinct())
      val sizes = f.groupBy("doc_id").agg(count(lit(1)).as("n_fps"))
      val shared = f.select(col("doc_id").as("id_a"), col("fp_hash"))
        .join(f.select(col("doc_id").as("id_b"), col("fp_hash").as("__h")),
          col("fp_hash") === col("__h") && col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= 2)
      shared
        .join(sizes.select(col("doc_id").as("id_a"), col("n_fps").as("fps_a")),
          Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("n_fps").as("fps_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("shared_fps"),
          col("fps_a"), col("fps_b"),
          expr("(shared_fps * 1000000) div least(fps_a, fps_b)")
            .as("overlap_ppm"))
        .orderBy("id_a", "id_b")
    }),

    // APPROXIMATE longest-common-substring pairs
    // (TextStats.approxLcsPairs — r17 verdict item 8): q325's
    // winnowing fingerprints joined on hash, grouped per pair by the
    // position-offset DIAGONAL, widest diagonal span + k = the token-
    // length estimate of the longest shared run — suffix-automaton
    // answers at a fingerprint sample's cost. Exact duplicates sit on
    // diagonal 0 at near-full-length estimates; partial syndication
    // shows as shorter spans on nonzero diagonals. The oracle replays
    // selection, join, and diagonal arithmetic (all integers).
    "q347_approx_lcs_pairs" -> ((s, d) =>
      graft.ext.TextStats.approxLcsPairs(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", k = 4, w = 4, minSpan = 8)
        .orderBy("id_a", "id_b")),

    // LEAKAGE-SAFE train/test split — cluster-aware holdout. A
    // random per-DOCUMENT split leaks: near-duplicates straddle the
    // boundary and the eval set scores memorization (the standard
    // benchmark-hygiene failure a curation pipeline must rule out).
    // The split unit is therefore the q64 near-dup COMPONENT: every
    // doc joins its cluster (singletons self-cluster), the CLUSTER id
    // hashes to an 80/20 assignment (md5 first-8-hex mod 5 — the
    // q142 digit-sum-replayable integer hash), and all members
    // inherit the cluster's side. The census reports per-split
    // docs/clusters/tokens, and the leak AUDIT re-joins the near-dup
    // pair set against the assignment — cross-split pairs must read
    // 0, computed from the data rather than assumed, and hashed by
    // the oracle. Scale shape: pairs ride q59's pigeonhole band join
    // (never all-pairs), components pointer-jump, the assignment is
    // map-side on the cluster key, and the audit is two id-keyed
    // equi-joins of the (sparse) pair frame.
    "q368_leakage_safe_split" -> ((s, d) => {
      val docs = graft.ops.Staging.stage(
        Tables.documents(s, d).select(col("doc_id"), col("text"),
          expr("size(filter(split(text, ' '), t -> length(t) > 0))")
            .cast("long").as("toks")))
      val pairs = graft.ops.Staging.stage(splitNearDupPairs(docs))
      val lab = graft.ops.Staging.stage(
        clusterSplits(docs.select("doc_id", "toks"), pairs))
      val census = lab.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct("cluster").as("n_clusters"),
             sum("toks").as("n_tokens"))
      val leaked = pairs
        .join(lab.select(col("doc_id").as("id_a"), col("split").as("sa")),
          Seq("id_a"))
        .join(lab.select(col("doc_id").as("id_b"), col("split").as("sb")),
          Seq("id_b"))
        .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)),
          lit(0L)).as("leaked_pairs"))
      census.crossJoin(broadcast(leaked)).orderBy("split")
    }),

    // q347 with the maxFpDocs occupancy cut ENGAGED (cap 2): hashes
    // winnowed in more than 2 documents — the boilerplate quadratic
    // hazard — never reach the pair join. The cut's scale shape is
    // the r18-verdict fix under test: the SMALL hot-hash drop set
    // broadcasts and left_anti-joins (|drop| <= fp_rows/cap by
    // counting), while the corpus-sized keep universe stays
    // distributed. At sf0.01 the cap drops ~32 hot hashes; the
    // surviving pairs hash-match the oracle's ANTI JOIN replay.
    "q365_approx_lcs_capped" -> ((s, d) =>
      graft.ext.TextStats.approxLcsPairs(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", k = 4, w = 4, minSpan = 8, maxFpDocs = 2L)
        .orderBy("id_a", "id_b")),

    // URL canonicalization + registrable-domain dedup census
    // (ext.Urls — r17 verdict item 8, the first operator of every
    // web-crawl pipeline). The corpus carries no URL column, so the
    // query SYNTHESIZES a deterministic crawl log from orders —
    // scheme/www/port/trailing-slash/query-order/tracking-param/
    // fragment variants plus a non-URL junk class — and the census
    // counts, per registrable domain, raw URLs vs distinct canonical
    // forms vs collapsed duplicates. The oracle rebuilds the same log
    // and replays the UrlCanonicalize step contract in SQL.
    // URL canonicalization + registrable-domain dedup census
    // (ext.Urls — r17 verdict item 8, the first operator of every
    // web-crawl pipeline), over the synthesized [[crawlUrl]] log:
    // per registrable domain, raw URLs vs distinct canonical forms vs
    // collapsed duplicates; junk rows land in '(invalid)'. The oracle
    // rebuilds the same log and replays the UrlCanonicalize step
    // contract in SQL (both from shared generators).
    "q348_url_domain_census" -> ((s, d) =>
      graft.ext.Urls.domainDedupCensus(Tables.orders(s, d), crawlUrl)
        .orderBy("domain")),

    // RECRAWL keep-latest over the same log — the temporal half of
    // crawl dedup: multiple fetches of one canonical URL keep the
    // LATEST (ties to the lowest order key — a total rule), censused
    // per registrable domain. keep_key_sum pins the exact per-URL
    // argmax selection, not just the counts; the latest-kept date is
    // emitted as a formatted string (ns-vs-us timestamp trap).
    "q349_url_recrawl_keep_latest" -> ((s, d) => {
      val rows = Tables.orders(s, d)
        .select(graft.ext.Urls.canonicalizeUrl(crawlUrl).as("canon"),
                col("o_orderkey"), col("o_orderdate"))
        .filter(col("canon").isNotNull) // junk has no canonical form
      val kept = rows.groupBy("canon")
        .agg(count(lit(1)).as("n_fetches"),
             max_by(struct(col("o_orderkey").as("k"),
                           col("o_orderdate").as("t")),
               struct(col("o_orderdate").as("t"),
                      (-col("o_orderkey")).as("nk"))).as("keep"))
      kept.select(
          graft.ext.Urls.registrableDomain(
            graft.ext.Urls.canonicalHost(col("canon"))).as("domain"),
          col("n_fetches"), col("keep.k").as("kk"), col("keep.t").as("kt"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_canonical"),
             sum("n_fetches").as("n_fetches"),
             sum("kk").as("keep_key_sum"),
             max("kt").as("__mt"))
        .select(col("domain"), col("n_canonical"), col("n_fetches"),
                col("keep_key_sum"),
                date_format(col("__mt"), "yyyy-MM-dd").as("latest_kept"))
        .orderBy("domain")
    }),

    // Exact-substring span CUTTING (TextStats.cutDupSpans): every
    // non-first occurrence of a corpus-duplicated 5-gram marks its
    // token span; spans merge and the text is rebuilt without them.
    // The oracle replays the span arithmetic: first occurrence via
    // row_number over (doc_id, pos), coverage via a range join,
    // merged-span count via a lag island scan. count(DISTINCT md5)
    // pins the rebuilt text content, not just its lengths.
    "q79_cut_dup_spans" -> ((s, d) =>
      graft.ext.TextStats.cutDupSpans(Tables.documents(s, d),
          "doc_id", "text", k = 5)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("n_tokens_removed") > 0, 1L).otherwise(0L)).as("n_docs_cut"),
             sum(col("n_cut_spans").cast("long")).as("total_spans"),
             sum(col("n_tokens_removed").cast("long")).as("total_removed"),
             sum(length(col("text_cut"))).cast("long").as("total_chars_after"),
             countDistinct(md5(col("text_cut"))).as("n_distinct_cut"))
        .orderBy("source")),

    // Cross-document boilerplate REMOVAL (TextStats.cutBoilerplate) —
    // the rewrite sibling of q289's census: every position whose
    // 8-gram appears in >= 2 distinct documents is template text and
    // is cut EVERYWHERE (no surviving first copy — unlike q79's dedup
    // cut, boilerplate is noise in every document). Spans merge, the
    // text rebuilds through the same native CutTokenSpans, and the
    // per-source audit uses q79's exact column set so the two rewrites
    // read side by side. The oracle replays the span arithmetic with
    // doc-frequency marking (count(DISTINCT doc_id) per gram) in place
    // of q79's row_number first-copy selection.
    "q307_cut_boilerplate" -> ((s, d) =>
      graft.ext.TextStats.cutBoilerplate(Tables.documents(s, d),
          "doc_id", "text", k = 8, minDocFrequency = 2L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("n_tokens_removed") > 0, 1L).otherwise(0L)).as("n_docs_cut"),
             sum(col("n_cut_spans").cast("long")).as("total_spans"),
             sum(col("n_tokens_removed").cast("long")).as("total_removed"),
             sum(length(col("text_cut"))).cast("long").as("total_chars_after"),
             countDistinct(md5(col("text_cut"))).as("n_distinct_cut"))
        .orderBy("source")),

    // Incremental dedup of a delta shard against a frozen corpus
    // (Dedup.dedupAgainstCorpus): docs with doc_id % 5 == 0 play the
    // new crawl, the rest the immutable corpus whose only retained
    // state is its distinct md5 fingerprints. Corpus copies lose,
    // intra-batch dups keep the lowest id.
    "q76_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpusHashes = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .select(md5(col("text")).as("content_hash")).distinct()
      // production shape: the bloom sidecar is built WITH the corpus
      // state (eager, once per increment) and prefilters the delta so
      // mostly-novel rows bypass the anti-join shuffle; no false
      // negatives, so the result is bit-identical to the plain path
      val sidecar = graft.ext.Dedup.corpusHashBloom(corpusHashes)
      graft.ext.Dedup.dedupAgainstCorpus(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text", corpusHashes, bloom = Some(sidecar))
        .groupBy("source")
        .agg(count(lit(1)).as("n_new"),
             countDistinct("content_hash").as("n_hashes"),
             min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source")
    }),

    // Incremental NEAR-dup dedup (Dedup.nearDupAgainstCorpus): docs
    // with doc_id % 5 == 0 play the crawl delta; the frozen corpus
    // retains only its 64-bit SimHash signatures as state. Delta docs
    // within hamming <= 3 of ANY corpus signature drop; survivors
    // return with their own signatures (the state delta). Exact
    // pigeonhole banding, so the oracle is the all-pairs comparison.
    "q82_incremental_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpusSigs = Dedup.withSimHash64(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "text")
        .select("simhash")
      Dedup.nearDupAgainstCorpus(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text", corpusSigs)
        .groupBy("source")
        .agg(count(lit(1)).as("n_new"),
             countDistinct("simhash").as("n_sigs"),
             min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source")
    }),

    // Edit-distance-verified near-dup (Dedup.editVerifiedNearDups):
    // LSH candidates -> exact Jaccard >= 0.5 -> levenshtein <= 5, the
    // order-sensitive confirmation gate. As with q31, verified LSH
    // candidates coincide with the exact global pair set on this
    // data, so the oracle is the all-pairs computation with both
    // predicates (edit distances here run 4-8; maxEdits=5 really
    // filters).
    "q88_editdist_neardup" -> ((s, d) =>
      Dedup.editVerifiedNearDups(Tables.documents(s, d), "doc_id", "text",
          k = 3, numHashes = 16, bands = 4, threshold = 0.5, maxEdits = 5)
        .orderBy("id_a", "id_b")),

    // Asymmetric containment near-dup (Dedup.exactContainmentPairs):
    // catches the quote-expansion duplicate Jaccard (q27) misses — a
    // short doc embedded in a longer one scores cont_a 1.0 but
    // Jaccard |A|/|B|. Same posting-list join shape as q27.
    "q108_containment_neardup" -> ((s, d) =>
      Dedup.exactContainmentPairs(Tables.documents(s, d), "doc_id", "text",
          groupCol = "source", k = 3, threshold = 0.6)
        .withColumnsRenamed(Map("id_a" -> "doc_id_a", "id_b" -> "doc_id_b"))
        .select("doc_id_a", "doc_id_b", "source", "cont_a", "cont_b")
        .orderBy("doc_id_a", "doc_id_b")),

    // Corpus NOVELTY rate — "is the new crawl worth ingesting?": the
    // share of the new half's distinct 8-grams unseen in the old half
    // (doc_id parity stands in for crawl generations). This is the
    // dedup family's ACQUISITION dial: q65 decontaminates against a
    // benchmark, q78 measures internal duplication; novelty prices
    // NEW data before it's paid for. Distinct-gram frames bound
    // everything (never positional rows); the old side joins
    // left-anti. Gram STRINGS here (exact, oracle-replayable); at
    // 100 TB the 8-byte xxhash64 gram key (the q78 hashGramKey rule)
    // halves the shuffle width with ~n²/2⁶⁵ collision odds.
    "q273_corpus_novelty" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(graft.functions.GraftFunctions.wordShinglesAll(
            s, col("text"), 8)).as("g"))
      val old = grams.filter(pmod(col("doc_id"), lit(2L)) === 0)
        .select("g").distinct()
      val nw = graft.ops.Staging.stage(
        grams.filter(pmod(col("doc_id"), lit(2L)) === 1)
          .select("source", "g").distinct())
      val novel = nw.join(old, Seq("g"), "left_anti")
        .groupBy("source").agg(count(lit(1)).as("n_novel"))
      nw.groupBy("source").agg(count(lit(1)).as("n_new_grams"))
        .join(novel, Seq("source"), "left")
        .na.fill(0L, Seq("n_novel"))
        .select(col("source"), col("n_new_grams"), col("n_novel"),
          expr("(n_novel * 1000000) div n_new_grams").as("novelty_ppm"))
        .orderBy("source")
    }),

    // Cross-document BOILERPLATE census — the C4/RefinedWeb cleaning
    // dial q78 measures within documents applied ACROSS them: an
    // 8-gram appearing in ≥2 distinct documents is shared template
    // text (headers, footers, licence blocks), and a source whose
    // occurrence mass is template-heavy gets cleaned or downweighted
    // before training. Per source: distinct (doc, gram) occurrences,
    // how many ride a cross-document gram, ratio in floor-ppm.
    // Distinct-gram frames bound everything; the doc-frequency frame
    // is vocabulary-sized and joins back on the gram key (at 100 TB
    // the xxhash64 gram key halves shuffle width, the q78 rule).
    "q289_boilerplate_ngrams" -> ((s, d) => {
      val grams = graft.ops.Staging.stage(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(graft.functions.GraftFunctions.wordShinglesAll(
              s, col("text"), 8)).as("g"))
          .distinct())
      val df2 = grams.groupBy("g").agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= 2).select("g")
      val boiler = grams.join(df2, Seq("g"), "left_semi")
        .groupBy("source").agg(count(lit(1)).as("n_boiler"))
      grams.groupBy("source").agg(count(lit(1)).as("n_doc_grams"))
        .join(boiler, Seq("source"), "left")
        .na.fill(0L, Seq("n_boiler"))
        .select(col("source"), col("n_doc_grams"), col("n_boiler"),
          expr("(n_boiler * 1000000) div n_doc_grams")
            .as("boiler_ppm"))
        .orderBy("source")
    }),

    // Greedy max-coverage document selection (the facility-location /
    // coreset step of data curation, Nemhauser et al. 1978: greedy is
    // (1−1/e)-optimal for monotone submodular coverage): pick 3
    // documents, each maximizing the count of distinct 8-grams NOT
    // covered by the picks so far — "which few documents teach the
    // most new text". Ties toward the lower doc_id. Each step is one
    // anti-join + aggregate over the STAGED distinct-gram frame with
    // the picked ids as literals (k tiny 1-row collects — the
    // ivfCentroids driver-seed discipline); the oracle unrolls the
    // same three steps.
    "q290_greedy_coverage" -> ((s, d) => {
      import s.implicits._
      val grams = graft.ops.Staging.stage(
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.functions.GraftFunctions.wordShinglesAll(
              s, col("text"), 8)).as("g"))
          .distinct())
      var picked = Seq.empty[Long]
      var rows = Seq.empty[(Long, Long, Long, Long)]
      var covered = 0L
      var exhausted = false
      for (t <- 1 to 3 if !exhausted) {
        val remaining =
          if (picked.isEmpty) grams
          else grams.filter(!col("doc_id").isin(picked: _*))
            .join(grams.filter(col("doc_id").isin(picked: _*))
                    .select("g").distinct(),
                  Seq("g"), "left_anti")
        // headOption, not head: when coverage is exhausted (fewer than
        // 3 gram-bearing docs, or the picks already cover every gram)
        // the oracle's later step CTEs are simply empty — emit fewer
        // rows, never crash the run on an empty argmax
        remaining.groupBy("doc_id")
          .agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1)
          .collect().headOption match {
          case Some(r) =>
            val (id, gain) = (r.getLong(0), r.getLong(1))
            picked :+= id
            covered += gain
            rows :+= ((t.toLong, id, gain, covered))
          case None => exhausted = true
        }
      }
      rows.toDF("step", "doc_id", "gain", "covered_total")
        .orderBy("step")
    }),

    // Order-invariant dataset fingerprint per source — the
    // reproducibility checksum a pipeline publishes with every
    // release ("did ANY row change?"): sum of per-row md5-prefix
    // integers, which no partitioning, shuffle order or split can
    // perturb, and which is ADDITIVE — fingerprint(A ∪ B) =
    // fingerprint(A) + fingerprint(B) for disjoint halves, so
    // incremental ingestion updates the ledger without rescanning
    // (the additive_ok column PROVES the property on the parity
    // halves in-query). Per-row terms are < 2^32, so the sums are
    // bounded by n_docs*2^32 — BIGINT-safe up to ~2^31 docs per
    // source; both engines emit BIGINT so the driver hash sees one
    // type (r14 lesson: DECIMAL(38,0) vs HUGEINT hash-diverged even
    // with identical values). Interior sums still ride decimal(38,0)
    // so the cast is the only narrowing. One aggregate, map-side
    // combined.
    "q275_dataset_fingerprint" -> ((s, d) => {
      val h = Tables.documents(s, d)
        .select(col("source"), pmod(col("doc_id"), lit(2L)).as("par"),
          expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), " +
            "'|', text)), 1, 8), 16, 10) AS DECIMAL(38,0))").as("rh"))
      val zero = lit(0).cast("decimal(38,0)")
      h.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum("rh").cast("long").as("fp"),
             sum(when(col("par") === 0, col("rh")).otherwise(zero))
               .cast("long").as("fp_even"),
             sum(when(col("par") === 1, col("rh")).otherwise(zero))
               .cast("long").as("fp_odd"))
        .withColumn("additive_ok",
          col("fp_even") + col("fp_odd") === col("fp"))
        .orderBy("source")
    }),
  )

  // q348 oracle: the suffix list interpolated from the operator's
  // own constant, so the two engines cannot drift
  private val SuffixSqlList: String =
    graft.ext.Urls.TwoLevelSuffixes.map(x => s"'$x'").mkString(", ")

  /** The synthesized crawl-log URL expression in SQL — the q348/q349
    * raw CTE body, matching [[crawlUrl]] variant-for-variant. */
  private val CrawlUrlSql: String =
    """CASE WHEN o_orderkey % 101 = 0 THEN 'junk line, not a url'
      |    ELSE
      |      (CASE WHEN o_orderkey % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END) ||
      |      (CASE WHEN o_orderkey % 3 = 0 THEN 'www.' ELSE '' END) ||
      |      'shop' || CAST(o_custkey % 40 AS VARCHAR) ||
      |      (CASE o_custkey % 5 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
      |        WHEN 2 THEN '.org' WHEN 3 THEN '.com.au' ELSE '.io' END) ||
      |      (CASE WHEN o_orderkey % 5 = 0 THEN ':443' ELSE '' END) ||
      |      '/item/' || CAST(o_orderkey % 97 AS VARCHAR) ||
      |      (CASE WHEN o_orderkey % 7 = 0 THEN '/' ELSE '' END) ||
      |      '?id=' || CAST(o_orderkey % 13 AS VARCHAR) ||
      |      (CASE WHEN o_orderkey % 2 = 0 THEN '&utm_source=mail' ELSE '' END) ||
      |      (CASE WHEN o_orderkey % 4 = 0 THEN '&b=2&a=1' ELSE '' END) ||
      |      (CASE WHEN o_orderkey % 11 = 0 THEN '#frag' ELSE '' END)
      |    END AS url""".stripMargin

  /** The [[graft.functions.UrlCanonicalize]] step contract replayed
    * in SQL: expects a CTE `raw(<carry...>, url)` and emits the chain
    * s0 -> sch -> parts -> hostq -> canon0(<carry...>, host, canon),
    * null-propagating for schemeless input. One generator for every
    * oracle that canonicalizes, so the contract text exists once. */
  private def urlCanonCtes(carry: Seq[String]): String = {
    val c = carry.map(_ + ", ").mkString
    s"""s0 AS (SELECT ${c}str_split(url, '#')[1] AS u FROM raw),
       |sch AS (
       |  SELECT $c
       |    CASE WHEN strpos(u, '://') > 1
       |      THEN lower(substr(u, 1, strpos(u, '://') - 1)) END AS scheme,
       |    CASE WHEN strpos(u, '://') > 1
       |      THEN substr(u, strpos(u, '://') + 3) END AS rest
       |  FROM s0),
       |parts AS (
       |  SELECT $c scheme,
       |    lower(regexp_extract(rest, '^([^/?]*)', 1)) AS auth,
       |    regexp_replace(regexp_extract(rest, '^[^/?]*([^?]*)', 1),
       |      '/+$$', '') AS path,
       |    CASE WHEN rest IS NOT NULL AND strpos(rest, '?') > 0
       |      THEN substr(rest, strpos(rest, '?') + 1) ELSE '' END AS q
       |  FROM sch),
       |hostq AS (
       |  SELECT $c scheme, path,
       |    CASE WHEN h2 LIKE 'www.%' THEN substr(h2, 5) ELSE h2 END AS host,
       |    list_sort(list_filter(str_split(q, '&'), x -> x <> '' AND NOT
       |      regexp_matches(x, '^(utm_[^=&]*|gclid|fbclid)(=.*)?$$'))) AS kept
       |  FROM (
       |    SELECT $c scheme, path, q,
       |      CASE WHEN scheme = 'http' AND auth LIKE '%:80'
       |             THEN substr(auth, 1, len(auth) - 3)
       |           WHEN scheme = 'https' AND auth LIKE '%:443'
       |             THEN substr(auth, 1, len(auth) - 4)
       |           ELSE auth END AS h2
       |    FROM parts)),
       |canon0 AS (
       |  SELECT $c host,
       |    CASE WHEN scheme IS NULL THEN NULL
       |      ELSE scheme || '://' || host || path ||
       |        (CASE WHEN len(kept) > 0
       |          THEN '?' || array_to_string(kept, '&') ELSE '' END)
       |    END AS canon
       |  FROM hostq)""".stripMargin
  }

  /** Registrable-domain CTE `dom`: `carry` columns pass through, the
    * source's `host` becomes `domain` (public-suffix-lite; with
    * `invalidBin` a NULL canonical maps to '(invalid)' — `canon` must
    * then be in `carry`). Matches [[graft.ext.Urls.registrableDomain]]. */
  private def domainCte(src: String, carry: Seq[String],
                        invalidBin: Boolean): String = {
    val c = carry.map(_ + ", ").mkString
    val nullArm =
      if (invalidBin) "CASE WHEN canon IS NULL THEN '(invalid)'\n         WHEN"
      else "CASE WHEN"
    s"""dom AS (
       |  SELECT $c
       |    $nullArm n <= 2 THEN host
       |         WHEN last2 IN ($SuffixSqlList)
       |           THEN labels[n - 2] || '.' || last2
       |         ELSE last2 END AS domain
       |  FROM (
       |    SELECT $c host, labels, len(labels) AS n,
       |      labels[len(labels) - 1] || '.' || labels[len(labels)] AS last2
       |    FROM (SELECT $c host, string_split(host, '.') AS labels
       |          FROM $src)))""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    // Source-matrix replay: q31's exact Jaccard>=0.5 pair set (the
    // LSH path has deterministic full recall at these parameters)
    // joined to each side's source.
    "q162_dup_source_matrix" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS shingles
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |    (len(a.shingles) + len(b.shingles)
        |     - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
        |j AS (
        |  SELECT least(da.source, db.source) AS source_lo,
        |         greatest(da.source, db.source) AS source_hi
        |  FROM p JOIN documents da ON p.id_a = da.doc_id
        |         JOIN documents db ON p.id_b = db.doc_id)
        |SELECT source_lo, source_hi, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q25_exact_dedup_docs" ->
      """SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_unique_texts,
        | count(*) - count(DISTINCT text) AS n_dup_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q26_fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS fingerprint, n_chars FROM documents ORDER BY doc_id",

    // q27's pair CTEs + the q64 recursive closure + the q66 md5 fold
    // thresholds keyed on the cluster representative; the straddle
    // count joins each pair to both ends' folds.
    "q309_leakage_safe_folds" ->
      ("""WITH RECURSIVE sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS shingles
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
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
        |c AS (
        |  SELECT d.doc_id, d.source, length(d.text) AS len,
        |    coalesce(comp.component, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
        |f AS (
        |  SELECT c.*, CASE WHEN substr(md5(CAST(cluster AS VARCHAR) || 'r16'), 1, 8) < 'b3333333' THEN 'train'
        |                   WHEN substr(md5(CAST(cluster AS VARCHAR) || 'r16'), 1, 8) < 'e6666666' THEN 'val'
        |                   ELSE 'test' END AS fold FROM c),
        |st AS (
        |  SELECT CAST(coalesce(sum(CASE WHEN fa.fold <> fb.fold THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_straddling
        |  FROM p JOIN f fa ON p.id_a = fa.doc_id JOIN f fb ON p.id_b = fb.doc_id)
        |SELECT fold, count(*) AS n_docs, count(DISTINCT cluster) AS n_clusters,
        |  min(doc_id) AS min_id, n_straddling
        |FROM f CROSS JOIN st GROUP BY fold, n_straddling
        |ORDER BY fold""").stripMargin,

    // Same closure; the representative is rn=1 over
    // (length DESC, doc_id) per cluster.
    "q310_dedup_keep_best" ->
      ("""WITH RECURSIVE sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS shingles
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
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
        |c AS (
        |  SELECT d.doc_id, d.source, length(d.text) AS len,
        |    coalesce(comp.component, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
        |k AS (
        |  SELECT * FROM (
        |    SELECT c.*, row_number() OVER (PARTITION BY cluster
        |      ORDER BY len DESC, doc_id) AS rn FROM c) WHERE rn = 1),
        |n AS (SELECT source, count(*) AS n_docs FROM c GROUP BY source)
        |SELECT k.source, n.n_docs, count(*) AS n_kept,
        |  CAST(sum(len) AS BIGINT) AS chars_kept,
        |  min(doc_id) AS min_kept_id
        |FROM k JOIN n ON k.source = n.source
        |GROUP BY k.source, n.n_docs ORDER BY k.source""").stripMargin,

    "q27_ngram_jaccard_neardup" ->
      """WITH sh AS (
         |  SELECT doc_id, source,
         |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS shingles
         |  FROM documents WHERE len(string_split(text,' ')) >= 3)
         |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, a.source,
         |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // Oracle for the LSH pipeline: the exact global near-dup pair set
    // (LSH with these parameters has deterministic full recall at 0.5
    // on this data — verified candidates equal the exact pair set).
    "q31_minhash_lsh_neardup" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS shingles
         |  FROM documents WHERE len(string_split(text,' ')) >= 3)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |    (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "q32_simhash" ->
      """WITH bits AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN substr(md5(t.tok), i, 1) IN ('8','9','a','b','c','d','e','f')
        |             THEN 1 ELSE -1 END) AS vote
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  CROSS JOIN range(1, 33) r(i)
        |  GROUP BY doc_id, i)
        |SELECT doc_id,
        |  string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The oracle is the ALL-PAIRS hamming computation over the 64-BIT
    // signature — the pigeonhole banding must reproduce it exactly.
    // Layout (mirrors the native SimHash(…, 64)): position i in
    // [1,32] votes on md5 hex digit i's HIGH bit (digit in 8..f);
    // position i in [33,64] votes on digit (i-32)'s SECOND bit (digit
    // in 4-7 or c-f). Each 32-bit half is assembled as a separate
    // BIGINT (weight 2^(32-i) within the half, matching Spark's
    // per-word conv(substr, 2, 10)); hamming = sum of per-half xor
    // popcounts. Halves avoid 64-bit assembly entirely: power(2,63)
    // sums lose exactness in DOUBLE and overflow signed BIGINT.
    "q59_simhash_neardup" ->
      """WITH bits AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN i <= 32
        |             THEN CASE WHEN substr(md5(t.tok), i, 1) IN ('8','9','a','b','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |             ELSE CASE WHEN substr(md5(t.tok), i - 32, 1) IN ('4','5','6','7','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |        END) AS vote
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  CROSS JOIN range(1, 65) r(i)
        |  GROUP BY doc_id, i),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vote > 0 AND i <= 32 THEN power(2, 32 - i) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN vote > 0 AND i > 32 THEN power(2, 64 - i) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p
        |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // Transitive closure over the q59 pair set (same 64-bit SimHash
    // recomputation), then component = min reachable id. The
    // recursive CTE is the oracle-side answer to what the engine
    // computes with distributed min-label propagation.
    "q64_dup_components" -> (simhashCompCtes +
      "\nSELECT component, count(*) AS n_members, max(id) AS max_id" +
      "\nFROM comp GROUP BY component ORDER BY component"),

    // Waterfall replay: q64's component CTEs extended with the tiered
    // keep-min windows and the integer census.
    "q338_dedup_waterfall" -> (simhashCompCtes + """,
      |tokc AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> length(t) > 0)) AS BIGINT) AS toks,
      |    md5(text) AS h
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id, source, toks FROM (
      |    SELECT tokc.*, row_number() OVER (PARTITION BY h ORDER BY doc_id)
      |      AS rn
      |    FROM tokc) WHERE rn = 1),
      |nd AS (
      |  SELECT doc_id, source, toks FROM (
      |    SELECT ex.doc_id, ex.source, ex.toks,
      |      row_number() OVER (PARTITION BY coalesce(comp.component, ex.doc_id)
      |        ORDER BY ex.doc_id) AS rn2
      |    FROM ex LEFT JOIN comp ON ex.doc_id = comp.id) WHERE rn2 = 1),
      |r0 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(toks) AS BIGINT) AS tokens_raw
      |       FROM tokc GROUP BY source),
      |r1 AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_exact,
      |         CAST(sum(toks) AS BIGINT) AS tokens_exact
      |       FROM ex GROUP BY source),
      |r2 AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_neardup,
      |         CAST(sum(toks) AS BIGINT) AS tokens_neardup
      |       FROM nd GROUP BY source)
      |SELECT r0.source, n_docs, tokens_raw, docs_exact, tokens_exact,
      |  docs_neardup, tokens_neardup,
      |  ((tokens_raw - tokens_neardup) * 1000000) // tokens_raw
      |    AS removed_ppm
      |FROM r0 JOIN r1 USING (source) JOIN r2 USING (source)
      |ORDER BY source""".stripMargin),

    // Canonicalization replay: q64's component pyramid + the
    // (n_chars DESC, doc_id) argmax per component.
    "q146_dup_canonical" -> (simhashCompCtes +
      """,
        |m AS (
        |  SELECT c.component, d.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY c.component
        |                       ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM comp c JOIN documents d ON c.id = d.doc_id)
        |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id,
        |  max(CASE WHEN rn = 1 THEN n_chars END) AS kept_chars
        |FROM m GROUP BY component ORDER BY component""".stripMargin),

    // Same 3-gram construction as q27's oracle, joined ACROSS the
    // train/bench split through the same rare-shingle guard: bench
    // shingles with document frequency > 3 never join, and n_shared
    // counts the surviving shared shingles.
    "q65_decontamination" ->
      """WITH sh AS (
         |  SELECT doc_id, source,
         |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
         |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         |           || ' ' || string_split(text,' ')[i+2])) AS shingles
         |  FROM documents WHERE len(string_split(text,' ')) >= 3),
         |bp AS (SELECT doc_id AS bench_id, unnest(shingles) AS s
         |       FROM sh WHERE source = 'src0'),
         |rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM bp GROUP BY s)
         |         WHERE df <= 3),
         |tp AS (SELECT doc_id AS train_id, unnest(shingles) AS s
         |       FROM sh WHERE source <> 'src0')
         |SELECT tp.train_id, bp.bench_id, count(*) AS n_shared
         |FROM tp JOIN rare USING (s) JOIN bp USING (s)
         |GROUP BY tp.train_id, bp.bench_id
         |HAVING count(*) >= 2
         |ORDER BY train_id, bench_id""".stripMargin,

    // All-position 5-grams via list slicing, global occurrence counts,
    // per-doc duplicated-position counts; the ratio CASE guards
    // too-short docs exactly like the operator's when().
    "q78_dup_span_stats" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(n - 4, 0) + 1),
        |    i -> array_to_string(tk[i : i + 4], ' '))) AS gram
        |  FROM t),
        |oc AS (
        |  SELECT gram FROM (SELECT gram, count(*) AS c FROM g GROUP BY gram)
        |  WHERE c >= 2),
        |d AS (
        |  SELECT doc_id, count(*) AS ndup FROM g JOIN oc USING (gram) GROUP BY doc_id),
        |m AS (
        |  SELECT t.doc_id, t.source, greatest(t.n - 4, 0) AS npos,
        |    coalesce(d.ndup, 0) AS ndup
        |  FROM t LEFT JOIN d USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(npos) AS BIGINT) AS total_positions,
        |  CAST(sum(ndup) AS BIGINT) AS dup_positions,
        |  round(avg(CASE WHEN npos > 0 THEN CAST(ndup AS DOUBLE) / npos ELSE 0.0 END), 6) AS avg_dup_ratio,
        |  CAST(sum(CASE WHEN (CASE WHEN npos > 0 THEN CAST(ndup AS DOUBLE) / npos ELSE 0.0 END) <= 0.5
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    // Prefix-filter replay: the q27/q31 shingle construction, the
    // all-pairs integer-ppm filter — exact because the prefix filter
    // prunes candidates, never results.
    "q327_prefix_jaccard_join" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS shingles
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
        |    CAST(len(a.shingles) + len(b.shingles)
        |         - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS uni
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, inter, uni,
        |  CAST((inter * 1000000) // uni AS BIGINT) AS jaccard_ppm
        |FROM p WHERE inter * 1000000 >= 500000 * uni
        |ORDER BY id_a, id_b""".stripMargin,

    // MOSS-similarity replay: q325's winnowing selection verbatim,
    // then distinct per-doc hash sets, the pair join and integer
    // overlap arithmetic.
    "q332_winnow_similarity" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, tk,
        |    unnest(range(1, greatest(n - 3, 0) + 1)) AS pos
        |  FROM t),
        |keyed AS (
        |  SELECT doc_id, pos,
        |    md5(array_to_string(tk[pos : pos + 3], ' ')) ||
        |      lpad(CAST(100000000 - pos AS VARCHAR), 9, '0') AS key
        |  FROM g),
        |sel AS (
        |  SELECT DISTINCT doc_id, substr(mk, 1, 32) AS fp_hash
        |  FROM (
        |    SELECT doc_id, pos,
        |      min(key) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
        |    FROM keyed)
        |  WHERE pos >= 4),
        |sz AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps
        |  FROM sel GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS shared_fps
        |  FROM sel a JOIN sel b
        |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, p.shared_fps,
        |  sa.n_fps AS fps_a, sb.n_fps AS fps_b,
        |  (p.shared_fps * 1000000) // least(sa.n_fps, sb.n_fps)
        |    AS overlap_ppm
        |FROM p JOIN sz sa ON p.id_a = sa.doc_id
        |       JOIN sz sb ON p.id_b = sb.doc_id
        |WHERE p.shared_fps >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Approx-LCS replay: q325's winnowing selection (with positions),
    // the hash pair join, and the diagonal-span integer arithmetic —
    // max span per (pair, pos-offset), min diagonal among the widest.
    "q347_approx_lcs_pairs" -> approxLcsOracleSql(None),

    // Leakage-safe split replay: q64's simhash pair + component
    // pyramid, singleton self-clustering, the md5-digit-sum cluster
    // hash mod 5, the per-split census, and the cross-split pair
    // audit over the identical pair CTE.
    "q368_leakage_safe_split" -> (simhashCompCtes + """,
      |tokc AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> length(t) > 0)) AS BIGINT) AS toks
      |  FROM documents),
      |asg AS (
      |  SELECT t.doc_id, t.toks, coalesce(c.component, t.doc_id) AS cluster
      |  FROM tokc t LEFT JOIN comp c ON t.doc_id = c.id),
      |lab AS (
      |  SELECT doc_id, toks, cluster,
      |    __SPLIT_CASE__ AS split
      |  FROM asg),
      |cen AS (
      |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
      |    CAST(sum(toks) AS BIGINT) AS n_tokens
      |  FROM lab GROUP BY split),
      |lk AS (
      |  SELECT coalesce(CAST(sum(CASE WHEN a.split <> b.split
      |    THEN 1 ELSE 0 END) AS BIGINT), 0) AS leaked_pairs
      |  FROM p JOIN lab a ON p.id_a = a.doc_id
      |         JOIN lab b ON p.id_b = b.doc_id)
      |SELECT cen.split, cen.n_docs, cen.n_clusters, cen.n_tokens,
      |  lk.leaked_pairs
      |FROM cen, lk ORDER BY cen.split""".stripMargin
        .replace("__SPLIT_CASE__", SplitCaseDuck)),

    // q347's replay with the hot-fingerprint occupancy cut ENGAGED
    // (maxFpDocs = 2): the same generator inserts the hot/kept CTEs,
    // so the two replays cannot drift. The r18-verdict fix this query
    // exercises: the cut anti-joins the SMALL drop set (hashes in
    // > 2 docs), never broadcasting the corpus-sized keep universe.
    "q365_approx_lcs_capped" -> approxLcsOracleSql(Some(2L)),

    // URL census replay: the identical synthesized crawl log
    // (CrawlUrlSql), the UrlCanonicalize step contract in SQL
    // (urlCanonCtes: fragment cut, scheme gate, authority/port/www,
    // trailing-slash strip, tracking-param filter + byte sort), the
    // public-suffix-lite domain (suffix list interpolated from
    // ext.Urls), then the (domain, canonical) census. Junk rows carry
    // NULL canonical end-to-end and land in the '(invalid)' bin. All
    // three pieces are GENERATED once and shared with q349, so the
    // contract text cannot drift between the two replays.
    "q348_url_domain_census" ->
      ("WITH raw AS (\n  SELECT " + CrawlUrlSql + "\n  FROM orders),\n" +
        urlCanonCtes(Nil) + ",\n" +
        domainCte("canon0", Seq("canon"), invalidBin = true) + ",\n" +
        """g AS (SELECT domain, canon, count(*) AS n FROM dom GROUP BY 1, 2)
          |SELECT domain, CAST(sum(n) AS BIGINT) AS n_raw,
          |  CAST(sum(CASE WHEN canon IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_canonical,
          |  CAST(sum(n) - sum(CASE WHEN canon IS NOT NULL THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_dup
          |FROM g GROUP BY domain ORDER BY domain""".stripMargin),

    // Recrawl replay: same log and canonicalization chain (orderkey/
    // orderdate carried through), keep-latest per canonical via
    // row_number over (o_orderdate DESC, o_orderkey), then the domain
    // census over the kept rows; latest-kept date formatted on both
    // sides.
    "q349_url_recrawl_keep_latest" ->
      ("WITH raw AS (\n  SELECT o_orderkey, o_orderdate, " + CrawlUrlSql +
        "\n  FROM orders),\n" +
        urlCanonCtes(Seq("o_orderkey", "o_orderdate")) + ",\n" +
        """v AS (
          |  SELECT o_orderkey, o_orderdate, canon, host
          |  FROM canon0 WHERE canon IS NOT NULL),
          |k AS (
          |  SELECT canon, host, o_orderkey, o_orderdate,
          |    row_number() OVER (PARTITION BY canon
          |      ORDER BY o_orderdate DESC, o_orderkey) AS rn,
          |    CAST(count(*) OVER (PARTITION BY canon) AS BIGINT) AS n_fetches
          |  FROM v),
          |kk AS (
          |  SELECT canon, host, o_orderkey, o_orderdate, n_fetches
          |  FROM k WHERE rn = 1),""".stripMargin + "\n" +
        domainCte("kk", Seq("o_orderkey", "o_orderdate", "n_fetches"),
          invalidBin = false) + "\n" +
        """SELECT domain, CAST(count(*) AS BIGINT) AS n_canonical,
          |  CAST(sum(n_fetches) AS BIGINT) AS n_fetches,
          |  CAST(sum(o_orderkey) AS BIGINT) AS keep_key_sum,
          |  strftime(max(o_orderdate), '%Y-%m-%d') AS latest_kept
          |FROM dom GROUP BY domain ORDER BY domain""".stripMargin),

    // Winnowing replay: identical 4-gram build, the identical
    // md5||zero-padded-(1e8-pos) min-key over the same 4-position
    // frame (lexicographic min == (min hash, rightmost pos)), same
    // full-window gate and distinct — then the integer census.
    "q325_winnow_fingerprints" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, tk,
        |    unnest(range(1, greatest(n - 3, 0) + 1)) AS pos
        |  FROM t),
        |keyed AS (
        |  SELECT doc_id, source, pos,
        |    md5(array_to_string(tk[pos : pos + 3], ' ')) ||
        |      lpad(CAST(100000000 - pos AS VARCHAR), 9, '0') AS key
        |  FROM g),
        |sel AS (
        |  SELECT DISTINCT doc_id, source,
        |    100000000 - CAST(substr(mk, 33, 9) AS BIGINT) AS fp_pos,
        |    substr(mk, 1, 32) AS fp_hash
        |  FROM (
        |    SELECT doc_id, source, pos,
        |      min(key) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
        |    FROM keyed)
        |  WHERE pos >= 4),
        |sh AS (
        |  SELECT fp_hash FROM (
        |    SELECT fp_hash, count(DISTINCT doc_id) AS c
        |    FROM sel GROUP BY 1) WHERE c >= 2),
        |fl AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_flagged
        |  FROM (SELECT DISTINCT doc_id, source FROM sel
        |        JOIN sh USING (fp_hash))
        |  GROUP BY source),
        |fp AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_fps
        |  FROM sel GROUP BY source),
        |b AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(greatest(n - 6, 0)) AS BIGINT) AS n_windows
        |  FROM t GROUP BY source)
        |SELECT b.source, b.n_docs, b.n_windows,
        |  coalesce(fp.n_fps, 0) AS n_fps,
        |  CAST(CASE WHEN b.n_windows > 0
        |    THEN (coalesce(fp.n_fps, 0) * 1000000) // b.n_windows
        |    ELSE 0 END AS BIGINT) AS density_ppm,
        |  coalesce(fl.n_docs_flagged, 0) AS n_docs_flagged
        |FROM b LEFT JOIN fp USING (source) LEFT JOIN fl USING (source)
        |ORDER BY source""".stripMargin,

    // Span-cutting replay: all-position 5-grams with positions via
    // unnest(range(...)) (the LIST range; the table function can't
    // take lateral column refs), non-first duplicate occurrences via
    // row_number (rn >= 2 iff the gram occurs >= 2 times and this is
    // not its (doc_id, pos)-minimal copy — exactly the operator's
    // min(struct) selection at minOccurrences = 2), token coverage via
    // a BETWEEN join, rebuilt text via ordered string_agg over the
    // uncovered tokens, and merged spans as lag-islands (new span when
    // the start gap exceeds k = 5).
    "q79_cut_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |gi AS (
        |  SELECT doc_id, tk, unnest(range(1, greatest(n - 4, 0) + 1)) AS i
        |  FROM t),
        |g AS (
        |  SELECT doc_id, i AS pos, array_to_string(tk[i : i + 4], ' ') AS gram
        |  FROM gi),
        |cuts AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM g) WHERE rn >= 2),
        |wi AS (
        |  SELECT doc_id, tk, unnest(range(1, n + 1)) AS ti FROM t),
        |tok AS (
        |  SELECT doc_id, ti, tk[ti] AS tok FROM wi),
        |cov AS (
        |  SELECT DISTINCT w.doc_id, w.ti
        |  FROM tok w JOIN cuts c
        |    ON w.doc_id = c.doc_id AND w.ti BETWEEN c.pos AND c.pos + 4),
        |reb AS (
        |  SELECT w.doc_id,
        |    coalesce(string_agg(w.tok, ' ' ORDER BY w.ti)
        |               FILTER (WHERE cov.ti IS NULL), '') AS text_cut,
        |    count(*) FILTER (WHERE cov.ti IS NOT NULL) AS n_removed
        |  FROM tok w LEFT JOIN cov ON w.doc_id = cov.doc_id AND w.ti = cov.ti
        |  GROUP BY w.doc_id),
        |sp AS (
        |  SELECT doc_id,
        |    count(*) FILTER (WHERE prev IS NULL OR pos - prev > 5) AS n_spans
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM cuts)
        |  GROUP BY doc_id),
        |m AS (
        |  SELECT t.doc_id, t.source, reb.text_cut, reb.n_removed,
        |    coalesce(sp.n_spans, 0) AS n_spans
        |  FROM t JOIN reb USING (doc_id) LEFT JOIN sp USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_cut,
        |  CAST(sum(n_spans) AS BIGINT) AS total_spans,
        |  CAST(sum(n_removed) AS BIGINT) AS total_removed,
        |  CAST(sum(length(text_cut)) AS BIGINT) AS total_chars_after,
        |  count(DISTINCT md5(text_cut)) AS n_distinct_cut
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    // q79's template with doc-frequency marking: a position is cut
    // when its 8-gram occurs in >= 2 DISTINCT documents (no
    // first-copy survivor), coverage via a BETWEEN join, merged
    // spans as lag-islands (new span when the start gap exceeds k=8).
    "q307_cut_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |gi AS (
        |  SELECT doc_id, tk, unnest(range(1, greatest(n - 7, 0) + 1)) AS i
        |  FROM t),
        |g AS (
        |  SELECT doc_id, i AS pos, array_to_string(tk[i : i + 7], ' ') AS gram
        |  FROM gi),
        |b AS (
        |  SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
        |  WHERE df >= 2),
        |cuts AS (
        |  SELECT g.doc_id, g.pos FROM g JOIN b USING (gram)),
        |wi AS (
        |  SELECT doc_id, tk, unnest(range(1, n + 1)) AS ti FROM t),
        |tok AS (
        |  SELECT doc_id, ti, tk[ti] AS tok FROM wi),
        |cov AS (
        |  SELECT DISTINCT w.doc_id, w.ti
        |  FROM tok w JOIN cuts c
        |    ON w.doc_id = c.doc_id AND w.ti BETWEEN c.pos AND c.pos + 7),
        |reb AS (
        |  SELECT w.doc_id,
        |    coalesce(string_agg(w.tok, ' ' ORDER BY w.ti)
        |               FILTER (WHERE cov.ti IS NULL), '') AS text_cut,
        |    count(*) FILTER (WHERE cov.ti IS NOT NULL) AS n_removed
        |  FROM tok w LEFT JOIN cov ON w.doc_id = cov.doc_id AND w.ti = cov.ti
        |  GROUP BY w.doc_id),
        |sp AS (
        |  SELECT doc_id,
        |    count(*) FILTER (WHERE prev IS NULL OR pos - prev > 8) AS n_spans
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM cuts)
        |  GROUP BY doc_id),
        |m AS (
        |  SELECT t.doc_id, t.source, reb.text_cut, reb.n_removed,
        |    coalesce(sp.n_spans, 0) AS n_spans
        |  FROM t JOIN reb USING (doc_id) LEFT JOIN sp USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_cut,
        |  CAST(sum(n_spans) AS BIGINT) AS total_spans,
        |  CAST(sum(n_removed) AS BIGINT) AS total_removed,
        |  CAST(sum(length(text_cut)) AS BIGINT) AS total_chars_after,
        |  count(DISTINCT md5(text_cut)) AS n_distinct_cut
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    // Anti-join on the same md5 fingerprints, then min-id-per-hash via
    // a join back (mirrors the operator's two-step representative
    // selection exactly).
    "q76_incremental_dedup" ->
      """WITH corpus AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
        |delta AS (
        |  SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % 5 = 0),
        |fresh AS (
        |  SELECT * FROM delta WHERE h NOT IN (SELECT h FROM corpus)),
        |keep AS (
        |  SELECT f.* FROM fresh f
        |  JOIN (SELECT h, min(doc_id) AS m FROM fresh GROUP BY h) r
        |    ON f.h = r.h AND f.doc_id = r.m)
        |SELECT source, count(*) AS n_new, count(DISTINCT h) AS n_hashes,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM keep GROUP BY source ORDER BY source""".stripMargin,

    // q59's signature construction (hi/lo 32-bit halves of the md5-bit
    // SimHash64), then the all-pairs NOT EXISTS the exact pigeonhole
    // banding must reproduce: a delta doc survives iff no corpus doc
    // is within hamming 3.
    "q82_incremental_neardup" ->
      """WITH bits AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN i <= 32
        |             THEN CASE WHEN substr(md5(t.tok), i, 1) IN ('8','9','a','b','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |             ELSE CASE WHEN substr(md5(t.tok), i - 32, 1) IN ('4','5','6','7','c','d','e','f')
        |                       THEN 1 ELSE -1 END
        |        END) AS vote
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  CROSS JOIN range(1, 65) r(i)
        |  GROUP BY doc_id, i),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vote > 0 AND i <= 32 THEN power(2, 32 - i) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN vote > 0 AND i > 32 THEN power(2, 64 - i) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |delta AS (
        |  SELECT s.doc_id, d.source, s.hi, s.lo
        |  FROM sh s JOIN documents d USING (doc_id) WHERE d.doc_id % 5 = 0),
        |keep AS (
        |  SELECT * FROM delta s WHERE NOT EXISTS (
        |    SELECT 1 FROM sh c WHERE c.doc_id % 5 <> 0
        |      AND bit_count(xor(s.hi, c.hi)) + bit_count(xor(s.lo, c.lo)) <= 3))
        |SELECT source, count(*) AS n_new,
        |  count(DISTINCT CAST(hi AS VARCHAR) || ':' || CAST(lo AS VARCHAR)) AS n_sigs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM keep GROUP BY source ORDER BY source""".stripMargin,

    // The jaccard gate is MATERIALIZED before levenshtein touches
    // anything: leaving both predicates in one WHERE lets the planner
    // evaluate O(len^2) levenshtein on all O(n^2) pairs (observed: the
    // sf0.1 check ran unbounded), instead of on the ~25 survivors.
    "q88_editdist_neardup" ->
      """WITH sh AS (
        |  SELECT doc_id, text,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS shingles
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |cand AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.text AS ta, b.text AS tb,
        |    round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |      (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |      (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5)
        |SELECT id_a, id_b, jaccard,
        |  CAST(levenshtein(ta, tb) AS BIGINT) AS edit_dist
        |FROM cand
        |WHERE levenshtein(ta, tb) <= 5
        |ORDER BY id_a, id_b""".stripMargin,

    // q27's shingle construction, asymmetric normalization: each
    // side's containment divides the intersection by ITS OWN shingle
    // count; a pair survives when either direction reaches 0.6.
    "q108_containment_neardup" ->
      """WITH sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS shingles
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, a.source,
        |    CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) / len(a.shingles) AS ca,
        |    CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) / len(b.shingles) AS cbb
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT doc_id_a, doc_id_b, source,
        |  round(ca, 6) AS cont_a, round(cbb, 6) AS cont_b
        |FROM p WHERE greatest(ca, cbb) >= 0.6
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // Novelty replay: the q78 token-slice gram construction at k=8,
    // parity halves, distinct frames and the left-anti novel set.
    "q273_corpus_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(range(1, greatest(n - 7, 0) + 1),
        |      i -> array_to_string(tk[i : i + 7], ' '))) AS gram
        |  FROM t),
        |old AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
        |nw AS (SELECT DISTINCT source, gram FROM g WHERE doc_id % 2 = 1),
        |novel AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_novel
        |  FROM nw ANTI JOIN old USING (gram)
        |  GROUP BY source)
        |SELECT nn.source, CAST(count(*) AS BIGINT) AS n_new_grams,
        |  CAST(coalesce(any_value(novel.n_novel), 0) AS BIGINT) AS n_novel,
        |  (CAST(coalesce(any_value(novel.n_novel), 0) AS BIGINT) * 1000000)
        |    // CAST(count(*) AS BIGINT) AS novelty_ppm
        |FROM nw nn LEFT JOIN novel ON nn.source = novel.source
        |GROUP BY nn.source ORDER BY nn.source""".stripMargin,

    // Boilerplate replay: same distinct (doc, gram) frame, ≥2-doc
    // frequency filter, per-source floor-ppm ratio.
    "q289_boilerplate_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, source,
        |    unnest(list_transform(range(1, greatest(n - 7, 0) + 1),
        |      i -> array_to_string(tk[i : i + 7], ' '))) AS gram
        |  FROM t),
        |df AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |b AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_boiler
        |  FROM g SEMI JOIN df USING (gram) GROUP BY source)
        |SELECT g.source, CAST(count(*) AS BIGINT) AS n_doc_grams,
        |  CAST(coalesce(any_value(b.n_boiler), 0) AS BIGINT) AS n_boiler,
        |  (CAST(coalesce(any_value(b.n_boiler), 0) AS BIGINT) * 1000000)
        |    // CAST(count(*) AS BIGINT) AS boiler_ppm
        |FROM g LEFT JOIN b ON g.source = b.source
        |GROUP BY g.source ORDER BY g.source""".stripMargin,

    // Coverage replay: the same three greedy steps unrolled — each
    // pick is (gain desc, doc_id) over grams not covered by prior
    // picks; covered_total accumulates the exact gains.
    "q290_greedy_coverage" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, greatest(n - 7, 0) + 1),
        |      i -> array_to_string(tk[i : i + 7], ' '))) AS gram
        |  FROM t),
        |p1 AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM g GROUP BY doc_id
        |  ORDER BY gain DESC, doc_id LIMIT 1),
        |c1 AS (SELECT DISTINCT gram FROM g
        |       WHERE doc_id IN (SELECT doc_id FROM p1)),
        |p2 AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM g ANTI JOIN c1 USING (gram)
        |  WHERE doc_id NOT IN (SELECT doc_id FROM p1)
        |  GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
        |c2 AS (SELECT DISTINCT gram FROM g
        |       WHERE doc_id IN (SELECT doc_id FROM p1
        |                        UNION ALL SELECT doc_id FROM p2)),
        |p3 AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM g ANTI JOIN c2 USING (gram)
        |  WHERE doc_id NOT IN (SELECT doc_id FROM p1
        |                       UNION ALL SELECT doc_id FROM p2)
        |  GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
        |u AS (
        |  SELECT 1 AS step, doc_id, gain FROM p1
        |  UNION ALL SELECT 2, doc_id, gain FROM p2
        |  UNION ALL SELECT 3, doc_id, gain FROM p3)
        |SELECT CAST(step AS BIGINT) AS step, doc_id, gain,
        |  CAST(sum(gain) OVER (ORDER BY step) AS BIGINT) AS covered_total
        |FROM u ORDER BY step""".stripMargin,

    // Fingerprint replay: the q142 hex-digit parse of the same 8-char
    // md5 prefix; sums emitted as BIGINT on both engines (r14: the
    // HUGEINT/DECIMAL(38,0) split hash-diverged with equal values;
    // n_docs*2^32 << 2^63 bounds the sums at any test SF), the
    // additive identity checked in SQL.
    "q275_dataset_fingerprint" ->
      """WITH h AS (
        |  SELECT source, doc_id % 2 AS par,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(CAST(doc_id AS VARCHAR) || '|' || text),
        |                       CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (8 - i) AS DOUBLE))))
        |      AS BIGINT) AS rh
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(rh) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN par = 0 THEN rh ELSE 0 END) AS BIGINT)
        |    AS fp_even,
        |  CAST(sum(CASE WHEN par = 1 THEN rh ELSE 0 END) AS BIGINT)
        |    AS fp_odd,
        |  CAST(sum(CASE WHEN par = 0 THEN rh ELSE 0 END) AS BIGINT) +
        |  CAST(sum(CASE WHEN par = 1 THEN rh ELSE 0 END) AS BIGINT) =
        |  CAST(sum(rh) AS BIGINT) AS additive_ok
        |FROM h GROUP BY source ORDER BY source""".stripMargin,
  )

  /** Shared approx-LCS oracle (q347 / q365): winnowing selection with
    * positions, optionally the maxFpDocs hot-hash cut (an ANTI JOIN
    * against the hot set — the replay of the Spark side's
    * broadcast-the-drop-set left_anti), the hash pair join, and the
    * diagonal-span integer arithmetic — max span per (pair,
    * pos-offset), min diagonal among the widest. */
  private def approxLcsOracleSql(maxFpDocs: Option[Long]): String = {
    val cut = maxFpDocs.fold("") { cap =>
      s"""hot AS (
         |  SELECT fp_hash FROM sel GROUP BY fp_hash
         |  HAVING count(DISTINCT doc_id) > $cap),
         |kept AS (
         |  SELECT s.doc_id, s.fp_pos, s.fp_hash
         |  FROM sel s ANTI JOIN hot h ON s.fp_hash = h.fp_hash),
         |""".stripMargin
    }
    val src = if (maxFpDocs.isDefined) "kept" else "sel"
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, tk,
       |    unnest(range(1, greatest(n - 3, 0) + 1)) AS pos
       |  FROM t),
       |keyed AS (
       |  SELECT doc_id, pos,
       |    md5(array_to_string(tk[pos : pos + 3], ' ')) ||
       |      lpad(CAST(100000000 - pos AS VARCHAR), 9, '0') AS key
       |  FROM g),
       |sel AS (
       |  SELECT DISTINCT doc_id,
       |    100000000 - CAST(substr(mk, 33, 9) AS BIGINT) AS fp_pos,
       |    substr(mk, 1, 32) AS fp_hash
       |  FROM (
       |    SELECT doc_id, pos,
       |      min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
       |    FROM keyed)
       |  WHERE pos >= 4),
       |${cut}pr AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.fp_pos - b.fp_pos AS diag, a.fp_pos AS pa
       |  FROM $src a JOIN $src b
       |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id),
       |dg AS (
       |  SELECT id_a, id_b, diag,
       |    max(pa) - min(pa) + 4 AS span,
       |    CAST(count(*) AS BIGINT) AS nf
       |  FROM pr GROUP BY 1, 2, 3),
       |mx AS (
       |  SELECT id_a, id_b,
       |    CAST(max(span) AS BIGINT) AS lcs_est_tokens,
       |    CAST(sum(nf) AS BIGINT) AS n_shared_fps
       |  FROM dg GROUP BY 1, 2),
       |bd AS (
       |  SELECT dg.id_a, dg.id_b, CAST(min(dg.diag) AS BIGINT) AS best_diag
       |  FROM dg JOIN mx ON dg.id_a = mx.id_a AND dg.id_b = mx.id_b
       |    AND dg.span = mx.lcs_est_tokens
       |  GROUP BY 1, 2)
       |SELECT mx.id_a, mx.id_b, mx.lcs_est_tokens, bd.best_diag,
       |  mx.n_shared_fps
       |FROM mx JOIN bd ON mx.id_a = bd.id_a AND mx.id_b = bd.id_b
       |WHERE mx.lcs_est_tokens >= 8
       |ORDER BY mx.id_a, mx.id_b""".stripMargin
  }
}
