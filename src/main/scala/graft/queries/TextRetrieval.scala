package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextStats}
import graft.tables.Tables
import TextQueries.{Stopwords, LangProfiles, simhashCompCtes, bm25Ctes}

/** RETRIEVAL + corpus-statistics queries: BM25 (+NDCG/MRR cascade),
  * PMI collocations, TextRank, proximity search, distinctive terms,
  * sketches (HLL/CMS/histogram), token entropy, Zipf slope,
  * weighted quantiles, bucket KL.
  *
  * Split from the single TextQueries object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[TextQueries]].
  */
object TextRetrievalQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // Two-stage retrieval CASCADE — the production search shape q95's
    // score fusion doesn't cover: BM25 selects 20 lexical candidates,
    // then the top hit's EMBEDDING reranks them by cosine
    // (query-by-top-document pseudo-relevance feedback). Stage 2
    // touches only the candidate ids — the embedding table joins 20
    // rows, never scans against the query. Both stage ranks are on
    // ROUNDED scores with id tie-breaks (the q80 rule).
    "q165_retrieval_cascade" -> ((s, d) => {
      val gf = graft.functions.GraftFunctions
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
      val top20 = graft.ext.Retrieval.withBm25(Tables.documents(s, d),
          "text", Seq("join", "vector", "scan"))
        .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
      val qvec = top20.orderBy(col("bm25").desc, col("doc_id")).limit(1)
        .join(emb, col("doc_id") === col("vec_id"))
        .select(col("vec").as("qvec"))
      top20.join(emb, col("doc_id") === col("vec_id"))
        .crossJoin(broadcast(qvec))
        .select(col("doc_id"), col("bm25"),
          round(gf.cosineSimilarity(s, col("vec"), col("qvec")), 6)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("doc_id")).limit(5)
    }),

    // CHAR-WEIGHTED document-length quantiles per language
    // (Sketches.histCounters weight column + histQuantiles): "the
    // median character lives in a document of length X" — the
    // length-vs-mass view that plain doc-count quantiles (q105's
    // family) miss, and the weighted-quantile operator a mixture
    // builder sizes shards with. Additive integer counters (weights
    // are exact char counts), in-bucket interpolation — the q212
    // exact-oracle-for-an-approximation contract.
    "q214_weighted_quantiles" -> ((s, d) =>
      graft.ext.Sketches.histQuantiles(
          graft.ext.Sketches.histCounters(
            Tables.documents(s, d), "lang", "n_chars", width = 20.0,
            weight = col("n_chars")),
          "lang", width = 20.0, ps = Seq(0.25, 0.5, 0.9))
        .orderBy("lang", "p")),

    // BM25 top-k retrieval (Retrieval.withBm25): scan-time sparse
    // retrieval against a literal query term set. tf/dl are map-side
    // native expressions (TokenSetCount — no explode); corpus stats
    // (N, Σdl, per-term df) collapse to ONE broadcast row; the only
    // shuffle is the final top-k. Ordering is on the 6dp-ROUNDED
    // score with doc_id tie-break so a cross-libm ln() ulp cannot
    // flip the limit boundary (the q80 rule). The oracle replays the
    // exact operand order; its k1+1 factor is written `(1.2 + 1.0)`
    // — the same IEEE add the Scala side folds — because the decimal
    // literal 2.2 can parse to a different ulp than the sum.
    "q86_bm25_retrieval" -> ((s, d) =>
      graft.ext.Retrieval.withBm25(Tables.documents(s, d), "text",
          Seq("join", "vector", "scan"))
        .select(col("doc_id"), col("lang"), col("source"), col("dl"),
                col("n_hits"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(15)),

    // PMI collocation mining (TextStats.collocationsPmi): top bigram
    // phrases by pointwise mutual information. Counts are exact longs
    // end-to-end; the single double expression and its ln are
    // operand-order-mirrored in the oracle, and ordering is on the
    // 6dp-ROUNDED pmi with (w1, w2) tie-break (the q80 rule).
    "q87_pmi_collocations" -> ((s, d) =>
      TextStats.collocationsPmi(Tables.documents(s, d), "text", minCount = 10L)
        .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
                round(col("pmi"), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(25)),

    // Portable HyperLogLog distinct estimate (Sketches.hllDistinct):
    // md5-based 256-register HLL whose buckets, ranks, and estimate
    // the oracle replays EXACTLY — an auditable approximate distinct,
    // unlike approx_count_distinct's engine-private hash. Joined to
    // the exact count so the artifact shows the sketch error.
    "q92_hll_distinct" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ext.Sketches.hllDistinct(docs, "source", "text")
        .join(docs.groupBy("source").agg(countDistinct("text").as("n_exact")),
              "source")
        .select(col("source"), col("n_exact"), col("n_buckets"),
                round(col("hll_distinct"), 6).as("hll_distinct"))
        .orderBy("source")
    }),

    // Distinctive terms per source (Retrieval.distinctiveTerms,
    // class-based TF-IDF): top-3 terms per source by rounded score
    // with term tie-break — rank AFTER rounding so a cross-libm ln()
    // ulp cannot reorder (the q80 rule). Ranking runs through the
    // TopKByScoreStr partial aggregate (k rows per partition per
    // source through the exchange), not a per-source row_number
    // window — the window shape sorts a source's ENTIRE vocabulary in
    // one task (the q62 corpus-stats scale trap). Its (score desc,
    // id asc) ordering is exactly the window's orderBy, so the
    // results are identical; tf/df_groups rejoin from the staged
    // scored frame on the 3·sources surviving keys.
    "q94_distinctive_terms" -> ((s, d) => {
      val scored = graft.ops.Staging.stage(
        graft.ext.Retrieval.distinctiveTerms(Tables.documents(s, d),
            "source", "text")
          .withColumn("score", round(col("score"), 6)))
      val top = scored.groupBy("source")
        .agg(graft.functions.GraftFunctions.topKByScoreStr(s,
          col("score"), col("term"), 3).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("source"), col("t.id").as("term"),
                col("t.score").as("score"),
                (col("pos") + 1).cast("int").as("rn"))
      top.join(scored.select("source", "term", "tf", "df_groups"),
               Seq("source", "term"))
        .select(col("source"), col("term"), col("tf"), col("df_groups"),
                col("score"), col("rn"))
        .orderBy("source", "rn")
    }),

    // Per-document token-distribution Shannon entropy, aggregated per
    // lang — the vocabulary-diversity quality signal (low entropy =
    // repetitive boilerplate; the Gopher repetition gates' continuous
    // cousin). Computed in the algebraic form H = ln(n) - (sum of
    // c*ln(c)) / n, which needs only two aggregates over the
    // (doc, token) counts — no second pass to attach n to every
    // token row. Both engines run the identical formula; the
    // remaining slack is aggregate-order ulps under the 6dp rounding.
    "q98_token_entropy" -> ((s, d) => {
      val tc = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"),
                explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("c"))
      tc.groupBy("doc_id", "lang")
        .agg(sum("c").as("n"),
             sum(col("c").cast("double") * log(col("c").cast("double")))
               .as("sclc"))
        .withColumn("entropy",
          log(col("n").cast("double")) - col("sclc") / col("n").cast("double"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             round(avg("entropy"), 6).as("avg_entropy"),
             round(min("entropy"), 6).as("min_entropy"),
             round(max("entropy"), 6).as("max_entropy"))
        .orderBy("lang")
    }),

    // Distribution drift per source (Dsir.bucketKl): KL divergence of
    // each source's smoothed hashed-gram bucket model from the
    // corpus-wide one — the "is this shard statistically unlike the
    // corpus" monitor. The oracle replays the full groups x 4096
    // bucket grid (absent buckets still carry smoothed mass).
    "q100_bucket_kl" -> ((s, d) =>
      graft.ext.Dsir.bucketKl(Tables.documents(s, d), "doc_id", "text", "source")
        .select(col("source"), col("n_grams"), round(col("kl"), 6).as("kl"))
        .orderBy("source")),

    // Count-min sketch heavy hitters (Sketches.cmsCounters/cmsLookup):
    // approximate token frequencies as a hash-CHECKED result — the
    // md5-prefix hashes make the whole sketch oracle-replayable, the
    // q92 HLL move applied to frequencies. The counter table is a
    // constant ≤ 4·4096 rows however big the corpus (additive =>
    // map-side partial agg), so the lookup join BROADCASTS; the exact
    // counts alongside exist only to exhibit the ≥-true guarantee.
    "q104_cms_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val counters = graft.ext.Sketches.cmsCounters(toks, "tok")
      val top = toks.groupBy("tok").agg(count(lit(1)).as("c_exact"))
        .orderBy(col("c_exact").desc, col("tok")).limit(20)
      graft.ext.Sketches.cmsLookup(top, "tok", counters)
        .withColumn("overcount", col("c_est") - col("c_exact"))
        .orderBy(col("c_exact").desc, col("tok"))
    }),

    // Histogram-sketch quantiles (Sketches.histCounters/histQuantiles):
    // the third portable sketch — additive fixed-width counters, so
    // the doc-length p50/p90/p99 per source comes off a bounded
    // counter table instead of a corpus sort (and unlike
    // approx_percentile's engine-private GK summary, every step is
    // oracle-replayable). The quantile window runs over the counter
    // table only.
    "q105_hist_quantiles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      val counters = graft.ext.Sketches.histCounters(docs, "source", "n_tokens",
          width = 16.0)
      graft.ext.Sketches.histQuantiles(counters, "source", 16.0,
          Seq(0.5, 0.9, 0.99))
        .orderBy("source", "p")
    }),

    // Token-WEIGHTED length quantiles (histCounters' weight column):
    // "the median token lives in a doc of length X" — the curation
    // statistic that tells long docs' dominance apart from doc-count
    // medians (q105's unweighted p50 can sit far below this one).
    "q118_weighted_quantiles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
      val counters = graft.ext.Sketches.histCounters(docs, "source", "n_tokens",
          width = 16.0, weight = col("n_tokens").cast("long"))
      graft.ext.Sketches.histQuantiles(counters, "source", 16.0, Seq(0.5, 0.9))
        .orderBy("source", "p")
    }),

    // TextRank keyword extraction: adjacent-token co-occurrence edges
    // (every position, via the codegen'd all-positions 2-shingle)
    // filtered to content words (length >= 3, not a stopword), then
    // weighted PageRank over the undirected word graph — the classic
    // graph-based keyword scorer, built entirely from existing
    // primitives (WordShingles -> pageRankWeighted). Edge weights are
    // co-occurrence counts; edges are normalized a < b so both walk
    // directions are unique by construction. Emits the top 20 words
    // by rank×N (the q168 magnitude/ordering contract); the oracle
    // rebuilds the identical edge list with the q62 shingle replay
    // and unrolls both sweeps.
    "q178_textrank_keywords" -> ((s, d) => {
      // staged: pageRankWeighted's symmetric union reads the edge
      // frame twice, and the shingle explosion must run once
      val pairs = graft.ops.Staging.stage(
        Tables.documents(s, d)
          .select(explode(
            graft.functions.GraftFunctions.wordShinglesAll(s, col("text"), 2))
            .as("sh"))
          .select(substring_index(col("sh"), " ", 1).as("t1"),
                  substring_index(col("sh"), " ", -1).as("t2"))
          .filter(length(col("t1")) >= 3 && length(col("t2")) >= 3 &&
                  !col("t1").isin(Stopwords: _*) &&
                  !col("t2").isin(Stopwords: _*) &&
                  col("t1") =!= col("t2"))
          .groupBy(least(col("t1"), col("t2")).as("a"),
                   greatest(col("t1"), col("t2")).as("b"))
          .agg(count(lit(1)).as("w")))
      // terminal pin since r16 — no extra staging (see q168)
      val pr = graft.ext.Graphs.pageRankWeighted(pairs, "a", "b", "w",
        iterations = 2)
      val nAgg = pr.agg(count(lit(1)).cast("double").as("__nn"))
      pr.crossJoin(broadcast(nAgg))
        .select(col("node").as("word"),
                col("total_weight").cast("long").as("total_w"),
                round(col("pr") * col("__nn"), 6).as("pr_x_n"))
        .orderBy(col("pr_x_n").desc, col("word"))
        .limit(20)
    }),

    // Proximity (phrase-ish) search: documents where 'join' and
    // 'vector' co-occur within 3 token positions — the retrieval
    // feature BM25 (q86) cannot express (bag-of-words loses order).
    // Position lists per term are tiny posting frames (one filtered
    // pass over the positions table, staged so both term filters
    // share it); the join is posting-list x posting-list per doc_id,
    // the standard inverted-index proximity shape that holds at
    // corpus scale because it never touches non-matching documents.
    // Distances are exact integers.
    "q183_proximity_search" -> ((s, d) => {
      val toks = graft.ops.Staging.stage(
        Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
          .filter(col("tok").isin("join", "vector")))
      val pj = toks.filter(col("tok") === "join")
        .select(col("doc_id"), col("p").as("p1"))
      val pv = toks.filter(col("tok") === "vector")
        .select(col("doc_id"), col("p").as("p2"))
      pj.join(pv, "doc_id")
        .select(col("doc_id"), abs(col("p1") - col("p2")).cast("long").as("dist"))
        .groupBy("doc_id")
        .agg(sum(when(col("dist") <= 3, 1L).otherwise(0L)).as("n_close"),
             min("dist").as("min_dist"))
        .filter(col("n_close") > 0)
        .orderBy("doc_id")
    }),

    // NDCG@10 of the BM25 ranking (q86) against a term-frequency
    // relevance proxy — the ranking-quality metric that closes the
    // retrieval loop (build the ranker, then MEASURE it). DCG sums
    // rel/log2(rank+1) over the rounded-score top 10; IDCG is the
    // same sum over the corpus-ideal top 10 by relevance. Both
    // top-10 selections are TakeOrdered + a 10-row rank window
    // (tiny); 6dp absorbs the 10-term sum-order ulp.
    "q193_ndcg_bm25" -> ((s, d) => {
      val rel = graft.ops.Staging.stage(
        Tables.documents(s, d).select(col("doc_id"),
          expr("CAST(size(filter(split(text, ' '), t -> t = 'join')) AS BIGINT)")
            .as("rel")))
      val top10 = graft.ext.Retrieval.withBm25(Tables.documents(s, d), "text",
          Seq("join", "vector", "scan"))
        .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
      val wR = Window.orderBy(col("bm25").desc, col("doc_id"))
      val dcg = top10.withColumn("rnk", row_number().over(wR))
        .join(rel, "doc_id")
        .agg(sum(col("rel").cast("double") / log2(col("rnk") + 1)).as("__dcg"),
             sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_relevant"))
      val wI = Window.orderBy(col("rel").desc, col("doc_id"))
      val idcg = rel.orderBy(col("rel").desc, col("doc_id")).limit(10)
        .withColumn("rnk", row_number().over(wI))
        .agg(sum(col("rel").cast("double") / log2(col("rnk") + 1)).as("__idcg"))
      dcg.crossJoin(broadcast(idcg))
        .select(round(col("__dcg"), 6).as("dcg"),
                round(col("__idcg"), 6).as("idcg"),
                round(col("__dcg") / col("__idcg"), 6).as("ndcg"),
                col("n_relevant"))
        .orderBy("ndcg")
    }),

    // Zipf slope of the token frequency distribution: OLS of
    // ln(count) on ln(rank) over the top 100 tokens — the
    // power-law-ness diagnostic of a corpus (natural text ~ -1;
    // synthetic/templated corpora flatten). Top-100 selection is
    // TakeOrdered (count desc, token); ranks come from a 100-row
    // window (tiny by construction); the OLS closed form runs on
    // identical (ln rank, ln count) doubles with 6dp absorbing the
    // 100-term sum-order ulp (the q99 contract).
    "q196_zipf_token_slope" -> ((s, d) => {
      val top = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(100)
      val wR = Window.orderBy(col("cnt").desc, col("tok"))
      top.withColumn("__x", log(row_number().over(wR).cast("double")))
        .withColumn("__y", log(col("cnt").cast("double")))
        .agg(count(lit(1)).as("n_tokens"),
             sum("__x").as("__sx"), sum("__y").as("__sy"),
             sum(col("__x") * col("__x")).as("__sxx"),
             sum(col("__x") * col("__y")).as("__sxy"))
        .select(col("n_tokens"),
          round((col("n_tokens") * col("__sxy") - col("__sx") * col("__sy")) /
                (col("n_tokens") * col("__sxx") - col("__sx") * col("__sx")), 6)
            .as("zipf_slope"),
          round((col("__sy") - ((col("n_tokens") * col("__sxy") -
                  col("__sx") * col("__sy")) /
                 (col("n_tokens") * col("__sxx") - col("__sx") * col("__sx"))) *
                col("__sx")) / col("n_tokens"), 6).as("intercept"))
        .orderBy("n_tokens")
    }),

    // BM25 MRR + recall@10 over a QUERY SET — the multi-query eval
    // report (q193's NDCG grades one ranking's ORDER; MRR/recall
    // grade a retriever across queries — the numbers a retrieval
    // system ships with). Relevance = term frequency >= 2 (graded →
    // binary); reciprocal rank and recall as exact floor-ppm
    // integers. Each query's top-10 is a TakeOrdered on the rounded
    // score (never a global window over the corpus); the in-top-10
    // re-rank windows over 10 rows.
    "q274_bm25_mrr" -> ((s, d) => {
      def evalTerm(t: String) = {
        val scored = graft.ops.Staging.stage(
          graft.ext.Retrieval.withBm25(Tables.documents(s, d), "text",
              Seq(t))
            .select(col("doc_id"),
              expr(s"CAST(size(filter(split(text, ' '), x -> x = '$t')) " +
                "AS BIGINT)").as("tf"),
              round(col("bm25"), 6).as("b")))
        val w = Window.orderBy(col("b").desc, col("doc_id"))
        val top10 = scored.orderBy(col("b").desc, col("doc_id")).limit(10)
          .withColumn("rnk", row_number().over(w).cast("long"))
        val m1 = top10.agg(
          coalesce(min(when(col("tf") >= 2, col("rnk"))), lit(0L))
            .as("first_rel_rank"),
          sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("n_rel_top10"))
        val m2 = scored.agg(
          sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("n_rel_total"))
        m1.crossJoin(broadcast(m2))
          .select(lit(t).as("query"), col("first_rel_rank"),
            expr("CASE WHEN first_rel_rank = 0 THEN 0 " +
              "ELSE 1000000 div first_rel_rank END").as("rr_ppm"),
            col("n_rel_top10"), col("n_rel_total"),
            expr("CASE WHEN n_rel_total = 0 THEN 0 ELSE " +
              "(n_rel_top10 * 1000000) div n_rel_total END")
              .as("recall_ppm"))
      }
      evalTerm("join").union(evalTerm("vector")).union(evalTerm("scan"))
        .orderBy("query")
    }),
  )

  val oracles: Map[String, String] = Map(

    // The q212 replay with weighted counters: c = sum of char
    // weights per bucket; ranks target the weighted mass.
    "q214_weighted_quantiles" ->
      """WITH h AS (
        |  SELECT lang AS g,
        |    CAST(floor(n_chars / 20.0) AS BIGINT) AS b,
        |    CAST(sum(n_chars) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, b, c,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM h),
        |ps AS (SELECT CAST(unnest([0.25, 0.5, 0.9]) AS DOUBLE) AS p),
        |sel AS (
        |  SELECT g, p, b, c, cb,
        |    CAST(ceil(p * n) AS BIGINT) AS r
        |  FROM cum, ps
        |  WHERE CAST(ceil(p * n) AS BIGINT) > cb
        |    AND CAST(ceil(p * n) AS BIGINT) <= cb + c)
        |SELECT g AS lang, p,
        |  round(b * 20.0 + 20.0 * CAST(r - cb AS DOUBLE) / c, 6) AS q_est
        |FROM sel ORDER BY lang, p""".stripMargin,

    "q86_bm25_retrieval" -> (bm25Ctes +
      "\nSELECT doc_id, lang, source, dl, n_hits, round(score, 6) AS bm25" +
      "\nFROM sc ORDER BY round(score, 6) DESC, doc_id LIMIT 15"),

    // Cascade replay: q86's BM25 pyramid -> rounded top-20 -> the
    // top hit's embedding as query vector -> q34's cosine over the
    // 20 candidates.
    "q165_retrieval_cascade" -> (bm25Ctes +
      """,
        |t20 AS (
        |  SELECT doc_id, round(score, 6) AS bm25 FROM sc
        |  ORDER BY round(score, 6) DESC, doc_id LIMIT 20),
        |t1 AS (SELECT doc_id FROM t20 ORDER BY bm25 DESC, doc_id LIMIT 1),
        |nv AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS vec
        |  FROM embeddings),
        |qv AS (SELECT vec AS qvec FROM t1 JOIN nv ON t1.doc_id = nv.vec_id),
        |r AS (
        |  SELECT t20.doc_id, t20.bm25,
        |    list_sum(list_transform(range(1, 65), i -> nv.vec[i] * qv.qvec[i]))
        |    / (sqrt(list_sum(list_transform(nv.vec, x -> x*x)))
        |       * sqrt(list_sum(list_transform(qv.qvec, x -> x*x)))) AS cos
        |  FROM t20 JOIN nv ON t20.doc_id = nv.vec_id, qv)
        |SELECT doc_id, bm25, round(cos, 6) AS cosine
        |FROM r ORDER BY round(cos, 6) DESC, doc_id LIMIT 5""".stripMargin),

    "q87_pmi_collocations" ->
      """WITH d AS (
        |  SELECT text, string_split(text, ' ') AS tk FROM documents
        |  WHERE length(text) > 0),
        |n AS (
        |  SELECT CAST(sum(CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT) AS nt
        |  FROM d),
        |uc AS (
        |  SELECT w, count(*) AS c FROM (SELECT unnest(tk) AS w FROM d) GROUP BY w),
        |bc AS (
        |  SELECT g, count(*) AS c_xy FROM (
        |    SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
        |    FROM d WHERE len(tk) >= 2)
        |  GROUP BY g HAVING count(*) >= 10),
        |sc AS (
        |  SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
        |    c_xy, u1.c AS c_x, u2.c AS c_y,
        |    ln((CAST(c_xy AS DOUBLE) * CAST(nt AS DOUBLE)) /
        |       (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))) AS pmi
        |  FROM bc JOIN uc u1 ON split_part(bc.g, ' ', 1) = u1.w
        |          JOIN uc u2 ON split_part(bc.g, ' ', 2) = u2.w, n)
        |SELECT w1, w2, c_xy, c_x, c_y, round(pmi, 6) AS pmi
        |FROM sc ORDER BY round(pmi, 6) DESC, w1, w2 LIMIT 25""".stripMargin,

    "q92_hll_distinct" ->
      """WITH g AS (
        |  SELECT source, substr(md5(text), 1, 2) AS b,
        |    substr(md5(text), 3, 13) AS w,
        |    length(regexp_extract(substr(md5(text), 3, 13), '^0*', 0)) AS z
        |  FROM documents),
        |r AS (
        |  SELECT source, b,
        |    max(CASE WHEN z = 13 THEN 53
        |        ELSE 4 * z
        |             + (CASE substr(w, z + 1, 1)
        |                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
        |                WHEN '7' THEN 1 ELSE 0 END) + 1 END) AS m
        |  FROM g GROUP BY source, b),
        |a AS (
        |  SELECT source, count(*) AS n_buckets,
        |    sum(1.0 / CAST((CAST(1 AS BIGINT) << m) AS DOUBLE)) AS s
        |  FROM r GROUP BY source),
        |f AS (
        |  SELECT source, n_buckets, 256 - n_buckets AS v,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 /
        |      (s + (256.0 - n_buckets) * 1.0) AS eraw
        |  FROM a)
        |SELECT f.source, x.n_exact, f.n_buckets,
        |  round(CASE WHEN v > 0 AND eraw <= 2.5 * 256.0
        |        THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE)) ELSE eraw END, 6) AS hll_distinct
        |FROM f JOIN (SELECT source, count(DISTINCT text) AS n_exact
        |             FROM documents GROUP BY source) x USING (source)
        |ORDER BY source""".stripMargin,

    "q94_distinctive_terms" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE length(text) > 0),
        |tf AS (
        |  SELECT source, term, count(*) AS tf FROM toks GROUP BY source, term),
        |dfg AS (
        |  SELECT term, count(*) AS df_groups FROM tf GROUP BY term),
        |ng AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS n FROM tf),
        |sc AS (
        |  SELECT tf.source, tf.term, tf.tf, dfg.df_groups,
        |    round(CAST(tf.tf AS DOUBLE) * ln(n / CAST(df_groups AS DOUBLE)), 6) AS score
        |  FROM tf JOIN dfg USING (term), ng),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |                               ORDER BY score DESC, term) AS rn
        |  FROM sc)
        |SELECT source, term, tf, df_groups, score, rn
        |FROM rk WHERE rn <= 3 ORDER BY source, rn""".stripMargin,

    "q98_token_entropy" ->
      """WITH tc AS (
        |  SELECT doc_id, lang, tok, count(*) AS c FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |    FROM documents WHERE length(text) > 0)
        |  GROUP BY doc_id, lang, tok),
        |h AS (
        |  SELECT doc_id, lang,
        |    ln(CAST(sum(c) AS DOUBLE))
        |      - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
        |        / CAST(sum(c) AS DOUBLE) AS entropy
        |  FROM tc GROUP BY doc_id, lang)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(entropy), 6) AS avg_entropy,
        |  round(min(entropy), 6) AS min_entropy,
        |  round(max(entropy), 6) AS max_entropy
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin,

    "q100_bucket_kl" ->
      """WITH d AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(tk) AS gram FROM d
        |  WHERE text IS NOT NULL AND text <> ''
        |  UNION ALL
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS gram
        |  FROM d WHERE text IS NOT NULL AND len(tk) >= 2),
        |o AS (
        |  SELECT dd.source, substr(md5(g.gram), 1, 3) AS bk
        |  FROM g JOIN documents dd USING (doc_id)),
        |gc AS (SELECT source, bk, count(*) AS c FROM o GROUP BY source, bk),
        |gt AS (SELECT source, CAST(sum(c) AS BIGINT) AS ng FROM gc GROUP BY source),
        |cb AS (SELECT bk, CAST(sum(c) AS BIGINT) AS cbv FROM gc GROUP BY bk),
        |ct AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gc),
        |bks AS (SELECT printf('%03x', i) AS bk FROM range(0, 4096) t(i)),
        |grid AS (
        |  SELECT s.source, b.bk
        |  FROM (SELECT DISTINCT source FROM gc) s, bks b),
        |f AS (
        |  SELECT grid.source, grid.bk,
        |    coalesce(gc.c, 0) AS c, coalesce(cb.cbv, 0) AS cbv
        |  FROM grid LEFT JOIN gc ON grid.source = gc.source AND grid.bk = gc.bk
        |            LEFT JOIN cb ON grid.bk = cb.bk),
        |k AS (
        |  SELECT f.source, gt.ng,
        |    sum(((c + 1.0) / (ng + 4096.0)) *
        |        ln(((c + 1.0) / (ng + 4096.0)) / ((cbv + 1.0) / (n + 4096.0)))) AS kl
        |  FROM f JOIN gt USING (source), ct GROUP BY f.source, gt.ng)
        |SELECT source, ng AS n_grams, round(kl, 6) AS kl
        |FROM k ORDER BY source""".stripMargin,

    "q104_cms_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tt AS (SELECT tok FROM t WHERE tok <> ''),
        |top AS (
        |  SELECT tok, count(*) AS c_exact FROM tt GROUP BY tok
        |  ORDER BY c_exact DESC, tok LIMIT 20),
        |cnt AS (
        |  SELECT j, substring(md5(CAST(j AS VARCHAR) || '|' || tok), 1, 3) AS b,
        |    count(*) AS c
        |  FROM tt CROSS JOIN (SELECT unnest(range(4)) AS j) GROUP BY 1, 2),
        |est AS (
        |  SELECT top.tok, top.c_exact, min(cnt.c) AS c_est
        |  FROM top CROSS JOIN (SELECT unnest(range(4)) AS j) jj
        |  JOIN cnt ON cnt.j = jj.j
        |    AND cnt.b = substring(md5(CAST(jj.j AS VARCHAR) || '|' || top.tok), 1, 3)
        |  GROUP BY 1, 2)
        |SELECT tok, c_exact, CAST(c_est AS BIGINT) AS c_est,
        |  CAST(c_est - c_exact AS BIGINT) AS overcount
        |FROM est ORDER BY c_exact DESC, tok""".stripMargin,

    // Replays the histogram sketch bucket by bucket: same width-16
    // buckets, same cumulative-before window over the counter table,
    // same ceil-rank linear interpolation. All exact integer/rational
    // arithmetic — no pow/ln anywhere.
    "q105_hist_quantiles" ->
      """WITH w AS (
        |  SELECT source, (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n
        |  FROM documents),
        |h AS (
        |  SELECT source, CAST(floor(n / 16.0) AS BIGINT) AS b, count(*) AS c
        |  FROM w GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, b, c,
        |    coalesce(sum(c) OVER (PARTITION BY source ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
        |    sum(c) OVER (PARTITION BY source) AS nt
        |  FROM h),
        |pp AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.5), (0.9), (0.99)) t(p))
        |SELECT source, p,
        |  round(b * 16.0 + 16.0 * (ceil(p * nt) - cb) / c, 6) AS q_est
        |FROM cum CROSS JOIN pp
        |WHERE ceil(p * nt) > cb AND ceil(p * nt) <= cb + c
        |ORDER BY source, p""".stripMargin,

    // q105's replay with sum(n) in place of count(*) — token mass,
    // not doc count, fills the buckets.
    "q118_weighted_quantiles" ->
      """WITH w AS (
        |  SELECT source, (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS n
        |  FROM documents),
        |h AS (
        |  SELECT source, CAST(floor(n / 16.0) AS BIGINT) AS b,
        |    CAST(sum(n) AS BIGINT) AS c
        |  FROM w GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, b, c,
        |    coalesce(sum(c) OVER (PARTITION BY source ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
        |    sum(c) OVER (PARTITION BY source) AS nt
        |  FROM h),
        |pp AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.5), (0.9)) t(p))
        |SELECT source, p,
        |  round(b * 16.0 + 16.0 * (ceil(p * nt) - cb) / c, 6) AS q_est
        |FROM cum CROSS JOIN pp
        |WHERE ceil(p * nt) > cb AND ceil(p * nt) <= cb + c
        |ORDER BY source, p""".stripMargin,

    // q62's shingle replay (all positions, no dedup) -> content-word
    // filter -> normalized weighted edges -> q168's 2-sweep weighted
    // PageRank unroll.
    "q178_textrank_keywords" -> {
      val stop = Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH sh AS (
         |  SELECT unnest(list_transform(range(1, len(string_split(text,' '))),
         |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
         |  FROM documents WHERE len(string_split(text,' ')) >= 2),
         |tp AS (SELECT split_part(sh, ' ', 1) AS t1,
         |              split_part(sh, ' ', 2) AS t2 FROM sh),
         |e0 AS (SELECT least(t1, t2) AS a, greatest(t1, t2) AS b,
         |         CAST(count(*) AS DOUBLE) AS w
         |       FROM tp
         |       WHERE len(t1) >= 3 AND len(t2) >= 3
         |         AND t1 NOT IN ($stop) AND t2 NOT IN ($stop)
         |         AND t1 <> t2
         |       GROUP BY 1, 2),
         |sym AS (SELECT a AS src, b AS dst, w FROM e0
         |        UNION ALL SELECT b AS src, a AS dst, w FROM e0),
         |wt AS (SELECT src, sum(w) AS wtot FROM sym GROUP BY src),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM wt),
         |r0 AS (SELECT src AS node, 1.0 / nn AS pr FROM wt, n),
         |r1 AS (SELECT s.dst AS node,
         |         (1.0 - 0.85) / nn + 0.85 * sum(r.pr * s.w / d.wtot) AS pr
         |       FROM sym s JOIN r0 r ON s.src = r.node
         |                  JOIN wt d ON s.src = d.src, n
         |       GROUP BY s.dst, nn),
         |r2 AS (SELECT s.dst AS node,
         |         (1.0 - 0.85) / nn + 0.85 * sum(r.pr * s.w / d.wtot) AS pr
         |       FROM sym s JOIN r1 r ON s.src = r.node
         |                  JOIN wt d ON s.src = d.src, n
         |       GROUP BY s.dst, nn)
         |SELECT r2.node AS word, CAST(wt.wtot AS BIGINT) AS total_w,
         |  round(r2.pr * nn, 6) AS pr_x_n
         |FROM r2 JOIN wt ON r2.node = wt.src, n
         |ORDER BY pr_x_n DESC, word LIMIT 20""".stripMargin
    },

    // Positions are 1-based here vs 0-based in Spark's posexplode —
    // only differences enter the result, so the bases cancel.
    "q183_proximity_search" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |           FROM documents),
        |pj AS (SELECT doc_id, unnest(list_filter(
        |         list_transform(range(1, len(ts) + 1),
        |           i -> CASE WHEN ts[i] = 'join' THEN i END),
        |         x -> x IS NOT NULL)) AS p1
        |       FROM d),
        |pv AS (SELECT doc_id, unnest(list_filter(
        |         list_transform(range(1, len(ts) + 1),
        |           i -> CASE WHEN ts[i] = 'vector' THEN i END),
        |         x -> x IS NOT NULL)) AS p2
        |       FROM d),
        |pairs AS (SELECT pj.doc_id, abs(pj.p1 - pv.p2) AS dist
        |          FROM pj JOIN pv ON pj.doc_id = pv.doc_id)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_close,
        |  CAST(min(dist) AS BIGINT) AS min_dist
        |FROM pairs GROUP BY doc_id
        |HAVING sum(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) > 0
        |ORDER BY doc_id""".stripMargin,

    // q86's BM25 pyramid -> rounded top-10 with ranks -> DCG over
    // the tf('join') relevance proxy; IDCG over the corpus-ideal
    // top-10 by relevance.
    "q193_ndcg_bm25" -> (bm25Ctes +
      """,
        |rel AS (SELECT doc_id,
        |          CAST(len(list_filter(string_split(text, ' '),
        |               t -> t = 'join')) AS BIGINT) AS rel
        |        FROM documents),
        |t10 AS (SELECT doc_id, round(score, 6) AS bm25 FROM sc
        |        ORDER BY round(score, 6) DESC, doc_id LIMIT 10),
        |rk AS (SELECT t.doc_id,
        |         row_number() OVER (ORDER BY t.bm25 DESC, t.doc_id) AS rnk,
        |         r.rel
        |       FROM t10 t JOIN rel r ON t.doc_id = r.doc_id),
        |ideal AS (SELECT rel,
        |            row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
        |          FROM rel ORDER BY rel DESC, doc_id LIMIT 10),
        |a AS (SELECT sum(CAST(rel AS DOUBLE) / log2(rnk + 1)) AS dcg,
        |        CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_relevant
        |      FROM rk),
        |b AS (SELECT sum(CAST(rel AS DOUBLE) / log2(rnk + 1)) AS idcg
        |      FROM ideal)
        |SELECT round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
        |  round(dcg / idcg, 6) AS ndcg, n_relevant
        |FROM a, b ORDER BY ndcg""".stripMargin),

    "q196_zipf_token_slope" ->
      """WITH c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY tok),
        |top AS (SELECT tok, cnt FROM c
        |        ORDER BY cnt DESC, tok LIMIT 100),
        |xy AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, tok)
        |                 AS DOUBLE)) AS x,
        |         ln(CAST(cnt AS DOUBLE)) AS y
        |       FROM top),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |        sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
        |      FROM xy)
        |SELECT n AS n_tokens,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |        (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
        |  round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |               (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) /
        |        CAST(n AS DOUBLE), 6) AS intercept
        |FROM a ORDER BY n_tokens""".stripMargin,

    // MRR replay: q193's single-term BM25 blocks per query term,
    // rounded-score ranking, tf >= 2 relevance, floor-ppm RR/recall.
    "q274_bm25_mrr" -> {
      val terms = Seq("join", "vector", "scan")
      val base =
        """WITH base AS (
          |  SELECT doc_id,
          |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS dl,
          |""".stripMargin +
        terms.map(t =>
          s"    len(list_filter(string_split(text,' '), t -> t = '$t')) AS tf_$t").mkString(",\n") +
        "\n  FROM documents),\nst AS (\n" +
        "  SELECT CAST(count(*) AS DOUBLE) AS nd, CAST(sum(dl) AS DOUBLE) AS sdl,\n" +
        terms.map(t =>
          s"    CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t").mkString(",\n") +
        "\n  FROM base)"
      val blocks = terms.map { t =>
        s""",
           |sc_$t AS (
           |  SELECT doc_id, tf_$t AS tf,
           |    ln(1.0 + (nd - df_$t + 0.5) / (df_$t + 0.5)) * (CAST(tf_$t AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd))) AS score
           |  FROM base, st),
           |rk_$t AS (
           |  SELECT doc_id, tf,
           |    row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
           |      AS rnk
           |  FROM sc_$t),
           |m_$t AS (
           |  SELECT
           |    CAST(coalesce(min(CASE WHEN tf >= 2 AND rnk <= 10
           |      THEN rnk END), 0) AS BIGINT) AS first_rel_rank,
           |    CAST(sum(CASE WHEN tf >= 2 AND rnk <= 10 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_rel_top10,
           |    CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_rel_total
           |  FROM rk_$t)""".stripMargin
      }.mkString
      val rows = terms.map { t =>
        s"""SELECT '$t' AS query, first_rel_rank,
           |  CASE WHEN first_rel_rank = 0 THEN 0
           |       ELSE 1000000 // first_rel_rank END AS rr_ppm,
           |  n_rel_top10, n_rel_total,
           |  CASE WHEN n_rel_total = 0 THEN 0
           |       ELSE (n_rel_top10 * 1000000) // n_rel_total END
           |    AS recall_ppm
           |FROM m_$t""".stripMargin
      }.mkString("\nUNION ALL\n")
      base + blocks + "\n" + rows + "\nORDER BY query"
    },
  )
}
