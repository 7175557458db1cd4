package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}
import graft.tables.Tables

/** Embedding-similarity queries over the embeddings table. */
object VectorQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact brute-force cosine top-3 for 10 query vectors.
    "q34_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 3)
        .orderBy("query_id", "rnk")
    }),

    // Banded multi-probe LSH ANN (scale path). Approximate, but
    // DETERMINISTIC: the full 30-row output is SF-aware hash-pinned
    // (r17 verdict item 1 — see the oracle), which subsumes the q53
    // recall sentinel. Round 2's single-band variant had recall
    // 0.033 — the pins guard that this path stays USABLE.
    "q35_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.annTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 3, method = "lsh")
        .orderBy("query_id", "rnk")
    }),

    // IVF ANN with k-means-refined centroids. Approximate by
    // construction but deterministic — full output SF-aware
    // hash-pinned like q35 (r17 verdict item 1).
    "q43_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.annTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 3, method = "ivf")
        .orderBy("query_id", "rnk")
    }),

    // Matryoshka truncation quality (MRL): recall@3 of cosine top-k
    // under PREFIX-truncated embeddings (dims 8/16/32) against the
    // full 64-dim ground truth — the dimension-ladder report that
    // decides how short production vectors can go. Reuses the exact
    // brute-force scorer over sliced vectors; recall emitted as
    // floored ppm of exact hit counts.
    "q160_matryoshka_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      def sliced(df: DataFrame, dims: Int) =
        df.select(col("vec_id"), slice(col("embedding"), 1, dims).as("embedding"))
      def topk(dims: Int) =
        Similarity.bruteForceTopK(sliced(emb, dims),
            sliced(emb.filter(col("vec_id") < 10), dims),
            "vec_id", "embedding", 3)
          .select("query_id", "neighbor_id")
      val full = topk(64)
      Seq(8, 16, 32).map { dims =>
        topk(dims).intersect(full)
          .agg(lit(dims).as("dims"), count(lit(1)).as("hits"),
               floor(count(lit(1)) * 1000000.0 / 30.0).cast("long")
                 .as("recall_ppm"))
      }.reduce(_ unionByName _).orderBy("dims")
    }),

    // Hard-negative mining (Similarity.hardNegatives): top-3
    // most-similar DIFFERENT-label corpus vectors per anchor — the
    // contrastive-training counterpart of q119's uniform negative
    // sampling. Exact scorer (oracle-checkable); the ANN candidate
    // paths compose the same way at scale.
    "q147_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegatives(
          corpus = emb, queries = emb.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = 3)
        .orderBy("query_id", "rnk")
    }),

    // Embedding-cosine near-duplicate pairs (sim >= 0.5) through the
    // banded-LSH candidate generator + exact-cosine verification —
    // the SCALE path is the verified path (round 1 verified an
    // all-pairs crossJoin; this plan is O(n·bands) shuffle keys). The
    // oracle is still the exact all-pairs pair set: with P=3/B=21 the
    // deterministic planes catch every true pair on this data (miss
    // probability ~6e-4 per pair), so verified LSH == exact.
    "q42_embedding_neardup" -> ((s, d) =>
      Similarity.lshNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.5, bands = 21, planesPerBand = 3)
        .orderBy("id_a", "id_b")),

    // Cross-lingual near-duplicate mining (r16 verdict item 7): a
    // document and its TRANSLATION share no shingles — MinHash/
    // SimHash/PPJoin are blind to the pair — but multilingual
    // embeddings put them nearly parallel. Candidates from the q42
    // banded hyperplane blocking, pruned by the two metadata blocks
    // (lang_a != lang_b, max(n_chars) <= 2*min(n_chars)) BEFORE any
    // vector is fetched, exact-cosine verified at 0.4. The oracle is
    // the exact all-pairs replay: the deterministic B=21/P=3 planes
    // catch every qualifying pair on this data at all three SFs
    // (verified against the all-pairs closure; the q42 argument at a
    // lower threshold — re-check if testdata regenerates).
    "q346_crosslingual_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val meta = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      Similarity.crossLingualNearDupPairs(
          emb.join(meta, col("vec_id") === col("doc_id")),
          "vec_id", "embedding", "lang", "n_chars",
          threshold = 0.4, maxLenRatio = 2.0)
        .orderBy("id_a", "id_b")
    }),

    // Full-probe IVF (nProbe = nCentroids): probing every cell makes
    // IVF reduce exactly to brute-force top-k, so the approximate
    // machinery (map-side NearestCentroids assignment, cell join,
    // partial top-k) gets a REAL oracle-checked correctness signal —
    // the same oracle as q34.
    "q52_ann_ivf_fullprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // kmeansSweeps = 0: with nProbe == nCentroids every cell is
      // probed, so refined centroids cannot change the result — the
      // default 2 sweeps would be two pure-overhead corpus scans here.
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 3, nCentroids = 8, nProbe = 8,
          kmeansSweeps = 0)
        .orderBy("query_id", "rnk")
    }),

    // Recall@k of the two ANN paths against exact brute force,
    // computed in-engine: any approximation regression (bucketing,
    // probe selection, tie-breaks) moves these values and turns the
    // driver row red. |exact| = 10 queries x k=3 = 30 by construction.
    "q53_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id")
      def recallRow(name: String) =
        Similarity.annTopK(emb, qs, "vec_id", "embedding", k = 3, method = name)
          .select("query_id", "neighbor_id").intersect(exact)
          .agg(lit(name).as("method"),
               round(count(lit(1)) / 30.0, 6).as("recall"))
      recallRow("ivf").unionByName(recallRow("lsh")).orderBy("method")
    }),

    // Quantized ANN recall sentinel (q53's pattern for the ivf_int8
    // path): IVF cells scored over int8 CODES (asymmetric
    // Int8CosineSim — the index side reads 1/4 the bytes), top
    // rerankFactor*k approximate candidates re-ranked exactly from
    // the float vectors. Recall vs exact brute force is a
    // deterministic fact of this configuration at sf0.01 (fixed
    // seeds/sweeps/probes/data); any regression in quantization,
    // approximate ordering, or the re-rank join turns this row red.
    "q63_ann_int8_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id")
      Similarity.annTopK(emb, qs, "vec_id", "embedding", k = 3, method = "ivf_int8")
        .select("query_id", "neighbor_id").intersect(exact)
        .agg(lit("ivf_int8").as("method"),
             round(count(lit(1)) / 30.0, 6).as("recall"))
        .orderBy("method")
    }),

    // Int8 embedding quantization (native Int8Quantize/Int8Dequantize
    // expressions — the 4x storage reduction for vector corpora),
    // driver-checked through reconstruction metrics: per-label mean
    // scale, mean/max of the per-vector max reconstruction error, and
    // the max |code| (pins the [-127,127] range). The zip_with/
    // transform lambdas here are METRIC arithmetic on already-
    // quantized rows in a validation query — the production operator
    // is the fused native expression pair itself.
    "q60_int8_quantize" -> ((s, d) => {
      val gf = graft.functions.GraftFunctions
      Tables.embeddings(s, d)
        .select(col("label"), Similarity.asDouble(col("embedding")).as("v"))
        .withColumn("q", gf.int8Quantize(s, col("v")))
        .withColumn("r", gf.int8Dequantize(s, col("q")))
        .withColumn("maxerr", array_max(zip_with(col("v"), col("r"), (a, b) => abs(a - b))))
        .withColumn("maxcode", array_max(transform(col("q.codes"), c => abs(c))).cast("long"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vectors"),
             round(avg(col("q.scale")), 6).as("avg_scale"),
             round(avg("maxerr"), 6).as("avg_max_err"),
             round(max("maxerr"), 6).as("max_max_err"),
             max("maxcode").as("max_code"))
        .orderBy("label")
    }),

    // SemDeDup-style semantic dedup (Similarity.semanticDedup): LSH
    // near-dup pairs at cosine >= 0.5 (the q42-verified generator and
    // parameters, so the pair set equals the exact one) -> connected
    // components -> keep-lowest-id representative per cluster. The
    // one-row summary pins corpus size, surviving representatives and
    // dropped semantic dups against the oracle's exact-pair recursive
    // transitive closure.
    "q73_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.5, bands = 21, planesPerBand = 3)
        .agg(count(lit(1)).as("n_vecs"),
             countDistinct("component").as("n_kept"),
             sum(when(col("vec_id") =!= col("component"), 1L).otherwise(0L))
               .as("n_dropped"))
        .orderBy("n_vecs")),

    // Per-label centroid aggregation: ONE elementwise vector-sum
    // buffer per partition per label through the exchange (the native
    // [[graft.functions.VectorSum]] aggregate) — round 2's posexplode
    // + groupBy(dim) shape pushed n x 64 rows through the shuffle.
    // The per-label mean/norm arithmetic runs on the 10 aggregated
    // rows, where interpreted array lambdas are free.
    "q36_label_centroid_norm" -> ((s, d) => {
      val gf = graft.functions.GraftFunctions
      Tables.embeddings(s, d)
        .select(col("label"), Similarity.asDouble(col("embedding")).as("v"))
        .groupBy("label")
        .agg(gf.vectorSum(s, col("v")).as("vs"))
        .select(col("label"),
          round(sqrt(aggregate(
            transform(col("vs.sum"), x => x / col("vs.n")),
            lit(0.0), (acc, m) => acc + m * m)), 6).as("centroid_norm"),
          col("vs.n").as("n_vectors"))
        .orderBy("label")
    }),

    // Reciprocal-rank fusion — hybrid retrieval: the BM25 lexical arm
    // (q86's terms, over documents) fused with the semantic arm
    // (cosine against the vec_id=0 embedding, the q34 construction)
    // by rrf = sum over arms of 1/(60 + rank). Each arm computes its
    // global top-50 via orderBy+limit (TakeOrderedAndProject does the
    // heavy lift; the rank window then runs on <= 50 rows) — never a
    // corpus-wide window. The query vector rides in as a broadcast
    // 1-row frame, not a collect. Lexical ranks order on the ROUNDED
    // score (q80 rule); semantic ranks order on the raw sim, which
    // q34 pins as bit-identical cross-engine; rrf terms are single
    // divisions of exact small integers — deterministic.
    "q95_rrf_hybrid" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val lex = graft.ext.Retrieval.withBm25(Tables.documents(s, d), "text",
          Seq("join", "vector", "scan"))
        .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        .withColumn("rank_lex", row_number().over(
          w.orderBy(col("bm25").desc, col("doc_id"))))
      val emb = Tables.embeddings(s, d)
      val q0 = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("__q"))
      val sem = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q0))
        .select(col("vec_id"),
          graft.functions.GraftFunctions.cosineSimilarity(s,
            Similarity.asDouble(col("embedding")),
            Similarity.asDouble(col("__q"))).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(50)
        .withColumn("rank_sem", row_number().over(
          w.orderBy(col("sim").desc, col("vec_id"))))
      lex.join(sem, col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
                col("rank_lex"), col("rank_sem"))
        .withColumn("rrf",
          round(coalesce(lit(1.0) / (lit(60.0) + col("rank_lex")), lit(0.0)) +
                coalesce(lit(1.0) / (lit(60.0) + col("rank_sem")), lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("id"))
        .limit(15)
    }),

    // MMR diverse re-ranking (Similarity.mmrRerank): top-20 exact
    // candidates per query, greedy 5 picks at λ=0.75 (chosen so 1−λ
    // is the same double in every engine). The oracle replays the
    // greedy loop as 4 unrolled SQL steps over the same 6dp-rounded
    // sims, so every pick AND its mmr score are hash-checked.
    "q106_mmr_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mmrRerank(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, candK = 20, lambda = 0.75)
        .orderBy("query_id", "step")
    }),

    // Triangle count of the 3-NN cosine graph — the embedding-space
    // clustering diagnostic (high triangle density = tight semantic
    // clusters), and the oriented-edge join pattern: undirect the
    // kNN pairs to x<y edges, then e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) so
    // every triangle counts exactly once. At 10^9 vectors swap
    // bruteForceTopK for annTopK and orient by degree before the
    // wedge join (bounds the fan-out of high-degree nodes); the
    // count/join shape is unchanged.
    "q113_knn_triangles" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val knn = graft.ops.Staging.stage(
        Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3)
          .select(least(col("query_id"), col("neighbor_id")).as("x"),
                  greatest(col("query_id"), col("neighbor_id")).as("y"))
          .distinct())
      val tri = graft.ext.Graphs.triangles(knn, "x", "y")
      emb.agg(countDistinct("vec_id").as("n_nodes"))
        .crossJoin(knn.agg(count(lit(1)).as("n_edges")))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
        .orderBy("n_nodes")
    }),

    // Local clustering coefficient over the q113 3-NN cosine graph —
    // the per-node tightness diagnostic (q113 counts triangles
    // globally; this localizes them): c(v) = 2·t(v) / (d(v)·(d(v)−1))
    // with t(v) = triangles containing v (each exactly-once triangle
    // from Graphs.triangles explodes to its 3 corners) and d(v) the
    // undirected degree (Sweep.symmetrize of the distinct x<y edge
    // set). Exact integers everywhere; the ratio is derived from
    // identical exact ints by identical IEEE ops on both engines, so
    // 6dp rounding is stable, and the ORDER is on the rounded value
    // with the node tie-break. Top 15 tightest nodes.
    "q203_clustering_coefficient" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val knn = graft.ops.Staging.stage(
        Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3)
          .select(least(col("query_id"), col("neighbor_id")).as("x"),
                  greatest(col("query_id"), col("neighbor_id")).as("y"))
          .distinct())
      val triPer = graft.ext.Graphs.triangles(knn, "x", "y")
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
      val deg = graft.ops.Sweep.symmetrize(knn, "x", "y")
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
      deg.join(triPer, Seq("node"), "left")
        .select(col("node"), col("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          when(col("degree") >= 2,
            round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
                  (col("degree") * (col("degree") - 1)), 6))
            .otherwise(lit(0.0)).as("clustering"))
        .orderBy(col("clustering").desc, col("node"))
        .limit(15)
    }),

    // Product-quantization ANN recall sentinel (q53's pattern for the
    // PQ memory path, Pq.pqTopK): the corpus is stored as M=8 codes
    // over K=16-codeword per-subspace codebooks (8 small ints vs 64
    // floats — the 32x index-memory reduction), queries score rows by
    // ADC table sum (native PqAdcScore — 8 array reads per row, no
    // dot product). Row 'pq' is the raw ADC ranking; 'pq_rerank' is
    // the production shape (top 4k ADC candidates re-scored exactly
    // from the float vectors). Codebooks train once and are shared by
    // both rows. Recall vs exact brute force is a deterministic fact
    // of this configuration (fixed seeds/sweeps/tie-breaks) at each
    // SF; any regression in training, encode, ADC scoring, or the
    // re-rank join turns the row red.
    "q131_ann_pq_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      // r22 (guide §2.4): STAGED — the exact ground-truth frame feeds
      // all three method branches' intersects; lazy, the brute-force
      // all-pairs pass re-ran once per branch
      val exact = graft.ops.Staging.stage(
        Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 3)
          .select("query_id", "neighbor_id"))
      val books = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 8, k = 64)
      def recallRow(name: String, rf: Int) =
        Pq.pqTopK(emb, qs, "vec_id", "embedding", k = 3,
            rerankFactor = rf, codebooks = Some(books))
          .select("query_id", "neighbor_id").intersect(exact)
          .agg(lit(name).as("method"),
               round(count(lit(1)) / 30.0, 6).as("recall"))
      val ivfPq = Pq.ivfPqTopK(emb, qs, "vec_id", "embedding", k = 3,
          nCentroids = 16, nProbe = 4, codebooks = Some(books))
        .select("query_id", "neighbor_id").intersect(exact)
        .agg(lit("ivf_pq").as("method"),
             round(count(lit(1)) / 30.0, 6).as("recall"))
      recallRow("pq", 0).unionByName(recallRow("pq_rerank", 16))
        .unionByName(ivfPq)
        .orderBy("method")
    }),

    // Label-centroid affinity matrix: the pairwise cosine between
    // class centroids (q36's centroid build) — the embedding-space
    // confusion structure (which labels sit close enough to collide
    // in ANN retrieval / dedup). Centroid frame is labels-sized, so
    // the pair join is a broadcast nested loop over 45 pairs — the
    // heavy work is the ONE distributed centroid aggregate. 6dp
    // absorbs the vector-sum merge-order ulp (the q36 contract).
    "q186_centroid_affinity" -> ((s, d) => {
      val gf = graft.functions.GraftFunctions
      val cents = graft.ops.Staging.stage(
        Tables.embeddings(s, d)
          .select(col("label"), Similarity.asDouble(col("embedding")).as("v"))
          .groupBy("label")
          .agg(gf.vectorSum(s, col("v")).as("vs"))
          .select(col("label"),
            transform(col("vs.sum"), x => x / col("vs.n")).as("c")))
      val a = cents.select(col("label").as("label_a"), col("c").as("ca"))
      val b = cents.select(col("label").as("label_b"), col("c").as("cb"))
      a.join(broadcast(b), col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          round(gf.cosineSimilarity(s, col("ca"), col("cb")), 6).as("cosine"))
        .orderBy("label_a", "label_b")
    }),

    // Exact-rational Lloyd k-means (ext.KmeansExact): the TRAINED
    // clustering itself is hash-verified — quantize once to integer
    // micro-units, keep centroids as exact (sum, count) rationals,
    // decide every assignment by cross-multiplied exact decimal
    // comparisons. The fp ivfCentroids path (q43/q52) is the
    // production build; this pins the algorithm's semantics with a
    // generated sweep-unrolled oracle (the q143 BPE contract).
    "q234_kmeans_exact" -> ((s, d) =>
      graft.ext.KmeansExact.lloyd(Tables.embeddings(s, d),
        "vec_id", "embedding", k = 4, dims = 64, sweeps = 2)),

    // Metadata-FILTERED vector search (Similarity.filteredTopK) — the
    // vector-db workload where every query carries a predicate:
    // top-3 cosine among corpus vectors sharing the query's label,
    // PRE-filtered so low-selectivity labels can't starve recall the
    // way post-filtering a fixed-k ANN result does (q34 is the
    // unfiltered baseline; hardNegatives q147 is the not-equal face
    // of the same plan). Broadcast anchors, one corpus scan.
    "q268_filtered_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ext.Similarity.filteredTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < 5),
          idCol = "vec_id", vecCol = "embedding", labelCol = "label",
          k = 3)
        .orderBy("query_id", "rnk")
    }),

    // Filtered-ANN INDEX tier (IvfIndex.buildLabeled +
    // searchFiltered): q268's pre-filter semantics at index scale —
    // the saved inverted file partitions by (label, cell), so a
    // filtered search prunes to its own label's probed cells at the
    // parquet directory listing instead of scanning the corpus.
    // Recall@3 vs the exact filteredTopK tier, the q53/q63 measured
    // SF-keyed pin pattern: 5 queries × k=3 = 15 expected hits; cells
    // are clustered on geometry alone, so the label filter thins each
    // probed cell's candidates and nProbe=4 (vs q53's 3) is the
    // compensating dial the operator scaladoc prescribes. Full probe
    // reduces EXACTLY to filteredTopK (ExtSpec-pinned).
    "q281_filtered_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
      val exact = graft.ext.Similarity.filteredTopK(
          corpus = emb, queries = qs, idCol = "vec_id",
          vecCol = "embedding", labelCol = "label", k = 3)
        .select("query_id", "neighbor_id")
      graft.ext.IvfIndex.buildLabeled(emb, "vec_id", "embedding", "label",
          nCentroids = 16, kmeansSweeps = 2)
        .searchFiltered(qs, "vec_id", "embedding", "label",
          k = 3, nProbe = 4)
        .select("query_id", "neighbor_id").intersect(exact)
        .agg(lit("ivf_filtered").as("method"),
             round(count(lit(1)) / 15.0, 6).as("recall"))
        .orderBy("method")
    }),

    // Filtered-ANN at the QUANTIZED index tier
    // (IvfIndex.searchFilteredQuantized) — the r15 scoped gap closed:
    // the 4x-smaller int8 layout serving label-filtered queries.
    // Stage 1 ranks same-label probed-cell candidates by the
    // asymmetric int8-x-float cosine (q63's path) under the
    // (label, cell) directory pruning; stage 2 re-ranks the
    // rerankFactor*k survivors exactly from the float corpus. Recall@3
    // vs the exact filteredTopK tier, the q281 SF-keyed measured-pin
    // form; nProbe=4 matches q281 so the int8 tier's recall reads
    // directly against the float tier's.
    "q308_filtered_ann_int8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
      val exact = graft.ext.Similarity.filteredTopK(
          corpus = emb, queries = qs, idCol = "vec_id",
          vecCol = "embedding", labelCol = "label", k = 3)
        .select("query_id", "neighbor_id")
      graft.ext.IvfIndex.buildLabeled(emb, "vec_id", "embedding", "label",
          nCentroids = 16, kmeansSweeps = 2)
        .searchFilteredQuantized(qs, emb, "vec_id", "embedding", "label",
          k = 3, nProbe = 4)
        .select("query_id", "neighbor_id").intersect(exact)
        .agg(lit("ivf_filtered_int8").as("method"),
             round(count(lit(1)) / 15.0, 6).as("recall"))
        .orderBy("method")
    }),

    // ANN recall CURVE — recall@3 of the IVF index tier at
    // nProbe = 1/2/4/8 against the exact brute-force top-3: the
    // operating-curve artifact an index deployment reads to pick its
    // probe budget (q53 pins two methods at one setting; this pins
    // one method across the dial). The index builds ONCE (centroids +
    // assignment reused across the four searches). SF-keyed measured
    // pin, the q53 form.
    "q319_ann_recall_curve" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      // r22: staged — four probe settings intersect against it (see q131)
      val exact = graft.ops.Staging.stage(
        graft.ext.Similarity.bruteForceTopK(
            emb, qs, "vec_id", "embedding", 3)
          .select("query_id", "neighbor_id"))
      val idx = graft.ext.IvfIndex.build(emb, "vec_id", "embedding",
        nCentroids = 16, kmeansSweeps = 2)
      Seq(1, 2, 4, 8).map { np =>
        idx.search(qs, "vec_id", "embedding", k = 3, nProbe = np)
          .select("query_id", "neighbor_id").intersect(exact)
          .agg(lit(np.toLong).as("n_probe"),
               round(count(lit(1)) / 30.0, 6).as("recall"))
      }.reduce(_.unionByName(_)).orderBy("n_probe")
    }),

    // Streaming-ingested ANN index (Streams.annAppendStream): the
    // micro-batch twin of IvfIndex.append driven END-TO-END — build a
    // labeled index over the even-id half, stream the odd-id half in
    // as two micro-batches (foreachBatch -> the batch append operator
    // at frozen centroids, replay-guarded by per-batch commit
    // markers), then run the filtered search over the loaded result.
    // At exhaustive probes the cell routing is a no-op, so the
    // stream-fed index's search must equal the exact filteredTopK
    // over the FULL corpus — q268's oracle text verbatim (shared
    // below): the stream ingest is invisible to correctness, which is
    // precisely the contract. The driver-side collect is the TEST
    // source shape only (MemoryStream); production ingest reads
    // Kafka/files and rows never visit the driver.
    "q321_ann_stream_append" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val dir = graft.ops.Scratch.dir("q321ivf")
      graft.ext.IvfIndex.buildLabeled(
          emb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", "label",
          nCentroids = 8, kmeansSweeps = 2)
        .save(dir)
      val delta = emb.filter(pmod(col("vec_id"), lit(2)) =!= 0)
        .select("vec_id", "embedding", "label")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
      implicit val sc = s.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float], Int)]
      val q = graft.streaming.Streams.annAppendStream(
        stream.toDF().toDF("vec_id", "embedding", "label"), dir,
        "vec_id", "embedding", Some("label"))
      val (b1, b2) = delta.splitAt(delta.length / 2)
      stream.addData(b1.toIndexedSeq)
      stream.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      graft.ext.IvfIndex.load(s, dir)
        .searchFiltered(emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 3, nProbe = 8)
        .orderBy("query_id", "rnk")
    }),

    // Full IVF index LIFECYCLE at the driver (build -> save ->
    // append -> compact -> search): the q321 contract extended to the
    // re-cluster half of maintenance — a fresh GENERATION at new
    // centroids over the appended corpus must serve the same filtered
    // search. At exhaustive probes any centroid set is exact, so the
    // compacted index's search equals filteredTopK over everything —
    // q268's oracle text verbatim, making the whole lifecycle
    // result-invisible by construction (nProbe covers the compacted
    // generation's 8 cells).
    "q333_ivf_compact_lifecycle" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = graft.ops.Scratch.dir("q333ivf")
      val gen2 = graft.ops.Scratch.dir("q333cmp")
      graft.ext.IvfIndex.buildLabeled(
          emb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", "label",
          nCentroids = 8, kmeansSweeps = 2)
        .save(dir)
      graft.ext.IvfIndex.append(s, dir,
        emb.filter(pmod(col("vec_id"), lit(2)) =!= 0),
        "vec_id", "embedding", labelCol = Some("label"))
      // r22 (r21 verdict item 3 — guide §2.4): the compact REBUILD runs
      // one Lloyd sweep, not two — each sweep is a full-corpus scan +
      // collect, and the rebuild's codebook starts from a corpus the
      // build step already clustered once, so it converges in fewer
      // sweeps. Result-invisible by construction: nProbe = nCentroids
      // is exhaustive, so the search result is EXACT under ANY centroid
      // set (the oracle is the centroid-free filteredTopK text, and the
      // lifecycle still writes the same on-disk generations).
      graft.ext.IvfIndex.compact(s, dir, gen2,
        nCentroids = 8, kmeansSweeps = 1)
      graft.ext.IvfIndex.load(s, gen2)
        .searchFiltered(emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 3, nProbe = 8)
        .orderBy("query_id", "rnk")
    }),

    // Shard-parallel IVF BUILD-AND-MERGE at the driver (r18 verdict
    // 6a — the multi-node build story append/compact don't cover):
    // two shard indexes built INDEPENDENTLY (per-shard k-means — the
    // expensive sweeps never see the full corpus), merged by cell-
    // union (centroid matrices concatenate, vectors keep their shard
    // cells; merge moves bytes, recomputes no geometry), then served.
    // At exhaustive probes (16 = both shards' 8 cells) the union
    // index IS a rebuild, so the whole build topology is result-
    // invisible: q268's exact filtered-top-k oracle text verbatim.
    "q366_ivf_merge_lifecycle" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val a = graft.ops.Scratch.dir("q366a")
      val b = graft.ops.Scratch.dir("q366b")
      val m = graft.ops.Scratch.dir("q366m")
      graft.ext.IvfIndex.buildLabeled(
          emb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", "label",
          nCentroids = 8, kmeansSweeps = 2)
        .save(a)
      graft.ext.IvfIndex.buildLabeled(
          emb.filter(pmod(col("vec_id"), lit(2)) =!= 0),
          "vec_id", "embedding", "label",
          nCentroids = 8, kmeansSweeps = 2)
        .save(b)
      graft.ext.IvfIndex.merge(s, Seq(a, b), m)
      graft.ext.IvfIndex.load(s, m)
        .searchFiltered(emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 3, nProbe = 16)
        .orderBy("query_id", "rnk")
    }),

    // TOMBSTONE-DELETE lifecycle at the driver (build -> append ->
    // delete -> serve LOGICALLY -> compact -> serve PHYSICALLY) — the
    // retention / right-to-be-forgotten path that makes the index
    // operable: a delete appends ids to a tombstone set (O(|ids|),
    // corpus untouched), load() anti-joins it so the very next load
    // serves without the deleted vectors, and the next compact folds
    // them out physically (the fresh generation carries no tombstone
    // set at all). BOTH serve stages are returned, tagged, and both
    // must equal the exact filtered-top-k over the SURVIVING corpus —
    // q268's oracle text restricted to vec_id % 7 <> 3 and crossed
    // with the stage tags, making the whole delete mechanism
    // result-invisible by construction (exhaustive probes, as q333).
    "q376_ivf_delete_lifecycle" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = graft.ops.Scratch.dir("q376ivf")
      val gen2 = graft.ops.Scratch.dir("q376cmp")
      graft.ext.IvfIndex.buildLabeled(
          emb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", "label",
          nCentroids = 8, kmeansSweeps = 2)
        .save(dir)
      graft.ext.IvfIndex.append(s, dir,
        emb.filter(pmod(col("vec_id"), lit(2)) =!= 0),
        "vec_id", "embedding", labelCol = Some("label"))
      graft.ext.IvfIndex.delete(s, dir,
        emb.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"),
        "vec_id")
      val queries = emb.filter(col("vec_id") < 5)
      val logical = graft.ext.IvfIndex.load(s, dir)
        .searchFiltered(queries, "vec_id", "embedding", "label",
          k = 3, nProbe = 8)
        .withColumn("stage", lit("logical"))
      // r22: one-sweep compact rebuild — see q333 (exhaustive probes
      // make the search exact under any centroid set)
      graft.ext.IvfIndex.compact(s, dir, gen2,
        nCentroids = 8, kmeansSweeps = 1)
      val physical = graft.ext.IvfIndex.load(s, gen2)
        .searchFiltered(queries, "vec_id", "embedding", "label",
          k = 3, nProbe = 8)
        .withColumn("stage", lit("physical"))
      logical.unionByName(physical).orderBy("stage", "query_id", "rnk")
    }),

    // EMBEDDING-SPACE DRIFT via the LINEAR-TIME MMD estimator
    // (Gretton et al. JMLR'12 §6) — the distribution-shift monitor
    // for embedding pipelines (new crawl vs reference corpus,
    // retrained encoder vs serving index), complementing q269's PSI
    // (per-feature bins) with a kernel statistic that sees the JOINT
    // geometry. The quadratic MMD is unusable at corpus scale; the
    // linear estimator pairs sample 2j-1 with 2j and averages
    // h = k(x,x')+k(y,y')-k(x,y')-k(x',y) — ONE pass, no all-pairs.
    // Determinism the lattice way: components quantize to exact
    // integers (floor(x * 2^20) — float->double is exact and the
    // power-of-two product is exact IEEE, so both engines get the
    // SAME integer), squared L2 distances are then exact BIGINTs
    // (<= 64 * 2^42 < 2^49), and the RBF kernel exp(-d2/2^41) — i.e.
    // sigma^2 = 1 on the unit-norm vectors — is ONE shared text over
    // those exact integers, floored to nano. Pairing rides the
    // denseIndex kernel (the q300 rule: no global windows), and the
    // consecutive-pair regroup is two id-keyed joins. P = labels 0-4,
    // Q = labels 5-9 — a label-composition split whose drift is weak
    // by construction, so the statistic exercises BOTH regimes:
    // positive at sf0.001/0.01 and (measured) slightly NEGATIVE at
    // sf0.1, where the unbiased estimator legitimately dips below 0 —
    // which is why the sign-split division guard is load-bearing:
    // Spark div truncates toward zero, DuckDB // floors, and they
    // diverge on exactly that negative case. Scale: sum |h| <= 4e9 *
    // pairs bounds BIGINT headroom at ~2e9 pairs — the q369
    // DECIMAL-valve note beyond.
    "q377_mmd_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qv = expr("transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) " +
        "AS BIGINT))")
      val xs = graft.ops.Kernels.denseIndex(
        emb.filter(col("label") < 5).select(col("vec_id"), qv.as("qv")),
        "vec_id", "idx")
      val ys = graft.ops.Kernels.denseIndex(
        emb.filter(col("label") >= 5).select(col("vec_id"), qv.as("qv")),
        "vec_id", "idx")
      val paired = graft.ops.Staging.stage(
        xs.select(col("idx"), col("qv").as("xv"))
          .join(ys.select(col("idx"), col("qv").as("yv")), "idx"))
      val a = paired.filter(expr("idx % 2 = 0"))
        .select(expr("idx div 2").as("j"), col("xv").as("xa"),
          col("yv").as("ya"))
      val b = paired.filter(expr("idx % 2 = 1"))
        .select(expr("idx div 2").as("j"), col("xv").as("xb"),
          col("yv").as("yb"))
      // the h-term + census stage is the shared operator core
      // (graft.ext.Drift — the streaming twin runs the SAME plan in
      // Complete mode; r19 verdict item 3)
      val census = graft.ext.Drift.linearMmdCensus(a.join(b, "j"))
      val nx = xs.agg(count(lit(1)).as("n_x"))
      val ny = ys.agg(count(lit(1)).as("n_y"))
      census.crossJoin(broadcast(nx)).crossJoin(broadcast(ny))
        .select(col("n_x"), col("n_y"), col("n_pairs"), col("sum_h_nano"),
          col("mmd2_nano"))
        .orderBy("n_pairs")
    }),

    // Planar GRID RANGE JOIN (Spatial.gridRangeJoin): all vector
    // pairs within L2 distance 0.02 in the first-two-dims projection
    // plane — the spatial self-join class (proximity blocking,
    // geo-style neighbor search) done the way it scales: points hash
    // to r-sized integer grid cells, candidates are same-or-adjacent
    // cell pairs via the 4-offset half-plane explode (never 9x, never
    // all-pairs), and only those pay the exact distance test. The
    // oracle is the O(n^2) all-pairs filter — exact equality, since
    // the grid changes WHICH pairs are tested, never the test itself.
    "q322_grid_range_join" -> ((s, d) => {
      val pts = Tables.embeddings(s, d).select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("px"),
        element_at(col("embedding"), 2).cast("double").as("py"))
      graft.ext.Spatial.gridRangeJoin(pts, "vec_id", "px", "py",
          radius = 0.02)
        .select(col("id_a"), col("id_b"), round(col("dist2"), 6).as("dist2"))
        .orderBy("id_a", "id_b")
    }),

    // Asymmetric grid PROXIMITY join (Spatial.gridProximityJoin):
    // odd-id vectors probed against the even-id reference set within
    // r = 0.02 in the 2-dim projection plane — q322's self-join
    // opened into the probe-vs-reference form (geofence / anomaly-
    // radius lookups), whose stateless plan doubles as the streaming
    // twin (Streams.proximityAlertStream is this operator applied to
    // a stream; StreamingSpec pins equality). Exact all-pairs oracle
    // for the same reason as q322.
    "q337_grid_proximity" -> ((s, d) => {
      val pts = Tables.embeddings(s, d).select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("px"),
        element_at(col("embedding"), 2).cast("double").as("py"))
      graft.ext.Spatial.gridProximityJoin(
          pts.filter(pmod(col("vec_id"), lit(2)) =!= 0), "vec_id",
          pts.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id",
          "px", "py", radius = 0.02)
        .select(col("probe_id"), col("ref_id"),
          round(col("dist2"), 6).as("dist2"))
        .orderBy("probe_id", "ref_id")
    }),

    // DBSCAN density clustering (Spatial.dbscan — Ester et al.
    // KDD'96) composed from the two scale kernels the suite already
    // carries: q322's grid range join supplies the eps-neighborhood
    // pairs WITHOUT an all-pairs pass, and q64's connectedComponents
    // labels the core-core graph — so density clustering costs one
    // grid join + one degree aggregate + min-label sweeps over the
    // (much smaller) core subgraph. minPts = 5 self-included; border
    // points attach to the MIN cluster among their core neighbors
    // (the deterministic resolution of DBSCAN's scan-order-dependent
    // border tie); noise is the remainder row (cluster -1). The
    // census per cluster (cores, borders, total, min id) is the
    // curation view: embedding-space density clumps are template/
    // boilerplate families; noise is the long tail worth keeping.
    // Exact integer outputs; the oracle replays all-pairs +
    // recursive closure; PropertySpec pins the kernel against
    // brute-force DBSCAN on random clouds.
    "q352_dbscan_grid" -> ((s, d) => {
      val pts = Tables.embeddings(s, d).select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("px"),
        element_at(col("embedding"), 2).cast("double").as("py"))
      val labeled = graft.ops.Staging.stage(
        graft.ext.Spatial.dbscan(pts, "vec_id", "px", "py",
          radius = 0.02, minPts = 5))
      val census = labeled.groupBy("cluster")
        .agg(sum(when(col("role") === "core", 1L).otherwise(0L))
               .as("n_core"),
             sum(when(col("role") === "border", 1L).otherwise(0L))
               .as("n_border"),
             count(lit(1)).as("n_total"), min("id").as("min_id"))
      val noise = pts.select(col("vec_id").as("id"))
        .join(labeled.select("id"), Seq("id"), "left_anti")
        .agg(count(lit(1)).as("n_total"), min("id").as("min_id"))
        .select(lit(-1L).as("cluster"), lit(0L).as("n_core"),
          lit(0L).as("n_border"), col("n_total"), col("min_id"))
      census.select("cluster", "n_core", "n_border", "n_total", "min_id")
        .unionByName(noise)
        .orderBy("cluster")
    }),

    // Top principal direction of the embedding SECOND-MOMENT matrix
    // (PcaPower.topComponent) — fixed-budget power iteration, the
    // one-pass linear-algebra shape under embedding whitening /
    // anisotropy diagnostics (SemDeDup-class pipelines whiten before
    // cosine): the d x d Gram accumulates MAP-SIDE from per-row outer
    // products (one scan + one d^2 shuffle of partial sums; 4096 rows
    // here), then 3 power steps x ↦ G x / max|G x| on d-sized
    // broadcast frames — never a data-sized shuffle. A DEFINED
    // statistic (fixed steps from all-ones, the pinned-sweep rule);
    // every product floors to integer nanos before its sum, so the
    // oracle replays bit for bit and PropertySpec pins alignment with
    // the true dominant axis on stretched clouds. Output: loading per
    // dim (max-abs = 1e9) + the lambda estimate.
    "q353_pca_power" -> ((s, d) =>
      graft.ext.PcaPower.topComponent(
          Tables.embeddings(s, d), "embedding", steps = 3)
        .orderBy("dim")),

    // Embedding-distribution drift between corpus halves via
    // sign-bucket PSI — the q243 population-stability index applied
    // to the EMBEDDING space: bucket each vector by the sign pattern
    // of its first 6 components (64 cells — a 6-bit random-projection
    // sketch of the distribution's orientation), then
    // Laplace-smoothed PSI between the vec_id-parity halves in
    // floored nano-nats (the shared-text + floored-integer-sum
    // rules). Exact float sign tests, exact counts, one bounded cell
    // frame. The drift gate an embedding-refresh pipeline runs before
    // swapping models.
    "q269_embedding_psi" -> ((s, d) => {
      val bucketExpr = (1 to 6).map(i =>
        s"${1 << (i - 1)} * CASE WHEN element_at(embedding, $i) >= 0 " +
          "THEN 1 ELSE 0 END").mkString(" + ")
      val cells = Tables.embeddings(s, d)
        .select(pmod(col("vec_id"), lit(2L)).as("h"),
                expr(bucketExpr).as("b"))
        .groupBy("b")
        .agg(sum(when(col("h") === 0, 1L).otherwise(0L)).as("c1"),
             sum(when(col("h") === 1, 1L).otherwise(0L)).as("c2"))
      val tot = cells.agg(sum("c1").as("n1"), sum("c2").as("n2"),
        count(lit(1)).as("nb"))
      cells.crossJoin(broadcast(tot))
        .groupBy("nb", "n1", "n2")
        .agg(sum(expr(s"CAST(floor($PsiTermNanoV) AS BIGINT)"))
          .as("psi_nano"))
        .select(col("nb").as("n_buckets"), col("n1"), col("n2"),
          col("psi_nano"))
        .orderBy("n_buckets")
    }),
  )

  /** Shared by q268 (exact filteredTopK) and q321 (the same search
    * served by the stream-appended IVF index at exhaustive probes —
    * the ingest path must be result-invisible, so the oracle is ONE
    * text): q34's exact-cosine construction with the label-equality
    * pre-filter in the pair join. */
  private val FilteredAnnOracleSql =
    """WITH n AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |m AS (
      |  SELECT vec_id, label, vec,
      |    sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
      |p AS (
      |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
      |      / (q.nrm * t.nrm) AS sim
      |  FROM m q, m t
      |  WHERE q.vec_id < 5 AND t.label = q.label
      |    AND t.vec_id <> q.vec_id)
      |SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rnk
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, neighbor_id) AS rnk FROM p)
      |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  /** q376's oracle: q268's exact filtered-top-k text restricted to
    * the SURVIVING corpus (vec_id % 7 <> 3 — the deleted set), then
    * crossed with the two serve-stage tags: the logical (tombstone
    * anti-join) and physical (post-compact) serves must both equal
    * it, row for row. */
  private val DeleteAnnOracleSql =
    """WITH st AS (SELECT unnest(['logical', 'physical']) AS stage),
      |n AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |m AS (
      |  SELECT vec_id, label, vec,
      |    sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
      |p AS (
      |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
      |      / (q.nrm * t.nrm) AS sim
      |  FROM m q, m t
      |  WHERE q.vec_id < 5 AND t.label = q.label
      |    AND t.vec_id <> q.vec_id AND t.vec_id % 7 <> 3)
      |SELECT st.stage, query_id, neighbor_id,
      |  round(sim, 6) AS cosine_sim, rnk
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, neighbor_id) AS rnk FROM p), st
      |WHERE rnk <= 3 ORDER BY stage, query_id, rnk""".stripMargin

  // q377's kernel / sign-split-mean texts live with the operator
  // (graft.ext.Drift — the streaming twin and the oracle interpolate
  // the SAME strings, the PcaPower convention).
  private def MmdKernNano(d2: String): String =
    graft.ext.Drift.mmdKernNano(d2)
  private def MmdMeanNano(idiv: String): String =
    graft.ext.Drift.mmdMeanNano(idiv)

  /** q377's oracle-side exact squared distance (BIGINT components on
    * the shared lattice) fed to the SHARED kernel text. */
  private def mmdOracleKern(u: String, v: String): String =
    MmdKernNano("CAST(list_sum(list_transform(range(1, 65), " +
      s"i -> ($u[i] - $v[i]) * ($u[i] - $v[i]))) AS BIGINT)")

  /** q269's per-bucket PSI contribution in nano-nats, pre-floor —
    * Laplace(+1)-smoothed shares from exact integer counts, SHARED
    * text so both engines run the identical IEEE sequence (the
    * q218/q243 rule). */
  private val PsiTermNanoV =
    "1000000000.0 * ((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)) - " +
      "(CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))) * " +
      "ln((CAST(c1 + 1 AS DOUBLE) * CAST(n2 + nb AS DOUBLE)) / " +
      "(CAST(c2 + 1 AS DOUBLE) * CAST(n1 + nb AS DOUBLE)))"

  // q353's shared term texts live with the operator
  // (graft.ext.PcaPower) — the oracle interpolates the SAME strings,
  // so the term text cannot drift between engines.
  private val GramTermNano = graft.ext.PcaPower.GramTermNano
  private val MatvecTermNano = graft.ext.PcaPower.MatvecTermNano
  private val RenormNano = graft.ext.PcaPower.RenormNano

  /** q353's oracle: the 64-dim Gram from the same floored outer
    * products, then the 3 power steps as generated CTE blocks — one
    * template so the iteration text cannot drift between steps. */
  private def pcaPowerOracleSql: String = {
    def step(t: Int, xPrev: String) =
      s"""y$t AS (
         |  SELECT g.i, CAST(sum($MatvecTermNano) AS BIGINT) AS y
         |  FROM g JOIN $xPrev ON g.j = $xPrev.j GROUP BY g.i),
         |m$t AS (SELECT CAST(max(abs(y)) AS BIGINT) AS m FROM y$t),
         |x$t AS (SELECT i AS j, $RenormNano AS x FROM y$t CROSS JOIN m$t)"""
        .stripMargin
    s"""WITH cell AS (
       |  SELECT i, j, CAST(embedding[i] AS DOUBLE) AS vi,
       |    CAST(embedding[j] AS DOUBLE) AS vj
       |  FROM embeddings
       |  CROSS JOIN range(1, 65) r1(i) CROSS JOIN range(1, 65) r2(j)),
       |g AS (
       |  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       |    CAST(sum($GramTermNano) AS BIGINT) AS g
       |  FROM cell GROUP BY 1, 2),
       |x0 AS (SELECT i AS j, CAST(1000000000 AS BIGINT) AS x
       |       FROM (SELECT DISTINCT i FROM g)),
       |${step(1, "x0")},
       |${step(2, "x1")},
       |y3 AS (
       |  SELECT g.i, CAST(sum($MatvecTermNano) AS BIGINT) AS y
       |  FROM g JOIN x2 ON g.j = x2.j GROUP BY g.i),
       |m3 AS (SELECT CAST(max(abs(y)) AS BIGINT) AS m FROM y3)
       |SELECT i AS dim, $RenormNano AS loading_nano, m AS lambda_nano
       |FROM y3 CROSS JOIN m3 ORDER BY dim""".stripMargin
  }

  /** q160's oracle: q34's exact-cosine top-3 replay at each prefix
    * length, intersected with the 64-dim truth — generated so the
    * four rank blocks are identical term for term. */
  private def matryoshkaOracleSql: String = {
    def top(dims: Int, name: String) =
      s"""$name AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rnk FROM (
         |      SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, ${dims + 1}),
         |          i -> q.vec[i] * t.vec[i]))
         |        / (sqrt(list_sum(list_transform(q.vec[1:$dims], x -> x*x)))
         |           * sqrt(list_sum(list_transform(t.vec[1:$dims], x -> x*x))))
         |          AS sim
         |      FROM m q, m t WHERE q.vec_id < 10 AND t.vec_id <> q.vec_id))
         |  WHERE rnk <= 3)""".stripMargin
    val blocks = (Seq(8, 16, 32).map(d => top(d, s"t$d")) :+ top(64, "t64"))
      .mkString(",\n")
    val rows = Seq(8, 16, 32).map { d =>
      s"""SELECT $d AS dims, CAST(count(*) AS BIGINT) AS hits,
         |  CAST(floor(count(*) * 1000000.0 / 30.0) AS BIGINT) AS recall_ppm
         |FROM t$d JOIN t64 USING (query_id, neighbor_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH n AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |m AS (SELECT vec_id, vec FROM n),
       |$blocks
       |$rows
       |ORDER BY dims""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // Exact cosine pairs (the q42 construction) -> recursive
    // transitive closure (the q64 construction) -> per-corpus summary;
    // singletons label themselves via the left-join coalesce.
    "q73_semantic_dedup" ->
      """WITH RECURSIVE n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id
        |  WHERE list_sum(list_transform(range(1, 65), i -> a.vec[i] * b.vec[i]))
        |      / (a.nrm * b.nrm) >= 0.5),
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
        |lab AS (
        |  SELECT e.vec_id, coalesce(c.component, e.vec_id) AS component
        |  FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id)
        |SELECT count(*) AS n_vecs, count(DISTINCT component) AS n_kept,
        |  CAST(sum(CASE WHEN vec_id <> component THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM lab ORDER BY n_vecs""".stripMargin,

    "q160_matryoshka_recall" -> matryoshkaOracleSql,

    // q34's exact-cosine replay with the label filter swapped in for
    // the self filter.
    "q147_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, label, vec,
        |    sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS sim
        |  FROM m q, m t WHERE q.vec_id < 10 AND t.label <> q.label)
        |SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rnk FROM p)
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // SF-AWARE pinned FULL OUTPUT (r17 verdict item 1 — the last two
    // rows-only entries in the suite): the banded-LSH top-3 per query at the
    // DEFAULT operating point is a deterministic fact of the fixed
    // xxhash64-derived hyperplanes (B=20 x P=3), probe set, and tie order and each SF's data (verified bit-identical
    // across 8- and 32-thread runs at all three SFs), so the whole
    // 30-row result is measured once per testdata generation and
    // keyed on the q53 SF fingerprint (lineitem row count). NOT a
    // recomputation — DuckDB cannot express the hyperplane signatures or bucket probing
    // — so any regression in candidate generation, re-ranking, or
    // tie-breaking turns the row red; this strictly subsumes the q53
    // recall pin (the exact neighbor SET and order are pinned, not
    // just the overlap count). An unknown SF yields an EMPTY oracle
    // and fails loudly on the row count.
    "q35_ann_lsh" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |  CAST(neighbor_id AS BIGINT) AS neighbor_id,
        |  CAST(cosine_sim AS DOUBLE) AS cosine_sim,
        |  CAST(rnk AS INTEGER) AS rnk
        |FROM (VALUES
        |  (6000,0,17,0.334456,1),(6000,0,225,0.315127,2),(6000,0,12,0.311027,3),
        |  (6000,1,257,0.391762,1),(6000,1,209,0.381544,2),(6000,1,129,0.35148,3),
        |  (6000,2,443,0.357569,1),(6000,2,62,0.289997,2),(6000,2,246,0.289771,3),
        |  (6000,3,223,0.340915,1),(6000,3,205,0.336595,2),(6000,3,212,0.319721,3),
        |  (6000,4,345,0.374941,1),(6000,4,98,0.339767,2),(6000,4,343,0.312433,3),
        |  (6000,5,113,0.364433,1),(6000,5,440,0.309255,2),(6000,5,234,0.304412,3),
        |  (6000,6,141,0.34588,1),(6000,6,434,0.305749,2),(6000,6,78,0.294073,3),
        |  (6000,7,382,0.349854,1),(6000,7,466,0.324004,2),(6000,7,209,0.30625,3),
        |  (6000,8,20,0.330079,1),(6000,8,385,0.326578,2),(6000,8,190,0.324204,3),
        |  (6000,9,381,0.356692,1),(6000,9,107,0.329678,2),(6000,9,365,0.321149,3),
        |  (60000,0,365,0.369994,1),(60000,0,334,0.362722,2),(60000,0,387,0.331139,3),
        |  (60000,1,386,0.371485,1),(60000,1,27,0.348208,2),(60000,1,407,0.32701,3),
        |  (60000,2,117,0.318143,1),(60000,2,450,0.266344,2),(60000,2,145,0.263494,3),
        |  (60000,3,130,0.399872,1),(60000,3,149,0.329934,2),(60000,3,343,0.308472,3),
        |  (60000,4,114,0.398513,1),(60000,4,496,0.341212,2),(60000,4,408,0.322753,3),
        |  (60000,5,404,0.328403,1),(60000,5,419,0.319237,2),(60000,5,157,0.311256,3),
        |  (60000,6,350,0.324518,1),(60000,6,430,0.32252,2),(60000,6,145,0.297696,3),
        |  (60000,7,340,0.492766,1),(60000,7,425,0.40752,2),(60000,7,209,0.394463,3),
        |  (60000,8,39,0.384696,1),(60000,8,138,0.356671,2),(60000,8,403,0.338238,3),
        |  (60000,9,49,0.385171,1),(60000,9,489,0.343538,2),(60000,9,414,0.3323,3),
        |  (600000,0,1204,0.406472,1),(600000,0,291,0.391932,2),(600000,0,1020,0.375988,3),
        |  (600000,1,1950,0.386131,1),(600000,1,1175,0.370337,2),(600000,1,1580,0.366762,3),
        |  (600000,2,1303,0.394011,1),(600000,2,953,0.369105,2),(600000,2,337,0.357443,3),
        |  (600000,3,263,0.397951,1),(600000,3,1701,0.388037,2),(600000,3,720,0.365554,3),
        |  (600000,4,524,0.419052,1),(600000,4,1166,0.378662,2),(600000,4,76,0.359507,3),
        |  (600000,5,426,0.396217,1),(600000,5,1684,0.39469,2),(600000,5,1019,0.382756,3),
        |  (600000,6,1805,0.418945,1),(600000,6,270,0.403949,2),(600000,6,1184,0.384812,3),
        |  (600000,7,1622,0.45191,1),(600000,7,605,0.400025,2),(600000,7,160,0.337521,3),
        |  (600000,8,1069,0.385235,1),(600000,8,1413,0.384788,2),(600000,8,1031,0.380335,3),
        |  (600000,9,1443,0.431444,1),(600000,9,796,0.361948,2),(600000,9,1020,0.352562,3)
        |) AS p(sfn, query_id, neighbor_id, cosine_sim, rnk), sf
        |WHERE p.sfn = sf.n
        |ORDER BY query_id, rnk""".stripMargin,

    // SF-AWARE pinned FULL OUTPUT (r17 verdict item 1 — the last two
    // rows-only entries in the suite): the IVF top-3 per query at the
    // DEFAULT operating point is a deterministic fact of the fixed
    // k-means seeds, 2 Lloyd sweeps (9dp-rounded means), and nProbe=3 cells and each SF's data (verified bit-identical
    // across 8- and 32-thread runs at all three SFs), so the whole
    // 30-row result is measured once per testdata generation and
    // keyed on the q53 SF fingerprint (lineitem row count). NOT a
    // recomputation — DuckDB cannot express the k-means cells or probe selection
    // — so any regression in candidate generation, re-ranking, or
    // tie-breaking turns the row red; this strictly subsumes the q53
    // recall pin (the exact neighbor SET and order are pinned, not
    // just the overlap count). An unknown SF yields an EMPTY oracle
    // and fails loudly on the row count.
    "q43_ann_ivf" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |  CAST(neighbor_id AS BIGINT) AS neighbor_id,
        |  CAST(cosine_sim AS DOUBLE) AS cosine_sim,
        |  CAST(rnk AS INTEGER) AS rnk
        |FROM (VALUES
        |  (6000,0,17,0.334456,1),(6000,0,225,0.315127,2),(6000,0,12,0.311027,3),
        |  (6000,1,257,0.391762,1),(6000,1,129,0.35148,2),(6000,1,376,0.304811,3),
        |  (6000,2,443,0.357569,1),(6000,2,62,0.289997,2),(6000,2,246,0.289771,3),
        |  (6000,3,223,0.340915,1),(6000,3,205,0.336595,2),(6000,3,212,0.319721,3),
        |  (6000,4,345,0.374941,1),(6000,4,143,0.329711,2),(6000,4,343,0.312433,3),
        |  (6000,5,113,0.364433,1),(6000,5,440,0.309255,2),(6000,5,234,0.304412,3),
        |  (6000,6,141,0.34588,1),(6000,6,434,0.305749,2),(6000,6,78,0.294073,3),
        |  (6000,7,382,0.349854,1),(6000,7,466,0.324004,2),(6000,7,329,0.305111,3),
        |  (6000,8,20,0.330079,1),(6000,8,385,0.326578,2),(6000,8,190,0.324204,3),
        |  (6000,9,381,0.356692,1),(6000,9,107,0.329678,2),(6000,9,365,0.321149,3),
        |  (60000,0,365,0.369994,1),(60000,0,334,0.362722,2),(60000,0,387,0.331139,3),
        |  (60000,1,386,0.371485,1),(60000,1,27,0.348208,2),(60000,1,407,0.32701,3),
        |  (60000,2,117,0.318143,1),(60000,2,450,0.266344,2),(60000,2,145,0.263494,3),
        |  (60000,3,130,0.399872,1),(60000,3,149,0.329934,2),(60000,3,343,0.308472,3),
        |  (60000,4,114,0.398513,1),(60000,4,496,0.341212,2),(60000,4,408,0.322753,3),
        |  (60000,5,404,0.328403,1),(60000,5,419,0.319237,2),(60000,5,157,0.311256,3),
        |  (60000,6,350,0.324518,1),(60000,6,430,0.32252,2),(60000,6,145,0.297696,3),
        |  (60000,7,340,0.492766,1),(60000,7,425,0.40752,2),(60000,7,209,0.394463,3),
        |  (60000,8,39,0.384696,1),(60000,8,138,0.356671,2),(60000,8,403,0.338238,3),
        |  (60000,9,49,0.385171,1),(60000,9,489,0.343538,2),(60000,9,414,0.3323,3),
        |  (600000,0,1204,0.406472,1),(600000,0,291,0.391932,2),(600000,0,1020,0.375988,3),
        |  (600000,1,1950,0.386131,1),(600000,1,1175,0.370337,2),(600000,1,1580,0.366762,3),
        |  (600000,2,1303,0.394011,1),(600000,2,953,0.369105,2),(600000,2,337,0.357443,3),
        |  (600000,3,263,0.397951,1),(600000,3,1701,0.388037,2),(600000,3,720,0.365554,3),
        |  (600000,4,524,0.419052,1),(600000,4,1166,0.378662,2),(600000,4,76,0.359507,3),
        |  (600000,5,426,0.396217,1),(600000,5,1684,0.39469,2),(600000,5,1019,0.382756,3),
        |  (600000,6,1805,0.418945,1),(600000,6,270,0.403949,2),(600000,6,1184,0.384812,3),
        |  (600000,7,1622,0.45191,1),(600000,7,605,0.400025,2),(600000,7,160,0.337521,3),
        |  (600000,8,1069,0.385235,1),(600000,8,1413,0.384788,2),(600000,8,1031,0.380335,3),
        |  (600000,9,1443,0.431444,1),(600000,9,796,0.361948,2),(600000,9,348,0.351084,3)
        |) AS p(sfn, query_id, neighbor_id, cosine_sim, rnk), sf
        |WHERE p.sfn = sf.n
        |ORDER BY query_id, rnk""".stripMargin,

    "q34_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS sim
        |  FROM m q, m t WHERE q.vec_id < 10 AND t.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rnk FROM p)
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // Full-probe IVF == exact brute force, so the oracle is the exact
    // top-k SQL (same as q34).
    "q52_ann_ivf_fullprobe" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS sim
        |  FROM m q, m t WHERE q.vec_id < 10 AND t.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rnk FROM p)
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    // SF-AWARE pinned recall (r11 verdict item 3): the planes, k-means
    // seeds/sweeps, probe counts and each SF's data are all fixed, so
    // per-SF recall is a deterministic fact of the configuration —
    // measured once per testdata generation and keyed on the SF
    // fingerprint (lineitem row count: 6000/60000/600000 discriminates
    // sf0.001/0.01/0.1 where the embeddings count alone cannot —
    // sf0.001 and sf0.01 both carry 500 vectors but DIFFERENT vector
    // data, hence different recall). An unknown SF yields a NULL
    // recall and fails LOUDLY instead of silently passing. The pin is
    // deliberately NOT a recomputation — DuckDB cannot express the
    // xxhash64-derived hyperplanes or the k-means cells — so any
    // regression in bucketing, assignment, refinement, or tie-breaking
    // turns the row red at every SF. At sf0.01 both paths find 30/30
    // (IVF: 2 Lloyd sweeps at nProbe=3/16 cells; LSH: banded B=20xP=3
    // — round 2's single-band config found 1/30, the banding fixed
    // it); the 500-vector sf0.001 corpus is harder for IVF (27/30)
    // because cells are thinner.
    "q53_ann_recall" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT 'ivf' AS method,
        |  CAST(CASE n WHEN 6000 THEN 0.9 WHEN 60000 THEN 1.0
        |              WHEN 600000 THEN 0.966667 END AS DOUBLE) AS recall
        |FROM sf
        |UNION ALL
        |SELECT 'lsh',
        |  CAST(CASE n WHEN 6000 THEN 0.966667 WHEN 60000 THEN 1.0
        |              WHEN 600000 THEN 1.0 END AS DOUBLE)
        |FROM sf
        |ORDER BY method""".stripMargin,

    // Same SF-keyed measured-pin form as q53 (not a recomputation —
    // DuckDB cannot express the k-means cells or int8 tie ordering).
    // At sf0.01 the int8-scored candidates re-rank to the same 30/30
    // neighbors the float IVF path finds: quantization error (~0.4%
    // of max component) only reorders near-ties, and rerankFactor=4
    // headroom absorbs that; the int8 path tracks float IVF's recall
    // at every SF (same cells, same probes).
    "q63_ann_int8_recall" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT 'ivf_int8' AS method,
        |  CAST(CASE n WHEN 6000 THEN 0.9 WHEN 60000 THEN 1.0
        |              WHEN 600000 THEN 0.966667 END AS DOUBLE) AS recall
        |FROM sf ORDER BY method""".stripMargin,

    // Same SF-keyed measured-pin form as q53/q63 (DuckDB cannot
    // express the per-subspace k-means codebooks or ADC tie
    // ordering). The directionally-uniform synthetic vectors are PQ's
    // pathological case — quantization error is spread across every
    // dimension with no cluster structure to absorb it — so the raw
    // ADC row sits low by construction and the re-rank row shows the
    // production dial (top 16k exact re-scoring) doing its job; the
    // pins are deterministic facts of seeds/sweeps/tie-breaks per SF.
    "q131_ann_pq_recall" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT 'ivf_pq' AS method,
        |  CAST(CASE n WHEN 6000 THEN 0.9 WHEN 60000 THEN 0.966667
        |              WHEN 600000 THEN 0.833333 END AS DOUBLE) AS recall
        |FROM sf
        |UNION ALL
        |SELECT 'pq',
        |  CAST(CASE n WHEN 6000 THEN 0.333333 WHEN 60000 THEN 0.333333
        |              WHEN 600000 THEN 0.2 END AS DOUBLE)
        |FROM sf
        |UNION ALL
        |SELECT 'pq_rerank',
        |  CAST(CASE n WHEN 6000 THEN 0.9 WHEN 60000 THEN 0.933333
        |              WHEN 600000 THEN 0.766667 END AS DOUBLE)
        |FROM sf
        |ORDER BY method""".stripMargin,

    "q42_embedding_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, 65), i -> a.vec[i] * b.vec[i]))
        |      / (a.nrm * b.nrm) AS sim
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(sim, 6) AS cosine_sim FROM p
        |WHERE sim >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // Exact all-pairs replay of the cross-lingual mine (see the q346
    // query comment): the metadata blocks applied on the raw pair
    // set, the q42 dot-product text, the filter on the UNROUNDED sim.
    "q346_crosslingual_neardup" ->
      """WITH j AS (
        |  SELECT e.vec_id, d.lang, d.n_chars,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |m AS (
        |  SELECT vec_id, lang, n_chars, vec,
        |    sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM j),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.lang AS lang_a, b.lang AS lang_b,
        |    list_sum(list_transform(range(1, 65), i -> a.vec[i] * b.vec[i]))
        |      / (a.nrm * b.nrm) AS sim
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id
        |  WHERE a.lang <> b.lang
        |    AND CAST(greatest(a.n_chars, b.n_chars) AS DOUBLE)
        |        <= 2.0 * CAST(least(a.n_chars, b.n_chars) AS DOUBLE))
        |SELECT id_a, id_b, lang_a, lang_b, round(sim, 6) AS cosine_sim
        |FROM p WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // Mirrors the quantization arithmetic exactly: scale = max|x|/127
    // (1.0 for zero vectors), codes = round(x/scale) — DuckDB's
    // round() is half-away-from-zero, the same rule the native
    // expression implements.
    "q60_int8_quantize" ->
      """WITH v AS (
        |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |q AS (
        |  SELECT label, vec,
        |    CASE WHEN list_max(list_transform(vec, x -> abs(x))) > 0
        |         THEN list_max(list_transform(vec, x -> abs(x))) / 127.0
        |         ELSE 1.0 END AS scale
        |  FROM v),
        |c AS (
        |  SELECT label, scale, vec,
        |    list_transform(vec, x -> round(x / scale)) AS codes
        |  FROM q),
        |m AS (
        |  SELECT label, scale,
        |    list_max(list_transform(range(1, 65),
        |      i -> abs(vec[i] - codes[i] * scale))) AS maxerr,
        |    list_max(list_transform(codes, cc -> abs(cc))) AS maxcode
        |  FROM c)
        |SELECT label, count(*) AS n_vectors,
        |  round(avg(scale), 6) AS avg_scale,
        |  round(avg(maxerr), 6) AS avg_max_err,
        |  round(max(maxerr), 6) AS max_max_err,
        |  CAST(max(maxcode) AS BIGINT) AS max_code
        |FROM m GROUP BY label ORDER BY label""".stripMargin,

    "q36_label_centroid_norm" ->
      """WITH e AS (
        |  SELECT label, i, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(1, 65) r(i)),
        |c AS (SELECT label, i, avg(x) AS m, count(*) AS cnt FROM e GROUP BY label, i)
        |SELECT label, round(sqrt(sum(m*m)), 6) AS centroid_norm,
        |  max(cnt) AS n_vectors
        |FROM c GROUP BY label ORDER BY label""".stripMargin,

    "q95_rrf_hybrid" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS dl,
        |    len(list_filter(string_split(text,' '), t -> t = 'join')) AS tf0,
        |    len(list_filter(string_split(text,' '), t -> t = 'vector')) AS tf1,
        |    len(list_filter(string_split(text,' '), t -> t = 'scan')) AS tf2
        |  FROM documents),
        |st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS nd, CAST(sum(dl) AS DOUBLE) AS sdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |  FROM base),
        |sc AS (
        |  SELECT doc_id,
        |      ln(1.0 + (nd - df0 + 0.5) / (df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd)))
        |    + ln(1.0 + (nd - df1 + 0.5) / (df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd)))
        |    + ln(1.0 + (nd - df2 + 0.5) / (df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd)))
        |    AS score
        |  FROM base, st),
        |lex AS (
        |  SELECT doc_id, round(score, 6) AS bm25 FROM sc
        |  ORDER BY round(score, 6) DESC, doc_id LIMIT 50),
        |lr AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
        |  FROM lex),
        |n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT t.vec_id AS vec_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS sim
        |  FROM m q, m t WHERE q.vec_id = 0 AND t.vec_id <> 0),
        |sem AS (SELECT vec_id, sim FROM p ORDER BY sim DESC, vec_id LIMIT 50),
        |sr AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank_sem
        |  FROM sem)
        |SELECT coalesce(lr.doc_id, sr.vec_id) AS id, lr.rank_lex, sr.rank_sem,
        |  round(coalesce(1.0 / (60.0 + lr.rank_lex), 0.0)
        |      + coalesce(1.0 / (60.0 + sr.rank_sem), 0.0), 6) AS rrf
        |FROM lr FULL JOIN sr ON lr.doc_id = sr.vec_id
        |ORDER BY rrf DESC, id LIMIT 15""".stripMargin,

    // The exact kNN (q34's construction over ALL queries), undirected
    // to x<y edges, then the same one-count-per-triangle triple join.
    "q113_knn_triangles" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS rawsim
        |  FROM m q, m t WHERE t.vec_id <> q.vec_id),
        |knn AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rawsim DESC, neighbor_id) AS rnk FROM p) WHERE rnk <= 3),
        |e AS (
        |  SELECT DISTINCT least(query_id, neighbor_id) AS x,
        |    greatest(query_id, neighbor_id) AS y FROM knn),
        |t AS (
        |  SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.y = e2.x
        |    JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
        |SELECT (SELECT count(DISTINCT vec_id) FROM m) AS n_nodes,
        |  (SELECT count(*) FROM e) AS n_edges, n_triangles
        |FROM t ORDER BY n_nodes""".stripMargin,

    // The q113 kNN-graph replay extended per node: triangle corners
    // exploded and counted, symmetric degrees, then the exact-int
    // coefficient — the same expression text as the Spark side, so
    // the rounded doubles are bit-stable.
    "q203_clustering_coefficient" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS rawsim
        |  FROM m q, m t WHERE t.vec_id <> q.vec_id),
        |knn AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rawsim DESC, neighbor_id) AS rnk FROM p) WHERE rnk <= 3),
        |e AS (
        |  SELECT DISTINCT least(query_id, neighbor_id) AS x,
        |    greatest(query_id, neighbor_id) AS y FROM knn),
        |tr AS (
        |  SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |  FROM e e1 JOIN e e2 ON e1.y = e2.x
        |    JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |tp AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |    SELECT a AS node FROM tr
        |    UNION ALL SELECT b FROM tr
        |    UNION ALL SELECT c FROM tr)
        |  GROUP BY node),
        |dg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT x AS node FROM e UNION ALL SELECT y FROM e)
        |  GROUP BY node)
        |SELECT dg.node, degree,
        |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN degree >= 2
        |    THEN round(2.0 * coalesce(n_tri, 0) / (degree * (degree - 1)), 6)
        |    ELSE 0.0 END AS clustering
        |FROM dg LEFT JOIN tp ON dg.node = tp.node
        |ORDER BY clustering DESC, dg.node LIMIT 15""".stripMargin,

    // The greedy MMR loop unrolled: candidates ranked on RAW sim (the
    // q34 shape) then 6dp-rounded for all MMR arithmetic; each step
    // anti-joins the selected set, takes max pair-sim to it as the
    // penalty, and picks argmax(0.75·sim − 0.25·pen) with the
    // (mmr DESC, id ASC) tie-break the Spark window uses. Assembled
    // by [[mmrOracleSql]] — one block per step, single stripMargin
    // nowhere (plain strings throughout).
    "q106_mmr_rerank" -> mmrOracleSql(k = 5),

    // q36's centroid replay joined pairwise on the dimension index;
    // the cosine mirrors CosineSimilarity's dot/(sqrt·sqrt) shape.
    "q186_centroid_affinity" ->
      """WITH e AS (
        |  SELECT label, i, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(1, 65) r(i)),
        |c AS (SELECT label, i, avg(x) AS m FROM e GROUP BY label, i),
        |p AS (SELECT a.label AS label_a, b.label AS label_b,
        |        sum(a.m * b.m) AS dot,
        |        sum(a.m * a.m) AS na, sum(b.m * b.m) AS nb
        |      FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
        |      GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
        |FROM p ORDER BY label_a, label_b""".stripMargin,

    // Generated sweep-unrolled exact-integer Lloyd replay — same
    // quantization, seed, comparisons and empty-cluster fallback as
    // KmeansExact.lloyd, with centroid state in pivoted CTEs.
    "q234_kmeans_exact" ->
      graft.ext.KmeansExact.lloydOracleSql(k = 4, dims = 64, sweeps = 2),

    // Filtered-search replay: q34's exact-cosine construction with
    // the label-equality pre-filter in the pair join.
    "q268_filtered_ann" -> FilteredAnnOracleSql,

    // The stream-appended index searched at exhaustive probes IS the
    // exact filtered top-k over the full corpus — q268's oracle text
    // verbatim (the ingest path must be invisible to correctness).
    "q321_ann_stream_append" -> FilteredAnnOracleSql,

    // The compacted generation searched at exhaustive probes IS the
    // exact filtered top-k — q268's oracle text verbatim (build,
    // append and re-cluster must all be result-invisible).
    "q333_ivf_compact_lifecycle" -> FilteredAnnOracleSql,
    "q366_ivf_merge_lifecycle" -> FilteredAnnOracleSql,
    "q376_ivf_delete_lifecycle" -> DeleteAnnOracleSql,

    // Linear-MMD replay: the same exact-integer component lattice
    // (floor of an exact power-of-two product — identical integers by
    // IEEE, not by luck), row_number pairing, consecutive-pair
    // regroup, and the SHARED kernel/mean texts.
    "q377_mmd_drift" ->
      (s"""WITH q AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE))
        |        AS BIGINT)) AS qv
        |  FROM embeddings),
        |x AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, qv
        |  FROM q WHERE label < 5),
        |y AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, qv
        |  FROM q WHERE label >= 5),
        |p AS (
        |  SELECT x.idx, x.qv AS xv, y.qv AS yv
        |  FROM x JOIN y ON x.idx = y.idx),
        |a AS (SELECT idx // 2 AS j, xv AS xa, yv AS ya FROM p
        |      WHERE idx % 2 = 0),
        |b AS (SELECT idx // 2 AS j, xv AS xb, yv AS yb FROM p
        |      WHERE idx % 2 = 1),
        |h AS (
        |  SELECT ${mmdOracleKern("xa", "xb")} + ${mmdOracleKern("ya", "yb")}
        |    - ${mmdOracleKern("xa", "yb")} - ${mmdOracleKern("xb", "ya")}
        |    AS h_nano
        |  FROM a JOIN b ON a.j = b.j),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    coalesce(CAST(sum(h_nano) AS BIGINT), 0) AS sum_h_nano
        |  FROM h),
        |nx AS (SELECT CAST(count(*) AS BIGINT) AS n_x FROM x),
        |ny AS (SELECT CAST(count(*) AS BIGINT) AS n_y FROM y)
        |SELECT n_x, n_y, n_pairs, sum_h_nano,
        |  ${MmdMeanNano("//")} AS mmd2_nano
        |FROM sums, nx, ny ORDER BY n_pairs""").stripMargin,

    // All-pairs replay of the grid range join: the grid only prunes
    // CANDIDATES, so brute force with the identical squared-distance
    // expression (subtract, square, add — no sqrt) is an exact oracle.
    // (the threshold is the Scala-computed DOUBLE 0.02*0.02
    // interpolated verbatim — DuckDB would parse `0.02 * 0.02` as
    // exact DECIMAL arithmetic, a possible 1-ulp divergence from the
    // operator's IEEE product on boundary pairs)
    "q322_grid_range_join" ->
      s"""WITH p AS (
        |  SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
        |         CAST(embedding[2] AS DOUBLE) AS y
        |  FROM embeddings)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y), 6) AS dist2
        |FROM p a, p b
        |WHERE a.id < b.id
        |  AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= ${0.02 * 0.02}
        |ORDER BY id_a, id_b""".stripMargin,

    // Asymmetric all-pairs replay: probe half x reference half with
    // the identical squared-distance expression and threshold double.
    "q337_grid_proximity" ->
      s"""WITH p AS (
        |  SELECT vec_id AS id, vec_id % 2 AS par,
        |    CAST(embedding[1] AS DOUBLE) AS x,
        |    CAST(embedding[2] AS DOUBLE) AS y
        |  FROM embeddings)
        |SELECT a.id AS probe_id, b.id AS ref_id,
        |  round((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y), 6) AS dist2
        |FROM p a, p b
        |WHERE a.par <> 0 AND b.par = 0
        |  AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= ${0.02 * 0.02}
        |ORDER BY probe_id, ref_id""".stripMargin,

    // DBSCAN replay: q322's all-pairs eps graph, the same >= 4
    // neighbor-degree core rule, q64's recursive closure over the
    // core-core subgraph, min-cluster border attachment, and the
    // noise remainder row.
    "q352_dbscan_grid" ->
      s"""WITH RECURSIVE p AS (
        |  SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
        |         CAST(embedding[2] AS DOUBLE) AS y
        |  FROM embeddings),
        |pr AS (
        |  SELECT a.id AS ia, b.id AS ib FROM p a, p b
        |  WHERE a.id < b.id
        |    AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= ${0.02 * 0.02}),
        |sym AS (SELECT ia AS id, ib AS nb FROM pr
        |        UNION ALL SELECT ib, ia FROM pr),
        |core AS (SELECT id FROM sym GROUP BY id HAVING count(*) >= 4),
        |ce AS (
        |  SELECT ia, ib FROM pr
        |  JOIN core ca ON pr.ia = ca.id
        |  JOIN core cb ON pr.ib = cb.id),
        |edges AS (SELECT ia AS src, ib AS dst FROM ce
        |          UNION SELECT ib, ia FROM ce),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (
        |  SELECT src AS id, least(src, min(dst)) AS component
        |  FROM reach GROUP BY src),
        |corelab AS (
        |  SELECT c.id, coalesce(comp.component, c.id) AS cluster
        |  FROM core c LEFT JOIN comp ON c.id = comp.id),
        |borderlab AS (
        |  SELECT s.id, min(cl.cluster) AS cluster
        |  FROM sym s JOIN corelab cl ON s.nb = cl.id
        |  WHERE s.id NOT IN (SELECT id FROM core)
        |  GROUP BY s.id),
        |lab AS (SELECT id, cluster, 'core' AS role FROM corelab
        |        UNION ALL SELECT id, cluster, 'border' FROM borderlab),
        |cens AS (
        |  SELECT cluster,
        |    CAST(sum(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_core,
        |    CAST(sum(CASE WHEN role = 'border' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_border,
        |    CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(min(id) AS BIGINT) AS min_id
        |  FROM lab GROUP BY cluster),
        |noise AS (
        |  SELECT CAST(-1 AS BIGINT) AS cluster, CAST(0 AS BIGINT) AS n_core,
        |    CAST(0 AS BIGINT) AS n_border, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(min(id) AS BIGINT) AS min_id
        |  FROM p WHERE id NOT IN (SELECT id FROM lab))
        |SELECT * FROM cens UNION ALL SELECT * FROM noise
        |ORDER BY cluster""".stripMargin,

    // Power-iteration replay: generated CTE blocks (one template per
    // step) over the same floored-nano Gram — see pcaPowerOracleSql.
    "q353_pca_power" -> pcaPowerOracleSql,

    // Same SF-keyed measured-pin form as q53/q63 (DuckDB cannot
    // express the k-means cells): recall@3 of the labeled-index
    // filtered search at nProbe=4/16 against the exact filteredTopK
    // tier, a deterministic fact of seeds/sweeps/probes per SF. An
    // unknown SF yields NULL and fails loudly.
    "q281_filtered_ann_ivf" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT 'ivf_filtered' AS method,
        |  CAST(CASE n WHEN 6000 THEN 0.733333 WHEN 60000 THEN 0.866667
        |              WHEN 600000 THEN 0.866667 END AS DOUBLE) AS recall
        |FROM sf ORDER BY method""".stripMargin,

    // Same SF-keyed measured-pin form as q53 (DuckDB cannot express
    // the k-means cells); recall must be NON-DECREASING in nProbe by
    // construction — visible in the pins.
    "q319_ann_recall_curve" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT CAST(p.n_probe AS BIGINT) AS n_probe,
        |  CAST(CASE WHEN sf.n = 6000 THEN p.r1
        |            WHEN sf.n = 60000 THEN p.r2
        |            WHEN sf.n = 600000 THEN p.r3 END AS DOUBLE) AS recall
        |FROM (VALUES (1, 0.833333, 0.9, 0.966667),
        |             (2, 0.866667, 0.933333, 0.966667),
        |             (4, 0.9, 1.0, 1.0), (8, 1.0, 1.0, 1.0))
        |  p(n_probe, r1, r2, r3)
        |CROSS JOIN sf ORDER BY n_probe""".stripMargin,

    // Same SF-keyed measured-pin form as q281; the quantized tier's
    // measured recall EQUALS the float tier's at every SF (the
    // rerankFactor=4 exact re-rank recovers every int8 near-tie) —
    // the fact the pin exists to protect.
    "q308_filtered_ann_int8" ->
      """WITH sf AS (SELECT count(*) AS n FROM lineitem)
        |SELECT 'ivf_filtered_int8' AS method,
        |  CAST(CASE n WHEN 6000 THEN 0.733333 WHEN 60000 THEN 0.866667
        |              WHEN 600000 THEN 0.866667 END AS DOUBLE) AS recall
        |FROM sf ORDER BY method""".stripMargin,

    // PSI replay: the same 6-bit sign buckets, parity halves and the
    // SHARED floored nano-nat term.
    "q269_embedding_psi" -> (
      """WITH e AS (
        |  SELECT vec_id % 2 AS h,
        |""".stripMargin +
      "    " + (1 to 6).map(i =>
        s"${1 << (i - 1)} * CASE WHEN embedding[$i] >= 0 " +
          "THEN 1 ELSE 0 END").mkString(" + ") + " AS b\n" +
      """  FROM embeddings),
        |cells AS (
        |  SELECT b,
        |    CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM e GROUP BY b),
        |tot AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(count(*) AS BIGINT) AS nb
        |  FROM cells)
        |SELECT nb AS n_buckets, n1, n2,
        |  CAST(sum(CAST(floor(""".stripMargin + PsiTermNanoV +
      """) AS BIGINT)) AS BIGINT) AS psi_nano
        |FROM cells CROSS JOIN tot
        |GROUP BY nb, n1, n2 ORDER BY n_buckets""".stripMargin),
  )

  /** Builds the q106 oracle: `k−1` identical greedy-step blocks after
    * the shared candidate/pair-sim CTEs. Kept as a generator so the
    * SQL provably matches the Spark loop step for step. */
  private def mmrOracleSql(k: Int): String = {
    val head =
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS rawsim
        |  FROM m q, m t WHERE q.vec_id < 5 AND t.vec_id <> q.vec_id),
        |cand AS (
        |  SELECT query_id, neighbor_id, round(rawsim, 6) AS sim, rnk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rawsim DESC, neighbor_id) AS rnk FROM p) WHERE rnk <= 20),
        |ps AS (
        |  SELECT c1.query_id, c1.neighbor_id AS ca, c2.neighbor_id AS cb,
        |    round(list_sum(list_transform(range(1, 65), i -> a.vec[i] * b.vec[i]))
        |      / (a.nrm * b.nrm), 6) AS psim
        |  FROM cand c1
        |  JOIN cand c2 ON c1.query_id = c2.query_id AND c1.neighbor_id <> c2.neighbor_id
        |  JOIN m a ON a.vec_id = c1.neighbor_id
        |  JOIN m b ON b.vec_id = c2.neighbor_id),
        |sel1 AS (
        |  SELECT query_id, neighbor_id AS id, 0.75 * sim AS mmr, 1 AS step
        |  FROM cand WHERE rnk = 1)""".stripMargin
    val steps = (2 to k).map { t =>
      s""",
sc$t AS (
  SELECT c.query_id, c.neighbor_id, c.sim, max(p.psim) AS pen
  FROM cand c
  JOIN ps p ON p.query_id = c.query_id AND p.ca = c.neighbor_id
  JOIN sel${t - 1} s ON s.query_id = p.query_id AND s.id = p.cb
  LEFT JOIN sel${t - 1} e ON e.query_id = c.query_id AND e.id = c.neighbor_id
  WHERE e.id IS NULL
  GROUP BY 1, 2, 3),
pk$t AS (
  SELECT query_id, neighbor_id AS id, 0.75 * sim - 0.25 * pen AS mmr, $t AS step FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY 0.75 * sim - 0.25 * pen DESC, neighbor_id) AS rn
    FROM sc$t) WHERE rn = 1),
sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pk$t)"""
    }.mkString
    head + steps +
      s"\nSELECT query_id, step, id AS picked_id, round(mmr, 6) AS mmr" +
      s"\nFROM sel$k ORDER BY query_id, step"
  }
}
