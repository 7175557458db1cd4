package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Kernels
import graft.tables.Tables
import Relational.{WoeLn, WoeShare, VolText, PchartP, PchartUcl, PchartLcl,
  ModularityText, AssortText, olsSelect, manifestOracleSql}

/** GRAPH + entity-resolution queries: PageRank x3, label propagation,
  * BFS/SSSP, k-core, assortativity, modularity, ER pipelines and
  * match audits.
  *
  * Split from the single Relational object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[Relational]].
  */
object RelationalGraphsQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // WEIGHTED PageRank (Graphs.pageRankWeighted): the same
    // customer-supplier graph, but mass flows proportionally to the
    // number of shared order lines — co-occurrence STRENGTH drives
    // the walk, not bare adjacency (the q90 special case w≡1).
    // Emits rank×N (q121's magnitude rule) on the rounded-score
    // order; the oracle unrolls both sweeps with the weighted mass
    // term and the same interpolated-IEEE (1-d) literal.
    "q168_pagerank_weighted" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                 concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .agg(count(lit(1)).as("w"))
      // pageRankWeighted returns a terminal PIN (r16) — already
      // materialized with declared partitioning; staging it again
      // would only copy the checkpoint into a second cache
      val pr = graft.ext.Graphs.pageRankWeighted(edges, "a", "b", "w",
        iterations = 2)
      val nAgg = pr.agg(count(lit(1)).cast("double").as("__nn"))
      pr.crossJoin(broadcast(nAgg))
        .select(col("node"), col("total_weight").cast("long").as("total_w"),
                round(col("pr") * col("__nn"), 6).as("pr_x_n"))
        .orderBy(col("pr_x_n").desc, col("node"))
        .limit(20)
    }),

    // Label propagation (Graphs.labelPropagation) over the same
    // customer-supplier graph as q90 — the deterministic synchronous
    // variant (mode of neighbor labels, ties to the smallest label),
    // 2 rounds. Emits the community-size histogram: top 20 labels by
    // member count. The oracle unrolls both rounds with the identical
    // (cnt DESC, label) argmax.
    "q145_label_propagation" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      graft.ext.Graphs.labelPropagation(edges, "a", "b", iterations = 2)
        .groupBy("label").agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("n_nodes").desc, col("label"))
        .limit(20)
    }),

    // PageRank (Graphs.pageRank) over the undirected customer-supplier
    // bipartite graph from lineitem x orders — the link-graph
    // centrality used as a corpus-curation quality prior. Fixed 3
    // iterations, d=0.85, uniform start. Node ids carry a 'c'/'s'
    // prefix so the two key spaces can't collide. Ordering is on the
    // 6dp-ROUNDED score with node tie-break (mass sums commute only
    // at ulp level); the oracle unrolls the 3 iterations and writes
    // (1-d) by INTERPOLATING the Scala double 1.0-0.85 verbatim —
    // DuckDB would subtract the decimal literals exactly (1 ulp off).
    "q90_pagerank" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      // the edge list is DISTINCT and the id spaces prefix-disjoint,
      // so both walk directions are unique — skip the sym distinct
      graft.ext.Graphs.pageRank(edges, "a", "b", iterations = 3,
        dedupEdges = false)
        .select(col("node"), col("degree"),
                round(col("pr"), 6).as("pagerank"))
        .orderBy(col("pagerank").desc, col("node"))
        .limit(20)
    }),

    // DIRECTED PageRank with dangling-mass redistribution
    // (Graphs.pageRankDirected): customer -> order edges make every
    // order a SINK (outdeg 0) — the exact shape the undirected q90
    // never exercises; without the D/N term ~85% of the sink mass
    // would leak per sweep. Emits rank SCALED BY N (the
    // multiple-of-uniform form, ~1.0 magnitude) so the 6dp round
    // carries real precision at any graph size; ordering on the
    // rounded score + node (the q80 rule). Mass conservation makes
    // sum(pagerank_x_n) = N, which the oracle replays exactly.
    "q121_pagerank_directed" -> ((s, d) => {
      val edges = Tables.orders(s, d)
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
                concat(lit("o"), col("o_orderkey").cast("string")).as("dst"))
      val pr = graft.ext.Graphs.pageRankDirected(edges, "src", "dst",
        iterations = 2) // terminal pin — no extra staging (see q168)
      val nAgg = pr.agg(count(lit(1)).cast("double").as("__nn"))
      pr.crossJoin(broadcast(nAgg))
        .select(col("node"), col("out_degree"),
                round(col("pr") * col("__nn"), 6).as("pagerank_x_n"))
        .orderBy(col("pagerank_x_n").desc, col("node"))
        .limit(20)
    }),

    // PERSONALIZED PageRank (Graphs.personalizedPageRank — random
    // walk with restart): q121's directed customer -> order graph,
    // but the teleport concentrates on nation-0 customers — ranks
    // become PROXIMITY to that seed set (the recommendation /
    // related-entity primitive), and every order stays a sink so the
    // dangling mass now recycles to the seeds, not uniformly. Emits
    // rank scaled by N (q121's multiple-of-uniform form); ordering
    // on the rounded score + node (the q80 rule). Non-seed customers
    // score exactly 0 (nothing links INTO a customer here) — visible
    // in the oracle too.
    // RICH-CLUB coefficient of the q90 customer-supplier graph at
    // degree cutoffs k = 2/4/8 — phi(k) = 2*E_k / (N_k*(N_k-1)) over
    // the subgraph of nodes with degree > k (Colizza et al. 2006):
    // "do the hubs preferentially trade with each other", the
    // structural complement of q277's assortativity. All-integer
    // outputs (floor-ppm density); degrees are one aggregate, E_k two
    // semi-joins of the distinct edge list per cutoff, the 3-cutoff
    // frame a broadcast.
    "q343_rich_club" -> ((s, d) => {
      // r22 (r21 verdict item 5 — guide §2.4): ONE pass per frame with
      // conditional aggregation instead of 3 cutoffs × (eager census +
      // two semi-joins). N_k = count(deg > k) is one aggregate over the
      // degree frame; E_k = count of edges with BOTH endpoint degrees
      // > k, from a single deg-annotated edge frame (two joins total,
      // replacing six semi-joins — an edge survives both semi-joins
      // for cutoff k iff deg(a) > k AND deg(b) > k, so the counts are
      // identical by construction). The 3-row output explodes from the
      // fused 1-row aggregate; phi text unchanged.
      val ks = Seq(2L, 4L, 8L)
      val e0 = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                  concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
          .distinct())
      val deg = graft.ops.Staging.stage(
        e0.select(explode(array(col("a"), col("b"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("deg")))
      val nCols = ks.map(k => count(when(col("deg") > k, lit(1))).as(s"n_$k"))
      val nAgg = deg.agg(nCols.head, nCols.tail: _*)
      val degE = e0
        .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
      val eCols = ks.map(k =>
        count(when(col("__da") > k && col("__db") > k, lit(1))).as(s"e_$k"))
      val eAgg = degE.agg(eCols.head, eCols.tail: _*)
      nAgg.crossJoin(broadcast(eAgg))
        .select(explode(array(ks.map(k =>
          struct(lit(k).as("k"), col(s"n_$k").as("n_k"),
                 col(s"e_$k").as("e_k"))): _*)).as("__r"))
        .select(col("__r.k").as("k"), col("__r.n_k").as("n_k"),
                col("__r.e_k").as("e_k"),
          expr("CASE WHEN __r.n_k >= 2 THEN (2 * __r.e_k * 1000000) div " +
            "(__r.n_k * (__r.n_k - 1)) ELSE CAST(NULL AS BIGINT) END")
            .as("phi_ppm"))
        .orderBy("k")
    }),

    // Discrete POWER-LAW degree exponent via the Clauset-Shalizi-
    // Newman continuous-MLE form at dmin = 1: alpha = 1 + N / sum
    // ln(d) over the q90 graph's degree sequence — the scale-free-ness
    // dial next to q286's fan-out histogram. The ln-sum runs over the
    // DISTINCT-DEGREE census (n_d * ln(d) per distinct degree, each
    // term floored to nano BEFORE the integer sum — the q269 rule and
    // the bounded-frame shape: distinct degrees, never nodes); alpha
    // is one shared-text floored-milli expression, NULL on the
    // degenerate all-degree-1 graph.
    "q344_powerlaw_alpha" -> ((s, d) => {
      val e0 = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      val degCensus = e0
        .select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_d"))
      degCensus
        .select(col("deg"), col("n_d"), expr(PowerLawTermNano).as("__t"))
        .agg(sum(col("n_d")).as("n_nodes"),
             sum(when(col("deg") > 1, col("n_d")).otherwise(0L))
               .as("n_above_dmin"),
             sum("__t").as("ln_sum_nano"))
        .select(col("n_nodes"), col("n_above_dmin"), col("ln_sum_nano"),
          expr(PowerLawAlphaMilli).as("alpha_milli"))
        .orderBy("n_nodes")
    }),

    "q330_personalized_pagerank" -> ((s, d) => {
      val edges = Tables.orders(s, d)
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
                concat(lit("o"), col("o_orderkey").cast("string")).as("dst"))
      val seeds = Tables.customer(s, d).filter(col("c_nationkey") === 0)
        .select(concat(lit("c"), col("c_custkey").cast("string")).as("node"))
      val pr = graft.ext.Graphs.personalizedPageRank(edges, "src", "dst",
        seeds, iterations = 2) // terminal pin — no extra staging (q168)
      val nAgg = pr.agg(count(lit(1)).cast("double").as("__nn"))
      pr.crossJoin(broadcast(nAgg))
        .select(col("node"), col("is_seed"), col("out_degree"),
                round(col("pr") * col("__nn"), 6).as("ppr_x_n"))
        .orderBy(col("ppr_x_n").desc, col("node"))
        .limit(20)
    }),

    // Multi-source BFS (Graphs.bfsHops) over the q90 customer-
    // supplier graph: all suppliers of nation 0 start at hop 0, and 3
    // relaxation sweeps compute every node's minimum hop count to the
    // seed set — "how far is each customer/supplier from this
    // nation's supply base". Emits the hop histogram (exact integer
    // distances, no float contract); nodes unreached within 3 hops
    // are absent by construction on both sides. The oracle unrolls
    // the 3 sweeps as min-merge unions.
    "q171_bfs_hops" -> ((s, d) => {
      // staged: the symmetric union inside bfsHops reads it twice
      val edges = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                  concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
          .distinct())
      val seeds = Tables.supplier(s, d)
        .filter(col("s_nationkey") === 0)
        .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"))
      graft.ext.Graphs.bfsHops(edges, "a", "b", seeds, "node", maxHops = 3)
        .groupBy("hops").agg(count(lit(1)).as("n_nodes"))
        .orderBy("hops")
    }),

    // Sorted-neighborhood ER candidates (EntityRes
    // .sortedNeighborhoodPairs — Hernández–Stolfo): the key-free
    // alternative to q173's blocking. Distinct names get a
    // range-partitioned total index (denseIndex, never a global
    // window) and each compares to its next 3 sort neighbors via the
    // bucket band join — candidates are EXACTLY d·w, linear by
    // construction. JW is the pinned native kernel, bit-identical to
    // DuckDB's builtin, so the 0.88 threshold is raw-comparison-safe.
    "q249_sorted_neighborhood" -> ((s, d) =>
      graft.ext.EntityRes.sortedNeighborhoodPairs(
          Tables.part(s, d), "p_partkey", "p_name", window = 3)
        .filter(col("jw") >= 0.88)
        .select(col("__nma").as("name_a"), col("__nmb").as("name_b"),
                col("__ca").as("n_rows_a"), col("__cb").as("n_rows_b"),
                round(col("jw"), 6).as("jw"))
        .orderBy("name_a", "name_b")),

    // Entity-resolution audit with the native codegen'd Jaro-Winkler
    // expression (graft_jaro_winkler), on the EntityRes.nameGroups
    // distinct-name comparison space: similarity depends only on the
    // name string, so each distinct in-block name pair is scored
    // ONCE and the row-level pair counts are recovered exactly from
    // multiplicities — n_exact = Σ C(c,2) (a pair is jw=1.0 iff the
    // strings are identical), n_strong = Σ c_a·c_b over distinct
    // pairs in [0.88, 1), n_pairs = both. p_name draws from a fixed
    // vocabulary (64 distinct values at every SF), so comparisons
    // are O(D²) in VOCABULARY size — constant as the corpus grows —
    // where the naive row-level block join was O(N²/8) (25M pairs at
    // sf0.1). The kernel's IEEE operation order is pinned to
    // DuckDB's built-in (rapidfuzz lineage), so max_sub1 (max over
    // distinct cross-name pairs ≡ max over all sub-identical pairs)
    // is emitted RAW, no rounding. C(c,2) rides integer `div` —
    // never double division.
    "q173_name_match_audit" -> ((s, d) => {
      val g = graft.ops.Staging.stage(
        graft.ext.EntityRes.nameGroups(Tables.part(s, d),
          "p_partkey", "p_name",
          substring_index(col("p_name"), " ", 1)))
      val a = g.select(col("__blk").as("blk"), col("__nm").as("n1"),
                       col("__c").as("c1"))
      val b = g.select(col("__blk").as("blk"), col("__nm").as("n2"),
                       col("__c").as("c2"))
      val cross = a.join(b, Seq("blk")).filter(col("n1") < col("n2"))
        .select(col("blk"), (col("c1") * col("c2")).as("w"),
          graft.functions.GraftFunctions.jaroWinkler(s, col("n1"), col("n2"))
            .as("jw"))
        .groupBy("blk")
        .agg(sum("w").as("__n_cross"),
             sum(when(col("jw") >= 0.88 && col("jw") < 1.0, col("w"))
               .otherwise(0L)).as("__n_strong"),
             max(col("jw")).as("__max_sub1"))
      val same = g.groupBy(col("__blk").as("blk"))
        .agg(sum(expr("(__c * (__c - 1)) div 2")).as("__n_exact"))
      same.join(cross, Seq("blk"), "full_outer")
        .select(col("blk"),
          (coalesce(col("__n_exact"), lit(0L)) +
           coalesce(col("__n_cross"), lit(0L))).as("n_pairs"),
          coalesce(col("__n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("__n_strong"), lit(0L)).as("n_strong"),
          col("__max_sub1").as("max_sub1"))
        .filter(col("n_pairs") > 0)
        .orderBy("blk")
    }),

    // Weighted single-source shortest path (Graphs.ssspWeighted —
    // Bellman-Ford relaxation sweeps; bfsHops is the w≡1 case) on the
    // customer-supplier graph with integer link costs: strong links
    // (2+ shared order lines) cost 1, weak links cost 3. Seeds are
    // nation 0's suppliers; 3 sweeps = the radius cut. Exact integer
    // distances; the oracle unrolls the three min-merge relaxations.
    "q177_sssp_weighted" -> ((s, d) => {
      // staged: the symmetric union inside ssspWeighted reads it twice
      val edges = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                   concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
          .agg(count(lit(1)).as("__cnt"))
          .select(col("a"), col("b"),
            when(col("__cnt") >= 2, 1L).otherwise(3L).as("w")))
      val seeds = Tables.supplier(s, d)
        .filter(col("s_nationkey") === 0)
        .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"))
      graft.ext.Graphs.ssspWeighted(edges, "a", "b", "w", seeds, "node",
          maxSweeps = 3)
        .groupBy("dist").agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    }),

    // Reciprocal best match — the entity-linkage step after q173's
    // scoring: within each blocking key, every part's best-scoring
    // counterpart (jw desc, partner key asc) in EITHER direction; a
    // pair links only if the choice is MUTUAL. Emits the top 25
    // links; jw compares raw (the q173 bit-exactness contract).
    //
    // Computed on the EntityRes.nameGroups distinct-name space (the
    // r12 version materialized all 25M row-level in-block pairs —
    // O(N²) in corpus size; this derivation is O(D²)+O(N)). The
    // best-match structure collapses exactly:
    //  - a part whose name repeats (c ≥ 2) always best-matches
    //    inside its own name group (jw = 1.0 beats any cross-name
    //    jw < 1.0; tie-break = min other key): best(m1) = m2,
    //    best(k≠m1) = m1 — so the group's ONLY mutual pair is
    //    (m1, m2) at jw 1.0;
    //  - a singleton name's best is its best cross-name partner
    //    (top-1 name by jw desc, then min member id asc — all parts
    //    of one name score identically, so the best key IS that
    //    name's min id); mutuality then requires the partner to be a
    //    singleton too (a c ≥ 2 partner best-matches its own group).
    // The oracle is unchanged — it still ranks the full row-level
    // pair space; the hash match IS the proof of the derivation.
    "q179_reciprocal_match" -> ((s, d) => {
      val parts = Tables.part(s, d)
      val g0 = graft.ops.Staging.stage(
        graft.ext.EntityRes.nameGroups(parts, "p_partkey", "p_name",
          substring_index(col("p_name"), " ", 1)))
      // second-smallest member id per name group (defined iff c >= 2)
      val m2 = parts
        .join(g0.select(col("__nm"), col("__rep")),
              col("p_name") === col("__nm"))
        .filter(col("p_partkey") > col("__rep"))
        .groupBy("__nm").agg(min("p_partkey").as("__m2"))
      val grp = graft.ops.Staging.stage(
        g0.join(m2, Seq("__nm"), "left"))
      // best cross-name partner per name: top-1 by (jw desc, rep asc)
      val a = grp.select(col("__blk"), col("__nm").as("n1"),
                         col("__rep").as("r1"))
      val b = grp.select(col("__blk"), col("__nm").as("n2"),
                         col("__rep").as("r2"))
      val cross = a.join(b, Seq("__blk")).filter(col("n1") =!= col("n2"))
        .select(col("n1"), col("r2"),
          graft.functions.GraftFunctions.jaroWinkler(s, col("n1"), col("n2"))
            .as("jw"))
        .filter(col("jw") >= 0.9)
      val wB = Window.partitionBy("n1")
        .orderBy(col("jw").desc, col("r2"))
      val crossBest = cross.withColumn("__rn", row_number().over(wB))
        .filter(col("__rn") === 1)
        .select(col("n1"), col("r2").as("__cb"), col("jw").as("__cjw"))
      // mutual pairs: one (m1, m2, 1.0) per repeated name…
      val pairs1 = grp.filter(col("__c") >= 2)
        .select(col("__rep").as("k1"), col("__m2").as("k2"),
                lit(1.0).as("jw"))
      // …plus reciprocal singleton-singleton cross-name links
      val sb = graft.ops.Staging.stage(
        grp.filter(col("__c") === 1)
          .select(col("__nm").as("n1"), col("__rep").as("__m1"))
          .join(crossBest, Seq("n1")))
      val pairs2 = sb.alias("x")
        .join(sb.alias("y"),
          col("x.__cb") === col("y.__m1") && col("y.__cb") === col("x.__m1"))
        .filter(col("x.__m1") < col("y.__m1"))
        .select(col("x.__m1").as("k1"), col("y.__m1").as("k2"),
                col("x.__cjw").as("jw"))
      pairs1.union(pairs2)
        .orderBy(col("jw").desc, col("k1"), col("k2"))
        .limit(25)
    }),

    // 3-core peeling (Graphs.kCore) of the customer-supplier graph:
    // nodes of degree < 3 are repeatedly removed (3 sweeps — each
    // sweep only shrinks, so the budget is a sound
    // over-approximation of the fixpoint core). Emits the surviving
    // degree histogram — exact integers; the oracle unrolls the
    // three peel rounds.
    "q192_kcore" -> ((s, d) => {
      val edges = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                  concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
          .distinct())
      val core = graft.ops.Staging.stage(
        graft.ext.Graphs.kCore(edges, "a", "b", k = 3, sweeps = 3))
      core.groupBy("src").agg(count(lit(1)).as("__deg"))
        .groupBy(col("__deg").as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // Full entity-resolution pipeline (EntityRes.resolve): blocking ->
    // distinct-name collapse -> native Jaro-Winkler scoring over
    // distinct name pairs (occupancy-guarded, see EntityRes scaladoc)
    // -> threshold edges -> connected components -> cluster audit
    // (size + max member per cluster). Restricted to ONE blocking key
    // here so the oracle's transitive closure stays clique-sized; the
    // operator itself runs all blocks at scale (one exchange on the
    // key, pairs quadratic only in DISTINCT names per sub-block).
    // Exact integers out; the oracle recomputes the closure with the
    // q64 recursive-CTE shape over the row-level bit-exact JW pair
    // set — the hash match proves the name-level collapse exact.
    // Blocking-quality metrics for entity resolution (Christen 2012's
    // reduction ratio + pairs completeness): blocking on the first
    // name token, truth = identical full p_name across part keys.
    // RR = 1 - candidate/total pairs; PC = truth pairs found inside
    // blocks / all truth pairs — COMPUTED independently on both sides
    // (equal names share a first token, so the hash pins PC at 1e6
    // ppm rather than asserting it). All exact integers; pair counts
    // via c*(c-1)/2 over group sizes, never materialized pairs.
    // Common-neighbor LINK PREDICTION over the customer-supplier
    // bipartite projection (Liben-Nowell & Kleinberg 2003): supplier
    // pairs ranked by the Jaccard of their customer sets — "suppliers
    // serving the same demand", the candidate-edge feature of graph
    // completion. The pair generator is CAPPED the q247 co-visitation
    // way: only customers with <= 20 distinct suppliers expand into
    // pairs (a hot hub would otherwise emit its degree squared), so
    // co-occurrence counts are over capped customers while the
    // degrees stay exact — the estimate and its cap are both part of
    // the contract. Integer jaccard-ppm ordering, no floats.
    "q320_link_prediction" -> ((s, d) => {
      val bip = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select("o_custkey", "l_suppkey").distinct())
      val deg = bip.groupBy("l_suppkey").agg(count(lit(1)).as("dg"))
      val kept = graft.ops.Staging.stage(
        bip.join(bip.groupBy("o_custkey").agg(count(lit(1)).as("__cd"))
                   .filter(col("__cd") <= 20).select("o_custkey"),
                 Seq("o_custkey"), "left_semi"))
      val pairs = kept.select(col("o_custkey"), col("l_suppkey").as("sa"))
        .join(kept.select(col("o_custkey"), col("l_suppkey").as("sb")),
          "o_custkey")
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("common"))
      pairs
        .join(deg.select(col("l_suppkey").as("sa"), col("dg").as("da")), "sa")
        .join(deg.select(col("l_suppkey").as("sb"), col("dg").as("db")), "sb")
        .select(col("sa").as("supp_a"), col("sb").as("supp_b"),
          col("common"), col("da"), col("db"),
          expr("(common * 1000000) div (da + db - common)").as("jaccard_ppm"))
        .orderBy(col("jaccard_ppm").desc, col("supp_a"), col("supp_b"))
        .limit(20)
    }),

    "q312_blocking_quality" -> ((s, d) => {
      val parts = graft.ops.Staging.stage(
        Tables.part(s, d).select(col("p_partkey"),
          col("p_name"), substring_index(col("p_name"), " ", 1).as("blk")))
      val tot = parts.agg(count(lit(1)).as("n_parts"))
        .select(col("n_parts"),
          expr("n_parts * (n_parts - 1) div 2").as("total_pairs"))
      val cand = parts.groupBy("blk").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))
          .as("candidate_pairs"))
      val truthAll = parts.groupBy("p_name").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))
          .as("matches_total"))
      val truthIn = parts.groupBy("blk", "p_name").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))
          .as("matches_found"))
      tot.crossJoin(broadcast(cand)).crossJoin(broadcast(truthAll))
        .crossJoin(broadcast(truthIn))
        .select(col("n_parts"), col("total_pairs"), col("candidate_pairs"),
          expr("((total_pairs - candidate_pairs) * 1000000) div total_pairs")
            .as("rr_ppm"),
          col("matches_total"), col("matches_found"),
          expr("CASE WHEN matches_total = 0 THEN 1000000 " +
            "ELSE (matches_found * 1000000) div matches_total END")
            .as("pc_ppm"))
        .orderBy("n_parts")
    }),

    "q197_entity_resolution" -> ((s, d) => {
      val blockSmall = Tables.part(s, d)
        .filter(substring_index(col("p_name"), " ", 1) === "small")
      graft.ext.EntityRes.resolve(blockSmall, "p_partkey", "p_name",
          blockCol = substring_index(col("p_name"), " ", 1),
          threshold = 0.9)
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"), max("id").as("max_id"))
        .orderBy("component")
    }),

    // Degree assortativity of the customer-supplier graph — "do hubs
    // link to hubs?", the network-topology diagnostic that predicts
    // how sampling and dedup behave on a link graph (q90's PageRank
    // family measures node importance; assortativity measures the
    // MIXING pattern). Pearson r over the (deg_u, deg_v) pairs of
    // both edge orientations; every moment is an exact
    // decimal(38,0)/HUGEINT integer sum and the one double closed
    // form rides SHARED expression text. Scale: two exchanges (degree
    // agg, edge-degree join); the moment frame is one row.
    "q277_degree_assortativity" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      // r21: one-pass symmetrization (Sweep.symmetrize — explode of
      // both orientations) instead of union(edges, reversed): the
      // union form read the whole lineitem⋈orders⋈distinct build
      // TWICE into the staged cache fill (the r12 pageRank bug shape).
      // Every downstream moment is an exact integer/decimal sum, so
      // the changed row order is value-invisible.
      val sym = graft.ops.Staging.stage(
        graft.ops.Sweep.symmetrize(edges, "a", "b")
          .select(col("src").as("a"), col("dst").as("b")))
      val deg = graft.ops.Staging.stage(
        sym.groupBy("a").agg(count(lit(1)).as("dg")))
      val pairs = sym.join(deg, "a").withColumnRenamed("dg", "dx")
        .join(deg.select(col("a").as("b"), col("dg").as("dy")), "b")
      val mom = pairs.agg(count(lit(1)).as("n"),
        sum(col("dx").cast("decimal(38,0)")).as("sx"),
        sum(col("dy").cast("decimal(38,0)")).as("sy"),
        // operands cast BEFORE the multiply: a Long*Long product wraps
        // silently past ~2^63 (ANSI off) long before the decimal sum
        // would — the envelope must start at the product
        sum(col("dx").cast("decimal(38,0)") * col("dy").cast("decimal(38,0)")).as("sxy"),
        sum(col("dx").cast("decimal(38,0)") * col("dx").cast("decimal(38,0)")).as("sxx"),
        sum(col("dy").cast("decimal(38,0)") * col("dy").cast("decimal(38,0)")).as("syy"))
      val st = deg.agg(count(lit(1)).as("n_nodes"),
        max("dg").as("max_degree"))
      mom.crossJoin(broadcast(st))
        .selectExpr("n_nodes", "n div 2 AS n_edges", "max_degree",
          s"round($AssortText, 6) AS assortativity")
        .orderBy("n_nodes")
    }),

    // Newman modularity of the customer-supplier graph under the
    // NATION partition — "does trade stay in-nation?": the community-
    // quality score (Newman & Girvan 2004) that grades any clustering
    // of a link graph (q145's label propagation produces candidate
    // communities; this scores a partition). Q = W/m − Σ_c d_c²/(4m²)
    // — every moment (within-community edge count W, per-community
    // degree sums d_c) is an exact integer, Σd_c² is an exact integer
    // sum, and the one double closed form rides SHARED expression
    // text, so no double is ever SUMMED across an exchange. Scale:
    // one distinct-edge exchange + two nation-sized aggregates.
    "q288_nation_modularity" -> ((s, d) => {
      val edges = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select("o_custkey", "l_suppkey").distinct()
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey").as("cn"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey").as("sn"))),
            col("l_suppkey") === col("s_suppkey"))
          .select("o_custkey", "l_suppkey", "cn", "sn"))
      val base = edges.agg(count(lit(1)).as("m"),
        sum(when(col("cn") === col("sn"), 1L).otherwise(0L)).as("w"))
      val degC = edges.groupBy(col("cn").as("nat"))
        .agg(count(lit(1)).as("__dc"))
      val degS = edges.groupBy(col("sn").as("nat"))
        .agg(count(lit(1)).as("__ds"))
      val deg = degC.join(degS, Seq("nat"), "full_outer")
        .select(col("nat"),
          (coalesce(col("__dc"), lit(0L)) + coalesce(col("__ds"), lit(0L)))
            .as("__d"))
        .agg(count(lit(1)).as("n_nations"),
             // cast-then-multiply: the Long product itself wraps at scale
             sum(col("__d").cast("decimal(38,0)") * col("__d").cast("decimal(38,0)"))
               .cast("long").as("sum_deg_sq"))
      base.crossJoin(broadcast(deg))
        .selectExpr("n_nations", "m AS n_edges", "w AS within_edges",
          s"round($ModularityText, 6) AS modularity")
        .orderBy("n_edges")
    }),

    // FELLEGI-SUNTER match weights (Fellegi & Sunter JASA 1969) — the
    // probabilistic record-linkage layer the ER suite's deterministic
    // pipelines (q197/q312) sit under: per comparison field k,
    // m_k = P(agree | match) and u_k = P(agree | non-match) estimated
    // over the BLOCKED candidate pairs (q312's first-word blocking —
    // never all-pairs) with the exact-name truth the suite already
    // uses, add-one smoothed so a never-agreeing field cannot blow
    // ln to infinity; agreement/disagreement weights ln(m/u) and
    // ln((1-m)/(1-u)) in floored nano-nats (shared text over exact
    // integer counts). One pair join + ONE aggregate; the per-field
    // rows explode from that single row, so weight estimation costs
    // one exchange regardless of field count.
    "q358_fs_weights" -> ((s, d) => {
      val agg = fsCombos(s, d).agg(fsAggCols.head, fsAggCols.tail: _*)
      val fields = Seq("noun", "len", "size").map(f =>
        struct(lit(f).as("field"), col(s"ma_$f").as("ma"),
          col(s"ua_$f").as("ua")))
      agg.select(col("mt"), col("ut"),
          explode(array(fields: _*)).as("kv"))
        .select(col("kv.field").as("field"), col("mt"), col("ut"),
          col("kv.ma").as("ma"), col("kv.ua").as("ua"))
        .select(col("field"), col("mt"), col("ut"), col("ma"), col("ua"),
          expr("((ma + 1) * 1000000) div (mt + 2)").as("m_ppm"),
          expr("((ua + 1) * 1000000) div (ut + 2)").as("u_ppm"),
          expr(FsAgreeNano).as("w_agree_nano"),
          expr(FsDisagreeNano).as("w_disagree_nano"))
        .orderBy("field")
    }),

    // FS SCORE separation census — the classification the q358
    // weights exist for: every blocked candidate pair scores
    // sum_k (agree_k ? w_k+ : w_k-) on the integer nano lattice (the
    // 1-row weight frame broadcasts; the sum is 3 integer terms,
    // map-side), and the census per truth status shows the
    // separation: true-match pairs should mass above 0, non-matches
    // below — the acceptance/review/reject thresholding of the 1969
    // decision rule read straight off exact integers.
    "q359_fs_classify" -> ((s, d) => {
      // the 16-row contingency frame carries EVERYTHING both stages
      // need: weights aggregate it, and the census scores each combo
      // once and weights by its count — so the ~25M-row pair join is
      // scanned exactly once and never persisted (the r18 bench
      // caught both the recompute-twice form at 10 s and the
      // persist-the-pairs form at 16 s; this shape reads 5 s, the
      // single pass's inherent cost)
      val combos = fsCombos(s, d)
      val weights = combos.agg(fsAggCols.head, fsAggCols.tail: _*)
        .select(Seq("noun", "len", "size").flatMap(f => Seq(
          expr(fsAgreeNanoText(s"ma_$f", s"ua_$f")).as(s"wa_$f"),
          expr(fsDisagreeNanoText(s"ma_$f", s"ua_$f")).as(s"wd_$f"))): _*)
      val scoreExpr = Seq("noun", "len", "size").map(f =>
        s"(CASE WHEN ag_$f THEN wa_$f ELSE wd_$f END)").mkString(" + ")
      combos.crossJoin(broadcast(weights))
        .select(col("is_match"), col("cnt"), expr(scoreExpr).as("score"))
        .groupBy("is_match")
        .agg(sum("cnt").as("n_pairs"),
             sum(when(col("score") > 0, col("cnt")).otherwise(0L))
               .as("n_positive"),
             min("score").as("min_score_nano"),
             max("score").as("max_score_nano"),
             sum(col("score") * col("cnt")).as("sum_score_nano"))
        .orderBy("is_match")
    }),

    // HYPERBALL NEIGHBORHOOD FUNCTION (Graphs.hyperBallCensus —
    // Boldi & Vigna's HyperANF): how much of the graph is within t
    // hops of a fixed supplier cohort (s_suppkey <= 4 — present and
    // non-empty at EVERY SF, unlike q171's nation-0 cut which is
    // empty at sf0.001) on q90's customer-supplier graph, measured
    // the only way that scales —
    // one 64-register HLL per node, unioned along edges per sweep, so
    // state is 64 small ints per node while the balls it summarizes
    // grow corpus-sized. The reach ratio per t (vs the t=3 ball, in
    // floored ppm) is the effective-diameter read-off. The ORACLE
    // recomputes the exact t-hop balls by recursive closure (the q171
    // d0..d3 shape, viable at test SF) and re-derives the SAME
    // registers from them — HLL max-union over sweeps IS the ball's
    // HLL, so the approximate estimator is hash-checked exactly, no
    // pins. Register folds are exact integers end to end (s_int =
    // sum 2^(45-r) <= 2^52); the only float is the one shared
    // estimate text per (seed, t).
    "q378_hyperball_nf" -> ((s, d) =>
      hyperBallNf(s, d)),

    // EFFECTIVE DIAMETER read-off (r19 verdict item 4) — the standard
    // HyperANF payoff (Boldi & Vigna WWW'11 §5): the smallest t whose
    // neighborhood function reaches 90% of its final value, i.e. the
    // hop count within which 90% of the reachable mass sits. ONE
    // driver query over the EXISTING q378 census (shared generator —
    // edges, seeds, sweeps, and the register pipeline are one copy):
    // the census is sweeps+1 rows, the argmin is a 1-row aggregate
    // broadcast back for the context row. At 100 TB the census is
    // still sweeps+1 rows — the readout costs nothing beyond the
    // census itself. The oracle wraps q378's exact ball replay and
    // applies the same integer-lattice cut (ratio_ppm >= 900000).
    "q380_effective_diameter" -> ((s, d) => {
      val census = graft.ops.Staging.stage(hyperBallNf(s, d))
      val eff = census.agg(
        min(when(col("ratio_vs_final_ppm") >= 900000L, col("t")))
          .as("eff_t"))
      census.join(broadcast(eff), col("t") === col("eff_t"))
        .select(col("t").as("eff_diameter_t"), col("n_seeds"),
          col("nf_est_milli").as("nf_at_t_milli"),
          col("ratio_vs_final_ppm").as("ratio_at_t_ppm"))
        .orderBy("eff_diameter_t")
    }),
  )

  /** q378/q380's HyperBall census over the customer-supplier graph —
    * ONE copy of the edge projection, the seed cohort (s_suppkey <= 4,
    * non-empty at every SF), and the sweep count, so the effective-
    * diameter readout reads exactly the census q378 hash-checks. The
    * edge frame is staged: the symmetric union inside hyperBallCensus
    * reads it twice (the q171 convention). */
  private def hyperBallNf(s: SparkSession, d: String): DataFrame = {
    val edges = graft.ops.Staging.stage(
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
                concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct())
    val seeds = Tables.supplier(s, d)
      .filter(col("s_suppkey") <= 4)
      .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"))
    graft.ext.Graphs.hyperBallCensus(edges, "a", "b", seeds, "node",
      sweeps = 3)
  }

  /** q358/q359's blocked candidate pairs over part (q312's first-word
    * blocking), with the exact-name truth flag and per-field
    * agreement flags. The fields model the real record-linkage
    * spectrum: `noun` (the name's second word) and `len` (name
    * length) correlate with identity without being individually
    * unique — the surname/zip-code class — while `size` is
    * identity-independent, so its FS weight must come out ~0 (the
    * field an analyst learns to drop).
    *
    * Pairs ride [[graft.ext.EntityRes.blockedPairsSignaled]] (r18
    * verdict item 2): within-block pair growth is quadratic in
    * occupancy, so the generator carries the maxBlockSize sub-split
    * valve. At the default cap no first-word block splits at any
    * tested SF (~220 parts/block at sf0.1), so the output — and the
    * oracle's plain block-join replay — is bit-identical to the
    * uncapped form. Because the ORACLE replays the UNCAPPED join, a
    * fired valve would silently diverge the two engines — so this
    * query refuses loudly when the breach signal is non-empty
    * (> 10k parts in one first-word block — ~sf5 on TPC-H name
    * distributions, far past driver scale);
    * pipelines that WANT the capped recall trade call
    * blockedPairs directly and skip the hash gate. */
  private def fsPairs(s: SparkSession, d: String): DataFrame = {
    val parts = graft.ops.Staging.stage(
      Tables.part(s, d).select(col("p_partkey"), col("p_name"),
        substring_index(col("p_name"), " ", 1).as("blk"),
        substring_index(col("p_name"), " ", -1).as("noun"),
        length(col("p_name")).as("nlen"), col("p_size")))
    val (pairs, breach) =
      graft.ext.EntityRes.blockedPairsSignaled(parts, "blk", "p_partkey")
    require(breach.isEmpty,
      s"fsPairs occupancy valve fired ($breach): the DuckDB oracle " +
        "replays the UNCAPPED block join, so a sub-split here would " +
        "silently diverge the engines — raise maxBlockSize or drop " +
        "the oracle gate for this corpus")
    pairs
      .select((col("p_name_a") === col("p_name_b")).as("is_match"),
        (col("noun_a") === col("noun_b")).as("ag_noun"),
        (col("nlen_a") === col("nlen_b")).as("ag_len"),
        (col("p_size_a") === col("p_size_b")).as("ag_size"))
  }

  /** The pair frame collapsed to its 16-row contingency table —
    * is_match x the 3 agreement bits, with the pair count per combo.
    * ONE pass over the blocked pairs; everything downstream of this
    * frame is combo-sized regardless of corpus scale. */
  /** Memoized per (session, dir) — the FinComposite convention: the
    * frame is at most 16 rows but costs a ~25M-row blocked pair scan
    * to produce, and BOTH FS queries derive from it; the second query
    * in a session reconstructs it from the collected rows as a
    * driver literal instead of paying the scan again (at 100 TB this
    * is exactly the derived table a pipeline persists once). */
  private val fsCombosCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Boolean, Boolean, Boolean, Boolean, Long)]]

  private def fsCombos(s: SparkSession, d: String): DataFrame = {
    val rows = fsCombosCache.getOrElseUpdate((s, d), {
      fsPairs(s, d)
        .groupBy("is_match", "ag_noun", "ag_len", "ag_size")
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3), r.getLong(4))).toSeq
    })
    import s.implicits._
    rows.toDF("is_match", "ag_noun", "ag_len", "ag_size", "cnt")
  }

  /** The m/u counting aggregate both FS queries share, over the
    * combo frame (cnt-weighted). */
  private def fsAggCols: Seq[Column] = {
    val mt = sum(when(col("is_match"), col("cnt")).otherwise(0L)).as("mt")
    val ut = sum(when(!col("is_match"), col("cnt")).otherwise(0L)).as("ut")
    val per = Seq("noun", "len", "size").flatMap(f => Seq(
      sum(when(col("is_match") && col(s"ag_$f"), col("cnt")).otherwise(0L))
        .as(s"ma_$f"),
      sum(when(!col("is_match") && col(s"ag_$f"), col("cnt")).otherwise(0L))
        .as(s"ua_$f")))
    mt +: ut +: per
  }

  /** q358/q359's add-one-smoothed FS weights in floored nano-nats —
    * ONE generator each, parameterized on the m/u column NAMES (never
    * substring-rewritten after the fact — a token like `max` in a
    * future edit cannot silently corrupt both engines' shared text):
    * w+ = ln( ((ma+1)/(mt+2)) / ((ua+1)/(ut+2)) ),
    * w- = ln( ((mt-ma+1)/(mt+2)) / ((ut-ua+1)/(ut+2)) ). */
  private def fsAgreeNanoText(ma: String, ua: String): String =
    s"CAST(floor(1000000000.0 * ln(((CAST($ma AS DOUBLE) + " +
      "CAST(1 AS DOUBLE)) / (CAST(mt AS DOUBLE) + CAST(2 AS DOUBLE))) / " +
      s"((CAST($ua AS DOUBLE) + CAST(1 AS DOUBLE)) / (CAST(ut AS DOUBLE) + " +
      "CAST(2 AS DOUBLE))))) AS BIGINT)"
  private def fsDisagreeNanoText(ma: String, ua: String): String =
    s"CAST(floor(1000000000.0 * ln(((CAST(mt - $ma AS DOUBLE) + " +
      "CAST(1 AS DOUBLE)) / (CAST(mt AS DOUBLE) + CAST(2 AS DOUBLE))) / " +
      s"((CAST(ut - $ua AS DOUBLE) + CAST(1 AS DOUBLE)) / (CAST(ut AS DOUBLE) " +
      "+ CAST(2 AS DOUBLE))))) AS BIGINT)"
  private val FsAgreeNano = fsAgreeNanoText("ma", "ua")
  private val FsDisagreeNano = fsDisagreeNanoText("ma", "ua")

  /** q344's per-distinct-degree ln contribution in floored nano —
    * SHARED text (n_d * ln(d), every operand DOUBLE-cast, floored
    * per term so sum order never matters). */
  private val PowerLawTermNano =
    "CAST(floor(CAST(1000000000 AS DOUBLE) * CAST(n_d AS DOUBLE) * " +
      "ln(CAST(deg AS DOUBLE))) AS BIGINT)"

  /** q344's alpha = 1 + N / (ln_sum_nano / 1e9), floored milli, NULL
    * when every node has degree 1 (ln sum 0) — SHARED text. */
  private val PowerLawAlphaMilli =
    "CASE WHEN ln_sum_nano > 0 THEN " +
      "CAST(floor(CAST(1000 AS DOUBLE) * (CAST(1 AS DOUBLE) + " +
      "CAST(n_nodes AS DOUBLE) * CAST(1000000000 AS DOUBLE) / " +
      "CAST(ln_sum_nano AS DOUBLE))) AS BIGINT) " +
      "ELSE CAST(NULL AS BIGINT) END"

  /** Shared oracle prefix for q358/q359: the blocked pair frame and
    * the single m/u counting aggregate, replayed field for field. */
  private val fsPairsCtes =
    """WITH p AS (
      |  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk,
      |    string_split(p_name, ' ')[-1] AS noun,
      |    CAST(length(p_name) AS BIGINT) AS nlen, p_size
      |  FROM part),
      |pr AS (
      |  SELECT (a.p_name = b.p_name) AS is_match,
      |    (a.noun = b.noun) AS ag_noun,
      |    (a.nlen = b.nlen) AS ag_len,
      |    (a.p_size = b.p_size) AS ag_size
      |  FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey),
      |agg AS (
      |  SELECT
      |    CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS mt,
      |    CAST(sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ut,
      |    CAST(sum(CASE WHEN is_match AND ag_noun THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ma_noun,
      |    CAST(sum(CASE WHEN NOT is_match AND ag_noun THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ua_noun,
      |    CAST(sum(CASE WHEN is_match AND ag_len THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ma_len,
      |    CAST(sum(CASE WHEN NOT is_match AND ag_len THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ua_len,
      |    CAST(sum(CASE WHEN is_match AND ag_size THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ma_size,
      |    CAST(sum(CASE WHEN NOT is_match AND ag_size THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ua_size
      |  FROM pr)""".stripMargin

  val oracles: Map[String, String] = Map(
    // FS-weight replay: same blocked pairs, same single aggregate,
    // per-field rows renamed back to the generic (ma, ua) columns so
    // the SAME shared weight texts apply verbatim.
    "q358_fs_weights" -> (fsPairsCtes +
      s""",
        |f AS (
        |  SELECT 'len' AS field, mt, ut, ma_len AS ma, ua_len AS ua
        |  FROM agg
        |  UNION ALL
        |  SELECT 'noun', mt, ut, ma_noun, ua_noun FROM agg
        |  UNION ALL
        |  SELECT 'size', mt, ut, ma_size, ua_size FROM agg)
        |SELECT field, mt, ut, ma, ua,
        |  ((ma + 1) * 1000000) // (mt + 2) AS m_ppm,
        |  ((ua + 1) * 1000000) // (ut + 2) AS u_ppm,
        |  $FsAgreeNano AS w_agree_nano,
        |  $FsDisagreeNano AS w_disagree_nano
        |FROM f ORDER BY field""".stripMargin),

    // FS-classify replay: the weight row from the same parameterized
    // generators (field-suffixed column names passed in, never
    // substring-rewritten), the 3-term integer score, and the
    // per-truth census.
    "q359_fs_classify" -> (fsPairsCtes + {
      val wCols = Seq("noun", "len", "size").flatMap(f => Seq(
        s"    ${fsAgreeNanoText(s"ma_$f", s"ua_$f")} AS wa_$f",
        s"    ${fsDisagreeNanoText(s"ma_$f", s"ua_$f")} AS wd_$f"))
        .mkString(",\n")
      val scoreExpr = Seq("noun", "len", "size").map(f =>
        s"(CASE WHEN ag_$f THEN wa_$f ELSE wd_$f END)").mkString(" + ")
      s""",
        |w AS (
        |  SELECT
        |$wCols
        |  FROM agg),
        |sc AS (
        |  SELECT pr.is_match, $scoreExpr AS score
        |  FROM pr CROSS JOIN w)
        |SELECT is_match, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_positive,
        |  CAST(min(score) AS BIGINT) AS min_score_nano,
        |  CAST(max(score) AS BIGINT) AS max_score_nano,
        |  CAST(sum(score) AS BIGINT) AS sum_score_nano
        |FROM sc GROUP BY is_match ORDER BY is_match""".stripMargin
    }),
    // Rich-club replay: same distinct bipartite edges, degree
    // census, two IN-subqueries per cutoff, floor-ppm phi.
    "q343_rich_club" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        |  GROUP BY node),
        |ks AS (SELECT CAST(unnest([2, 4, 8]) AS BIGINT) AS k),
        |nk AS (
        |  SELECT ks.k, CAST(count(*) FILTER (deg.deg > ks.k) AS BIGINT)
        |    AS n_k
        |  FROM ks CROSS JOIN deg GROUP BY ks.k),
        |ed AS (
        |  SELECT da.deg AS dega, db.deg AS degb
        |  FROM e0 JOIN deg da ON da.node = e0.a
        |          JOIN deg db ON db.node = e0.b),
        |ek AS (
        |  SELECT ks.k,
        |    CAST(count(*) FILTER (ed.dega > ks.k AND ed.degb > ks.k)
        |      AS BIGINT) AS e_k
        |  FROM ks CROSS JOIN ed GROUP BY ks.k)
        |SELECT nk.k, nk.n_k, ek.e_k,
        |  CAST(CASE WHEN nk.n_k >= 2
        |    THEN (2 * ek.e_k * 1000000) // (nk.n_k * (nk.n_k - 1))
        |    ELSE NULL END AS BIGINT) AS phi_ppm
        |FROM nk JOIN ek ON nk.k = ek.k
        |ORDER BY nk.k""".stripMargin,

    // Power-law replay: same degree census, the SHARED floored nano
    // term and floored-milli alpha.
    "q344_powerlaw_alpha" ->
      s"""WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |dg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        |  GROUP BY node),
        |dc AS (
        |  SELECT deg, CAST(count(*) AS BIGINT) AS n_d
        |  FROM dg GROUP BY deg),
        |t AS (SELECT deg, n_d, $PowerLawTermNano AS tn FROM dc),
        |a AS (
        |  SELECT CAST(sum(n_d) AS BIGINT) AS n_nodes,
        |    CAST(sum(CASE WHEN deg > 1 THEN n_d ELSE 0 END) AS BIGINT)
        |      AS n_above_dmin,
        |    CAST(sum(tn) AS BIGINT) AS ln_sum_nano
        |  FROM t)
        |SELECT n_nodes, n_above_dmin, ln_sum_nano,
        |  $PowerLawAlphaMilli AS alpha_milli
        |FROM a ORDER BY n_nodes""".stripMargin,

    "q168_pagerank_weighted" ->
      s"""WITH e0 AS (
        |  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |         's' || CAST(l.l_suppkey AS VARCHAR) AS b,
        |         CAST(count(*) AS DOUBLE) AS w
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |sym AS (SELECT a AS src, b AS dst, w FROM e0
        |        UNION ALL SELECT b AS src, a AS dst, w FROM e0),
        |wt AS (SELECT src, sum(w) AS wtot FROM sym GROUP BY src),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM wt),
        |r0 AS (SELECT src AS node, 1.0 / nn AS pr FROM wt, n),
        |r1 AS (SELECT s.dst AS node,
        |         ${1.0 - 0.85} / nn + 0.85 * sum(r.pr * s.w / d.wtot) AS pr
        |       FROM sym s JOIN r0 r ON s.src = r.node
        |                  JOIN wt d ON s.src = d.src, n
        |       GROUP BY s.dst, nn),
        |r2 AS (SELECT s.dst AS node,
        |         ${1.0 - 0.85} / nn + 0.85 * sum(r.pr * s.w / d.wtot) AS pr
        |       FROM sym s JOIN r1 r ON s.src = r.node
        |                  JOIN wt d ON s.src = d.src, n
        |       GROUP BY s.dst, nn)
        |SELECT r2.node, CAST(wt.wtot AS BIGINT) AS total_w,
        |  round(r2.pr * nn, 6) AS pr_x_n
        |FROM r2 JOIN wt ON r2.node = wt.src, n
        |ORDER BY pr_x_n DESC, r2.node LIMIT 20""".stripMargin,

    "q145_label_propagation" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |sym AS (SELECT a AS src, b AS dst FROM e0
        |        UNION SELECT b AS src, a AS dst FROM e0),
        |i0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
        |c1 AS (SELECT s.dst, i.label, count(*) AS cnt
        |       FROM sym s JOIN i0 i ON s.src = i.node GROUP BY 1, 2),
        |i1 AS (SELECT dst AS node, label FROM (
        |         SELECT dst, label, row_number() OVER (
        |           PARTITION BY dst ORDER BY cnt DESC, label) AS rn
        |         FROM c1) WHERE rn = 1),
        |c2 AS (SELECT s.dst, i.label, count(*) AS cnt
        |       FROM sym s JOIN i1 i ON s.src = i.node GROUP BY 1, 2),
        |i2 AS (SELECT dst AS node, label FROM (
        |         SELECT dst, label, row_number() OVER (
        |           PARTITION BY dst ORDER BY cnt DESC, label) AS rn
        |         FROM c2) WHERE rn = 1)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM i2 GROUP BY label
        |ORDER BY n_nodes DESC, label LIMIT 20""".stripMargin,

    "q90_pagerank" ->
      s"""WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |sym AS (SELECT a AS src, b AS dst FROM e0
        |        UNION SELECT b AS src, a AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM deg),
        |r0 AS (SELECT src AS node, 1.0 / nn AS pr FROM deg, n),
        |r1 AS (SELECT s.dst AS node,
        |         ${1.0 - 0.85} / nn + 0.85 * sum(r.pr / d.deg) AS pr
        |       FROM sym s JOIN r0 r ON s.src = r.node
        |                  JOIN deg d ON s.src = d.src, n
        |       GROUP BY s.dst, nn),
        |r2 AS (SELECT s.dst AS node,
        |         ${1.0 - 0.85} / nn + 0.85 * sum(r.pr / d.deg) AS pr
        |       FROM sym s JOIN r1 r ON s.src = r.node
        |                  JOIN deg d ON s.src = d.src, n
        |       GROUP BY s.dst, nn),
        |r3 AS (SELECT s.dst AS node,
        |         ${1.0 - 0.85} / nn + 0.85 * sum(r.pr / d.deg) AS pr
        |       FROM sym s JOIN r2 r ON s.src = r.node
        |                  JOIN deg d ON s.src = d.src, n
        |       GROUP BY s.dst, nn)
        |SELECT r3.node, deg.deg AS degree, round(r3.pr, 6) AS pagerank
        |FROM r3 JOIN deg ON r3.node = deg.src
        |ORDER BY round(r3.pr, 6) DESC, r3.node LIMIT 20""".stripMargin,

    // Unrolls 2 personalized sweeps: restart mass ((1-d) + d*D) / |S|
    // lands on seeds only; (1-d) is the interpolated Scala double
    // (decimal-literal subtraction in DuckDB is exact, 1 ulp off the
    // IEEE fold), 1.0/s the same division the operator seeds with.
    "q330_personalized_pagerank" ->
      s"""WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |                  'o' || CAST(o_orderkey AS VARCHAR) AS dst
        |  FROM orders),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |sd AS (SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
        |       FROM customer WHERE c_nationkey = 0),
        |od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |nf AS (SELECT n0.node, od.src IS NULL AS dang,
        |         sd.node IS NOT NULL AS seed
        |       FROM nodes n0 LEFT JOIN od ON n0.node = od.src
        |                     LEFT JOIN sd ON n0.node = sd.node),
        |sc AS (SELECT CAST(count(*) FILTER (seed) AS DOUBLE) AS s FROM nf),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nf),
        |r0 AS (SELECT node, dang, seed,
        |         CASE WHEN seed THEN 1.0 / s ELSE 0.0 END AS pr
        |       FROM nf, sc),
        |d0 AS (SELECT coalesce(sum(pr) FILTER (dang), 0.0) AS dm FROM r0),
        |m1 AS (SELECT e.dst AS node, sum(r.pr / od.deg) AS mass
        |       FROM e JOIN od ON e.src = od.src
        |              JOIN r0 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT nf.node, nf.dang, nf.seed,
        |         CASE WHEN nf.seed
        |           THEN (${1.0 - 0.85} + 0.85 * (SELECT dm FROM d0)) / s
        |           ELSE 0.0 END
        |         + 0.85 * coalesce(m1.mass, 0.0) AS pr
        |       FROM nf LEFT JOIN m1 ON nf.node = m1.node, sc),
        |d1 AS (SELECT coalesce(sum(pr) FILTER (dang), 0.0) AS dm FROM r1),
        |m2 AS (SELECT e.dst AS node, sum(r.pr / od.deg) AS mass
        |       FROM e JOIN od ON e.src = od.src
        |              JOIN r1 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT nf.node, nf.seed,
        |         CASE WHEN nf.seed
        |           THEN (${1.0 - 0.85} + 0.85 * (SELECT dm FROM d1)) / s
        |           ELSE 0.0 END
        |         + 0.85 * coalesce(m2.mass, 0.0) AS pr
        |       FROM nf LEFT JOIN m2 ON nf.node = m2.node, sc)
        |SELECT r2.node, r2.seed AS is_seed,
        |  CAST(coalesce(od.deg, 0) AS BIGINT) AS out_degree,
        |  round(r2.pr * nn.n, 6) AS ppr_x_n
        |FROM r2 LEFT JOIN od ON r2.node = od.src, nn
        |ORDER BY ppr_x_n DESC, r2.node LIMIT 20""".stripMargin,

    // Unrolls 2 directed sweeps with the dangling term: D_k = sum of
    // pr over outdeg-0 nodes, pr' = (1-d)/N + d*(mass + D/N). (1-d)
    // is the interpolated Scala double, matching the IEEE fold the
    // operator uses (DuckDB's decimal subtraction is 1 ulp off).
    "q121_pagerank_directed" ->
      s"""WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |                  'o' || CAST(o_orderkey AS VARCHAR) AS dst
        |  FROM orders),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
        |od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, 1.0 / nn AS pr FROM nodes, n),
        |d0 AS (SELECT coalesce(sum(r.pr), 0.0) AS dm
        |       FROM r0 r LEFT JOIN od ON r.node = od.src
        |       WHERE od.src IS NULL),
        |m1 AS (SELECT e.dst AS node, sum(r.pr / od.deg) AS mass
        |       FROM e JOIN od ON e.src = od.src
        |              JOIN r0 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT nodes.node,
        |         ${1.0 - 0.85} / nn +
        |           0.85 * (coalesce(m1.mass, 0.0) + (SELECT dm FROM d0) / nn) AS pr
        |       FROM nodes LEFT JOIN m1 ON nodes.node = m1.node, n),
        |d1 AS (SELECT coalesce(sum(r.pr), 0.0) AS dm
        |       FROM r1 r LEFT JOIN od ON r.node = od.src
        |       WHERE od.src IS NULL),
        |m2 AS (SELECT e.dst AS node, sum(r.pr / od.deg) AS mass
        |       FROM e JOIN od ON e.src = od.src
        |              JOIN r1 r ON r.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT nodes.node,
        |         ${1.0 - 0.85} / nn +
        |           0.85 * (coalesce(m2.mass, 0.0) + (SELECT dm FROM d1) / nn) AS pr
        |       FROM nodes LEFT JOIN m2 ON nodes.node = m2.node, n)
        |SELECT r2.node, CAST(coalesce(od.deg, 0) AS BIGINT) AS out_degree,
        |  round(r2.pr * nn, 6) AS pagerank_x_n
        |FROM r2 LEFT JOIN od ON r2.node = od.src, n
        |ORDER BY round(r2.pr * nn, 6) DESC, r2.node LIMIT 20""".stripMargin,

    // Unrolls 3 BFS relaxation sweeps as min-merge unions — the same
    // dist' = min(dist, 1 + min over neighbors) recurrence.
    "q171_bfs_hops" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |sym AS (SELECT a AS src, b AS dst FROM e0
        |        UNION SELECT b AS src, a AS dst FROM e0),
        |d0 AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node,
        |              CAST(0 AS BIGINT) AS hops
        |       FROM supplier WHERE s_nationkey = 0),
        |d1 AS (SELECT node, min(hops) AS hops FROM (
        |         SELECT node, hops FROM d0
        |         UNION ALL
        |         SELECT s.dst, d.hops + 1 FROM sym s JOIN d0 d ON s.src = d.node)
        |       GROUP BY node),
        |d2 AS (SELECT node, min(hops) AS hops FROM (
        |         SELECT node, hops FROM d1
        |         UNION ALL
        |         SELECT s.dst, d.hops + 1 FROM sym s JOIN d1 d ON s.src = d.node)
        |       GROUP BY node),
        |d3 AS (SELECT node, min(hops) AS hops FROM (
        |         SELECT node, hops FROM d2
        |         UNION ALL
        |         SELECT s.dst, d.hops + 1 FROM sym s JOIN d2 d ON s.src = d.node)
        |       GROUP BY node)
        |SELECT hops, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM d3 GROUP BY hops ORDER BY hops""".stripMargin,

    // Sorted-neighborhood replay: distinct names, a 0-based
    // row_number total order, neighbor pairs within 3 positions, the
    // bit-identical builtin JW at the same raw threshold.
    "q249_sorted_neighborhood" ->
      """WITH g AS (
        |  SELECT p_name AS nm, CAST(count(*) AS BIGINT) AS c
        |  FROM part GROUP BY p_name),
        |r AS (
        |  SELECT nm, c, row_number() OVER (ORDER BY nm) - 1 AS i
        |  FROM g)
        |SELECT a.nm AS name_a, b.nm AS name_b,
        |  a.c AS n_rows_a, b.c AS n_rows_b,
        |  round(jaro_winkler_similarity(a.nm, b.nm), 6) AS jw
        |FROM r a JOIN r b ON b.i > a.i AND b.i <= a.i + 3
        |WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.88
        |ORDER BY name_a, name_b""".stripMargin,

    // DuckDB's jaro_winkler_similarity is bit-identical to the native
    // graft_jaro_winkler kernel (same rapidfuzz-lineage formula and
    // IEEE operation order), so max_sub1 compares RAW.
    "q173_name_match_audit" ->
      """WITH p AS (SELECT p_partkey, p_name,
        |                  split_part(p_name, ' ', 1) AS blk FROM part),
        |pr AS (SELECT a.blk, jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        |       FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey)
        |SELECT blk, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(*) FILTER (jw = 1.0) AS BIGINT) AS n_exact,
        |  CAST(count(*) FILTER (jw >= 0.88 AND jw < 1.0) AS BIGINT) AS n_strong,
        |  max(jw) FILTER (jw < 1.0) AS max_sub1
        |FROM pr GROUP BY blk ORDER BY blk""".stripMargin,

    // Unrolls 3 Bellman-Ford relaxations: dist' = min(dist,
    // min over neighbors(dist + w)) with the q177 link costs.
    "q177_sssp_weighted" ->
      """WITH e0 AS (
        |  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |         's' || CAST(l.l_suppkey AS VARCHAR) AS b,
        |         CASE WHEN count(*) >= 2 THEN 1 ELSE 3 END AS w
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |sym AS (SELECT a AS src, b AS dst, w FROM e0
        |        UNION ALL SELECT b AS src, a AS dst, w FROM e0),
        |d0 AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node,
        |              CAST(0 AS BIGINT) AS dist
        |       FROM supplier WHERE s_nationkey = 0),
        |d1 AS (SELECT node, min(dist) AS dist FROM (
        |         SELECT node, dist FROM d0
        |         UNION ALL
        |         SELECT s.dst, d.dist + s.w FROM sym s JOIN d0 d ON s.src = d.node)
        |       GROUP BY node),
        |d2 AS (SELECT node, min(dist) AS dist FROM (
        |         SELECT node, dist FROM d1
        |         UNION ALL
        |         SELECT s.dst, d.dist + s.w FROM sym s JOIN d1 d ON s.src = d.node)
        |       GROUP BY node),
        |d3 AS (SELECT node, min(dist) AS dist FROM (
        |         SELECT node, dist FROM d2
        |         UNION ALL
        |         SELECT s.dst, d.dist + s.w FROM sym s JOIN d2 d ON s.src = d.node)
        |       GROUP BY node)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM d3 GROUP BY dist ORDER BY dist""".stripMargin,

    "q179_reciprocal_match" ->
      """WITH p AS (SELECT p_partkey, p_name,
        |                  split_part(p_name, ' ', 1) AS blk FROM part),
        |half AS (SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |           jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        |         FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        |         WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9),
        |both_d AS (SELECT k1, k2, jw FROM half
        |           UNION ALL SELECT k2, k1, jw FROM half),
        |best AS (SELECT k1, k2, jw FROM (
        |           SELECT *, row_number() OVER (PARTITION BY k1
        |             ORDER BY jw DESC, k2) AS rn FROM both_d) WHERE rn = 1)
        |SELECT x.k1, x.k2, x.jw
        |FROM best x JOIN best y ON x.k1 = y.k2 AND x.k2 = y.k1
        |WHERE x.k1 < x.k2
        |ORDER BY x.jw DESC, x.k1, x.k2 LIMIT 25""".stripMargin,

    "q192_kcore" ->
      """WITH e0x AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e0 AS (SELECT a AS src, b AS dst FROM e0x
        |       UNION SELECT b AS src, a AS dst FROM e0x),
        |d1 AS (SELECT src, count(*) AS c FROM e0 GROUP BY src),
        |k1 AS (SELECT src FROM d1 WHERE c >= 3),
        |e1 AS (SELECT e.src, e.dst FROM e0 e
        |       JOIN k1 x ON e.src = x.src JOIN k1 y ON e.dst = y.src),
        |d2 AS (SELECT src, count(*) AS c FROM e1 GROUP BY src),
        |k2 AS (SELECT src FROM d2 WHERE c >= 3),
        |e2 AS (SELECT e.src, e.dst FROM e1 e
        |       JOIN k2 x ON e.src = x.src JOIN k2 y ON e.dst = y.src),
        |d3 AS (SELECT src, count(*) AS c FROM e2 GROUP BY src),
        |k3 AS (SELECT src FROM d3 WHERE c >= 3),
        |e3 AS (SELECT e.src, e.dst FROM e2 e
        |       JOIN k3 x ON e.src = x.src JOIN k3 y ON e.dst = y.src)
        |SELECT c AS degree, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM (SELECT src, CAST(count(*) AS BIGINT) AS c
        |      FROM e3 GROUP BY src)
        |GROUP BY 1 ORDER BY degree""".stripMargin,

    // Same group-size arithmetic: blocks on the first token, truth on
    // the full name, found = (block, name) groups.
    // Same capped pair generator and exact-degree Jaccard ppm.
    "q320_link_prediction" ->
      """WITH bip AS (
        |  SELECT DISTINCT o_custkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS dg FROM bip GROUP BY 1),
        |kept AS (
        |  SELECT * FROM bip WHERE o_custkey IN (
        |    SELECT o_custkey FROM bip GROUP BY o_custkey HAVING count(*) <= 20)),
        |p AS (
        |  SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
        |    CAST(count(*) AS BIGINT) AS common
        |  FROM kept a JOIN kept b
        |    ON a.o_custkey = b.o_custkey AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2)
        |SELECT sa AS supp_a, sb AS supp_b, common, da.dg AS da, db.dg AS db,
        |  (common * 1000000) // (da.dg + db.dg - common) AS jaccard_ppm
        |FROM p JOIN deg da ON p.sa = da.l_suppkey
        |       JOIN deg db ON p.sb = db.l_suppkey
        |ORDER BY jaccard_ppm DESC, supp_a, supp_b LIMIT 20""".stripMargin,

    "q312_blocking_quality" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
        |  FROM part),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
        |    CAST(count(*) AS BIGINT) * (CAST(count(*) AS BIGINT) - 1) // 2 AS total_pairs
        |  FROM p),
        |cand AS (
        |  SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS candidate_pairs
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM p GROUP BY blk)),
        |ta AS (
        |  SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS matches_total
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM p GROUP BY p_name)),
        |ti AS (
        |  SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS matches_found
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM p GROUP BY blk, p_name))
        |SELECT n_parts, total_pairs, candidate_pairs,
        |  ((total_pairs - candidate_pairs) * 1000000) // total_pairs AS rr_ppm,
        |  matches_total, matches_found,
        |  CASE WHEN matches_total = 0 THEN 1000000
        |       ELSE (matches_found * 1000000) // matches_total END AS pc_ppm
        |FROM tot CROSS JOIN cand CROSS JOIN ta CROSS JOIN ti
        |ORDER BY n_parts""".stripMargin,

    "q197_entity_resolution" ->
      """WITH RECURSIVE p AS (
        |  SELECT p_partkey, p_name FROM part
        |  WHERE split_part(p_name, ' ', 1) = 'small'),
        |pr AS (SELECT a.p_partkey AS k1, b.p_partkey AS k2
        |       FROM p a JOIN p b ON a.p_partkey < b.p_partkey
        |       WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9),
        |edges AS (SELECT k1 AS src, k2 AS dst FROM pr
        |          UNION SELECT k2, k1 FROM pr),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (
        |  SELECT src AS id, least(src, min(dst)) AS component
        |  FROM reach GROUP BY src)
        |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
        |  max(id) AS max_id
        |FROM comp GROUP BY 1 ORDER BY component""".stripMargin,

    // Modularity replay: same distinct edge set, nation moments and
    // the SHARED closed form over exact integers.
    "q288_nation_modularity" -> (
      """WITH e AS (
        |  SELECT DISTINCT o_custkey, l_suppkey, c.c_nationkey AS cn,
        |    s.s_nationkey AS sn
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer c ON o_custkey = c.c_custkey
        |  JOIN supplier s ON l_suppkey = s.s_suppkey),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN cn = sn THEN 1 ELSE 0 END) AS BIGINT) AS w
        |  FROM e),
        |dc AS (SELECT cn AS nat, CAST(count(*) AS BIGINT) AS d
        |       FROM e GROUP BY 1),
        |ds AS (SELECT sn AS nat, CAST(count(*) AS BIGINT) AS d
        |       FROM e GROUP BY 1),
        |deg AS (
        |  SELECT coalesce(dc.nat, ds.nat) AS nat,
        |    coalesce(dc.d, 0) + coalesce(ds.d, 0) AS d
        |  FROM dc FULL OUTER JOIN ds ON dc.nat = ds.nat),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nations,
        |    CAST(sum(d * d) AS BIGINT) AS sum_deg_sq
        |  FROM deg)
        |SELECT n_nations, m AS n_edges, w AS within_edges,
        |""".stripMargin +
      s"  round($ModularityText, 6) AS modularity\n" +
      "FROM base CROSS JOIN mom ORDER BY n_edges"),

    // Assortativity replay: same distinct bipartite edges, symmetric
    // orientations, HUGEINT moments and the SHARED Pearson text.
    "q277_degree_assortativity" -> (
      """WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
        |    's' || CAST(l_suppkey AS VARCHAR) AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (
        |  SELECT a, CAST(count(*) AS BIGINT) AS dg
        |  FROM sym GROUP BY a),
        |p AS (
        |  SELECT da.dg AS dx, db.dg AS dy
        |  FROM sym JOIN deg da ON sym.a = da.a
        |  JOIN deg db ON sym.b = db.a),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dx) AS HUGEINT) AS sx,
        |    CAST(sum(dy) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy
        |  FROM p),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(max(dg) AS BIGINT) AS max_degree
        |  FROM deg)
        |SELECT n_nodes, n // 2 AS n_edges, max_degree,
        |""".stripMargin +
      s"  round($AssortText, 6) AS assortativity\n" +
      "FROM mom CROSS JOIN st ORDER BY n_nodes"),

    // HyperBall replay: exact t-hop balls by recursive closure (the
    // q171 d0..d3 shape — viable at test SF, which is the point: the
    // oracle pays the quadratic ball cost the operator exists to
    // avoid), the same md5 bucket/rho registers re-derived from each
    // ball (digit-sum hex replay; length(bin()) bit-length, never
    // float log2), the exact-integer s_int/zeros fold, and the SHARED
    // estimate text interpolated from the operator.
    "q378_hyperball_nf" -> hyperBallOracleSql,

    // Effective-diameter replay: q378's exact-ball census verbatim
    // (nested WITH — the generator is the single source), then the
    // same integer argmin + context-row join.
    "q380_effective_diameter" ->
      (s"WITH hb AS (\n$hyperBallOracleSql\n),\n" +
        """eff AS (
          |  SELECT min(CASE WHEN ratio_vs_final_ppm >= 900000
          |    THEN t END) AS eff_t FROM hb)
          |SELECT hb.t AS eff_diameter_t, hb.n_seeds,
          |  hb.nf_est_milli AS nf_at_t_milli,
          |  hb.ratio_vs_final_ppm AS ratio_at_t_ppm
          |FROM hb, eff WHERE hb.t = eff.eff_t
          |ORDER BY eff_diameter_t""".stripMargin),
  )

  /** q378's oracle builder — the per-t ball/register/census CTEs come
    * from ONE step generator so the four sweep replays cannot drift
    * from each other (the pcaPowerOracleSql convention). */
  private def hyperBallOracleSql: String = {
    def hex(start: Int, len: Int) =
      s"CAST(list_sum(list_transform(range(1, ${len + 1}), i -> " +
        "CAST(strpos('0123456789abcdef', substring(md5(node), " +
        s"$start + i - 1, 1)) - 1 AS DOUBLE) * " +
        s"power(16.0, CAST($len - i AS DOUBLE)))) AS BIGINT)"
    val est = graft.ext.Graphs.HbEstMilliText
    def step(t: Int) =
      s"""b$t AS (
         |  SELECT DISTINCT seed, node FROM (
         |    SELECT seed, node FROM b${t - 1}
         |    UNION ALL
         |    SELECT b.seed, s.dst AS node FROM b${t - 1} b
         |    JOIN sym s ON s.src = b.node))""".stripMargin
    def census(t: Int) =
      s"""rg$t AS (
         |  SELECT m.seed, hr.bucket, max(hr.rho) AS r
         |  FROM b$t m JOIN hr ON hr.node = m.node
         |  GROUP BY m.seed, hr.bucket),
         |ag$t AS (
         |  SELECT seed,
         |    CAST(sum(CAST(power(2.0, 45 - r) AS BIGINT)) AS BIGINT)
         |      + (64 - CAST(count(*) AS BIGINT)) * 35184372088832 AS s_int,
         |    64 - CAST(count(*) AS BIGINT) AS zeros
         |  FROM rg$t GROUP BY seed),
         |cn$t AS (
         |  SELECT CAST($t AS BIGINT) AS t,
         |    CAST(count(*) AS BIGINT) AS n_seeds,
         |    CAST(sum(est_milli) AS BIGINT) AS nf_est_milli
         |  FROM (SELECT seed, $est AS est_milli FROM ag$t))""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
       |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |sym AS (SELECT a AS src, b AS dst FROM e0
       |        UNION SELECT b AS src, a AS dst FROM e0),
       |n AS (SELECT DISTINCT src AS node FROM sym),
       |hr AS (
       |  SELECT node,
       |    CAST(${hex(1, 2)} AS INT) % 64 AS bucket,
       |    CASE WHEN ${hex(3, 11)} = 0 THEN 45
       |      ELSE CAST(45 - length(bin(${hex(3, 11)})) AS INT) END AS rho
       |  FROM n),
       |b0 AS (
       |  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS seed,
       |         's' || CAST(s_suppkey AS VARCHAR) AS node
       |  FROM supplier WHERE s_suppkey <= 4),
       |${step(1)},
       |${step(2)},
       |${step(3)},
       |${census(0)},
       |${census(1)},
       |${census(2)},
       |${census(3)},
       |allr AS (SELECT * FROM cn0 UNION ALL SELECT * FROM cn1
       |         UNION ALL SELECT * FROM cn2 UNION ALL SELECT * FROM cn3),
       |fin AS (SELECT nf_est_milli AS f FROM allr WHERE t = 3)
       |SELECT t, n_seeds, nf_est_milli,
       |  (nf_est_milli * 1000000) // f AS ratio_vs_final_ppm
       |FROM allr, fin ORDER BY t""".stripMargin
  }
}
