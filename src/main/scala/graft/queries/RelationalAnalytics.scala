package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Kernels
import graft.tables.Tables
import Relational.{ElastLnP, ElastLnQ, ElastSlope, TheilTermNano, WoeLn, WoeShare, VolText, PchartP, PchartUcl, PchartLcl,
  ModularityText, AssortText, olsSelect, manifestOracleSql}

/** Business-ANALYTICS / statistics queries: salted aggs + skew joins,
  * robust/winsorized stats, HHI/Gini/Lorenz, OLS, price-volume mix,
  * changepoints, Theil-Sen, WOE/IV, gains, p-charts, Spearman,
  * cadence, ABC.
  *
  * Split from the single Relational object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[Relational]].
  */
object RelationalAnalyticsQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // Salted two-phase aggregation (Kernels.saltedAgg — SURVEY §7.2
    // step 7's skew operator): phase 1 reduces per (key, salt16) so a
    // hot key spreads over 16 reducers, phase 2 merges the tiny
    // partials. l_returnflag has 3 values over 60k rows — exactly the
    // low-cardinality/hot-group shape that straggles an unsalted
    // exchange at 100 TB when per-group state is wide. The output
    // must equal the plain groupBy row for row, which is what the
    // oracle checks; the balance win is spec-measured
    // (KernelsSpec "saltedAgg").
    "q128_salted_agg" -> ((s, d) =>
      Kernels.saltedAgg(
          Tables.lineitem(s, d).select("l_returnflag", "l_quantity",
            "l_extendedprice", "l_orderkey", "l_linenumber"),
          keys = Seq("l_returnflag"), saltBuckets = 16,
          aggs = Seq(
            ("count", "*", "n_rows"),
            ("sum", "l_quantity", "__sq"),
            ("avg", "l_extendedprice", "__ap"),
            ("min", "l_extendedprice", "__mn"),
            ("max", "l_extendedprice", "__mx")))
        .select(col("l_returnflag"), col("n_rows"),
          round(col("__sq"), 2).as("sum_qty"),
          round(col("__ap"), 6).as("avg_price"),
          round(col("__mn"), 2).as("min_price"),
          round(col("__mx"), 2).as("max_price"))
        .orderBy("l_returnflag")),

    // Salted aggregation on a DELIBERATELY hot key (r12 verdict #5:
    // q128/q138 salt near-uniform testdata keys, so the balance claim
    // was measured only on synthetic spec rows). Here 3 of every 4
    // users collapse onto ONE key — a 75%-mass hot group, the
    // power-law shape of a real event stream — while the rest stay
    // per-user (~375 cold keys). Phase 1 spreads the hot key over 32
    // (key, salt) reducers, phase 2 merges the partials; KernelsSpec
    // measures rows-per-partition on THIS key shape over the real
    // events table. Equality with the plain group-by is the oracle.
    // Sums ride exact cents (salted float sums would reassociate);
    // min/max are raw doubles — order-independent, bit-equal across
    // engines.
    "q202_salted_hot_key" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        when(col("user_id") % 4 =!= 0, lit("hot"))
          .otherwise(concat(lit("u"), col("user_id").cast("string"))).as("k"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        col("value"), col("event_id"))
      Kernels.saltedAgg(ev, keys = Seq("k"), saltBuckets = 32,
          aggs = Seq(
            ("count", "*", "n_rows"),
            ("sum", "cents", "sum_cents"),
            ("min", "value", "min_value"),
            ("max", "value", "max_value")))
        .orderBy("k")
    }),

    // Salted skew JOIN (Kernels.skewSafeJoin — the join sibling of
    // q128's salted aggregation): lineitem's 3-value l_returnflag is
    // the textbook hot join key; the left side salts
    // deterministically over 8 sub-keys and the dim replicates 8x,
    // so each hot key's rows spread over 8 tasks instead of one
    // straggler when the dim is too big to broadcast and the
    // exchange is reused (AQE skew-join can't help there). Output
    // must equal the plain inner join, which the oracle replays; the
    // per-partition balance win is spec-measured (KernelsSpec).
    "q138_skew_join" -> ((s, d) => {
      import s.implicits._
      val dim = Seq(("A", "returned"), ("N", "in_flight"), ("R", "refunded"))
        .toDF("l_returnflag", "flag_label")
      Kernels.skewSafeJoin(
          Tables.lineitem(s, d).select("l_returnflag", "l_quantity",
            "l_extendedprice", "l_orderkey", "l_linenumber"),
          dim, Seq("l_returnflag"), saltBuckets = 8)
        .groupBy("l_returnflag", "flag_label")
        .agg(count(lit(1)).as("n_rows"),
             round(sum("l_quantity"), 2).as("sum_qty"),
             round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q9-shaped 5-table join — the optimizer stress the
    // single-join queries never apply: part (filtered) ⋈ lineitem ⋈
    // supplier ⋈ orders ⋈ nation, profit aggregated per nation/year.
    // Catalyst broadcast-joins the three small dims and reorders
    // around the lineitem⋈orders shuffle; the part filter prunes
    // before the join (pushdown). Sums sit on the 4dp grid
    // (price×(1-disc) = 2dp×2dp), so the emit rounds at 4dp — a 2dp
    // round meets exact 4dp halves (observed at sf0.01: last-cent
    // flips), the q14 rule.
    "q166_profit_by_nation" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("a")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
                 year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
               .as("profit"),
             count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), col("o_year").desc)),

    // The analytic-window ladder in one pass: rank / dense_rank /
    // percent_rank / cume_dist / ntile(4) over customers by account
    // balance within segment — every rank-family function sharing ONE
    // window exchange. percent_rank and cume_dist are small-
    // denominator rationals, so they emit as FLOORED ppm (the q142
    // rule), never round().
    "q167_rank_ladder" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc,
        col("c_custkey"))
      Tables.customer(s, d)
        .filter(col("c_custkey") < 200)
        .select(col("c_mktsegment").as("segment"), col("c_custkey"),
          col("c_acctbal"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          floor(percent_rank().over(w) * 1000000.0).cast("long")
            .as("pct_rank_ppm"),
          floor(cume_dist().over(w) * 1000000.0).cast("long")
            .as("cume_dist_ppm"),
          ntile(4).over(w).as("quartile"))
        .orderBy("segment", "rnk", "c_custkey")
    }),

    // Share-shift report — the BI staple: each segment's share of
    // monthly revenue (floor-ppm of exact 2dp-grid cents sums — the
    // revenue ratio never round()s) and its month-over-month delta
    // via lag over the tiny (month x segment) frame. Revenue sums in
    // CENTS (exact integers) so the shares divide exact ints.
    "q157_share_shift" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
                 col("c_mktsegment").as("segment"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val w = Window.partitionBy("segment").orderBy("month")
      m.join(broadcast(m.groupBy("month").agg(sum("cents").as("__tot"))),
          "month")
        .select(col("month"), col("segment"),
          floor(col("cents") * 1000000.0 / col("__tot")).cast("long")
            .as("share_ppm"))
        .withColumn("shift_ppm",
          col("share_ppm") - lag("share_ppm", 1).over(w))
        .orderBy("month", "segment")
    }),

    // Robust statistics per group: deterministic MODE (count desc,
    // value asc — never an engine's unspecified-tie mode()), exact
    // interpolated MEDIAN, and MAD (median absolute deviation) — the
    // outlier-resistant siblings of q39's moment stats. Rounding is
    // half-safe: l_extendedprice sits on the 2dp grid, so its median
    // is on the 0.005 grid (3 decimals, exact at 4dp) and the MAD of
    // |x - median| is on the 0.0025 grid (4 decimals, exact at 6dp).
    // Two aggregate passes (median, then deviations) + the mode
    // argmax — each one exchange on the group key.
    //
    // SCALE NOTE: both percentile probes ride
    // Kernels.groupQuantilesWide. This driver row keeps the default
    // exact = true (its oracle needs the interpolated value; the
    // exact path emits percentile() unrounded, so the route-through
    // is bit-identical) — but exact percentile() buffers every group
    // value in executor memory (TypedImperativeAggregate): fine on 4
    // flags at audit SFs, an OOM risk on heavy groups at 100 TB,
    // where the SAME call flips to exact = false (additive histogram
    // counters + in-bucket interpolation, within one bucket width of
    // exact — both modes spec-pinned against each other in
    // KernelsSpec).
    "q149_robust_stats" -> ((s, d) => {
      // r22 (r21 verdict item 7 — guide §5/§2.4): the scan is STAGED so
      // the three consumers (median pass, MAD deviation pass, mode
      // pass) read one InMemoryRelation instead of three parquet-rooted
      // chains, and the 4-row median frame is staged so its exact
      // percentile aggregate — which buffers and sorts ~200k values per
      // group — runs ONCE instead of twice (it fed both the MAD chain
      // and the final join as separate subtrees). Values unchanged:
      // staging reorders nothing and percentile() is deterministic.
      val li = graft.ops.Staging.stage(Tables.lineitem(s, d)
        .select("l_returnflag", "l_quantity", "l_extendedprice"))
      val med = graft.ops.Staging.stage(
        Kernels.groupQuantilesWide(li, "l_returnflag",
          "l_extendedprice", Seq(0.5 -> "__med")))
      val mad = Kernels.groupQuantilesWide(
        li.join(broadcast(med), "l_returnflag")
          .select(col("l_returnflag"),
            abs(col("l_extendedprice") - col("__med")).as("__dev")),
        "l_returnflag", "__dev", Seq(0.5 -> "__mad"))
      val byFlag = Window.partitionBy("l_returnflag")
      val w = byFlag.orderBy(col("__cnt").desc, col("l_quantity"))
      // n_rows rides the mode pass's exchange (sum of the per-value
      // counts over the same partitioning — no extra shuffle)
      val mode = li.groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("n_rows", sum("__cnt").over(byFlag))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("l_returnflag"), col("n_rows"),
                col("l_quantity").as("mode_qty"),
                col("__cnt").as("mode_count"))
      med.join(mad, "l_returnflag").join(mode, "l_returnflag")
        .select(col("l_returnflag"), col("n_rows"),
                col("mode_qty"), col("mode_count"),
                round(col("__med"), 4).as("median_price"),
                round(col("__mad"), 6).as("mad_price"))
        .orderBy("l_returnflag")
    }),

    // Supplier concentration per nation — the Herfindahl–Hirschman
    // index in EXACT integer arithmetic: revenue shares in basis
    // points ((cents*10000) div total — integer floor division, both
    // engines), HHI = sum of squared bp (≤ 10^8, overflow-free). A
    // market/portfolio concentration gate with zero float anywhere.
    "q170_supplier_hhi" -> ((s, d) => {
      val c = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey")
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
          .as("c"))
      val t = c.groupBy("s_nationkey")
        .agg(sum("c").as("tot"), count(lit(1)).as("n_suppliers"))
      c.join(t, "s_nationkey")
        .withColumn("bp", expr("(c * 10000) div tot"))
        .groupBy("s_nationkey", "n_suppliers")
        .agg(sum(col("bp") * col("bp")).as("hhi_bp2"))
        .join(Tables.nation(s, d),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n_suppliers"),
                col("hhi_bp2"))
        .orderBy("nation")
    }),

    // 2-D skyline (Kernels.skyline2d): the Pareto frontier of parts
    // under (minimize retail price, maximize size) — the best
    // price/capability trade-offs, with how many parts sit on each
    // frontier point. Distributed as the two-phase prefix-max sweep
    // (never a single-partition global window, never the O(n²)
    // dominance join); the oracle replays the same frontier with an
    // ordered window over the distinct value pairs. Exact
    // integers/input doubles only — no rounding contract needed.
    "q172_pareto_skyline" -> ((s, d) =>
      Kernels.skyline2d(Tables.part(s, d), "p_retailprice", "p_size")
        .withColumnRenamed("n_rows", "n_parts")
        .orderBy("p_retailprice")),

    // Pairwise Pearson correlation matrix of the lineitem measures in
    // long form — the feature-screening pass before any model
    // training (which measure pairs are redundant, which carry
    // signal). ONE aggregate pass computes all 6 upper-triangle
    // coefficients (no per-pair scans), then stack() unpivots to
    // (var_a, var_b, pearson_r). 6dp rounding absorbs the co-moment
    // merge-order ulp (the q39 stats contract).
    "q174_corr_matrix" -> ((s, d) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield (cols(i), cols(j))
      val aggs = pairs.map { case (x, y) =>
        round(corr(col(x), col(y)), 6).as(s"${x}__$y") }
      val entries = pairs.map { case (x, y) =>
        struct(lit(x).as("var_a"), lit(y).as("var_b"),
               col(s"${x}__$y").as("pearson_r")) }
      Tables.lineitem(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(entries: _*)).as("kv"))
        .select("kv.*")
        .orderBy("var_a", "var_b")
    }),

    // Winsorized group statistics — the outlier-clipping feature
    // scaler: per return flag, clip l_extendedprice into its
    // [p05, p95] band and report the clipped-tail counts and the
    // winsorized mean. Percentiles are the exact interpolated form
    // (the q149 contract: both engines compute (n-1)*p linear
    // interpolation); p05/p95 sit on the 0.01/20 value grid (fraction
    // of the 2dp grid = k/20 steps), ≤ 4 decimals, so 6dp rounding
    // can never land on a half. Two aggregate passes (percentiles,
    // then clip+mean), each one exchange on the group key. The clip
    // thresholds ride Kernels.groupQuantilesWide (exact = true here —
    // bit-identical to inlined percentile(); at 100 TB the same call
    // flips to exact = false — the q149 scale note; a winsorization
    // band only needs bucket-width precision).
    "q175_winsorized_stats" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      val pct = Kernels.groupQuantilesWide(li, "l_returnflag",
        "l_extendedprice", Seq(0.05 -> "__p05", 0.95 -> "__p95"))
      li.join(pct, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
             sum(when(col("l_extendedprice") < col("__p05"), 1L).otherwise(0L))
               .as("n_clipped_low"),
             sum(when(col("l_extendedprice") > col("__p95"), 1L).otherwise(0L))
               .as("n_clipped_high"),
             round(avg(least(greatest(col("l_extendedprice"), col("__p05")),
                             col("__p95"))), 6).as("mean_winsorized"),
             round(first(col("__p05")), 6).as("p05"),
             round(first(col("__p95")), 6).as("p95"))
        .orderBy("l_returnflag")
    }),

    // Gini coefficient of customer revenue — the inequality/
    // concentration audit (q170's HHI measures supplier share; Gini
    // measures the whole distribution). Needs every value's rank in
    // the GLOBAL ascending order: that is Kernels.denseIndex (range
    // partition + zipWithIndex), never a single-partition window.
    // Ranks are 1-based; ties in `cents` are harmless because equal
    // values make sum(i*x) invariant under any assignment of the
    // consecutive tied index block. Rank-weighted sums ride
    // decimal(38,0) (exact at ANY scale — Long S1 would overflow
    // near 10^9 customers); the final ratio is computed in double
    // from identical exact integers by identical IEEE ops on both
    // engines, so 6dp rounding is stable.
    "q182_gini_revenue" -> ((s, d) => {
      val cents = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      Kernels.denseIndex(cents, "cents", "__i0")
        .agg(count(lit(1)).as("__n"),
             sum(col("cents").cast("decimal(38,0)")).as("__s0"),
             sum((col("__i0") + 1).cast("decimal(38,0)") *
                 col("cents").cast("decimal(38,0)")).as("__s1"))
        .select(col("__n").as("n_customers"),
          col("__s0").cast("long").as("total_cents"),
          round((lit(2.0) * col("__s1").cast("double") -
                 (col("__n") + 1).cast("double") * col("__s0").cast("double")) /
                (col("__n").cast("double") * col("__s0").cast("double")), 6)
            .as("gini"))
        .orderBy("n_customers")
    }),

    // Out-of-fold target encoding — the leakage-safe categorical
    // feature: each (category, fold) cell's encoding is the target
    // mean computed from the OTHER folds only
    // ((cat_total - fold_total) / (cat_n - fold_n)), so a row never
    // sees its own fold's statistics. Folds are the deterministic
    // content-hash bands of Sampling.withFold (stable across runs,
    // engines and corpus growth); totals are exact integer cents and
    // the encoding is an integer floor division — zero float
    // anywhere. One exchange on (category, fold), then a
    // category-level rollup joined back (both frames category-sized).
    "q188_oof_target_encoding" -> ((s, d) => {
      val folded = graft.ext.Sampling.withFold(
          Tables.orders(s, d), col("o_orderkey"),
          folds = Seq("f0" -> 1.0 / 3, "f1" -> 1.0 / 3, "f2" -> 1.0 / 3),
          salt = "te")
        .select(col("o_orderpriority").as("category"), col("fold"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("__c"))
      // staged: the category rollup and the join both read it
      val cell = graft.ops.Staging.stage(
        folded.groupBy("category", "fold")
          .agg(count(lit(1)).as("n_rows"), sum("__c").as("__fc")))
      val cat = cell.groupBy("category")
        .agg(sum("n_rows").as("__cn"), sum("__fc").as("__cc"))
      cell.join(cat, "category")
        .select(col("category"), col("fold"), col("n_rows"),
          when(col("__cn") === col("n_rows"), lit(null).cast("long"))
            .otherwise(expr("(__cc - __fc) div (__cn - n_rows)"))
            .as("oof_mean_cents"))
        .orderBy("category", "fold")
    }),

    // Lorenz curve by customer decile — q182's Gini as a readable
    // table: customers ranked ascending by revenue (denseIndex again,
    // never a global window), cut into 10 equal-population deciles,
    // each decile's revenue share and the cumulative share in exact
    // integer ppm. The running total is a 10-row window over the
    // decile rollup — tiny by construction.
    "q190_lorenz_deciles" -> ((s, d) => {
      val cents = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val idx = Kernels.denseIndex(cents, "cents", "__i0")
      val tot = idx.agg(count(lit(1)).as("__n"), sum("cents").as("__tot"))
      val dec = idx.crossJoin(broadcast(tot))
        .select(expr("(__i0 * 10) div __n").as("decile"), col("cents"),
                col("__tot"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum("cents").as("__dc"),
             first("__tot").as("__tot"))
      val wCum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      dec
        .withColumn("__cum", sum(col("__dc")).over(wCum))
        .select(col("decile"), col("n_customers"),
          expr("(__dc * 1000000) div __tot").as("share_ppm"),
          expr("(__cum * 1000000) div __tot").as("cum_share_ppm"))
        .orderBy("decile")
    }),

    // Price-volume-mix decomposition of the 1996 -> 1997 revenue
    // change per supplier nation: volume effect = Δqty at the old
    // average price (integer floor division), price effect = the
    // exact remainder — the two effects sum EXACTLY to Δrevenue by
    // construction, the property float decompositions lose. One
    // exchange on (nation, year) then a nation-sized pivot.
    "q191_price_volume_mix" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
                expr("l_shipdate < timestamp'1998-01-01'"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"),
                 year(col("l_shipdate")).as("__yr"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
               .as("__r"),
             sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("__q"))
      val pv = base.groupBy("s_nationkey")
        .agg(sum(when(col("__yr") === 1996, col("__r"))).as("r1"),
             sum(when(col("__yr") === 1996, col("__q"))).as("q1"),
             sum(when(col("__yr") === 1997, col("__r"))).as("r2"),
             sum(when(col("__yr") === 1997, col("__q"))).as("q2"))
      pv.join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          (col("r2") - col("r1")).as("delta_cents"),
          expr("((q2 - q1) * r1) div q1").as("volume_effect_cents"),
          (col("r2") - col("r1") - expr("((q2 - q1) * r1) div q1"))
            .as("price_effect_cents"))
        .orderBy("nation")
    }),

    // Multi-feature linear regression by NORMAL EQUATIONS — the
    // at-scale training pattern: the whole fit collapses to ONE
    // aggregation of exact integer sufficient statistics (9 sums,
    // decimal(38,0) — exact at any corpus size, order-independent),
    // then a closed-form 3×3 Cramer solve on the driver-sized row.
    // y = price-cents ~ β0 + β1·quantity + β2·discount-bps. The
    // solve expression TEXT is shared verbatim with the oracle
    // ([[olsSelect]]), so every IEEE operation matches and the
    // 6dp-rounded betas and R² hash. q99's single-feature trend OLS
    // is the 2×2 special case; this is the general shape a 100-TB
    // featurized table trains with (no gradient loop, one exchange).
    "q218_ols_normal_eq" -> ((s, d) => {
      val t = Tables.lineitem(s, d).select(
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x1"),
        expr("CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)").as("x2"))
      def dec(c: String) = col(c).cast("decimal(38,0)")
      t.agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(dec("x1")).as("s1"), sum(dec("x2")).as("s2"),
          sum(dec("x1") * dec("x1")).as("s11"),
          sum(dec("x1") * dec("x2")).as("s12"),
          sum(dec("x2") * dec("x2")).as("s22"),
          sum(dec("y")).as("sy"),
          sum(dec("x1") * dec("y")).as("s1y"),
          sum(dec("x2") * dec("y")).as("s2y"),
          sum(dec("y") * dec("y")).as("syy"))
        .selectExpr(olsSelect: _*)
        .orderBy("n_rows")
    }),

    // SPLIT-CONFORMAL prediction interval (Vovk et al.; Lei et al.
    // 2018 — the distribution-free coverage wrapper modern ML evals
    // put around any point model): fit OLS price~quantity on the
    // par=0 third (q218's exact decimal sums -> shared closed form),
    // take qhat = the ceil(0.9*(nc+1))-th smallest absolute residual
    // on the par=1 calibration third (a k-th ORDER STATISTIC — via
    // Kernels.denseIndex's range-sort + zipWithIndex, never a global
    // window), and audit the guaranteed >= 90% coverage of
    // prediction +- qhat on the untouched par=2 third. Every float
    // comes from shared-text expressions over exact integers; k and
    // the coverage census are pure integers.
    "q334_conformal_interval" -> ((s, d) => {
      val t = graft.ops.Staging.stage(Tables.lineitem(s, d).select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        pmod(col("l_orderkey"), lit(3L)).as("par"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x")))
      def dec(c: String) = col(c).cast("decimal(38,0)")
      val sums = t.filter(col("par") === 0).agg(
          count(lit(1)).cast("decimal(38,0)").as("nf"),
          sum(dec("x")).as("s1"), sum(dec("y")).as("sy"),
          sum(dec("x") * dec("x")).as("s11"),
          sum(dec("x") * dec("y")).as("s1y"))
        .withColumn("b", expr(ConfSlope))
        .withColumn("a", expr(ConfIntercept))
        .select(col("nf").cast("long").as("n_fit"), col("b"), col("a"))
      val calib = graft.ops.Staging.stage(
        t.filter(col("par") === 1).crossJoin(broadcast(sums))
          .select(col("rid"), expr(ConfAbsResid).as("ar")))
      val kF = calib.agg(count(lit(1)).as("nc"))
        .select(col("nc"), expr("(9 * (nc + 1) + 9) div 10").as("k"))
      val qhat = graft.ops.Kernels.denseIndex(calib,
          Seq(col("ar"), col("rid")), "idx")
        .crossJoin(broadcast(kF))
        .filter(col("idx") === col("k") - 1)
        .select(col("nc"), col("k"), col("ar").as("qhat"))
      val test = t.filter(col("par") === 2).crossJoin(broadcast(sums))
        .select(expr(ConfAbsResid).as("art"))
      test.crossJoin(broadcast(qhat))
        .groupBy("nc", "k", "qhat")
        .agg(count(lit(1)).as("n_test"),
             sum(when(col("art") <= col("qhat"), 1L).otherwise(0L))
               .as("covered"))
        .crossJoin(broadcast(sums))
        .select(col("n_fit"), col("nc").as("n_calib"), col("k"),
          col("n_test"), col("covered"),
          round(col("qhat"), 6).as("qhat_cents"),
          expr("(covered * 1000000) div n_test").as("coverage_ppm"),
          round(col("b"), 6).as("slope"), round(col("a"), 6).as("intercept"))
        .orderBy("n_calib")
    }),

    // Share-of-parent hierarchical rollup — the BI drill-down every
    // revenue report ships (nation as % of region, region as % of
    // world) that plain ROLLUP totals don't directly give: the child
    // level joins its parent's total back (broadcast — parent frames
    // are hierarchy-sized). Exact cents and floor-ppm shares at both
    // levels; every join key is a tiny dimension.
    "q279_share_of_parent" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val byRegion = rev.groupBy("r_name")
        .agg(sum("cents").as("__rc"))
      val total = byRegion.agg(sum("__rc").as("__tc"))
      rev.join(broadcast(byRegion), "r_name")
        .crossJoin(broadcast(total))
        .select(col("r_name"), col("n_name"), col("cents"),
          expr("(cents * 1000000) div __rc").as("share_of_region_ppm"),
          expr("(__rc * 1000000) div __tc").as("region_share_ppm"))
        .orderBy("r_name", "n_name")
    }),

    // Binary-segmentation changepoint (first split) over the daily
    // revenue series — "when did the level shift?", the offline twin
    // of q158's sequential CUSUM: the split day maximizes the
    // absolute gap between the left and right mean, the first
    // recursion step of binary segmentation (Scott & Knott 1974).
    // Everything decisive is exact integers: daily cents, prefix sums
    // via the range-partitioned Kernels.prefixSum (NEVER a
    // single-partition global window), means as floor-ppm integers
    // (both operands positive — the div-vs-// trap never applies),
    // argmax by (gap desc, day) TakeOrdered. The day frame is bounded
    // by the calendar, not the corpus.
    "q282_changepoint_binseg" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(expr("date_format(o_orderdate, 'yyyy-MM-dd')").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
               .as("cents"))
      val cum = Kernels.prefixSum(
        daily.select(col("day"), col("cents"), lit(1L).as("one")),
        Seq(col("day").asc), Seq("cents", "one"))
      val tot = cum.agg(max("one_cum").as("n"), max("cents_cum").as("s"))
      cum.crossJoin(broadcast(tot))
        .filter(col("one_cum") < col("n"))
        .select(col("day").as("split_day"), col("one_cum").as("left_days"),
          expr("(cents_cum * 1000000) div one_cum").as("mean_left_ppm"),
          expr("((s - cents_cum) * 1000000) div (n - one_cum)")
            .as("mean_right_ppm"),
          abs(expr("(cents_cum * 1000000) div one_cum") -
              expr("((s - cents_cum) * 1000000) div (n - one_cum)"))
            .as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("split_day"))
        .limit(1)
    }),

    // Revenue-rank churn between period halves — "the biggest movers
    // in the rankings" (q272's WoW movers count events; this ranks a
    // CATALOG and measures rank displacement, the merchandising /
    // popularity-drift view): parts ranked by revenue within each
    // half of the order-date span (exact cents, the range-partitioned
    // denseIndex total order with part-key tie-break), inner-joined
    // on the part, top-10 by |rank delta| with integer tie-breaks.
    // Rank frames are catalog-bounded.
    "q284_rank_churn" -> ((s, d) => {
      val base = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"),
            expr("datediff(to_date(o_orderdate), DATE'1990-01-01')")
              .as("__us"),
            expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 " +
              "+ 0.5) AS BIGINT)").as("__c")))
      val mid = base.agg(
        expr("(min(__us) + max(__us)) div 2").as("__mid"))
      val halves = graft.ops.Staging.stage(
        base.crossJoin(broadcast(mid))
          .groupBy("l_partkey")
          .agg(sum(when(col("__us") < col("__mid"), col("__c"))
                 .otherwise(0L)).as("c1"),
               sum(when(col("__us") >= col("__mid"), col("__c"))
                 .otherwise(0L)).as("c2")))
      def ranked(c: String, out: String) = Kernels.denseIndex(
          halves.filter(col(c) > 0).select(col("l_partkey"), col(c)),
          Seq(col(c).desc, col("l_partkey").asc), out)
        .select(col("l_partkey"), (col(out) + 1L).as(out))
      ranked("c1", "r1").join(ranked("c2", "r2"), Seq("l_partkey"))
        .select(col("l_partkey"), col("r1"), col("r2"),
          (col("r2") - col("r1")).as("rank_delta"))
        .orderBy(abs(col("rank_delta")).desc, col("l_partkey"))
        .limit(10)
    }),

    // Weight-of-evidence / information value of order priority as a
    // predictor of returns — the credit-scoring feature diagnostic
    // (Siddiqi 2006) a feature store runs before one-hot-ing a
    // categorical: WOE_c = ln((good_c·B)/(bad_c·G)) per level in
    // floored nano-nats (exact integer ratio inside the one ln — the
    // q257 discipline), IV contribution as the floored-nano product
    // term summed over levels by the READER (each row carries its own
    // term; no cross-row double sum). Good = lineitem not returned.
    "q293_woe_iv" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
               .as("n_good"),
             sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
               .as("n_bad"))
      val tot = base.agg(sum("n_good").as("tg"), sum("n_bad").as("tb"))
      base.crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("n_good"), col("n_bad"),
          expr(s"CAST(floor(1000000000.0 * $WoeLn) AS BIGINT)")
            .as("woe_nano"),
          expr("CAST(floor(1000000000.0 * " +
            s"($WoeShare) * $WoeLn) AS BIGINT)")
            .as("iv_term_nano"))
        .orderBy("o_orderpriority")
    }),

    // 7-day rolling volatility of daily revenue — the risk/ops trend
    // band over the calendar-bounded day frame (q229's rolling-median
    // convention): exact integer daily cents, window moment sums
    // (Σ, Σ² in decimal(38,0) — cents² at lake scale exceeds long),
    // sample stddev by ONE shared closed form. The window is over the
    // day GRID — bounded by the calendar, never corpus rows.
    "q295_rolling_volatility" -> ((s, d) => {
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      Tables.orders(s, d)
        .groupBy(expr("date_format(o_orderdate, 'yyyy-MM-dd')").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
        .select(col("day"), col("cents"),
          count(lit(1)).over(w).as("n7"),
          sum("cents").over(w).as("s7"),
          sum(col("cents").cast("decimal(38,0)") *
              col("cents").cast("decimal(38,0)")).over(w).as("ss7"))
        .filter(col("n7") === 7)
        // floor, not round(…, 6): the stddev's integer part has 9+
        // digits at sf0.1, where a 6dp decimal rounding needs 15+
        // significant digits — past the point where Spark's
        // BigDecimal HALF_UP and DuckDB's double rounding agree on
        // the last digit (measured ±1e-6 flips). floor() operates on
        // the identical shared-text double directly — exact on both.
        .select(col("day"), col("cents"), col("s7"),
          expr(s"CAST(floor($VolText) AS BIGINT) AS vol_cents_floor"))
        .orderBy("day")
    }),

    // Monthly price percentile BANDS — the percentile TIME SERIES an
    // SLO/pricing dashboard tracks (q40 is one global snapshot):
    // p25/p50/p75/p90 of order value per calendar month, every
    // percentile routed through Kernels.groupQuantilesWide — at
    // 100 TB the same call flips exact=false onto the additive
    // histogram estimate (the q149 dial). Month groups are
    // calendar-bounded; 4dp rounding on ~6-digit values is inside
    // double↔decimal fidelity (the q40 convention).
    "q296_monthly_price_bands" -> ((s, d) => {
      val pr = Tables.orders(s, d)
        .select(expr("date_format(o_orderdate, 'yyyy-MM')").as("month"),
                col("o_totalprice"))
      Kernels.groupQuantilesWide(pr, "month", "o_totalprice",
          Seq(0.25 -> "__p25", 0.5 -> "__p50", 0.75 -> "__p75",
              0.9 -> "__p90"))
        .select(col("month"),
          round(col("__p25"), 4).as("p25"), round(col("__p50"), 4).as("p50"),
          round(col("__p75"), 4).as("p75"), round(col("__p90"), 4).as("p90"))
        .orderBy("month")
    }),

    // Theil–Sen robust trend slope of daily revenue — the
    // outlier-immune replacement for q99's OLS trend (median of all
    // pairwise slopes; breakdown point 29%): day indices off the
    // range-partitioned denseIndex (calendar-bounded), the pair frame
    // is days² (bounded by the calendar SQUARED, never corpus rows),
    // each slope one exact-integer division — identical doubles on
    // both engines — and the median interpolates identical doubles.
    // Emitted as floor micro-cents/day (the q295 rule: a 6dp round at
    // this magnitude would exceed double↔decimal fidelity; floor of
    // an identical double is exact).
    // Seasonal-naive forecast backtest with MASE (Hyndman & Koehler
    // 2006): forecast day t's revenue as day t-7's; the error scale is
    // the in-sample naive-1 (previous-day) MAE. Both error sums are
    // exact cents over date-keyed self-joins (a missing calendar day
    // drops identically on both sides); the one float is the final
    // shared-text ratio of two integer averages. The lag-1 window runs
    // over the CALENDAR-DAY frame (the q282 convention), never corpus
    // rows.
    // Price elasticity of demand: OLS slope of ln(monthly quantity)
    // on ln(monthly unit price) — the log-log regression whose slope
    // IS the elasticity. Each month's x/y logs floor to exact
    // nano-units (the q314 rule), moments sum in decimal(38,0) with
    // operands cast BEFORE the product (the q295/q300 envelope: nano
    // logs reach ~25e9, so a Long product would wrap), and the slope
    // is one shared-text double expression over the exact moments.
    // Months are calendar-bounded.
    "q315_price_elasticity" -> ((s, d) => {
      val monthly = Tables.lineitem(s, d)
        .groupBy(expr("date_format(l_shipdate, 'yyyy-MM')").as("m"))
        .agg(sum(expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"))
               .as("cq"),
             sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
               .as("pc"))
        .select(
          expr(s"CAST(floor($ElastLnP) AS BIGINT)").as("xn"),
          expr(s"CAST(floor($ElastLnQ) AS BIGINT)").as("yn"))
      monthly.agg(count(lit(1)).as("n"),
          sum(col("xn").cast("decimal(38,0)")).as("sx"),
          sum(col("yn").cast("decimal(38,0)")).as("sy"),
          sum(col("xn").cast("decimal(38,0)") * col("yn").cast("decimal(38,0)")).as("sxy"),
          sum(col("xn").cast("decimal(38,0)") * col("xn").cast("decimal(38,0)")).as("sxx"))
        .selectExpr("n AS n_months", s"round($ElastSlope, 6) AS elasticity")
        .orderBy("n_months")
    }),

    // RFM-segment MIGRATION matrix between order-date halves — the
    // drift view on top of q219's static segmentation: each customer's
    // frequency segment (1 / 2-3 / 4+ orders) before vs after the
    // 1995-01-01 pivot; counts per (seg_before, seg_after) over
    // customers active in BOTH halves. Exact integers, two bounded
    // aggregates and one node-sized join.
    "q316_rfm_migration" -> ((s, d) => {
      def seg(cnt: Column) = when(cnt >= 4, "4+")
        .when(cnt >= 2, "2-3").otherwise("1")
      val o = Tables.orders(s, d)
      val before = o.filter(col("o_orderdate") < lit("1995-01-01"))
        .groupBy("o_custkey").agg(count(lit(1)).as("cb"))
      val after = o.filter(col("o_orderdate") >= lit("1995-01-01"))
        .groupBy("o_custkey").agg(count(lit(1)).as("ca"))
      before.join(after, "o_custkey")
        .groupBy(seg(col("cb")).as("seg_before"),
                 seg(col("ca")).as("seg_after"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("seg_before", "seg_after")
    }),

    "q313_seasonal_naive_mase" -> ((s, d) => {
      val daily = graft.ops.Staging.stage(
        Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("cents")))
      val wk = daily.join(
        daily.select(date_add(col("day"), 7).as("day"),
          col("cents").as("c7")), "day")
        .agg(count(lit(1)).as("n7"),
             sum(abs(col("cents") - col("c7"))).as("s7"))
      val wDay = Window.orderBy("day")
      val nv = daily
        .withColumn("prev", lag("cents", 1).over(wDay))
        .filter(col("prev").isNotNull)
        .agg(count(lit(1)).as("n1"),
             sum(abs(col("cents") - col("prev"))).as("s1"))
      wk.crossJoin(broadcast(nv))
        .select(col("n7").as("n_eval_days"), col("s7").as("abs_err7_cents"),
          col("n1").as("n_naive_days"), col("s1").as("abs_err1_cents"),
          expr("round((CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE)) / " +
            "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6)").as("mase"))
        .orderBy("n_eval_days")
    }),

    // Theil inequality index over customer revenue (the entropy
    // sibling of q182's Gini): T = (1/n) * sum (x/mu) ln(x/mu), with
    // x/mu written as the exact-integer ratio x*n/t so both engines
    // run the identical IEEE sequence; per-customer terms floor to
    // nano-nats and SUM EXACTLY (the q257/q314 floored-integer rule),
    // so the hash carries no float-summation order sensitivity. The
    // 1/n normalization stays with the reader (n is a column).
    "q314_theil_index" -> ((s, d) => {
      val cust = graft.ops.Staging.stage(
        Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("x")))
      val tot = cust.agg(count(lit(1)).as("n"), sum("x").as("t"))
      cust.crossJoin(broadcast(tot))
        .groupBy("n", "t")
        .agg(sum(expr(s"CAST(floor($TheilTermNano) AS BIGINT)"))
          .as("theil_nano_sum"))
        .select(col("n").as("n_customers"), col("t").as("total_cents"),
          col("theil_nano_sum"))
        .orderBy("n_customers")
    }),

    "q297_theil_sen" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(expr("date_format(o_orderdate, 'yyyy-MM-dd')").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val idx = graft.ops.Staging.stage(
        Kernels.denseIndex(daily, Seq(col("day")), "t"))
      val a = idx.select(col("t").as("t1"), col("cents").as("c1"))
      val b = idx.select(col("t").as("t2"), col("cents").as("c2"))
      // broadcast one day-frame side: both are calendar-bounded, so
      // the pair build is a map-side nested-loop expansion of the
      // scanned side — never a partitioned cross join
      val slopes = a.crossJoin(broadcast(b)).filter(col("t2") > col("t1"))
        .select(expr("CAST(c2 - c1 AS DOUBLE) / CAST(t2 - t1 AS DOUBLE)")
          .as("__s"))
      // median via distributed SORT + rank pick, never percentile():
      // exact percentile buffers every distinct double in a boxed
      // hash map and sorts them single-threaded at eval — measured
      // 9.5 s over the 2.9M slopes where the sort-rank path is ~1 s.
      // Rank assignment among EQUAL slopes is order-invariant here
      // (rank selection reads the VALUE), so the single-column
      // denseIndex contract applies. The interpolation replays
      // quantile_cont's formula on the identical picked doubles.
      val nDays = idx.agg(max("t")).head().getLong(0) + 1
      val nPairs = nDays * (nDays - 1) / 2
      val pos = 0.5 * (nPairs - 1).toDouble
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      val frac = pos - lo // exactly 0.0 or 0.5
      Kernels.denseIndex(slopes, Seq(col("__s").asc), "__r")
        .filter(col("__r") === lo || col("__r") === hi)
        .agg(min(when(col("__r") === lo, col("__s"))).as("__lov"),
             min(when(col("__r") === hi, col("__s"))).as("__hiv"))
        .select(lit(nPairs).as("n_pairs"),
          expr(s"CAST(floor((__lov + $frac * (__hiv - __lov)) " +
            "* 1000000.0) AS BIGINT)").as("slope_micro_cents"))
        .orderBy("n_pairs")
    }),

    // Decile gains table — the model-eval artifact every targeting
    // model ships with (complements q240 calibration / q205 AUC):
    // orders ranked by value into 10 equal-population buckets via the
    // range-partitioned denseIndex (bucket = idx·10 div n — exact
    // integer ntile, deterministic under the (cents desc, orderkey)
    // total order), response = any returned lineitem; per decile the
    // response census, cumulative capture and lift in floor-ppm —
    // cumulatives via a window over the 10-row decile frame.
    "q300_gains_table" -> ((s, d) => {
      val resp = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("__ok"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("__r"))
      val scored = Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("__cents"))
        .join(resp, col("o_orderkey") === col("__ok"))
      val idx = Kernels.denseIndex(scored,
        Seq(col("__cents").desc, col("o_orderkey").asc), "__i")
      val tot = idx.agg(count(lit(1)).as("n"), sum("__r").as("tr"))
      val dec = idx.crossJoin(broadcast(tot))
        .select(expr("(__i * 10) div n").as("decile"), col("__r"),
                col("n"), col("tr"))
        .groupBy("decile", "n", "tr")
        .agg(count(lit(1)).as("n_orders"), sum("__r").as("n_returned"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      dec.select(col("decile"), col("n_orders"), col("n_returned"),
          sum("n_orders").over(w).as("cum_orders"),
          sum("n_returned").over(w).as("cum_returned"),
          col("n"), col("tr"))
        // lift products in decimal(38,0): cum_returned·n·10⁶ exceeds
        // Long before TPC-H SF10 (Spark would wrap silently with ANSI
        // off; the oracle would error) — div on decimals still emits
        // BIGINT, and the ppm results are small
        .select(col("decile"), col("n_orders"), col("n_returned"),
          expr("(CAST(cum_returned AS DECIMAL(38,0)) * 1000000) div tr")
            .as("cum_capture_ppm"),
          expr("(CAST(cum_returned AS DECIMAL(38,0)) * n * 1000000) " +
            "div (CAST(cum_orders AS DECIMAL(38,0)) * tr)")
            .as("cum_lift_ppm"))
        .orderBy("decile")
    }),

    // Repeat-purchase cadence per nation — the inter-order gap
    // distribution a retention model calibrates on: per-customer
    // consecutive order gaps in exact days (one customer exchange,
    // lag over each customer's bounded order history), then per
    // nation the gap census with interpolated quantiles emitted as
    // floor MILLI-days (gaps interpolate on a 1/10-day grid at these
    // probes, so the ×1000 floor is exact — never a 2dp round that
    // could sit on a half).
    "q301_purchase_cadence" -> ((s, d) => {
      val wo = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
      val gaps = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          expr("datediff(to_date(o_orderdate), DATE'1990-01-01')").as("__d"))
        .withColumn("__gap", col("__d") - lag("__d", 1).over(wo))
        .filter(col("__gap").isNotNull)
        .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
      gaps.groupBy("n_name")
        .agg(count(lit(1)).as("n_gaps"),
          expr("CAST(floor(percentile(__gap, 0.5) * 1000.0) AS BIGINT)")
            .as("median_gap_millidays"),
          expr("CAST(floor(percentile(__gap, 0.9) * 1000.0) AS BIGINT)")
            .as("p90_gap_millidays"),
          max("__gap").as("max_gap_days"))
        .orderBy("n_name")
    }),

    // p-chart (attribute control chart) for the weekly return share —
    // the SPC monitor beside q158's CUSUM and q282's changepoint:
    // 3σ binomial limits around the pooled rate,
    // UCL = p̄ + 3·√(p̄(1−p̄)/n_w) per week (limits depend on each
    // week's own n — the textbook varying-limit p-chart). The flag
    // compares the week's exact rate against the SHARED-text limit
    // double; emitted values are exact integers and booleans.
    "q302_return_pchart" -> ((s, d) => {
      // integer epoch-week index, never a 'ww' date pattern: Spark 3+
      // removed week-of-year letters from datetime formats, and ISO
      // week numbering differs across engines anyway
      val wk = Tables.lineitem(s, d)
        .groupBy(expr("datediff(to_date(l_shipdate), DATE'1990-01-01') " +
          "div 7").as("week"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
               .as("r"))
      val tot = wk.agg(sum("n").as("tn"), sum("r").as("tr"))
      wk.crossJoin(broadcast(tot))
        .select(col("week"), col("n"), col("r"),
          expr("(r * 1000000) div n").as("rate_ppm"),
          expr(s"CAST(r AS DOUBLE) / CAST(n AS DOUBLE) > $PchartUcl")
            .as("above_ucl"),
          expr(s"CAST(r AS DOUBLE) / CAST(n AS DOUBLE) < $PchartLcl")
            .as("below_lcl"))
        .orderBy("week")
    }),

    // ABC inventory classification — the Pareto working-capital
    // census (q190's Lorenz deciles with the operational 80/95 cuts):
    // parts ranked by revenue, class A = parts covering the first 80%
    // of cumulative revenue, B to 95%, C the tail. The rank is the
    // range-partitioned denseIndex total order and the cumulative
    // revenue rides Kernels.prefixSum — both calendar/catalog-bounded
    // shapes, never a single-partition window over the part catalog.
    // Class boundaries compare exact integer cumulative cents against
    // exact integer thresholds (cum·100 vs total·80).
    "q303_abc_classification" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount) " +
          "* 100 + 0.5) AS BIGINT)")).as("cents"))
      val ranked = Kernels.prefixSum(
        Kernels.denseIndex(rev, Seq(col("cents").desc,
          col("l_partkey").asc), "__i"),
        Seq(col("__i").asc), Seq("cents"))
      val tot = ranked.agg(max("cents_cum").as("tc"))
      ranked.crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("cents"),
          when(col("cents_cum") * 100 <= col("tc") * 80, "A")
            .when(col("cents_cum") * 100 <= col("tc") * 95, "B")
            .otherwise("C").as("abc"))
        .groupBy("abc")
        .agg(count(lit(1)).as("n_parts"), sum("cents").as("class_cents"))
        .crossJoin(broadcast(tot))
        .withColumn("revenue_share_ppm",
          expr("(class_cents * 1000000) div tc"))
        .drop("tc")
        .orderBy("abc")
    }),

    // New-vs-returning customer census per month — the BI split every
    // growth dashboard opens with (q93's cohort matrix is the full
    // retention grid; this is its month-grain margin): a customer is
    // NEW in their first-order month, RETURNING after. First-order
    // month via one customer-keyed aggregate joined back (bounded
    // frames, exact integers).
    "q304_new_vs_returning" -> ((s, d) => {
      val om = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("date_format(o_orderdate, 'yyyy-MM')").as("m"))
      val first = om.groupBy("o_custkey").agg(min("m").as("__fm"))
      om.distinct()
        .join(first, Seq("o_custkey"))
        .groupBy(col("m").as("month"))
        .agg(count(lit(1)).as("active_customers"),
             sum(when(col("m") === col("__fm"), 1L).otherwise(0L))
               .as("new_customers"))
        .withColumn("returning_customers",
          expr("active_customers - new_customers"))
        .withColumn("new_share_ppm",
          expr("(new_customers * 1000000) div active_customers"))
        .orderBy("month")
    }),

    // Spearman rank correlation between basket size and order value —
    // the monotone-association twin of q174's Pearson (robust to the
    // heavy right tail order values have): Pearson over AVERAGE ranks,
    // with ties handled exactly — 2·avgrank = 2·(count below) +
    // count(ties) + 1 is an INTEGER, and Pearson is affine-invariant,
    // so the whole statistic computes from exact integer double-ranks
    // (decimal(38,0) moments, the q277 shared closed form — no double
    // ever summed across an exchange). Rank frames are bounded by
    // DISTINCT values and ride the range-partitioned prefixSum.
    "q305_spearman_corr" -> ((s, d) => {
      val xy = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("x"))
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"),
              expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                .as("y")),
            col("l_orderkey") === col("o_orderkey"))
          .select("x", "y"))
      def dblRanks(c: String) = Kernels.prefixSum(
          xy.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c")),
          Seq(col("__v").asc), Seq("__c"))
        .select(col("__v").as(c),
          (lit(2L) * col("__c_cum") - col("__c") + 1L).as(s"dr$c"))
      val ranked = xy
        .join(dblRanks("x"), Seq("x"))
        .join(dblRanks("y"), Seq("y"))
      ranked.agg(count(lit(1)).as("n"),
          sum(col("drx").cast("decimal(38,0)")).as("sx"),
          sum(col("dry").cast("decimal(38,0)")).as("sy"),
          // cast-then-multiply (q295/q300 pattern): dense-rank doubles
          // reach ~2n, so drx*dry in Long wraps near n ~ 2^31 rows
          sum(col("drx").cast("decimal(38,0)") * col("dry").cast("decimal(38,0)")).as("sxy"),
          sum(col("drx").cast("decimal(38,0)") * col("drx").cast("decimal(38,0)")).as("sxx"),
          sum(col("dry").cast("decimal(38,0)") * col("dry").cast("decimal(38,0)")).as("syy"))
        .selectExpr("n AS n_orders",
          s"round($AssortText, 6) AS spearman")
        .orderBy("n_orders")
    }),

    // BRADLEY-TERRY strengths from pairwise duels (Bradley & Terry
    // 1952; the MM iteration of Hunter 2004) — the preference-model
    // fit under RLHF reward data, LLM-judge arena ratings, and
    // ranker calibration, run here on a deterministic duel corpus:
    // within each order, every pair of lineitems from DIFFERENT
    // supplier nations duels and the higher extendedprice wins (price
    // ties break to the lexicographically smaller nation — total
    // rule). The duel join is per-order (co-partitioned self-join on
    // the order key — one shuffle; <= C(7,2) pairs per order), then
    // BradleyTerry.fit runs 3 MM steps p_i <- w_i / sum_j
    // m_ij/(p_i+p_j) on NATION-sized broadcast frames from the
    // all-ones start — a DEFINED statistic (the pinned-sweep rule),
    // each term floored to integer nanos before its sum so the oracle
    // replays bit for bit; PropertySpec pins the converged fit
    // against the BT stationarity equations on random duel tables.
    // Zero-win nations fix at 0 (the BT MLE boundary); see the
    // kernel's scaladoc for the DECIMAL(38,0) scale valve.
    "q354_bradley_terry" -> ((s, d) => {
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
      val li = graft.ops.Staging.stage(Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_suppkey",
          "l_extendedprice")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_extendedprice").as("pr"), col("n_name").as("nat")))
      val duels = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.ln") < col("b.ln"))
        .filter(col("a.nat") =!= col("b.nat"))
        .select(
          when(col("a.pr") > col("b.pr"), col("a.nat"))
            .when(col("b.pr") > col("a.pr"), col("b.nat"))
            .otherwise(least(col("a.nat"), col("b.nat"))).as("win"),
          when(col("a.pr") > col("b.pr"), col("b.nat"))
            .when(col("b.pr") > col("a.pr"), col("a.nat"))
            .otherwise(greatest(col("a.nat"), col("b.nat"))).as("lose"))
      val fit = graft.ops.Staging.stage(graft.ext.BradleyTerry.fit(
        duels.groupBy("win", "lose").agg(count(lit(1)).as("n")),
        steps = 3))
      fit.crossJoin(broadcast(fit.agg(sum("p").as("tot"))))
        .select(col("na").as("nation"), col("w").as("wins"),
          col("duels"), col("p").as("strength_nano"),
          expr(BtSharePpm).as("strength_ppm"))
        .orderBy("nation")
    }),
  )

  /** q334's OLS closed form and residual — SHARED text. The slope's
    * integer products run in decimal(38,0) (Spark) / HUGEINT (DuckDB)
    * and cast to DOUBLE only at the final division; the intercept
    * reuses the b column; the residual derives every float from the
    * same (a, b, integer y, integer x). */
  private val ConfSlope =
    "CAST(nf * s1y - s1 * sy AS DOUBLE) / CAST(nf * s11 - s1 * s1 AS DOUBLE)"
  private val ConfIntercept =
    "(CAST(sy AS DOUBLE) - b * CAST(s1 AS DOUBLE)) / CAST(nf AS DOUBLE)"
  private val ConfAbsResid =
    "abs(CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE)))"

  // q354's shared term texts live with the operator
  // (graft.ext.BradleyTerry) — the oracle interpolates the SAME
  // strings, so the term text cannot drift between engines.
  private val BtDenomTermNano = graft.ext.BradleyTerry.DenomTermNano
  private val BtUpdateNano = graft.ext.BradleyTerry.UpdateNano
  private val BtSharePpm = graft.ext.BradleyTerry.SharePpm

  /** q354's oracle: duel construction replay + the 3 MM steps as
    * generated CTE blocks (one template, so the iteration text cannot
    * drift between steps or engines). */
  private def bradleyTerryOracleSql: String = {
    def step(t: Int, xPrev: String) =
      s"""den$t AS (
         |  SELECT pm.na,
         |    CAST(sum($BtDenomTermNano) AS BIGINT) AS den
         |  FROM (SELECT pm0.na, pm0.nb, pm0.m, pa.p AS pa, pb.p AS pb
         |        FROM pm pm0
         |        JOIN $xPrev pa ON pm0.na = pa.na
         |        JOIN $xPrev pb ON pm0.nb = pb.na) pm
         |  GROUP BY pm.na),
         |x$t AS (
         |  SELECT w.na, $BtUpdateNano AS p
         |  FROM w JOIN den$t USING (na))""".stripMargin
    s"""WITH li AS (
       |  SELECT l.l_orderkey AS ok, l.l_linenumber AS ln,
       |    l.l_extendedprice AS pr, n.n_name AS nat
       |  FROM lineitem l
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
       |duels AS (
       |  SELECT
       |    CASE WHEN a.pr > b.pr THEN a.nat
       |         WHEN b.pr > a.pr THEN b.nat
       |         ELSE least(a.nat, b.nat) END AS win,
       |    CASE WHEN a.pr > b.pr THEN b.nat
       |         WHEN b.pr > a.pr THEN a.nat
       |         ELSE greatest(a.nat, b.nat) END AS lose
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.ln < b.ln
       |  WHERE a.nat <> b.nat),
       |nwl AS (SELECT win, lose, CAST(count(*) AS BIGINT) AS n
       |        FROM duels GROUP BY 1, 2),
       |pm AS (
       |  SELECT na, nb, CAST(sum(n) AS BIGINT) AS m FROM (
       |    SELECT win AS na, lose AS nb, n FROM nwl
       |    UNION ALL SELECT lose, win, n FROM nwl)
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT nodes.na, CAST(coalesce(wr.w, 0) AS BIGINT) AS w
       |  FROM (SELECT DISTINCT na FROM pm) nodes
       |  LEFT JOIN (SELECT win AS na, CAST(sum(n) AS BIGINT) AS w
       |             FROM nwl GROUP BY 1) wr USING (na)),
       |x0 AS (SELECT na, CAST(1000000000 AS BIGINT) AS p FROM w),
       |${step(1, "x0")},
       |${step(2, "x1")},
       |${step(3, "x2")},
       |tt AS (SELECT CAST(sum(p) AS BIGINT) AS tot FROM x3),
       |dd AS (SELECT na, CAST(sum(m) AS BIGINT) AS duels
       |       FROM pm GROUP BY 1)
       |SELECT x3.na AS nation, w.w AS wins, dd.duels,
       |  x3.p AS strength_nano, $BtSharePpm AS strength_ppm
       |FROM x3 JOIN w USING (na) JOIN dd USING (na) CROSS JOIN tt
       |ORDER BY nation""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // MM-iteration replay — see bradleyTerryOracleSql.
    "q354_bradley_terry" -> bradleyTerryOracleSql,

    // Conformal replay: HUGEINT sums mirroring the decimal(38,0)
    // sums, the SHARED slope/intercept/residual texts, row_number for
    // the k-th order statistic (exact at oracle scale; the operator
    // side uses the distributed denseIndex), integer coverage census.
    "q334_conformal_interval" ->
      s"""WITH t AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS rid,
        |    l_orderkey % 3 AS par,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS nf,
        |    sum(CAST(x AS HUGEINT)) AS s1, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS s11,
        |    sum(CAST(x AS HUGEINT) * y) AS s1y
        |  FROM t WHERE par = 0),
        |sb AS (SELECT nf, s1, sy, $ConfSlope AS b FROM s),
        |sa AS (SELECT nf, s1, sy, b, $ConfIntercept AS a FROM sb),
        |cal AS (SELECT rid, $ConfAbsResid AS ar FROM t, sa WHERE par = 1),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS nc,
        |         (9 * (CAST(count(*) AS BIGINT) + 1) + 9) // 10 AS k
        |       FROM cal),
        |idx AS (SELECT ar, row_number() OVER (ORDER BY ar, rid) AS rn
        |        FROM cal),
        |qh AS (SELECT kk.nc, kk.k, idx.ar AS qhat
        |       FROM idx, kk WHERE idx.rn = kk.k),
        |tst AS (SELECT $ConfAbsResid AS art FROM t, sa WHERE par = 2),
        |cov AS (SELECT qh.nc, qh.k, qh.qhat,
        |          CAST(count(*) AS BIGINT) AS n_test,
        |          CAST(sum(CASE WHEN art <= qhat THEN 1 ELSE 0 END)
        |            AS BIGINT) AS covered
        |        FROM tst, qh GROUP BY 1, 2, 3)
        |SELECT (SELECT CAST(nf AS BIGINT) FROM s) AS n_fit,
        |  nc AS n_calib, k, n_test, covered,
        |  round(qhat, 6) AS qhat_cents,
        |  (covered * 1000000) // n_test AS coverage_ppm,
        |  round((SELECT b FROM sb), 6) AS slope,
        |  round((SELECT a FROM sa), 6) AS intercept
        |FROM cov ORDER BY n_calib""".stripMargin,
    // The salted join must be value-identical to the plain inner
    // join + aggregate (the dim is a 3-row literal, inlined as CASE).
    "q138_skew_join" ->
      """SELECT l_returnflag,
        |  CASE l_returnflag WHEN 'A' THEN 'returned'
        |    WHEN 'N' THEN 'in_flight' WHEN 'R' THEN 'refunded' END
        |    AS flag_label,
        |  count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The salted two-phase plan must be value-identical to the plain
    // group-by: count/sum/min/max split exactly; avg's
    // sum-of-sums/sum-of-counts reassociates float addition only at
    // ulp level, absorbed by the 6dp round like every driver avg.
    "q128_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The salted two-phase plan must equal the plain group-by exactly:
    // count/sum-of-cents split exactly in integers; min/max compare
    // raw (order-independent doubles, bit-identical from the same
    // parquet on both engines).
    "q202_salted_hot_key" ->
      """SELECT CASE WHEN user_id % 4 != 0 THEN 'hot'
        |    ELSE 'u' || CAST(user_id AS VARCHAR) END AS k,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "q166_profit_by_nation" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS profit,
        |  count(*) AS n_lines
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%a%'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q167_rank_ladder" ->
      """SELECT c_mktsegment AS segment, c_custkey, c_acctbal,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT)
        |    AS pct_rank_ppm,
        |  CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT)
        |    AS cume_dist_ppm,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM customer WHERE c_custkey < 200
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY segment, rnk, c_custkey""".stripMargin,

    "q157_share_shift" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    c_mktsegment AS segment,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |t AS (SELECT month, CAST(sum(cents) AS BIGINT) AS tot
        |      FROM m GROUP BY month),
        |s AS (
        |  SELECT m.month, m.segment,
        |    CAST(floor(m.cents * 1000000.0 / t.tot) AS BIGINT) AS share_ppm
        |  FROM m JOIN t ON m.month = t.month)
        |SELECT month, segment, share_ppm,
        |  share_ppm - lag(share_ppm, 1) OVER (PARTITION BY segment
        |                                      ORDER BY month) AS shift_ppm
        |FROM s ORDER BY month, segment""".stripMargin,

    // Robust-stats replay: quantile_cont is the same interpolated
    // percentile as Spark's percentile(); the mode is the explicit
    // (count DESC, value) argmax on both sides.
    "q149_robust_stats" ->
      """WITH med AS (
        |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med,
        |         count(*) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag),
        |mad AS (
        |  SELECT l.l_returnflag,
        |         quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad
        |  FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
        |  GROUP BY l.l_returnflag),
        |mode AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
        |  FROM (
        |    SELECT l_returnflag, l_quantity, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY l_returnflag
        |                         ORDER BY count(*) DESC, l_quantity) AS rn
        |    FROM lineitem GROUP BY l_returnflag, l_quantity)
        |  WHERE rn = 1)
        |SELECT m.l_returnflag, m.n_rows, mo.mode_qty, mo.mode_count,
        |  round(m.med, 4) AS median_price, round(a.mad, 6) AS mad_price
        |FROM med m JOIN mad a ON m.l_returnflag = a.l_returnflag
        |           JOIN mode mo ON m.l_returnflag = mo.l_returnflag
        |ORDER BY m.l_returnflag""".stripMargin,

    "q170_supplier_hhi" ->
      """WITH c AS (
        |  SELECT s_nationkey, s_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS c
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |t AS (SELECT s_nationkey, CAST(sum(c) AS BIGINT) AS tot,
        |        CAST(count(*) AS BIGINT) AS n_suppliers
        |      FROM c GROUP BY 1),
        |b AS (SELECT c.s_nationkey, (c.c * 10000) // t.tot AS bp,
        |        t.n_suppliers
        |      FROM c JOIN t ON c.s_nationkey = t.s_nationkey)
        |SELECT n_name AS nation, n_suppliers,
        |  CAST(sum(bp * bp) AS BIGINT) AS hhi_bp2
        |FROM b JOIN nation ON b.s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation""".stripMargin,

    // Ordered-sweep frontier over the distinct value pairs: survive
    // iff p_size strictly exceeds every (price asc, size desc)-earlier
    // pair's size. The Scala spec pins this formulation against the
    // O(n²) NOT-EXISTS dominance definition on random data.
    "q172_pareto_skyline" ->
      """WITH pair AS (
        |  SELECT p_retailprice, CAST(p_size AS DOUBLE) AS p_size,
        |         CAST(count(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1, 2),
        |sw AS (
        |  SELECT p_retailprice, p_size, n_parts,
        |    max(p_size) OVER (ORDER BY p_retailprice ASC, p_size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM pair)
        |SELECT p_retailprice, p_size, n_parts FROM sw
        |WHERE prev_max IS NULL OR p_size > prev_max
        |ORDER BY p_retailprice""".stripMargin,

    "q174_corr_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield (cols(i), cols(j))
      pairs.map { case (x, y) =>
        s"""SELECT '$x' AS var_a, '$y' AS var_b,
           |  round(corr($x, $y), 6) AS pearson_r FROM lineitem""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
                 "\n) ORDER BY var_a, var_b")
    },

    "q175_winsorized_stats" ->
      """WITH pct AS (
        |  SELECT l_returnflag,
        |         quantile_cont(l_extendedprice, 0.05) AS p05,
        |         quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (l.l_extendedprice < pct.p05) AS BIGINT)
        |    AS n_clipped_low,
        |  CAST(count(*) FILTER (l.l_extendedprice > pct.p95) AS BIGINT)
        |    AS n_clipped_high,
        |  round(avg(least(greatest(l.l_extendedprice, pct.p05), pct.p95)), 6)
        |    AS mean_winsorized,
        |  round(any_value(pct.p05), 6) AS p05,
        |  round(any_value(pct.p95), 6) AS p95
        |FROM lineitem l JOIN pct ON l.l_returnflag = pct.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    // Any tie order inside equal cents gives the same s1 (equal
    // values x index-block sum); the final ratio replays the exact
    // Spark double expression from the same exact integers.
    "q182_gini_revenue" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS i FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(cents) AS HUGEINT) AS s0,
        |        CAST(sum(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS s1
        |      FROM r)
        |SELECT n AS n_customers, CAST(s0 AS BIGINT) AS total_cents,
        |  round((2.0 * CAST(s1 AS DOUBLE) -
        |         CAST(n + 1 AS DOUBLE) * CAST(s0 AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE)), 6) AS gini
        |FROM a ORDER BY n_customers""".stripMargin,

    // Replays withFold's md5 bands (1/3 -> 0x55555555, 2/3 ->
    // 0xaaaaaaab — round(frac * 2^32) hex, the q66 replay) and the
    // exact integer leave-fold-out means.
    "q188_oof_target_encoding" ->
      """WITH f AS (
        |  SELECT o_orderpriority AS category,
        |    CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || 'te'), 1, 8)
        |              < '55555555' THEN 'f0'
        |         WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || 'te'), 1, 8)
        |              < 'aaaaaaab' THEN 'f1'
        |         ELSE 'f2' END AS fold,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |cell AS (SELECT category, fold, CAST(count(*) AS BIGINT) AS n_rows,
        |           CAST(sum(c) AS BIGINT) AS fc
        |         FROM f GROUP BY 1, 2),
        |cat AS (SELECT category, CAST(sum(n_rows) AS BIGINT) AS cn,
        |          CAST(sum(fc) AS BIGINT) AS cc
        |        FROM cell GROUP BY 1)
        |SELECT cell.category, fold, n_rows,
        |  CASE WHEN cn = n_rows THEN NULL
        |       ELSE (cc - fc) // (cn - n_rows) END AS oof_mean_cents
        |FROM cell JOIN cat ON cell.category = cat.category
        |ORDER BY cell.category, fold""".stripMargin,

    // Ranks replayed with row_number (0-based to match denseIndex);
    // tie order inside equal cents cannot move a customer across a
    // decile boundary's SUM (equal values, same multiset per decile).
    "q190_lorenz_deciles" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(cents) AS BIGINT) AS tot FROM c),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS i
        |      FROM c),
        |d AS (SELECT (i * 10) // n AS decile,
        |        CAST(count(*) AS BIGINT) AS n_customers,
        |        CAST(sum(cents) AS BIGINT) AS dc, any_value(tot) AS tot
        |      FROM r, t GROUP BY 1),
        |cm AS (SELECT *, CAST(sum(dc) OVER (ORDER BY decile
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum FROM d)
        |SELECT decile, n_customers,
        |  (dc * 1000000) // tot AS share_ppm,
        |  (cum * 1000000) // tot AS cum_share_ppm
        |FROM cm ORDER BY decile""".stripMargin,

    "q191_price_volume_mix" ->
      """WITH base AS (
        |  SELECT s_nationkey, year(l_shipdate) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS r,
        |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |pv AS (SELECT s_nationkey,
        |         sum(CASE WHEN yr = 1996 THEN r END) AS r1,
        |         sum(CASE WHEN yr = 1996 THEN q END) AS q1,
        |         sum(CASE WHEN yr = 1997 THEN r END) AS r2,
        |         sum(CASE WHEN yr = 1997 THEN q END) AS q2
        |       FROM base GROUP BY 1)
        |SELECT n_name AS nation,
        |  CAST(r2 - r1 AS BIGINT) AS delta_cents,
        |  CAST(((q2 - q1) * r1) // q1 AS BIGINT) AS volume_effect_cents,
        |  CAST(r2 - r1 - ((q2 - q1) * r1) // q1 AS BIGINT)
        |    AS price_effect_cents
        |FROM pv JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY nation""".stripMargin,

    // Replays the histogram estimate EXACTLY: floor buckets,
    // per-group cumulative counts, ceil(p*N) target ranks, and the
    // same left-associated interpolation expression.
    // The identical shared solve text over HUGEINT sufficient
    // statistics (see olsSelect).
    "q218_ols_normal_eq" ->
      s"""WITH t AS (
         |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
         |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
         |         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x2
         |  FROM lineitem),
         |s AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
         |    CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
         |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
         |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
         |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
         |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
         |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
         |  FROM t)
         |SELECT ${olsSelect.mkString(",\n  ")}
         |FROM s ORDER BY n_rows""".stripMargin,

    // Spearman replay: same integer double-ranks (window prefix count
    // over the distinct-value frames), same shared Pearson form.
    "q305_spearman_corr" -> (
      """WITH xy AS (
        |  SELECT CAST(count(*) AS BIGINT) AS x,
        |    CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS y
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_orderkey),
        |rx AS (
        |  SELECT x, 2 * CAST(sum(count(*)) OVER (ORDER BY x) AS BIGINT)
        |    - CAST(count(*) AS BIGINT) + 1 AS drx
        |  FROM xy GROUP BY x),
        |ry AS (
        |  SELECT y, 2 * CAST(sum(count(*)) OVER (ORDER BY y) AS BIGINT)
        |    - CAST(count(*) AS BIGINT) + 1 AS dry
        |  FROM xy GROUP BY y),
        |r AS (
        |  SELECT drx, dry FROM xy JOIN rx USING (x) JOIN ry USING (y)),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(drx AS HUGEINT)) AS sx,
        |    sum(CAST(dry AS HUGEINT)) AS sy,
        |    sum(CAST(drx AS HUGEINT) * CAST(dry AS HUGEINT)) AS sxy,
        |    sum(CAST(drx AS HUGEINT) * CAST(drx AS HUGEINT)) AS sxx,
        |    sum(CAST(dry AS HUGEINT) * CAST(dry AS HUGEINT)) AS syy
        |  FROM r)
        |SELECT n AS n_orders,
        |""".stripMargin +
      s"  round($AssortText, 6) AS spearman\n" +
      "FROM mom ORDER BY n_orders"),

    // ABC replay: same revenue rank, window cumulative, integer
    // threshold comparisons, per-class census.
    "q303_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT l_partkey, cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey)
        |      AS BIGINT) AS cum
        |  FROM rev),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tc FROM rev),
        |cls AS (
        |  SELECT cents,
        |    CASE WHEN cum * 100 <= tc * 80 THEN 'A'
        |         WHEN cum * 100 <= tc * 95 THEN 'B'
        |         ELSE 'C' END AS abc, tc
        |  FROM r CROSS JOIN tot)
        |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(cents) AS BIGINT) AS class_cents,
        |  (CAST(sum(cents) AS BIGINT) * 1000000) // tc
        |    AS revenue_share_ppm
        |FROM cls GROUP BY abc, tc ORDER BY abc""".stripMargin,

    // New-vs-returning replay: same first-month join-back and
    // month-grain censuses.
    "q304_new_vs_returning" ->
      """WITH om AS (
        |  SELECT DISTINCT o_custkey, strftime(o_orderdate, '%Y-%m') AS m
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS fm FROM om GROUP BY 1)
        |SELECT m AS month, CAST(count(*) AS BIGINT) AS active_customers,
        |  CAST(sum(CASE WHEN m = fm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_customers,
        |  CAST(count(*) AS BIGINT) -
        |    CAST(sum(CASE WHEN m = fm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_customers,
        |  (CAST(sum(CASE WHEN m = fm THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS new_share_ppm
        |FROM om JOIN f USING (o_custkey)
        |GROUP BY m ORDER BY month""".stripMargin,

    // Gains replay: same (cents desc, orderkey) total order via
    // row_number()−1, integer ntile, window cumulatives, floor-ppm.
    "q300_gains_table" ->
      """WITH resp AS (
        |  SELECT l_orderkey AS ok,
        |    CAST(max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |scored AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, r
        |  FROM orders JOIN resp ON o_orderkey = ok),
        |idx AS (
        |  SELECT r, row_number() OVER (ORDER BY cents DESC, o_orderkey)
        |    - 1 AS i
        |  FROM scored),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(r) AS BIGINT) AS tr FROM idx),
        |dec AS (
        |  SELECT (i * 10) // n AS decile,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(r) AS BIGINT) AS n_returned, n, tr
        |  FROM idx CROSS JOIN tot GROUP BY 1, n, tr)
        |SELECT decile, n_orders, n_returned,
        |  CAST((CAST(sum(n_returned) OVER w AS HUGEINT) * 1000000) // tr
        |    AS BIGINT) AS cum_capture_ppm,
        |  CAST((CAST(sum(n_returned) OVER w AS HUGEINT) * n * 1000000)
        |    // (CAST(sum(n_orders) OVER w AS HUGEINT) * tr)
        |    AS BIGINT) AS cum_lift_ppm
        |FROM dec
        |WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |             AND CURRENT ROW)
        |ORDER BY decile""".stripMargin,

    // Cadence replay: same per-customer lag gaps, per-nation censuses
    // with floor milli-day quantiles.
    "q301_purchase_cadence" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    datediff('day', DATE '1990-01-01', o_orderdate) AS d
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey,
        |    d - lag(d) OVER (PARTITION BY o_custkey
        |      ORDER BY d, o_orderkey) AS gap
        |  FROM o),
        |gg AS (
        |  SELECT n_name, gap
        |  FROM g
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE gap IS NOT NULL)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(floor(quantile_cont(gap, 0.5) * 1000.0) AS BIGINT)
        |    AS median_gap_millidays,
        |  CAST(floor(quantile_cont(gap, 0.9) * 1000.0) AS BIGINT)
        |    AS p90_gap_millidays,
        |  CAST(max(gap) AS BIGINT) AS max_gap_days
        |FROM gg GROUP BY n_name ORDER BY n_name""".stripMargin,

    // p-chart replay: same epoch-week buckets, SHARED-text limits.
    "q302_return_pchart" -> (
      """WITH wk AS (
        |  SELECT datediff('day', DATE '1990-01-01', l_shipdate) // 7
        |    AS week,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |               CAST(sum(r) AS BIGINT) AS tr FROM wk)
        |SELECT week, n, r, (r * 1000000) // n AS rate_ppm,
        |""".stripMargin +
      s"  CAST(r AS DOUBLE) / CAST(n AS DOUBLE) > $PchartUcl AS above_ucl,\n" +
      s"  CAST(r AS DOUBLE) / CAST(n AS DOUBLE) < $PchartLcl AS below_lcl\n" +
      "FROM wk CROSS JOIN tot ORDER BY week"),

    // Bands replay: quantile_cont ≡ percentile per month, 4dp.
    "q296_monthly_price_bands" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    // Theil–Sen replay: same day indices (row_number over the
    // calendar-bounded day frame ≡ denseIndex), identical slope
    // doubles, interpolated median, floor micro-cents.
    // Date-keyed self-joins, identical cents, identical shared-text
    // final ratio.
    // Identical shared nano-log terms and decimal/HUGEINT moments;
    // slope text over exact integers.
    "q315_price_elasticity" -> (
      """WITH m AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS m,
        |    CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cq,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS pc
        |  FROM lineitem GROUP BY 1),
        |pts AS (
        |  SELECT CAST(floor(""".stripMargin + ElastLnP +
      """) AS BIGINT) AS xn,
        |    CAST(floor(""".stripMargin + ElastLnQ +
      """) AS BIGINT) AS yn FROM m),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xn) AS HUGEINT) AS sx, CAST(sum(yn) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(xn AS HUGEINT) * CAST(yn AS HUGEINT)) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(xn AS HUGEINT) * CAST(xn AS HUGEINT)) AS HUGEINT) AS sxx
        |  FROM pts)
        |SELECT n AS n_months, round(""".stripMargin + ElastSlope +
      """, 6) AS elasticity FROM mom ORDER BY n_months""".stripMargin),

    // Same pivot, same frequency buckets.
    "q316_rfm_migration" ->
      """WITH b AS (
        |  SELECT o_custkey, count(*) AS cb FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1995-01-01' GROUP BY o_custkey),
        |a AS (
        |  SELECT o_custkey, count(*) AS ca FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' GROUP BY o_custkey)
        |SELECT
        |  CASE WHEN cb >= 4 THEN '4+' WHEN cb >= 2 THEN '2-3' ELSE '1' END AS seg_before,
        |  CASE WHEN ca >= 4 THEN '4+' WHEN ca >= 2 THEN '2-3' ELSE '1' END AS seg_after,
        |  count(*) AS n_customers
        |FROM b JOIN a USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY seg_before, seg_after""".stripMargin,

    "q313_seasonal_naive_mase" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |wk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n7,
        |    CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS s7
        |  FROM daily a JOIN daily b ON a.day = b.day + 7),
        |nv AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(abs(cents - prev)) AS BIGINT) AS s1
        |  FROM (SELECT cents, lag(cents) OVER (ORDER BY day) AS prev FROM daily)
        |  WHERE prev IS NOT NULL)
        |SELECT n7 AS n_eval_days, s7 AS abs_err7_cents,
        |  n1 AS n_naive_days, s1 AS abs_err1_cents,
        |  round((CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE)) / (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6) AS mase
        |FROM wk CROSS JOIN nv ORDER BY n_eval_days""".stripMargin,

    // Identical shared floored nano-nat term over the same exact
    // integers.
    "q314_theil_index" -> (
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t FROM cust)
        |SELECT n AS n_customers, t AS total_cents,
        |  CAST(sum(CAST(floor(""".stripMargin + TheilTermNano +
      """) AS BIGINT)) AS BIGINT) AS theil_nano_sum
        |FROM cust CROSS JOIN tot GROUP BY n, t ORDER BY n_customers""".stripMargin),

    "q297_theil_sen" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |idx AS (
        |  SELECT cents, row_number() OVER (ORDER BY day) - 1 AS t
        |  FROM daily),
        |s AS (
        |  SELECT CAST(b.cents - a.cents AS DOUBLE) /
        |         CAST(b.t - a.t AS DOUBLE) AS sl
        |  FROM idx a JOIN idx b ON b.t > a.t)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(floor(quantile_cont(sl, 0.5) * 1000000.0) AS BIGINT)
        |    AS slope_micro_cents
        |FROM s ORDER BY n_pairs""".stripMargin,

    // Churn replay: same midpoint split, per-half revenue ranks via
    // row_number over the identical total order, |delta| top-10.
    "q284_rank_churn" ->
      """WITH base AS (
        |  SELECT l_partkey,
        |    datediff('day', DATE '1990-01-01', o_orderdate) AS us,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      AS BIGINT) AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM base),
        |h AS (
        |  SELECT l_partkey,
        |    CAST(sum(CASE WHEN us < mid THEN c ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN us >= mid THEN c ELSE 0 END) AS BIGINT)
        |      AS c2
        |  FROM base CROSS JOIN m GROUP BY 1),
        |r1 AS (
        |  SELECT l_partkey, CAST(row_number() OVER (
        |    ORDER BY c1 DESC, l_partkey) AS BIGINT) AS r1
        |  FROM h WHERE c1 > 0),
        |r2 AS (
        |  SELECT l_partkey, CAST(row_number() OVER (
        |    ORDER BY c2 DESC, l_partkey) AS BIGINT) AS r2
        |  FROM h WHERE c2 > 0)
        |SELECT l_partkey, r1, r2, r2 - r1 AS rank_delta
        |FROM r1 JOIN r2 USING (l_partkey)
        |ORDER BY abs(r2 - r1) DESC, l_partkey LIMIT 10""".stripMargin,

    // WOE/IV replay: same level counts, the SHARED ln term and
    // floored-nano products.
    "q293_woe_iv" -> (
      """WITH base AS (
        |  SELECT o_orderpriority,
        |    CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_good,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_bad
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
        |               CAST(sum(n_bad) AS BIGINT) AS tb FROM base)
        |SELECT o_orderpriority, n_good, n_bad,
        |""".stripMargin +
      s"  CAST(floor(1000000000.0 * $WoeLn) AS BIGINT) AS woe_nano,\n" +
      s"  CAST(floor(1000000000.0 * ($WoeShare) * $WoeLn) AS BIGINT)" +
      " AS iv_term_nano\n" +
      "FROM base CROSS JOIN tot ORDER BY o_orderpriority"),

    // Volatility replay: same day grid, HUGEINT window moments
    // standing in for decimal(38,0), the SHARED stddev closed form.
    "q295_rolling_volatility" -> (
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, cents,
        |    count(*) OVER win AS n7,
        |    CAST(sum(cents) OVER win AS BIGINT) AS s7,
        |    sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
        |      OVER win AS ss7
        |  FROM daily
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
        |                 AND CURRENT ROW))
        |SELECT day, cents, s7,
        |""".stripMargin +
      s"  CAST(floor($VolText) AS BIGINT) AS vol_cents_floor\n" +
      "FROM w WHERE n7 = 7 ORDER BY day"),

    // Changepoint replay: same daily cents, window prefix sums (the
    // day frame is calendar-bounded, so the oracle's global window is
    // safe where the engine's range-partitioned prefixSum is the
    // 100 TB shape), floor-ppm means, (gap desc, day) argmax.
    "q282_changepoint_binseg" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT day,
        |    CAST(sum(cents) OVER (ORDER BY day) AS BIGINT) AS cl,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
        |  FROM daily),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(cents) AS BIGINT) AS s FROM daily)
        |SELECT day AS split_day, t AS left_days,
        |  (cl * 1000000) // t AS mean_left_ppm,
        |  ((s - cl) * 1000000) // (n - t) AS mean_right_ppm,
        |  abs((cl * 1000000) // t - ((s - cl) * 1000000) // (n - t))
        |    AS score_ppm
        |FROM c, tot WHERE t < n
        |ORDER BY score_ppm DESC, split_day LIMIT 1""".stripMargin,

    // Share-of-parent replay: identical two-level cent rollups and
    // floor-ppm shares.
    "q279_share_of_parent" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |br AS (SELECT r_name, CAST(sum(cents) AS BIGINT) AS rc
        |       FROM rev GROUP BY r_name),
        |t AS (SELECT CAST(sum(rc) AS BIGINT) AS tc FROM br)
        |SELECT rev.r_name, n_name, cents,
        |  (cents * 1000000) // rc AS share_of_region_ppm,
        |  (rc * 1000000) // tc AS region_share_ppm
        |FROM rev JOIN br ON rev.r_name = br.r_name CROSS JOIN t
        |ORDER BY rev.r_name, n_name""".stripMargin,
  )
}
