package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Kernels
import graft.tables.Tables

/** Relational operator queries over the driver testdata, each paired
  * with a DuckDB oracle. Covers SURVEY.md §2.1-§2.7: scans, filters,
  * joins, aggregations, dedup-keep-last, pivot/unpivot, windows,
  * top-k, set ops.
  *
  * Determinism contract: every query ends in a total ORDER BY, and
  * every floating-point aggregate is rounded identically on both the
  * Spark and oracle side (sum->2dp, ratios/avgs->6dp) so driver
  * hash-comparison is stable across engines and runs.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // §2.4 A1-A3, §2.2 P4, §2.8 F9 — TPC-H Q1-style pricing summary.
    "q01_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 40)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // §2.6 O2 — top-k via orderBy.limit => TakeOrderedAndProject.
    "q02_topk_customers" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10)),

    // §2.4 A5 — dedup keep-last (latest order per customer), the
    // window-top-1 form of the reference's sort+unique(keep="last").
    "q03_latest_order_per_customer" -> ((s, d) =>
      Kernels.dedupKeepLast(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey")))
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")),

    // §2.10 rank() composite: dedup -> join -> broadcast join ->
    // regex filter -> top-k (reference data.py:152-201 shape).
    "q04_rank_segments" -> ((s, d) => {
      val latest = Kernels.dedupKeepLast(Tables.orders(s, d), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      latest
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("c_mktsegment").rlike("BUILDING|AUTOMOBILE"))
        .select("c_custkey", "c_name", "n_name", "c_mktsegment", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("c_custkey"))
        .limit(10)
    }),

    // §2.4 A7 — pivot with explicit values + zero-fill (trap 10).
    "q05_pivot_status_priority" -> ((s, d) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
        .na.fill(0L, prios)
        .orderBy("o_orderstatus")
    }),

    // §2.4 A8 — unpivot/melt of measure columns.
    "q06_unpivot_measures" -> ((s, d) => {
      val aggd = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("qty"),
             round(sum("l_extendedprice"), 2).as("price"),
             round(sum("l_discount"), 2).as("disc"),
             round(sum("l_tax"), 2).as("tax"))
      Kernels.unpivot(aggd, Seq("l_returnflag"),
          Seq("qty", "price", "disc", "tax"), "measure", "value")
        .orderBy("l_returnflag", "measure")
    }),

    // §2.3 J6 / §2.2 P11 — left-semi join (EXISTS).
    "q07_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")),

    // Anti join (NOT EXISTS) — beyond-reference set op.
    "q08_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")),

    // §2.3 J5 — dictionary translation via broadcast left join with
    // prefixed fallback (reference company.py:425-433 semantics).
    "q09_translate_fallback" -> ((s, d) => {
      val dict = Tables.region(s, d).filter(col("r_regionkey") < 3)
      Kernels.translate(Tables.nation(s, d), dict,
          keyCol = "n_regionkey", dictKey = "r_regionkey", dictVal = "r_name",
          outCol = "region_label",
          fallback = concat(lit("(?) "), col("n_name")))
        .select("n_nationkey", "n_name", "region_label")
        .orderBy("n_nationkey")
    }),

    // §2.2 P6-P9 — regex / prefix-disjunction / token-count filters.
    "q10_regex_prefix_filter" -> ((s, d) => {
      val prefixes = Seq("small", "red", "blue")
      Tables.part(s, d)
        .filter(col("p_type").rlike("^(PROMO|ECONOMY)") ||
                prefixes.map(p => col("p_name").startsWith(p)).reduce(_ || _))
        .filter(size(split(col("p_name"), " ")) <= 2)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    }),

    // §2.2 P10 — IN-list filters.
    "q11_inlist_filter" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
                col("o_orderstatus").isin("F", "O"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority", "o_orderstatus")),

    // §2.3 J2 — multi-key aggregate-join-back, expressed as a whole-
    // partition window over the same 2-key grouping: ONE shuffle of
    // lineitem instead of the groupBy-then-join-back double exchange
    // (the oracle keeps the join formulation — same values). This was
    // round 1's slowest bench query; the windowed plan is strictly
    // better at any scale.
    "q12_multikey_join" -> ((s, d) => {
      val w = Window.partitionBy("l_partkey", "l_suppkey")
      Tables.lineitem(s, d)
        .withColumn("ps_qty", round(sum("l_quantity").over(w), 2))
        .withColumn("ps_lines", count(lit(1)).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
                round(col("l_quantity") / col("ps_qty"), 6).as("qty_share"),
                col("ps_lines"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.2 P12/P13 — when/otherwise buckets + null handling.
    "q13_conditional_buckets" -> ((s, d) =>
      Tables.customer(s, d)
        .withColumn("bucket",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .withColumn("nz_bal", coalesce(expr("nullif(c_acctbal, 0.0)"), lit(-1.0)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
             round(sum("nz_bal"), 2).as("sum_nz_bal"),
             round(avg("c_acctbal"), 6).as("avg_bal"))
        .orderBy("bucket")),

    // §2.5 W1/W2 — trailing averages with lag-1 and lag-4->1->self
    // coalescing (reference indicators.py:47-69 semantics).
    "q14_window_lag_avg" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        // Rounded at 4dp: inputs have 2 decimals, so the /2 yields at
        // most 3 — no value ever sits on a half at the 4th digit,
        // keeping Spark (BigDecimal HALF_UP) and DuckDB (fp multiply)
        // rounding in exact agreement.
        .withColumn("trail2",
          round((col("o_totalprice") + coalesce(lag("o_totalprice", 1).over(w), col("o_totalprice"))) / 2, 4))
        .withColumn("trail4",
          round((col("o_totalprice") + coalesce(lag("o_totalprice", 4).over(w),
                                                lag("o_totalprice", 1).over(w),
                                                col("o_totalprice"))) / 2, 4))
        .select("o_custkey", "o_orderkey", "o_totalprice", "trail2", "trail4")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // §2.5 W3 + frames — row_number and running sum per group.
    "q15_running_window" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("running_spend",
          round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .select("o_custkey", "o_orderkey", "rn", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // §2.7 U1 — schema-aligned union of two aggregates.
    "q16_union_tagged" -> ((s, d) => {
      def side(status: String) =
        Tables.orders(s, d).filter(col("o_orderstatus") === status)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .withColumn("status_tag", lit(status))
      side("F").unionByName(side("O"))
        .select("status_tag", "o_orderpriority", "n", "total")
        .orderBy("status_tag", "o_orderpriority")
    }),

    // §2.4 A4 / §2.6 O3 — distinct + sort.
    "q17_distinct_segments" -> ((s, d) =>
      Tables.customer(s, d).select("c_mktsegment").distinct().orderBy("c_mktsegment")),

    // §2.1 S3/S4 + §2.4 A1-A3 — info(): literal DF built from
    // collected tiny aggregates (reference data.py:70-95 shape).
    "q18_info_stats" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .agg(count(lit(1)).as("n"), countDistinct("o_custkey").as("nc"),
             date_format(min("o_orderdate"), "yyyy-MM-dd").as("mn"),
             date_format(max("o_orderdate"), "yyyy-MM-dd").as("mx"))
        .head()
      val nLine = Tables.lineitem(s, d).count()
      val nCust = Tables.customer(s, d).count()
      import s.implicits._
      Seq(
        ("customers_total", nCust.toString),
        ("first_order_date", o.getString(2)),
        ("last_order_date", o.getString(3)),
        ("lineitem_rows", nLine.toString),
        ("orders_customers", o.getLong(1).toString),
        ("orders_rows", o.getLong(0).toString),
      ).toDF("metric", "value").orderBy("metric")
    }),

    // §2.10 composite: the full indicators-pipeline shape
    // (filter -> dedup-keep-last -> pivot -> derived cols -> trailing
    // lag average -> cutoff-guarded ratio) over testdata. Mirrors
    // finlogic.Indicators.build stage-for-stage.
    "q37_indicators_pipeline" -> ((s, d) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val safe = Seq("p_urgent", "p_high", "p_medium", "p_notspec", "p_low")
      // cast to long: DuckDB's year() returns BIGINT
      val o = Tables.orders(s, d).withColumn("yr", year(col("o_orderdate")).cast("long"))
      val latest = Kernels.dedupKeepLast(o,
        Seq("o_custkey", "yr", "o_orderpriority"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      val wide0 = latest.groupBy("o_custkey", "yr")
        .pivot("o_orderpriority", prios)
        .agg(round(sum("o_totalprice"), 2))
      val wide = prios.zip(safe).foldLeft(wide0) {
        case (df, (p, n)) => df.withColumnRenamed(p, n)
      }.na.fill(0.0, safe)
      val derived = wide
        .withColumn("total", safe.map(col).reduce(_ + _))
        .withColumn("urgent_ratio",
          when(col("total") > 50000, round(col("p_urgent") / col("total"), 6))
            .otherwise(0.0))
      val w = Window.partitionBy("o_custkey").orderBy("yr")
      derived
        .withColumn("avg_total",
          round((col("total") + coalesce(lag("total", 1).over(w), col("total"))) / 2, 4))
        .select("o_custkey", "yr", "p_urgent", "p_high", "total", "urgent_ratio", "avg_total")
        .orderBy("o_custkey", "yr")
    }),

    // Set operations: INTERSECT / EXCEPT (beyond-reference §2.7).
    "q38_setops" -> ((s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F").select("o_custkey")
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O").select("o_custkey")
      val both = f.intersect(o).withColumn("relation", lit("both"))
      val fOnly = f.except(o).withColumn("relation", lit("f_only"))
      both.unionByName(fOnly)
        .groupBy("relation").agg(count(lit(1)).as("n_customers"))
        .orderBy("relation")
    }),

    // Statistical aggregates: stddev/corr/covar (beyond reference).
    // Computed from explicitly mirrored sufficient sums (count, sum(x),
    // sum(x*x), sum(x*y)) with the SAME arithmetic on both engines,
    // instead of the built-in streaming co-moment aggregates whose
    // last-ulp accumulation differs between Spark and DuckDB (the
    // round-1 hash mismatch). `+ 0.0` after round normalizes the -0.0
    // that round() yields for tiny negative covariances (cov_disc_tax
    // is ~-2e-7 here) — IEEE -0.0 and 0.0 hash differently.
    // RESIDUAL RISK (same class as the q14 note): the sufficient sums
    // themselves are double accumulations whose order differs between
    // Spark partial aggregation (partition-count/AQE dependent) and
    // DuckDB's scan, so a 6dp round can still land on different sides
    // of a half at OTHER scales or SPARK_GRAFT_CPUS settings than the
    // driver's. Exact-decimal accumulation would remove it but these
    // measure columns are float-derived doubles; accepted + documented.
    "q39_stats_agg" -> ((s, d) => {
      val q = col("l_quantity"); val p = col("l_extendedprice")
      val dc = col("l_discount"); val tx = col("l_tax")
      val agg = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
             sum(q).as("sq"), sum(q * q).as("sqq"),
             sum(p).as("sp"), sum(p * p).as("spp"), sum(q * p).as("sqp"),
             sum(dc).as("sd"), sum(dc * dc).as("sdd"),
             sum(tx).as("st"), sum(tx * tx).as("stt"), sum(dc * tx).as("sdt"))
      agg.select(col("l_returnflag"),
          (round(sqrt((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1)), 6) + 0.0).as("sd_qty"),
          (round((col("sqp") - col("sq") * col("sp") / col("n")) /
            (sqrt(col("sqq") - col("sq") * col("sq") / col("n")) *
             sqrt(col("spp") - col("sp") * col("sp") / col("n"))), 6) + 0.0).as("corr_qty_price"),
          (round((col("sdt") - col("sd") * col("st") / col("n")) / (col("n") - 1), 6) + 0.0).as("cov_disc_tax"),
          (round((col("sdd") - col("sd") * col("sd") / col("n")) / (col("n") - 1), 6) + 0.0).as("var_disc"))
        .orderBy("l_returnflag")
    }),

    // Exact interpolated percentiles per group (beyond reference).
    "q40_percentiles" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
             round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
             round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy("o_orderpriority")),

    // The spark.sql(...) API surface: TPC-H Q3-shaped query run as a
    // SQL string over temp views (same engine, SQL front door).
    "q47_sql_tpch_q3" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")
    }),

    // §2.1 S2 (explicit schema at read — no footer inference), §2.8
    // F4 upper(), F10 lit(true) pass-through, plus a float->int cast
    // via floor (ANSI double->long truncation and DuckDB's CAST round
    // half-even disagree; floor first is engine-neutral).
    "q55_cast_upper_flags" -> ((s, d) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_nationkey", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c_acctbal", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("c_mktsegment", org.apache.spark.sql.types.StringType)))
      s.read.schema(schema).parquet(s"$d/customer.parquet")
        .filter(lit(true))
        .select(col("c_custkey"),
                col("c_custkey").cast("string").as("cust_str"),
                upper(col("c_name")).as("name_up"),
                col("c_nationkey").cast("long").as("nation_l"),
                floor(col("c_acctbal")).cast("long").as("bal_floor"),
                lit(true).as("all_rows"))
        .orderBy("c_custkey")
    }),

    // Rollup aggregation (beyond reference; grouping-sets family).
    "q19_rollup_pricing" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), round(sum("l_extendedprice"), 2).as("total_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
                col("n_rows"), col("total_price"))
        .orderBy("returnflag", "linestatus")),

    // CUBE — q19's rollup covers the (a,b)/(a)/() prefix sets; cube
    // adds the (b)-only slice, completing the grouping-sets family.
    // Keys coalesce to 'ALL' so null ordering never differs between
    // engines (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
    "q115_cube_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("total_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                col("n_orders"), col("total_price"))
        .orderBy("status", "priority")),

    // Column profiling (Kernels.profile) — the Deequ-style validation
    // table: row/null/distinct counts and min/max per column in ONE
    // pass. Timestamp/double columns stay out of the profile list
    // here because their ->string formatting is engine-specific; the
    // operator documents the same caveat.
    "q117_profile_orders" -> ((s, d) =>
      graft.ops.Kernels.profile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("column")),

    // Data-quality expectation suite (Kernels.expectations — profile
    // DESCRIBES, this JUDGES): five rules over orders in ONE
    // aggregate pass (each rule a conditional sum; |rules|-independent
    // scan cost). A null predicate counts as a violation — "could not
    // establish the rule" must fail a gate, not slip through.
    "q125_expectations_orders" -> ((s, d) =>
      graft.ops.Kernels.expectations(Tables.orders(s, d), Seq(
          "key_positive" -> (col("o_orderkey") > 0),
          "price_positive" -> (col("o_totalprice") > 0),
          "status_known" -> col("o_orderstatus").isin("F", "O", "P"),
          "priority_prefixed" -> col("o_orderpriority").rlike("^[1-5]-"),
          "date_in_range" -> (col("o_orderdate").isNotNull &&
            year(col("o_orderdate")).between(1990, 2005))))
        .orderBy("rule")),

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

    // Release MANIFEST — dataset-versioning integrity: one row per
    // table with its row count and an ORDER-INDEPENDENT key checksum
    // (sum over rows of md5-derived 52-bit ints mod 1000003 — an
    // exact integer sum, so partitioning/order can't move it; the
    // md5 replay is the established q107 pattern). A consumer
    // re-runs this over a delivered snapshot and diffs. Ten
    // independent single-pass aggregates, each pruned to its key
    // columns.
    "q154_release_manifest" -> ((s, d) => {
      def h(key: Column) =
        conv(substring(md5(key), 1, 13), 16, 10).cast("long") % 1000003L
      def row(name: String, df: DataFrame, key: Column) =
        df.agg(count(lit(1)).as("n_rows"), sum(h(key)).as("key_checksum"))
          .select(lit(name).as("table_name"), col("n_rows"),
                  col("key_checksum"))
      row("customer", Tables.customer(s, d), col("c_custkey").cast("string"))
        .unionByName(row("documents", Tables.documents(s, d),
          col("doc_id").cast("string")))
        .unionByName(row("embeddings", Tables.embeddings(s, d),
          col("vec_id").cast("string")))
        .unionByName(row("events", Tables.events(s, d),
          col("event_id").cast("string")))
        .unionByName(row("lineitem", Tables.lineitem(s, d),
          concat(col("l_orderkey").cast("string"), lit("|"),
                 col("l_linenumber").cast("string"))))
        .unionByName(row("nation", Tables.nation(s, d),
          col("n_nationkey").cast("string")))
        .unionByName(row("orders", Tables.orders(s, d),
          col("o_orderkey").cast("string")))
        .unionByName(row("part", Tables.part(s, d),
          col("p_partkey").cast("string")))
        .unionByName(row("region", Tables.region(s, d),
          col("r_regionkey").cast("string")))
        .unionByName(row("supplier", Tables.supplier(s, d),
          col("s_suppkey").cast("string")))
        .orderBy("table_name")
    }),

    // Interval SWEEP-LINE: how many order lines are "in fulfillment"
    // (ordered, not yet shipped) on each calendar day — the classic
    // +1/-1 boundary-event cumsum that a join-per-day would compute
    // quadratically. The raw deltas aggregate to ONE row per
    // distinct date FIRST (the big shuffle, with map-side combine);
    // the running sum then runs over that tiny daily frame — the
    // single-partition window is over |dates| rows by construction,
    // never over the fact table (the q119 denseIndex lesson).
    "q155_inflight_sweep" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      val deltas = li
        .select(to_date(col("o_orderdate")).as("day"), lit(1L).as("delta"))
        .unionByName(li.select(
          date_add(to_date(col("l_shipdate")), 1).as("day"),
          lit(-1L).as("delta")))
        .groupBy("day").agg(sum("delta").as("net"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      deltas
        .withColumn("in_flight", sum("net").over(w))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
                col("net"), col("in_flight"))
        .orderBy("day")
    }),

    // k-anonymity audit — the privacy gate a training-data release
    // runs over quasi-identifiers: group sizes on (nationkey,
    // mktsegment), then for each k threshold the number of groups
    // smaller than k and the rows they expose. One aggregate + a
    // 4-way threshold explode over the (tiny) group table.
    "q152_k_anonymity" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("sz"))
        .select(col("sz"),
          explode(array(lit(2), lit(5), lit(10), lit(20))).as("k"))
        .groupBy("k")
        .agg(sum(when(col("sz") < col("k"), 1L).otherwise(0L))
               .as("n_violating_groups"),
             sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
               .as("rows_at_risk"),
             min("sz").as("min_group_size"),
             count(lit(1)).as("n_groups"))
        .orderBy("k")),

    // Benford first-digit audit — the order-of-magnitude fraud/
    // quality signal: observed first-digit shares of o_totalprice vs
    // the Benford expectation. The digit comes from the exact CENTS
    // integer's decimal string (2dp grid -> x100 shifts the decimal
    // point, so the leading digit is the price's; never float log10),
    // shares are floor-ppm (the q142 rule), and the Benford targets
    // are INTEGER ppm literals — computing floor(log10(1+1/d)*1e6)
    // at run time could flip the floor by one ulp.
    "q153_benford_audit" -> ((s, d) => {
      val cents = expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
      val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L)
      val bCol = benford.zipWithIndex.foldLeft(lit(null).cast("long")) {
        case (acc, (ppm, i)) =>
          when(col("first_digit") === (i + 1).toString, lit(ppm)).otherwise(acc)
      }
      val digits = Tables.orders(s, d)
        .filter(col("o_totalprice") > 0)
        .select(substring(cents.cast("string"), 1, 1).as("first_digit"))
        .groupBy("first_digit").agg(count(lit(1)).as("n"))
      digits.crossJoin(broadcast(digits.agg(sum("n").as("__tot"))))
        .select(col("first_digit"), col("n"),
          floor(col("n") * 1000000.0 / col("__tot")).cast("long")
            .as("share_ppm"),
          bCol.as("benford_ppm"))
        .withColumn("dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
        .orderBy("first_digit")
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
      val li = Tables.lineitem(s, d)
        .select("l_returnflag", "l_quantity", "l_extendedprice")
      val med = Kernels.groupQuantilesWide(li, "l_returnflag",
        "l_extendedprice", Seq(0.5 -> "__med"))
      val mad = Kernels.groupQuantilesWide(
        li.join(med, "l_returnflag")
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

    // WEIGHTED PageRank (Graphs.pageRankWeighted): the same
    // customer-supplier graph, but mass flows proportionally to the
    // number of shared order lines — co-occurrence STRENGTH drives
    // the walk, not bare adjacency (the q90 special case w≡1).
    // Emits rank×N (q121's magnitude rule) on the rounded-score
    // order; the oracle unrolls both sweeps with the weighted mass
    // term and the same `(1.0 - 0.85)` literal.
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
    // (1-d) as `(1.0 - 0.85)` — the same IEEE subtraction the Scala
    // side folds, which the decimal literal 0.15 does NOT parse to.
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

    // Largest-remainder (Hamilton) apportionment: allocate exactly
    // 1,000,000 units across nations proportionally to revenue, in
    // EXACT integer arithmetic — floor shares via integer division,
    // then the leftover units go to the largest fractional remainders
    // (ties to the lower nation key). The "allocations must sum
    // exactly to the budget" operator every billing/quota pipeline
    // needs — naive round() over- or under-shoots. cents*1e6 stays
    // within Long for any realistic per-key revenue (documented
    // bound: tot < 9.2e12 cents ≈ $92B). The remainder ranking is a
    // top-R selection (TakeOrdered at scale), never a data-sized
    // driver collect.
    "q176_largest_remainder" -> ((s, d) => {
      // staged: the total and the share pass both read it
      val cents = graft.ops.Staging.stage(
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey")
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("cents")))
      val tot = cents.agg(sum("cents").as("__tot"))
      val fl = cents.crossJoin(broadcast(tot))
        .select(col("c_nationkey"), col("cents"),
          expr("(cents * 1000000) div __tot").as("__fl"),
          expr("(cents * 1000000) % __tot").as("__rem"))
      val used = fl.agg((lit(1000000L) - sum("__fl")).as("__leftover"))
      fl.withColumn("__rk",
          row_number().over(Window.orderBy(col("__rem").desc,
                                           col("c_nationkey"))))
        .crossJoin(broadcast(used))
        .select(col("c_nationkey"), col("cents"),
          (col("__fl") + when(col("__rk") <= col("__leftover"), 1L)
            .otherwise(0L)).as("units"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("cents"), col("units"))
        .orderBy("nation")
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

    // TPC-H Q5 (local supplier volume): the 6-way join optimizer
    // stressor — customer x orders x lineitem x supplier x nation x
    // region with the customer-nation = supplier-nation correlation
    // predicate. Declared as plain DataFrame joins: Catalyst prunes
    // columns into every scan, pushes the region/date filters down,
    // and broadcasts the three dimension tables (nation/region tiny,
    // supplier SF-bounded) so only the orders-lineitem join shuffles.
    // Revenue sums round 2dp; ordering on the rounded value with the
    // nation tie-break.
    "q185_tpch_q5" -> ((s, d) => {
      val asia = Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            expr("o_orderdate >= timestamp'1996-01-01'") &&
            expr("o_orderdate < timestamp'1997-01-01'"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
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

    // TPC-H Q3 (shipping priority, adapted to the testdata schema:
    // o_orderpriority stands in for the absent o_shippriority): the
    // classic filter-pushdown + join-order stressor — segment filter
    // on customer (pushed to the scan), date filters on both orders
    // and lineitem, 3-way join, per-order revenue rollup, top 10.
    // Revenue follows the q185 float contract (round(sum, 2)); the
    // total order is (rounded revenue DESC, l_orderkey).
    "q206_tpch_q3" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(expr("o_orderdate < timestamp'1997-06-01'"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(expr("l_shipdate > timestamp'1997-06-01'"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),

    // TPC-H Q10 (returned-item reporting, adapted: the testdata
    // customer has no address/phone/comment columns): customers who
    // returned items in a quarter, ranked by lost revenue. The
    // one-quarter date band prunes orders before the join; returnflag
    // prunes lineitem at the scan; nation is a broadcast dim.
    "q207_tpch_q10" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(expr("o_orderdate >= timestamp'1997-10-01'") &&
                expr("o_orderdate < timestamp'1998-01-01'"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // Snapshot reconciliation (Reconcile.snapshotDiff — the table
    // diff every incremental pipeline runs for audit/backfill
    // validation): v1 = orders before 1997; v2 = v1 with every 13th
    // key dropped, every 7th price bumped by exactly +1.0 (exact in
    // IEEE for any realistic price, so the changed-set is
    // deterministic on both engines), and the next two months
    // appended. ONE full-outer exchange on the key classifies every
    // row added/removed/changed/unchanged with null-safe per-column
    // change flags; the driver row rolls the statuses up.
    "q209_snapshot_diff" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      val v1 = base.filter(expr("o_orderdate < timestamp'1997-01-01'"))
      val v2 = v1.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
        .unionByName(base.filter(
          expr("o_orderdate >= timestamp'1997-01-01'") &&
          expr("o_orderdate < timestamp'1997-03-01'")))
      graft.ops.Reconcile.snapshotDiff(v1, v2, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice"))
        .groupBy("diff_status")
        .agg(count(lit(1)).as("n_rows"),
             sum(when(col("o_orderstatus_changed"), 1L).otherwise(0L))
               .as("n_status_changed"),
             sum(when(col("o_totalprice_changed"), 1L).otherwise(0L))
               .as("n_price_changed"))
        .orderBy("diff_status")
    }),

    // The q149 scale substitute exercised as a DRIVER ROW:
    // Kernels.groupQuantiles(exact = false) — additive fixed-width
    // histogram counters + in-bucket interpolation
    // (Sketches.histCounters/histQuantiles), the percentile path
    // whose memory is bounded by value-range/width instead of group
    // size. Every step is exact integer/rational double arithmetic
    // (floor buckets, cumulative counts, ceil(p·N) ranks, one
    // interpolation), so the oracle replays the ESTIMATE bit-exactly
    // — this is the rare approximate operator with an exact oracle.
    "q212_approx_quantiles" -> ((s, d) =>
      Kernels.groupQuantiles(
          Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice"),
          "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.95),
          exact = false, width = 500.0)
        .orderBy("l_returnflag", "p")),

    // Explicit GROUPING SETS (the rollup/cube generalization q19/q115
    // don't cover: an arbitrary set list — here (nation, year),
    // (nation), (year), ()) over order revenue in exact cents.
    // Aggregated-away keys are emitted as sentinels ('ALL' / -1)
    // rather than NULLs so the total ORDER BY needs no cross-engine
    // null-ordering contract.
    "q213_grouping_sets" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), year(col("o_orderdate")).as("yr"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("__c"))
        .groupingSets(
          Seq(Seq(col("n_name"), col("yr")), Seq(col("n_name")),
              Seq(col("yr")), Seq()),
          col("n_name"), col("yr"))
        .agg(count(lit(1)).as("n_orders"), sum("__c").as("cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("yr"), lit(-1)).as("yr"),
          col("n_orders"), col("cents"))
        .orderBy("nation", "yr")),

    // Referential-integrity audit — orphan counts for every FK edge
    // of the star schema via LEFT-ANTI joins (the promote-gate check
    // a warehouse runs on each snapshot; the q125 expectations suite
    // judges columns, this judges RELATIONSHIPS). Each edge is one
    // anti join (semi-join family, shuffle on the key, no row
    // explosion) + two counts. Exact integers; testdata is
    // referentially clean, so every orphan count is a hard 0 — any
    // ingest corruption flips the row.
    "q215_fk_orphans" -> ((s, d) => {
      def edge(rel: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String): DataFrame = {
        val n = child.agg(count(lit(1)).as("n_child_rows"))
        val orphans = child
          .join(parent.select(col(pk)), child(ck) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        n.crossJoin(orphans).select(lit(rel).as("relationship"),
          col("n_child_rows"), col("n_orphans"))
      }
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val na = Tables.nation(s, d)
      edge("customer.nation", c, "c_nationkey", na, "n_nationkey")
        .unionByName(edge("lineitem.order", li, "l_orderkey", o, "o_orderkey"))
        .unionByName(edge("lineitem.part", li, "l_partkey",
          Tables.part(s, d), "p_partkey"))
        .unionByName(edge("lineitem.supplier", li, "l_suppkey", su, "s_suppkey"))
        .unionByName(edge("nation.region", na, "n_regionkey",
          Tables.region(s, d), "r_regionkey"))
        .unionByName(edge("orders.customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(edge("supplier.nation", su, "s_nationkey", na, "n_nationkey"))
        .orderBy("relationship")
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

    // TPC-H Q6 (forecasting revenue change): the pure scan-pushdown
    // showcase — three filters that must all reach the parquet scan
    // (PushedFilters on l_shipdate/l_discount/l_quantity; ReadSchema
    // prunes to 4 columns) feeding one global aggregate, no shuffle
    // beyond the 1-row combine. The discount band compares the SAME
    // parquet doubles against identically-parsed literals on both
    // engines, so the boundary is bit-safe; revenue follows the q185
    // 2dp contract.
    "q220_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(expr("l_shipdate >= timestamp'1997-01-01'") &&
                expr("l_shipdate < timestamp'1998-01-01'") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_rows"),
             round(sum(col("l_extendedprice") * col("l_discount")), 2)
               .as("revenue"))
        .orderBy("n_rows")),

    // TPC-H Q13 (customer distribution): the LEFT-join-then-histogram
    // shape — orders per customer including ZERO-order customers
    // (count(o_orderkey) over a left join counts non-null matches, so
    // no-order customers land in the c_count = 0 bucket), with the
    // classic filtered-join condition (exclude one priority class
    // INSIDE the join, not after it — a post-filter would drop the
    // zero bucket). Exact integers throughout.
    "q221_tpch_q13" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q19 (discounted revenue, adapted to the testdata schema:
    // brand × size-band × quantity-band branches stand in for the
    // absent container/shipmode columns): the DISJUNCTIVE-predicate
    // stressor — three OR branches that each touch BOTH join sides,
    // so the optimizer must keep the join keys clean and push what it
    // can (the p_brand IN superset and quantity range are pushable;
    // the per-branch conjunctions evaluate post-join). q185 float
    // contract on revenue.
    "q222_tpch_q19" -> ((s, d) => {
      val branch1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
      val branch2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(10, 30) && col("l_quantity").between(10, 20)
      val branch3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(20, 50) && col("l_quantity").between(20, 30)
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(branch1 || branch2 || branch3)
        .agg(count(lit(1)).as("n_rows"),
             round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
               .as("revenue"))
        .orderBy("n_rows")
    }),

    // TPC-H Q22 (global sales opportunity, adapted: nation buckets
    // stand in for phone country codes): customers whose balance
    // exceeds the average POSITIVE balance and who never ordered.
    // The threshold is the boundary trap: comparing a double balance
    // against a float average would flip boundary customers on ulp
    // noise, so the comparison is EXACT integer cross-multiplication
    // — cents·n > sum_cents — over exact cents totals. The no-order
    // test is a left-anti join (never NOT IN, which at 100 TB is a
    // broadcast-nested-loop trap and null-hostile).
    "q223_tpch_q22" -> ((s, d) => {
      val cents = expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
      val cust = graft.ops.Staging.stage(
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), cents.as("__cents")))
      val pos = cust.filter(col("__cents") > 0)
        .agg(sum("__cents").as("__sum"), count(lit(1)).as("__n"))
      cust.crossJoin(broadcast(pos))
        .filter(col("__cents") * col("__n") > col("__sum"))
        .join(Tables.orders(s, d).select(col("o_custkey")),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_custs"), sum("__cents").as("total_cents"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n_custs"), col("total_cents"))
        .orderBy("nation")
    }),

    // TPC-H Q7 (volume shipping): bidirectional nation-pair trade by
    // ship year — the DOUBLE-dim-alias join (nation joined twice
    // under different roles) plus a symmetric pair predicate. q185
    // float contract; the year comes from l_shipdate on both sides.
    "q224_tpch_q7" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("__ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
                expr("l_shipdate < timestamp'1998-01-01'"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("__sk"))
        .join(n2, col("c_nationkey") === col("__ck"))
        .filter((col("supp_nation") === "NATION_1" &&
                 col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" &&
                 col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
                 year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 (national market share): NATION_3's share of ASIA's
    // PROMO-part order volume per year. The share is a ratio of two
    // float sums (both computed over identical row sets) rounded at
    // 6dp — the q14 rule holds because the true ratio can't sit on an
    // exact decimal half.
    "q225_tpch_q8" -> ((s, d) => {
      val vol = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
              col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
        .select(year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("__v"),
          col("n_name"))
      vol.groupBy("o_year")
        .agg(round(sum(when(col("n_name") === "NATION_3", col("__v"))
               .otherwise(lit(0.0))) / sum(col("__v")), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q14 (promotion effect): PROMO share of monthly revenue —
    // the conditional-aggregate-over-one-scan shape; months anchored
    // by date_format (identical string grid both engines).
    "q226_tpch_q14" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(expr("l_shipdate >= timestamp'1997-01-01'") &&
                expr("l_shipdate < timestamp'1997-07-01'"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(round(sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount")))
              .otherwise(lit(0.0))) * 100.0 /
             sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("promo_pct"))
        .orderBy("month")),

    // TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    // the maximum WITH ties — the filter compares against the 1-row
    // max of the identical raw double revenue (the q204 argmax
    // contract: same doubles, same max, same selected rows), display
    // rounds at 2dp.
    "q227_tpch_q15" -> ((s, d) => {
      val rev = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .filter(expr("l_shipdate >= timestamp'1997-01-01'") &&
                  expr("l_shipdate < timestamp'1997-04-01'"))
          .groupBy("l_suppkey")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("__rev")))
      rev.crossJoin(broadcast(rev.agg(max("__rev").as("__mx"))))
        .filter(col("__rev") === col("__mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
                round(col("__rev"), 2).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (small-quantity-order revenue): lineitems under 20%
    // of their part's average quantity. The threshold is the float
    // trap: qty < 0.2·avg flips boundary rows on division ulps, so
    // the comparison is EXACT — qty·5·cnt < sum_qty with integral-
    // double quantities (exact in IEEE) and exact counts, cross-
    // multiplied. Yearly-average display division by 7.0 at 2dp.
    "q228_tpch_q17" -> ((s, d) => {
      val pavg = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("__pk"))
        .agg(sum("l_quantity").as("__sq"), count(lit(1)).as("__cnt"))
      Tables.lineitem(s, d)
        .join(pavg, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity") * 5.0 * col("__cnt") < col("__sq"))
        .agg(count(lit(1)).as("n_rows"),
             round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
        .orderBy("n_rows")
    }),

    // TPC-H Q18 (large-volume customers): the group-having semi-join
    // stressor — orders whose line quantities sum past a threshold,
    // re-joined to customer and lineitem for the detail rollup. The
    // HAVING frame is one exchange on l_orderkey; its key set then
    // semi-joins the fact scan. Quantities are integral doubles, so
    // their sums are exact in IEEE and the >300 threshold is
    // boundary-safe; ordering is on the 2dp-rounded total price with
    // the order key as tie-break.
    "q200_tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("__q"))
        .filter(col("__q") > 300)
        .select(col("l_orderkey").as("__bk"))
      Tables.lineitem(s, d)
        .join(big, col("l_orderkey") === col("__bk"), "left_semi")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Simpson's-paradox audit — pooled vs stratified comparison of
    // mean order value between high-priority (1-URGENT/2-HIGH) and
    // lower-priority orders, stratified by order status: the
    // aggregation-bias detector every metrics team needs (a pooled
    // diff can flip sign against every stratum when strata sizes
    // confound). EXACT integers end-to-end: cents sums, floor-div
    // means, and the flip flag compares each stratum's diff sign to
    // the pooled sign. One rollup exchange produces the strata AND
    // the pooled row ('ALL', the grouping-null slot); the pooled
    // row's sign broadcasts back for the flag. Scale: cells are
    // |status|×2 — tiny forever.
    "q255_simpson_audit" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .select(col("o_orderstatus"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1L))
            .otherwise(lit(0L)).as("hi"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
        .rollup("o_orderstatus")
        .agg(sum(when(col("hi") === 1, lit(1L)).otherwise(lit(0L)))
               .as("n_hi"),
             sum(when(col("hi") === 1, col("c")).otherwise(lit(0L)))
               .as("c_hi"),
             sum(when(col("hi") === 0, lit(1L)).otherwise(lit(0L)))
               .as("n_lo"),
             sum(when(col("hi") === 0, col("c")).otherwise(lit(0L)))
               .as("c_lo"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("stratum"),
          col("n_hi"), col("n_lo"),
          expr("c_hi div n_hi").as("mean_hi_cents"),
          expr("c_lo div n_lo").as("mean_lo_cents"))
        .withColumn("diff_cents",
          col("mean_hi_cents") - col("mean_lo_cents"))
      val pooled = cells.filter(col("stratum") === "ALL")
        .select(signum(col("diff_cents")).cast("long").as("pooled_sign"))
      cells.crossJoin(broadcast(pooled))
        .withColumn("flipped",
          (signum(col("diff_cents")).cast("long") =!= col("pooled_sign")) &&
            col("stratum") =!= "ALL")
        .orderBy("stratum")
    }),

    // Functional-dependency violation census — data-profiling's FD
    // discovery primitive (q117 profiles columns; q125 checks declared
    // expectations; this MEASURES how far candidate determinancies
    // hold): for each candidate lhs → rhs, the share of lhs groups
    // with more than one distinct rhs. Each census is one aggregate
    // pair (distinct-rhs per group, then the group rollup) — bounded
    // by group count, map-side partial combined; the three candidates
    // union into one frame. Exact integers and ppm floor division.
    "q258_fd_census" -> ((s, d) => {
      def census(df: org.apache.spark.sql.DataFrame, fd: String,
                 lhs: String, rhs: String) =
        df.groupBy(col(lhs).as("__l"))
          .agg(countDistinct(col(rhs)).as("__d"))
          .agg(count(lit(1)).as("n_groups"),
               sum(when(col("__d") > 1, 1L).otherwise(0L))
                 .as("n_violating"))
          .select(lit(fd).as("fd"), col("n_groups"), col("n_violating"),
            expr("(n_violating * 1000000) div n_groups")
              .as("violation_ppm"))
      census(Tables.orders(s, d), "o_custkey->o_orderpriority",
          "o_custkey", "o_orderpriority")
        .union(census(Tables.orders(s, d), "o_orderstatus->o_orderpriority",
          "o_orderstatus", "o_orderpriority"))
        .union(census(Tables.lineitem(s, d), "l_orderkey->l_returnflag",
          "l_orderkey", "l_returnflag"))
        .orderBy("fd")
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

    // Interval-UNION coverage per customer — "how many distinct days
    // was at least one order in flight?": merge each customer's
    // [orderdate, last shipdate] intervals and measure the union
    // length, the uptime/SLA/occupancy primitive (q155's in-flight
    // sweep is the corpus-wide daily census; this is the per-key
    // union length). The merge is a prefix-max window over each
    // customer's intervals in (start, end, orderkey) total order —
    // covered_i = max(0, end_i − max(start_i, max-prev-end)) on exact
    // epoch-day integers, half-open [s, e+1). One exchange on the
    // customer; never a per-key collect. Top 20 by covered days.
    "q280_interval_coverage" -> ((s, d) => {
      val iv = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(min(expr("datediff(to_date(o_orderdate), DATE'1990-01-01')"))
               .as("s"),
             max(expr("datediff(to_date(l_shipdate), DATE'1990-01-01') + 1"))
               .as("e"))
      val w = Window.partitionBy("o_custkey")
        .orderBy("s", "e", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
      iv.withColumn("__pm", max("e").over(w))
        .select(col("o_custkey"),
          greatest(lit(0L),
            col("e") - greatest(col("s"), coalesce(col("__pm"), col("s"))))
            .as("cov"),
          col("s"), col("e"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum("cov").as("covered_days"),
             (max("e") - min("s")).as("span_days"))
        .withColumn("coverage_ppm",
          expr("(covered_days * 1000000) div span_days"))
        .orderBy(col("covered_days").desc, col("o_custkey"))
        .limit(20)
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
      val sym = graft.ops.Staging.stage(
        edges.union(edges.select(col("b").as("a"), col("a").as("b"))))
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

    // l-diversity histogram over the q265 quasi-identifier — the
    // OTHER release-prep axis: k-anonymity bounds group SIZE, but a
    // group whose sensitive attribute is constant still leaks it
    // (Machanavajjhala et al. 2007). Census: for each distinct count
    // of sensitive values (order status) within a (priority, month)
    // QI group, how many groups and rows sit at that diversity level.
    // Two bounded aggregates, exact integers.
    "q283_l_diversity" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          expr("date_format(o_orderdate, 'yyyy-MM')").as("__m"))
        .agg(countDistinct("o_orderstatus").as("l_diversity"),
             count(lit(1)).as("__sz"))
        .groupBy("l_diversity")
        .agg(count(lit(1)).as("n_groups"), sum("__sz").as("n_rows"),
             min("__sz").as("min_group_size"))
        .orderBy("l_diversity")
    }),

    // Join-fanout histogram — the data-profiling step that prices
    // every join in a pipeline before it runs (a 2^10-fanout bucket
    // predicts the skew q128/q202 salt for): per-key child counts of
    // the two hot joins (orders per customer, lineitems per order),
    // bucketed by floor(log2(n)) computed EXACTLY as
    // length(bin(n)) - 1 — integer bit-length on both engines, never
    // the float log2 whose 1-ulp wobble flips floor() at power-of-two
    // boundaries. Two aggregates over bounded key frames, union
    // tagged.
    "q286_fanout_histogram" -> ((s, d) => {
      def hist(child: DataFrame, key: String, tag: String) =
        child.groupBy(col(key)).agg(count(lit(1)).as("__n"))
          .select((length(expr("bin(__n)")) - 1).cast("long").as("bucket"),
                  col("__n"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_keys"), min("__n").as("min_fanout"),
               max("__n").as("max_fanout"))
          .select(lit(tag).as("relation"), col("bucket"), col("n_keys"),
                  col("min_fanout"), col("max_fanout"))
      hist(Tables.orders(s, d), "o_custkey", "orders_per_customer")
        .unionByName(
          hist(Tables.lineitem(s, d), "l_orderkey", "items_per_order"))
        .orderBy("relation", "bucket")
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

    // Tukey-fence outlier census per nation — the per-group
    // data-cleaning pass q149's global robust stats imply: exact
    // quartiles per (bounded) nation group, 1.5·IQR fences, integer
    // outlier counts. The fences are doubles built from exact-integer
    // cents by IDENTICAL ops on both engines (percentile ≡
    // quantile_cont, the q40 pairing), and every emitted column is an
    // exact integer. Two passes over the staged cents frame; the
    // fence frame is nation-sized and broadcasts.
    "q292_outlier_fence_census" -> ((s, d) => {
      val cents = graft.ops.Staging.stage(
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("c")))
      val fences = cents.groupBy("n_name")
        .agg(expr("percentile(c, 0.25)").as("q1"),
             expr("percentile(c, 0.75)").as("q3"))
        .select(col("n_name"), expr("q1 - (q3 - q1) * 1.5").as("__lo"),
                expr("q3 + (q3 - q1) * 1.5").as("__hi"))
      cents.join(broadcast(fences), "n_name")
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
             sum(when(col("c") < col("__lo"), 1L).otherwise(0L))
               .as("n_low"),
             sum(when(col("c") > col("__hi"), 1L).otherwise(0L))
               .as("n_high"))
        .withColumn("outlier_ppm",
          expr("((n_low + n_high) * 1000000) div n_orders"))
        .orderBy("n_name")
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

    // k-anonymity GENERALIZATION ladder — the release-prep step q152's
    // audit implies: walk the quasi-identifier ladder (priority+month
    // → priority+year → priority → everything) and pick the LEAST
    // general level whose smallest group already satisfies k=50 —
    // Samarati's minimal-generalization selection over a fixed
    // hierarchy. Each level is one aggregate over its (tiny) group
    // table; the chosen level broadcasts back as a 1-row min. All
    // exact integers.
    "q265_k_anon_generalize" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def level(i: Int, qi: Column) =
        o.groupBy(qi.as("__q")).agg(count(lit(1)).as("__sz"))
          .agg(count(lit(1)).as("n_groups"), min("__sz").as("min_group"),
               sum(when(col("__sz") < 50, 1L).otherwise(0L))
                 .as("n_violating"))
          .select(lit(i.toLong).as("level"), col("n_groups"),
            col("min_group"), col("n_violating"))
      val lv = level(0, concat_ws("|", col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM")))
        .union(level(1, concat_ws("|", col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy"))))
        .union(level(2, col("o_orderpriority")))
        .union(level(3, lit("*")))
      val ch = lv.filter(col("n_violating") === 0)
        .agg(min("level").as("__ch"))
      lv.crossJoin(broadcast(ch))
        .select(col("level"), col("n_groups"), col("min_group"),
          col("n_violating"), (col("level") === col("__ch")).as("chosen"))
        .orderBy("level")
    }),

    // Bounded-contribution clipping audit — the differential-privacy
    // prep step (user-level sensitivity bounding, the Abadi et
    // al./DP-SGD clip in aggregate form): cap each customer's
    // contribution to the per-priority revenue total at C = $50k and
    // report what clipping costs. A DP release calibrates noise to
    // C, so the loss_ppm column IS the bias/variance dial. One
    // exchange on (priority, customer), then a priority-bounded
    // rollup; exact cents and floor-ppm.
    "q266_contribution_clipping" -> ((s, d) => {
      val cap = 5000000L // $50k in cents
      val per = Tables.orders(s, d)
        .groupBy("o_orderpriority", "o_custkey")
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("c"))
      per.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_customers"),
             sum("c").as("raw_cents"),
             sum(least(col("c"), lit(cap))).as("clipped_cents"),
             sum(when(col("c") > cap, 1L).otherwise(0L))
               .as("n_clipped"))
        .withColumn("loss_ppm",
          expr("((raw_cents - clipped_cents) * 1000000) div raw_cents"))
        .orderBy("o_orderpriority")
    }),
  )

  /** q293's WOE log term — one ln over an exact integer ratio (the
    * q257 discipline), SHARED text. Explicit DOUBLE casts, never
    * `* 1.0`: Spark parses the 1.0 literal as DECIMAL, and the
    * decimal÷decimal result at precision 38 clamps to scale 6 —
    * a 1e-6 quantization DuckDB (whose decimal division returns
    * DOUBLE) does not apply, measured as ~1e-7 ln divergence. */
  private val WoeLn =
    "ln((CAST(n_good AS DOUBLE) * CAST(tb AS DOUBLE)) / " +
      "(CAST(n_bad AS DOUBLE) * CAST(tg AS DOUBLE)))"

  /** q293's distribution-share gap (good% − bad%), SHARED text, same
    * explicit-DOUBLE rule as [[WoeLn]]. */
  private val WoeShare =
    "CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE) - " +
      "CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)"

  /** q295's 7-day sample standard deviation from exact window moments
    * (n7 = 7 by the filter, s7 long, ss7 decimal) — SHARED text. */
  private val VolText =
    "sqrt((7.0 * CAST(ss7 AS DOUBLE) - " +
      "CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE)) / (7.0 * 6.0))"

  /** q302's varying-limit p-chart bounds (p̄ ± 3·√(p̄(1−p̄)/n)) from
    * exact integer totals — SHARED text, explicit DOUBLE casts (the
    * q293 decimal-literal rule). */
  private val PchartP = "CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)"
  private val PchartUcl =
    s"($PchartP + 3.0 * sqrt($PchartP * (1.0 - $PchartP) / CAST(n AS DOUBLE)))"
  private val PchartLcl =
    s"($PchartP - 3.0 * sqrt($PchartP * (1.0 - $PchartP) / CAST(n AS DOUBLE)))"

  /** q288's Newman modularity closed form from exact integer moments
    * (W = within_edges `w`, m = n_edges, Σd² = sum_deg_sq) — SHARED
    * expression text (the q218/q238 rule); 4m² built by double
    * multiplication so no integer power overflows at any scale. */
  private val ModularityText =
    "CAST(w AS DOUBLE) / CAST(m AS DOUBLE) - " +
      "CAST(sum_deg_sq AS DOUBLE) / " +
      "(2.0 * CAST(m AS DOUBLE) * 2.0 * CAST(m AS DOUBLE))"

  /** q277's degree-assortativity Pearson r from the exact
    * decimal/HUGEINT moment sums — SHARED expression text (the
    * q218/q238 rule). */
  private val AssortText =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
      "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"

  /** q218's closed-form 3×3 normal-equation solve (Cramer), emitted
    * as ONE expression text shared VERBATIM by the Spark selectExpr
    * and the DuckDB oracle — textual identity is what makes every
    * IEEE operation order match, so the 6dp-rounded betas hash. The
    * inputs are the exact integer sufficient statistics
    * (n, Σx, Σxx, Σxy, Σyy) — decimal(38,0) on the Spark side,
    * HUGEINT in the oracle — cast to double once. */
  private def olsSelect: Seq[String] = {
    def D(c: String) = s"CAST($c AS DOUBLE)"
    val (a11, a12, a13) = (D("n"), D("s1"), D("s2"))
    val (a22, a23, a33) = (D("s11"), D("s12"), D("s22"))
    val (b1, b2, b3) = (D("sy"), D("s1y"), D("s2y"))
    val det = s"($a11 * ($a22 * $a33 - $a23 * $a23) - " +
      s"$a12 * ($a12 * $a33 - $a23 * $a13) + " +
      s"$a13 * ($a12 * $a23 - $a22 * $a13))"
    val beta0 = s"(($b1 * ($a22 * $a33 - $a23 * $a23) - " +
      s"$a12 * ($b2 * $a33 - $a23 * $b3) + " +
      s"$a13 * ($b2 * $a23 - $a22 * $b3)) / $det)"
    val beta1 = s"(($a11 * ($b2 * $a33 - $a23 * $b3) - " +
      s"$b1 * ($a12 * $a33 - $a23 * $a13) + " +
      s"$a13 * ($a12 * $b3 - $b2 * $a13)) / $det)"
    val beta2 = s"(($a11 * ($a22 * $b3 - $b2 * $a23) - " +
      s"$a12 * ($a12 * $b3 - $b2 * $a13) + " +
      s"$b1 * ($a12 * $a23 - $a22 * $a13)) / $det)"
    val sse = s"(${D("syy")} - ($b1 * $beta0 + $b2 * $beta1 + $b3 * $beta2))"
    val sst = s"(${D("syy")} - $b1 * $b1 / $a11)"
    Seq(
      "CAST(n AS BIGINT) AS n_rows",
      s"round($beta0, 6) AS beta0",
      s"round($beta1, 6) AS beta1",
      s"round($beta2, 6) AS beta2",
      s"round(1.0 - $sse / $sst, 6) AS r2")
  }

  /** q154's oracle: per-table (count, order-independent key
    * checksum) selects generated from one template — the 13-hex-digit
    * md5 replay (q107's pattern) mod 1000003, summed. */
  private def manifestOracleSql: String = {
    def h(key: String) =
      "CAST(list_sum(list_transform(range(1, 14), " +
        "i -> CAST(strpos('0123456789abcdef', " +
        s"substring(md5($key), CAST(i AS INTEGER), 1)) - 1 AS DOUBLE) " +
        "* power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) AS BIGINT) % 1000003"
    def sel(t: String, key: String) =
      s"SELECT '$t' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,\n" +
        s"  CAST(sum(${h(key)}) AS BIGINT) AS key_checksum FROM $t"
    Seq(
      "customer" -> "CAST(c_custkey AS VARCHAR)",
      "documents" -> "CAST(doc_id AS VARCHAR)",
      "embeddings" -> "CAST(vec_id AS VARCHAR)",
      "events" -> "CAST(event_id AS VARCHAR)",
      "lineitem" ->
        "(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))",
      "nation" -> "CAST(n_nationkey AS VARCHAR)",
      "orders" -> "CAST(o_orderkey AS VARCHAR)",
      "part" -> "CAST(p_partkey AS VARCHAR)",
      "region" -> "CAST(r_regionkey AS VARCHAR)",
      "supplier" -> "CAST(s_suppkey AS VARCHAR)",
    ).map { case (t, k) => sel(t, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  val oracles: Map[String, String] = Map(
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

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_extendedprice),6) AS avg_price,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_quantity < 40
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_topk_customers" ->
      """SELECT o_custkey, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin,

    "q03_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q04_rank_segments" ->
      """WITH latest AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) WHERE rn = 1)
        |SELECT c_custkey, c_name, n_name, c_mktsegment, o_totalprice, o_orderdate
        |FROM latest
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE regexp_matches(c_mktsegment, 'BUILDING|AUTOMOBILE')
        |ORDER BY o_totalprice DESC, c_custkey LIMIT 10""".stripMargin,

    "q05_pivot_status_priority" ->
      """SELECT o_orderstatus,
        | count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
        | count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        | count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        | count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        | count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q06_unpivot_measures" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity),2) AS qty, round(sum(l_extendedprice),2) AS price,
        |    round(sum(l_discount),2) AS disc, round(sum(l_tax),2) AS tax
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'price', price FROM a
        |UNION ALL SELECT l_returnflag, 'disc', disc FROM a
        |UNION ALL SELECT l_returnflag, 'tax', tax FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q07_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q08_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q09_translate_fallback" ->
      """SELECT n_nationkey, n_name,
        | coalesce(r_name, '(?) ' || n_name) AS region_label
        |FROM nation LEFT JOIN (SELECT * FROM region WHERE r_regionkey < 3) r
        |  ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q10_regex_prefix_filter" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        |WHERE (regexp_matches(p_type, '^(PROMO|ECONOMY)')
        |   OR p_name LIKE 'small%' OR p_name LIKE 'red%' OR p_name LIKE 'blue%')
        |  AND len(string_split(p_name, ' ')) <= 2
        |ORDER BY p_partkey""".stripMargin,

    "q11_inlist_filter" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        | round(sum(o_totalprice),2) AS total
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus IN ('F','O')
        |GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "q12_multikey_join" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, round(sum(l_quantity),2) AS ps_qty,
        |    count(*) AS ps_lines
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
        |  round(l.l_quantity / ps.ps_qty, 6) AS qty_share, ps.ps_lines
        |FROM lineitem l JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "q13_conditional_buckets" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 1000 THEN 'low'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        | count(*) AS n,
        | round(sum(coalesce(nullif(c_acctbal, 0.0), -1.0)),2) AS sum_nz_bal,
        | round(avg(c_acctbal),6) AS avg_bal
        |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q14_window_lag_avg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | round((o_totalprice + coalesce(lag(o_totalprice, 1) OVER w, o_totalprice)) / 2, 4) AS trail2,
        | round((o_totalprice + coalesce(lag(o_totalprice, 4) OVER w,
        |                                lag(o_totalprice, 1) OVER w, o_totalprice)) / 2, 4) AS trail4
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q15_running_window" ->
      """SELECT o_custkey, o_orderkey,
        | row_number() OVER w AS rn,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q16_union_tagged" ->
      """SELECT 'F' AS status_tag, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice),2) AS total
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'O', o_orderpriority, count(*), round(sum(o_totalprice),2)
        |FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
        |ORDER BY status_tag, o_orderpriority""".stripMargin,

    "q17_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q18_info_stats" ->
      """SELECT 'customers_total' AS metric, CAST(count(*) AS VARCHAR) AS value FROM customer
        |UNION ALL SELECT 'first_order_date', CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'last_order_date', CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'lineitem_rows', CAST(count(*) AS VARCHAR) FROM lineitem
        |UNION ALL SELECT 'orders_customers', CAST(count(DISTINCT o_custkey) AS VARCHAR) FROM orders
        |UNION ALL SELECT 'orders_rows', CAST(count(*) AS VARCHAR) FROM orders
        |ORDER BY metric""".stripMargin,

    "q37_indicators_pipeline" ->
      """WITH latest AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, year(o_orderdate) AS yr, o_orderpriority, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, year(o_orderdate), o_orderpriority
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1),
        |wide AS (
        |  SELECT o_custkey, yr,
        |    coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2), 0.0) AS p_urgent,
        |    coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '2-HIGH'), 2), 0.0) AS p_high,
        |    coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '3-MEDIUM'), 2), 0.0) AS p_medium,
        |    coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED'), 2), 0.0) AS p_notspec,
        |    coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 2), 0.0) AS p_low
        |  FROM latest GROUP BY o_custkey, yr),
        |derived AS (
        |  SELECT *, p_urgent + p_high + p_medium + p_notspec + p_low AS total,
        |    CASE WHEN p_urgent + p_high + p_medium + p_notspec + p_low > 50000
        |         THEN round(p_urgent / (p_urgent + p_high + p_medium + p_notspec + p_low), 6)
        |         ELSE 0.0 END AS urgent_ratio
        |  FROM wide)
        |SELECT o_custkey, yr, p_urgent, p_high, total, urgent_ratio,
        |  round((total + coalesce(lag(total, 1) OVER (PARTITION BY o_custkey ORDER BY yr), total)) / 2, 4) AS avg_total
        |FROM derived ORDER BY o_custkey, yr""".stripMargin,

    "q47_sql_tpch_q3" ->
      """SELECT o_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q38_setops" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |     u AS (
        |       SELECT 'both' AS relation, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
        |       UNION ALL
        |       SELECT 'f_only', o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o))
        |SELECT relation, count(*) AS n_customers FROM u
        |GROUP BY relation ORDER BY relation""".stripMargin,

    "q39_stats_agg" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    sum(l_quantity) AS sq, sum(l_quantity*l_quantity) AS sqq,
        |    sum(l_extendedprice) AS sp, sum(l_extendedprice*l_extendedprice) AS spp,
        |    sum(l_quantity*l_extendedprice) AS sqp,
        |    sum(l_discount) AS sd, sum(l_discount*l_discount) AS sdd,
        |    sum(l_tax) AS st, sum(l_tax*l_tax) AS stt,
        |    sum(l_discount*l_tax) AS sdt
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | round(sqrt((sqq - sq*sq/n)/(n-1)), 6) + 0.0 AS sd_qty,
        | round((sqp - sq*sp/n)/(sqrt(sqq - sq*sq/n)*sqrt(spp - sp*sp/n)), 6) + 0.0 AS corr_qty_price,
        | round((sdt - sd*st/n)/(n-1), 6) + 0.0 AS cov_disc_tax,
        | round((sdd - sd*sd/n)/(n-1), 6) + 0.0 AS var_disc
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q40_percentiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q55_cast_upper_flags" ->
      """SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS cust_str,
        | upper(c_name) AS name_up,
        | CAST(c_nationkey AS BIGINT) AS nation_l,
        | CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
        | true AS all_rows
        |FROM customer WHERE true ORDER BY c_custkey""".stripMargin,

    "q19_rollup_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n_rows, round(sum(l_extendedprice),2) AS total_price
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q115_cube_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q117_profile_orders" -> Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority").map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\""),

    "q154_release_manifest" -> manifestOracleSql,

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

    "q155_inflight_sweep" ->
      """WITH li AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS od,
        |         CAST(l.l_shipdate AS DATE) AS sd
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |dd AS (
        |  SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM (
        |    SELECT od AS day, 1 AS delta FROM li
        |    UNION ALL
        |    SELECT sd + 1 AS day, -1 AS delta FROM li)
        |  GROUP BY day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, net,
        |  CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |       AS BIGINT) AS in_flight
        |FROM dd ORDER BY day""".stripMargin,

    "q152_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
        |  FROM customer GROUP BY 1, 2),
        |x AS (SELECT sz, unnest([2, 5, 10, 20]) AS k FROM g)
        |SELECT k,
        |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_groups,
        |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(min(sz) AS BIGINT) AS min_group_size,
        |  CAST(count(*) AS BIGINT) AS n_groups
        |FROM x GROUP BY k ORDER BY k""".stripMargin,

    "q153_benford_audit" ->
      """WITH d AS (
        |  SELECT substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |                    AS VARCHAR), 1, 1) AS first_digit
        |  FROM orders WHERE o_totalprice > 0),
        |c AS (SELECT first_digit, count(*) AS n FROM d GROUP BY first_digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT first_digit, n,
        |  CAST(floor(n * 1000000.0 / tot) AS BIGINT) AS share_ppm,
        |  CAST(CASE first_digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
        |    WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181
        |    WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153
        |    WHEN '9' THEN 45757 END AS BIGINT) AS benford_ppm,
        |  abs(CAST(floor(n * 1000000.0 / tot) AS BIGINT) -
        |      CASE first_digit WHEN '1' THEN 301030 WHEN '2' THEN 176091
        |        WHEN '3' THEN 124939 WHEN '4' THEN 96910 WHEN '5' THEN 79181
        |        WHEN '6' THEN 66947 WHEN '7' THEN 57992 WHEN '8' THEN 51153
        |        WHEN '9' THEN 45757 END) AS dev_ppm
        |FROM c, t ORDER BY first_digit""".stripMargin,

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

    "q168_pagerank_weighted" ->
      """WITH e0 AS (
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
        |         (1.0 - 0.85) / nn + 0.85 * sum(r.pr * s.w / d.wtot) AS pr
        |       FROM sym s JOIN r0 r ON s.src = r.node
        |                  JOIN wt d ON s.src = d.src, n
        |       GROUP BY s.dst, nn),
        |r2 AS (SELECT s.dst AS node,
        |         (1.0 - 0.85) / nn + 0.85 * sum(r.pr * s.w / d.wtot) AS pr
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
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |sym AS (SELECT a AS src, b AS dst FROM e0
        |        UNION SELECT b AS src, a AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM deg),
        |r0 AS (SELECT src AS node, 1.0 / nn AS pr FROM deg, n),
        |r1 AS (SELECT s.dst AS node,
        |         (1.0 - 0.85) / nn + 0.85 * sum(r.pr / d.deg) AS pr
        |       FROM sym s JOIN r0 r ON s.src = r.node
        |                  JOIN deg d ON s.src = d.src, n
        |       GROUP BY s.dst, nn),
        |r2 AS (SELECT s.dst AS node,
        |         (1.0 - 0.85) / nn + 0.85 * sum(r.pr / d.deg) AS pr
        |       FROM sym s JOIN r1 r ON s.src = r.node
        |                  JOIN deg d ON s.src = d.src, n
        |       GROUP BY s.dst, nn),
        |r3 AS (SELECT s.dst AS node,
        |         (1.0 - 0.85) / nn + 0.85 * sum(r.pr / d.deg) AS pr
        |       FROM sym s JOIN r2 r ON s.src = r.node
        |                  JOIN deg d ON s.src = d.src, n
        |       GROUP BY s.dst, nn)
        |SELECT r3.node, deg.deg AS degree, round(r3.pr, 6) AS pagerank
        |FROM r3 JOIN deg ON r3.node = deg.src
        |ORDER BY round(r3.pr, 6) DESC, r3.node LIMIT 20""".stripMargin,

    // One row per rule; violation = NOT rule OR rule IS NULL. DuckDB
    // regexp_matches is unanchored, so the ^ anchor matches Spark's
    // rlike semantics here.
    "q125_expectations_orders" -> Seq(
      ("date_in_range", "o_orderdate IS NOT NULL AND year(o_orderdate) BETWEEN 1990 AND 2005"),
      ("key_positive", "o_orderkey > 0"),
      ("price_positive", "o_totalprice > 0"),
      ("priority_prefixed", "regexp_matches(o_orderpriority, '^[1-5]-')"),
      ("status_known", "o_orderstatus IN ('F', 'O', 'P')")).map {
        case (name, pred) =>
          s"""SELECT '$name' AS rule, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN coalesce($pred, false) THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
             |  round(CAST(sum(CASE WHEN coalesce($pred, false) THEN 0 ELSE 1 END) AS DOUBLE) / count(*), 6) AS violation_rate
             |FROM orders""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY rule"),

    // Unrolls 2 directed sweeps with the dangling term: D_k = sum of
    // pr over outdeg-0 nodes, pr' = (1-d)/N + d*(mass + D/N). (1-d)
    // is written as the IEEE subtraction (1.0 - 0.85), matching the
    // Scala constant fold.
    "q121_pagerank_directed" ->
      """WITH e AS (
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
        |         (1.0 - 0.85) / nn +
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
        |         (1.0 - 0.85) / nn +
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

    "q176_largest_remainder" ->
      """WITH c AS (
        |  SELECT c_nationkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM c),
        |fl AS (SELECT c_nationkey, cents,
        |         (cents * 1000000) // tot AS f,
        |         (cents * 1000000) % tot AS rem
        |       FROM c, t),
        |lo AS (SELECT 1000000 - CAST(sum(f) AS BIGINT) AS leftover FROM fl),
        |rk AS (SELECT *, row_number() OVER (
        |         ORDER BY rem DESC, c_nationkey) AS r FROM fl)
        |SELECT n_name AS nation, cents,
        |  CAST(f + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS units
        |FROM rk JOIN nation ON c_nationkey = n_nationkey, lo
        |ORDER BY nation""".stripMargin,

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

    "q185_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

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

    "q200_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |JOIN big USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

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

    "q224_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q225_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(sum(CASE WHEN n_name = 'NATION_3'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0.0 END)
        |        / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem, part, orders, customer, nation, region
        |WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q226_tpch_q14" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0.0 END) * 100.0
        |        / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1 ORDER BY month""".stripMargin,

    "q227_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(l_extendedprice * (1 - l_discount)) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(r) AS m FROM rev)
        |SELECT s_suppkey, s_name, round(r, 2) AS total_revenue
        |FROM rev, mx
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = m
        |ORDER BY s_suppkey""".stripMargin,

    "q228_tpch_q17" ->
      """WITH p AS (
        |  SELECT l_partkey AS pk, sum(l_quantity) AS sq,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN p ON l_partkey = pk
        |WHERE l_quantity * 5.0 * cnt < sq
        |ORDER BY n_rows""".stripMargin,

    "q221_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q222_tpch_q19" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 30)
        |ORDER BY n_rows""".stripMargin,

    "q223_tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |t AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM c WHERE cents > 0)
        |SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_custs,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM c, t
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE cents * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name ORDER BY nation""".stripMargin,

    "q220_tpch_q6" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24
        |ORDER BY n_rows""".stripMargin,

    "q215_fk_orphans" -> {
      def edge(rel: String, child: String, ck: String,
               parent: String, pk: String) =
        s"""SELECT '$rel' AS relationship,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child_rows,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child c
           |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
           |                     WHERE c.$ck = p.$pk)) AS n_orphans""".stripMargin
      Seq(
        edge("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("lineitem.order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
        edge("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
                 "\n) ORDER BY relationship")
    },

    "q212_approx_quantiles" ->
      """WITH h AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice / 500.0) AS BIGINT) AS b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, b, c,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM h),
        |ps AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS p),
        |sel AS (
        |  SELECT g, p, b, c, cb,
        |    CAST(ceil(p * n) AS BIGINT) AS r
        |  FROM cum, ps
        |  WHERE CAST(ceil(p * n) AS BIGINT) > cb
        |    AND CAST(ceil(p * n) AS BIGINT) <= cb + c)
        |SELECT g AS l_returnflag, p,
        |  round(b * 500.0 + 500.0 * CAST(r - cb AS DOUBLE) / c, 6) AS q_est
        |FROM sel ORDER BY l_returnflag, p""".stripMargin,

    "q213_grouping_sets" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(yr, -1) AS yr,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(c) AS BIGINT) AS cents
        |FROM (
        |  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |GROUP BY GROUPING SETS ((n_name, yr), (n_name), (yr), ())
        |ORDER BY nation, yr""".stripMargin,

    "q209_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |  FROM orders),
        |v1 AS (SELECT * FROM base WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        |v2 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate
        |  FROM v1 WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT * FROM base
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-03-01'),
        |j AS (
        |  SELECT v1.o_orderkey IS NOT NULL AS in1,
        |         v2.o_orderkey IS NOT NULL AS in2,
        |    (v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus) AS st_ch,
        |    (v1.o_totalprice IS DISTINCT FROM v2.o_totalprice) AS pr_ch
        |  FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey),
        |c AS (
        |  SELECT CASE WHEN in1 AND NOT in2 THEN 'removed'
        |              WHEN NOT in1 THEN 'added'
        |              WHEN st_ch OR pr_ch THEN 'changed'
        |              ELSE 'unchanged' END AS diff_status,
        |    (in1 AND in2 AND st_ch) AS stc,
        |    (in1 AND in2 AND pr_ch) AS prc
        |  FROM j)
        |SELECT diff_status, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (stc) AS BIGINT) AS n_status_changed,
        |  CAST(count(*) FILTER (prc) AS BIGINT) AS n_price_changed
        |FROM c GROUP BY 1 ORDER BY diff_status""".stripMargin,

    "q206_tpch_q3" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q207_tpch_q10" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-10-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

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

    // Fence replay: quantile_cont ≡ percentile (the q40 pairing),
    // identical fence arithmetic, integer censuses.
    "q292_outlier_fence_census" ->
      """WITH c AS (
        |  SELECT n_name, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS c
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |f AS (
        |  SELECT n_name, quantile_cont(c, 0.25) AS q1,
        |    quantile_cont(c, 0.75) AS q3
        |  FROM c GROUP BY 1),
        |ff AS (
        |  SELECT n_name, q1 - (q3 - q1) * 1.5 AS lo,
        |    q3 + (q3 - q1) * 1.5 AS hi
        |  FROM f)
        |SELECT c.n_name, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high,
        |  ((CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) +
        |    CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT))
        |   * 1000000) // CAST(count(*) AS BIGINT) AS outlier_ppm
        |FROM c JOIN ff ON c.n_name = ff.n_name
        |GROUP BY c.n_name ORDER BY c.n_name""".stripMargin,

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

    // l-diversity replay: same QI grouping, distinct-sensitive counts
    // and histogram.
    "q283_l_diversity" ->
      """WITH g AS (
        |  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS m,
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS l_diversity,
        |    CAST(count(*) AS BIGINT) AS sz
        |  FROM orders GROUP BY 1, 2)
        |SELECT l_diversity, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(min(sz) AS BIGINT) AS min_group_size
        |FROM g GROUP BY 1 ORDER BY l_diversity""".stripMargin,

    // Fanout replay: same integer bit-length bucket
    // (length(bin(n)) - 1 — never float log2), same per-relation
    // censuses.
    "q286_fanout_histogram" ->
      """WITH oc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM orders
        |  GROUP BY o_custkey),
        |li AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
        |  GROUP BY l_orderkey),
        |u AS (
        |  SELECT 'orders_per_customer' AS relation,
        |    CAST(length(bin(n)) - 1 AS BIGINT) AS bucket, n FROM oc
        |  UNION ALL
        |  SELECT 'items_per_order', CAST(length(bin(n)) - 1 AS BIGINT), n
        |  FROM li)
        |SELECT relation, bucket, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(min(n) AS BIGINT) AS min_fanout,
        |  CAST(max(n) AS BIGINT) AS max_fanout
        |FROM u GROUP BY 1, 2 ORDER BY relation, bucket""".stripMargin,

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

    // Simpson replay: the same ROLLUP cells, floor-div cent means and
    // CASE-sign flip flags — exact integers throughout.
    "q255_simpson_audit" ->
      """WITH o AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |         THEN 1 ELSE 0 END AS hi,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |cells AS (
        |  SELECT coalesce(o_orderstatus, 'ALL') AS stratum,
        |    CAST(sum(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hi,
        |    CAST(sum(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_lo,
        |    CAST(sum(CASE WHEN hi = 1 THEN c ELSE 0 END) AS BIGINT) //
        |      CAST(sum(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS mean_hi_cents,
        |    CAST(sum(CASE WHEN hi = 0 THEN c ELSE 0 END) AS BIGINT) //
        |      CAST(sum(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS mean_lo_cents
        |  FROM o GROUP BY ROLLUP(o_orderstatus)),
        |d AS (
        |  SELECT stratum, n_hi, n_lo, mean_hi_cents, mean_lo_cents,
        |    mean_hi_cents - mean_lo_cents AS diff_cents
        |  FROM cells),
        |p AS (
        |  SELECT CAST(CASE WHEN diff_cents > 0 THEN 1
        |                   WHEN diff_cents < 0 THEN -1 ELSE 0 END
        |         AS BIGINT) AS pooled_sign
        |  FROM d WHERE stratum = 'ALL')
        |SELECT d.*, p.pooled_sign,
        |  (CAST(CASE WHEN diff_cents > 0 THEN 1
        |             WHEN diff_cents < 0 THEN -1 ELSE 0 END AS BIGINT)
        |     <> p.pooled_sign) AND stratum <> 'ALL' AS flipped
        |FROM d CROSS JOIN p ORDER BY stratum""".stripMargin,

    // FD replay: the same three candidate censuses over distinct-rhs
    // group counts.
    "q258_fd_census" ->
      """WITH a AS (
        |  SELECT o_custkey AS l, count(DISTINCT o_orderpriority) AS dd
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT o_orderstatus AS l, count(DISTINCT o_orderpriority) AS dd
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT l_orderkey AS l, count(DISTINCT l_returnflag) AS dd
        |  FROM lineitem GROUP BY 1),
        |u AS (
        |  SELECT 'o_custkey->o_orderpriority' AS fd,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(CASE WHEN dd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating
        |  FROM a
        |  UNION ALL
        |  SELECT 'o_orderstatus->o_orderpriority',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN dd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM b
        |  UNION ALL
        |  SELECT 'l_orderkey->l_returnflag',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN dd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM c)
        |SELECT fd, n_groups, n_violating,
        |  (n_violating * 1000000) // n_groups AS violation_ppm
        |FROM u ORDER BY fd""".stripMargin,

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

    // Coverage replay: the same per-order [start, end+1) epoch-day
    // intervals, (s, e, orderkey)-ordered prefix max and clipped
    // lengths.
    "q280_interval_coverage" ->
      """WITH iv AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(min(date_diff('day', DATE '1990-01-01',
        |      CAST(o_orderdate AS DATE))) AS BIGINT) AS s,
        |    CAST(max(date_diff('day', DATE '1990-01-01',
        |      CAST(l_shipdate AS DATE)) + 1) AS BIGINT) AS e
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |pm AS (
        |  SELECT o_custkey, s, e,
        |    max(e) OVER (PARTITION BY o_custkey ORDER BY s, e, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p
        |  FROM iv),
        |cov AS (
        |  SELECT o_custkey,
        |    greatest(0, e - greatest(s, coalesce(p, s))) AS cov, s, e
        |  FROM pm)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cov) AS BIGINT) AS covered_days,
        |  CAST(max(e) - min(s) AS BIGINT) AS span_days,
        |  (CAST(sum(cov) AS BIGINT) * 1000000) //
        |    CAST(max(e) - min(s) AS BIGINT) AS coverage_ppm
        |FROM cov GROUP BY o_custkey
        |ORDER BY covered_days DESC, o_custkey LIMIT 20""".stripMargin,

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

    // Ladder replay: identical generalized keys per level and the
    // broadcast minimal satisfying level.
    "q265_k_anon_generalize" ->
      """WITH l0 AS (
        |  SELECT 0 AS level, g.* FROM (
        |    SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |      CAST(min(sz) AS BIGINT) AS min_group,
        |      CAST(sum(CASE WHEN sz < 50 THEN 1 ELSE 0 END) AS BIGINT)
        |        AS n_violating
        |    FROM (SELECT count(*) AS sz FROM orders
        |          GROUP BY o_orderpriority || '|' ||
        |                   strftime(o_orderdate, '%Y-%m'))) g),
        |l1 AS (
        |  SELECT 1 AS level, g.* FROM (
        |    SELECT CAST(count(*) AS BIGINT), CAST(min(sz) AS BIGINT),
        |      CAST(sum(CASE WHEN sz < 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM (SELECT count(*) AS sz FROM orders
        |          GROUP BY o_orderpriority || '|' ||
        |                   strftime(o_orderdate, '%Y'))) g),
        |l2 AS (
        |  SELECT 2 AS level, g.* FROM (
        |    SELECT CAST(count(*) AS BIGINT), CAST(min(sz) AS BIGINT),
        |      CAST(sum(CASE WHEN sz < 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM (SELECT count(*) AS sz FROM orders
        |          GROUP BY o_orderpriority)) g),
        |l3 AS (
        |  SELECT 3 AS level, g.* FROM (
        |    SELECT CAST(count(*) AS BIGINT), CAST(min(sz) AS BIGINT),
        |      CAST(sum(CASE WHEN sz < 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM (SELECT count(*) AS sz FROM orders)) g),
        |lv AS (
        |  SELECT * FROM l0 UNION ALL SELECT * FROM l1
        |  UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3),
        |ch AS (
        |  SELECT CAST(min(level) AS BIGINT) AS c FROM lv
        |  WHERE n_violating = 0)
        |SELECT CAST(level AS BIGINT) AS level, n_groups, min_group,
        |  n_violating, level = ch.c AS chosen
        |FROM lv CROSS JOIN ch ORDER BY level""".stripMargin,

    // Clipping replay: same per-customer cents, cap, and floor-ppm
    // loss.
    "q266_contribution_clipping" ->
      """WITH per AS (
        |  SELECT o_orderpriority, o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(c) AS BIGINT) AS raw_cents,
        |  CAST(sum(least(c, 5000000)) AS BIGINT) AS clipped_cents,
        |  CAST(sum(CASE WHEN c > 5000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  ((CAST(sum(c) AS BIGINT) - CAST(sum(least(c, 5000000)) AS BIGINT))
        |    * 1000000) // CAST(sum(c) AS BIGINT) AS loss_ppm
        |FROM per GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
