package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Kernels
import graft.tables.Tables
import Relational.{WoeLn, WoeShare, VolText, PchartP, PchartUcl, PchartLcl,
  ModularityText, AssortText, olsSelect, manifestOracleSql}

/** CORE relational-operator queries (the SURVEY §2 parity rows):
  * select/filter/join/agg/pivot/window/setops/rollup/cube/grouping
  * sets, percentiles, the indicators pipeline.
  *
  * Split from the single Relational object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[Relational]].
  */
object RelationalCoreQueries {
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
  )

  val oracles: Map[String, String] = Map(

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
  )
}
