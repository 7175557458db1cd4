package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Kernels
import graft.tables.Tables
import Relational.{WoeLn, WoeShare, VolText, PchartP, PchartUcl, PchartLcl,
  ModularityText, AssortText, olsSelect, manifestOracleSql}

/** Data-quality / AUDIT / privacy queries: profiling, expectations,
  * k-anonymity + generalization, l-diversity, Benford, manifests,
  * FD census, snapshot diff, coverage, clipping, fences.
  *
  * Split from the single Relational object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[Relational]].
  */
object RelationalAuditQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

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

    // NEYMAN-optimal sampling allocation (Neyman 1934) — the
    // survey-sampling rule every stratified eval-set builder should
    // use instead of proportional draws: a 1000-unit sample budget
    // split across market segments proportional to N_h * sigma_h, so
    // volatile strata get the observations that actually shrink the
    // estimator's variance. N_h*sigma_h = sqrt(n*sumsq - sum^2) from
    // EXACT integer cent moments (decimal(38,0) squares, the q305
    // rule), floored to nano as the integer apportionment weight, and
    // the seats fall out of q176's largest-remainder machinery —
    // exact integer quotas, deterministic remainder ranks. The
    // n-proportional share rides along to show the correction the
    // variance term buys. One join + one group aggregate.
    "q362_neyman_allocation" -> ((s, d) => {
      val strata = graft.ops.Staging.stage(
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("cents"))
          .groupBy("segment")
          .agg(count(lit(1)).as("n"), sum("cents").as("sm"),
               sum(col("cents").cast("decimal(38,0)") *
                   col("cents").cast("decimal(38,0)")).as("sq"))
          .select(col("segment"), col("n"), col("sm"),
            expr(NeymanW).as("w"),
            expr(NeymanSigmaMilli).as("sigma_cents_milli")))
      val tot = strata.agg(sum("w").as("__tot"), sum("n").as("__nt"))
      val fl = strata.crossJoin(broadcast(tot))
        .select(col("segment"), col("n"), col("sigma_cents_milli"),
          expr("(w * 1000000) div __tot").as("neyman_share_ppm"),
          expr("(n * 1000000) div __nt").as("prop_share_ppm"),
          expr("(w * 1000) div __tot").as("__fl"),
          expr("(w * 1000) % __tot").as("__rem"))
      val used = fl.agg((lit(1000L) - sum("__fl")).as("__leftover"))
      fl.withColumn("__rk",
          row_number().over(Window.orderBy(col("__rem").desc,
                                           col("segment"))))
        .crossJoin(broadcast(used))
        .select(col("segment"), col("n").as("n_orders"),
          col("sigma_cents_milli"), col("neyman_share_ppm"),
          col("prop_share_ppm"),
          (col("__fl") + when(col("__rk") <= col("__leftover"), 1L)
            .otherwise(0L)).as("alloc"))
        .orderBy("segment")
    }),

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

  /** q362's Neyman weight N_h*sigma_h = sqrt(n*sumsq - sum^2) and the
    * per-stratum sd, from exact integer cent moments — ONE sqrt core
    * shared by both texts and both engines. */
  private val NeymanSdCore =
    "sqrt(CAST(n AS DOUBLE) * CAST(sq AS DOUBLE) - " +
      "CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))"
  // weight kept at CENT resolution (not nano): N_h*sigma_h in cents
  // is already ~1e11 at sf0.1 and a nano scale would overflow Long;
  // integer cents give 8+ significant digits for a 1000-seat split
  private val NeymanW =
    s"CAST(floor($NeymanSdCore) AS BIGINT)"
  private val NeymanSigmaMilli =
    s"CAST(floor(CAST(1000 AS DOUBLE) * $NeymanSdCore / " +
      "CAST(n AS DOUBLE)) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    // Neyman replay: same integer cent moments (HUGEINT squares
    // mirroring decimal(38,0)), the shared sqrt core, and q176's
    // largest-remainder integer apportionment.
    "q362_neyman_allocation" ->
      s"""WITH o AS (
        |  SELECT c_mktsegment AS segment,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |st AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sm,
        |    sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sq
        |  FROM o GROUP BY segment),
        |w AS (
        |  SELECT segment, n, sm, $NeymanW AS w,
        |    $NeymanSigmaMilli AS sigma_cents_milli
        |  FROM st),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tot,
        |        CAST(sum(n) AS BIGINT) AS nt FROM w),
        |fl AS (
        |  SELECT segment, n, sigma_cents_milli,
        |    (w * 1000000) // tot AS neyman_share_ppm,
        |    (n * 1000000) // nt AS prop_share_ppm,
        |    (w * 1000) // tot AS fl, (w * 1000) % tot AS rem
        |  FROM w CROSS JOIN t),
        |u AS (SELECT CAST(1000 - sum(fl) AS BIGINT) AS leftover FROM fl),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, segment) AS rk
        |  FROM fl)
        |SELECT segment, n AS n_orders, sigma_cents_milli,
        |  neyman_share_ppm, prop_share_ppm,
        |  CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM r CROSS JOIN u ORDER BY segment""".stripMargin,

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
