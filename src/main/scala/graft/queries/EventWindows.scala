package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{AsOf, Cdc}
import graft.ops.Kernels
import graft.tables.Tables
import EventQueries.{TsFmt, CupedNaive, CupedXDiff, CupedTheta, MiTermNano,
  RollingSlope, BootSd, PsiTerm, WelchV1, WelchV2, WelchT, WelchDof,
  hilbertOracleSql, zOrderOracleSql, ewmaOracleSql}

/** Event WINDOW/session/funnel queries: JSON extraction, tumbling/
  * sliding/session windows, sequences, funnels, attribution,
  * cohorts, paths, co-visitation, cooldowns, capped sessions,
  * watermark lateness.
  *
  * Split from the single EventQueries object (r16 maintainability
  * pass): entries and oracle SQL are byte-identical and compose back
  * into the driver map through [[EventQueries]].
  */
object EventWindowsQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // JSON field extraction (events.props) + aggregation.
    "q20_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
             round(avg("k"), 6).as("avg_k"),
             round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")),

    // Tumbling 1h windows — batch form of a streaming windowed agg.
    "q21_hourly_windows" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), TsFmt).as("hour"),
                 col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
        .orderBy("hour", "event_type")),

    // Sliding 2h/1h windows via Spark's native window() generator.
    "q22_sliding_windows" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(date_format(col("window.start"), TsFmt).as("win_start"),
                col("event_type"), col("n_events"))
        .orderBy("win_start", "event_type")),

    // Session windows: 30-minute inactivity gap, per user. The oracle
    // casts ts to microseconds first so both engines compare gaps at
    // the same precision (Spark reads the ns parquet truncated to us).
    "q23_session_windows" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             date_format(min("ts"), TsFmt).as("session_start"),
             date_format(max("ts"), TsFmt).as("session_end"),
             round(sum("value"), 2).as("total_value"))
        .orderBy("user_id", "session_id")
    }),

    // Session SEQUENCE assembly — the behavioral-training-data shape:
    // per (user, session), the time-ordered event-type sequence as a
    // delimited string, truncated to the first 20 events (explicit,
    // oracle-mirrored cap), keeping sessions with >= 3 events. Reuses
    // q23's sessionization; ordering inside the aggregate is total
    // ((ts, event_id) is unique), so the assembled sequence is
    // deterministic on any partitioning. collect_list runs per
    // session (bounded by the session gap); the transform/slice
    // lambdas run on aggregated session rows, not the scan.
    "q68_session_sequences" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             array_join(
               transform(
                 slice(sort_array(collect_list(struct(col("ts"), col("event_id"),
                   col("event_type")))), 1, 20),
                 e => e.getField("event_type")), ">").as("sequence"))
        .filter(col("n_events") >= 3)
        .orderBy("user_id", "session_id")
    }),

    // JSON -> typed struct via from_json (schema'd parse; q20 is the
    // string-extraction form), nested field access + filter.
    "q41_json_struct" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("parsed", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
        .withColumn("k", col("parsed.k"))
        .filter(col("k") > 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // MapType ops: JSON -> map<string,string>, explode entries.
    "q44_map_ops" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .select(col("event_type"), explode(col("m")).as(Seq("key", "value")))
        .groupBy("event_type", "key")
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("long")).as("sum_value"))
        .orderBy("event_type", "key")),

    // Date arithmetic: ship delay in days per priority.
    "q45_date_math" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      Tables.orders(s, d)
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .withColumn("delay_days",
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).cast("long"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
             min("delay_days").as("min_delay"),
             max("delay_days").as("max_delay"),
             round(avg("delay_days"), 6).as("avg_delay"))
        .orderBy("o_orderpriority")
    }),

    // Ordered funnel (Funnel.steps): users reaching view -> click ->
    // purchase, each step strictly after the user's earliest
    // completion of the previous one. Strict `>` is unambiguous here:
    // the ns timestamps have no sub-us components and no per-user
    // same-us pairs (both engines compare at us).
    "q91_funnel_steps" -> ((s, d) =>
      graft.ext.Funnel.steps(Tables.events(s, d), "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"))
        .orderBy("step_idx")),

    // Retention cohort matrix: users bucketed by first-activity week,
    // counted per week offset they return in. Week truncation is
    // Monday-based in both engines; offsets are day-diffs of two
    // week-truncated dates, so they are exact multiples of 7 and the
    // /7 division is exact. One shuffle on user_id (first-week agg),
    // one distinct + count on (cohort, offset).
    "q93_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      val cohort = ev.groupBy("user_id").agg(min("w").as("cw"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cw"),
                (datediff(col("w"), col("cw")) / 7).cast("int").as("week_offset"))
        .distinct()
        .groupBy("cw", "week_offset").agg(count(lit(1)).as("n_users"))
        .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
                col("week_offset"), col("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // First-order Markov transition matrix over per-user event
    // sequences — the behavioral-model summary (and the generator
    // behind q68's session sequences). Counts are exact; the row
    // probability is one division of exact longs.
    "q97_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wp = Window.partitionBy("prev")
      Tables.events(s, d)
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "event_type").agg(count(lit(1)).as("n"))
        .withColumn("p",
          round(col("n").cast("double") / sum("n").over(wp), 6))
        .select(col("prev"), col("event_type").as("next"), col("n"), col("p"))
        .orderBy("prev", "next")
    }),

    // Batch twin of Streams.attributionJoin (the stream-stream join
    // runs the IDENTICAL plan on static frames): every view pairs
    // with the same user's clicks within 30 minutes after it,
    // summarized per user. StreamingSpec pins stream ≡ batch; this
    // row hash-pins the batch semantics against a SQL interval join.
    "q110_attribution_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.streaming.Streams.attributionJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "click"),
          horizon = "30 minutes")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
             countDistinct("view_id").as("n_views_attributed"),
             round(sum("click_value"), 2).as("sum_click_value"))
        .orderBy("user_id")
    }),

    // Time-series resampling with forward-fill — the pandas
    // resample('1h').ffill() shape, composed from existing operators:
    // per-user hourly grid (sequence + explode, map-side) as-of
    // joined backward (AsOf.joinBackward — ONE shuffle, one window
    // pass) to the user's purchases. The first grid point precedes
    // the first purchase (date_trunc rounds down), so the null/unfilled
    // path is exercised deterministically on every user.
    "q111_resample_ffill" -> ((s, d) => {
      val p = graft.ops.Staging.stage(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value")))
      val grid = p.groupBy("user_id")
        .agg(date_trunc("hour", min("ts")).as("t0"),
             date_trunc("hour", max("ts")).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR")))
            .as("grid_ts"))
      graft.ext.AsOf.joinBackward(grid,
          p.select(col("user_id").as("rk"), col("ts").as("rt"), col("value")),
          "user_id", "rk", "grid_ts", "rt", Seq("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_grid"),
             sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_unfilled"),
             round(sum(coalesce(col("value"), lit(0.0))), 2).as("sum_ffill"))
        .orderBy("user_id")
    }),

    // Cumulative distinct users per day by HLL register MERGE — the
    // sketch-composition pattern: per-day registers (Sketches.
    // hllRegisters, the q92 sketch keyed by day), a days × buckets
    // grid (≤ 31 × 256 rows), cumulative per-bucket max down the days
    // (register merge = max, so "union of all days so far" is a
    // window, not a rescan), estimate-on-read per day. The exact
    // equivalent needs count(DISTINCT) over an ever-growing window —
    // O(days · users) state; the sketch path is O(days · 256).
    "q112_cumulative_distinct" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      val regs = graft.ops.Staging.stage(
        graft.ext.Sketches.hllRegisters(ev, "day", "user_id"))
      val grid = regs.select("day").distinct()
        .crossJoin(regs.select("__b").distinct())
      val cum = grid.join(regs, Seq("day", "__b"), "left")
        .withColumn("__cm", max("__m").over(
          w.partitionBy("__b").orderBy("day")
            .rowsBetween(w.unboundedPreceding, 0)))
        .filter(col("__cm").isNotNull)
        .select(col("day"), col("__b"), col("__cm").as("__m"))
      graft.ext.Sketches.hllEstimate(cum, "day")
        .select(col("day"), col("n_buckets"),
                round(col("hll_distinct"), 6).as("cum_users_est"))
        .orderBy("day")
    }),

    // RANGE window frame — the TIME-based trailing window (pandas
    // rolling('2h')): every event sees the count/sum of the same
    // user's events in the 2 hours up to and including it (RANGE
    // frames include all time-ties as peers, per the SQL standard —
    // a ROWS frame could not express this). Per-user peak = the
    // busiest 2-hour burst. Each windowed sum is rounded BEFORE the
    // max so ulp-level accumulation-order noise can't reorder peaks.
    "q116_range_window" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-7200000000L, 0) // 2 hours in microseconds
      Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("value"))
        .withColumn("n2", count(lit(1)).over(w))
        .withColumn("s2", round(sum("value").over(w), 2))
        .groupBy("user_id")
        .agg(max("n2").as("peak_2h_events"), max("s2").as("peak_2h_value"))
        .orderBy("user_id")
    }),

    // Market-basket association over user baskets: for each ordered
    // event-type pair, support / confidence / lift — the classic
    // co-occurrence rule mining (q87's PMI is the token-level
    // sibling; this is the entity-level one). All ratios are floored
    // ppm of EXACT integer counts (n_both*N*1e6 < 2^53, so even the
    // lift numerator is exact).
    "q169_basket_lift" -> ((s, d) => {
      val baskets = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val n = baskets.select("user_id").distinct()
        .agg(count(lit(1)).as("n_users"))
      val per = baskets.groupBy("event_type").agg(count(lit(1)).as("n_t"))
      val pairs = baskets.as("x")
        .join(baskets.as("y"), col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("t_a"),
                 col("y.event_type").as("t_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(per.select(col("event_type").as("t_a"), col("n_t").as("n_a")),
          "t_a")
        .join(per.select(col("event_type").as("t_b"), col("n_t").as("n_b")),
          "t_b")
        .crossJoin(broadcast(n))
        .select(col("t_a"), col("t_b"), col("n_both"), col("n_a"),
          col("n_b"),
          floor(col("n_both") * 1000000.0 / col("n_users")).cast("long")
            .as("support_ppm"),
          floor(col("n_both") * 1000000.0 / col("n_a")).cast("long")
            .as("confidence_ppm"),
          floor(col("n_both") * col("n_users") * 1000000.0 /
            (col("n_a") * col("n_b"))).cast("long").as("lift_ppm"))
        .orderBy("t_a", "t_b")
    }),

    // Markov next-event BACKTEST — train/evaluate with a temporal
    // split (the only honest split for sequence models): transition
    // counts learned on events before 2024-01-16, the per-prev-type
    // argmax prediction (count desc, next-type asc — deterministic)
    // scored on transitions after it. Exact integer counts; accuracy
    // in floored ppm. Transitions never cross the split boundary
    // (both ends must land in the same half).
    "q163_markov_backtest" -> ((s, d) => {
      val cut = lit("2024-01-16").cast("timestamp")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val tr = Tables.events(s, d)
        .withColumn("prev", lag("event_type", 1).over(w))
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .filter(col("prev").isNotNull)
      val train = tr.filter(col("ts") < cut)
        .groupBy(col("prev"), col("event_type").as("nxt"))
        .agg(count(lit(1)).as("cnt"))
      val wBest = Window.partitionBy("prev")
        .orderBy(col("cnt").desc, col("nxt"))
      val model = train.withColumn("__rn", row_number().over(wBest))
        .filter(col("__rn") === 1)
        .select(col("prev"), col("nxt").as("predicted"))
      tr.filter(col("prev_ts") >= cut)
        .join(broadcast(model), "prev")
        .groupBy("prev")
        .agg(count(lit(1)).as("n_test"),
             sum(when(col("event_type") === col("predicted"), 1L)
               .otherwise(0L)).as("n_correct"),
             first("predicted").as("predicted"))
        .select(col("prev"), col("predicted"), col("n_test"),
          col("n_correct"),
          floor(col("n_correct") * 1000000.0 / col("n_test")).cast("long")
            .as("accuracy_ppm"))
        .orderBy("prev")
    }),

    // DAU/WAU stickiness per week — the engagement ratio product
    // teams track. Weeks are ANCHORED AT THE DATA'S MIN DATE
    // (datediff div 7), never an engine's week-of-year numbering
    // (Spark and DuckDB disagree on week boundaries); everything is
    // exact integers, stickiness in ppm.
    "q195_stickiness" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val m = ev.agg(min("day").as("__d0"))
      val wk = graft.ops.Staging.stage(
        ev.crossJoin(broadcast(m))
          .select(expr("datediff(day, __d0) div 7").as("week"),
                  col("day"), col("user_id")))
      val dau = wk.groupBy("week", "day")
        .agg(countDistinct("user_id").as("__dau"))
        .groupBy("week")
        .agg(sum("__dau").as("__sdau"), count(lit(1)).as("n_days"))
      val wau = wk.groupBy("week").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, "week")
        .select(col("week"), col("n_days"),
          expr("__sdau div n_days").as("avg_dau"), col("wau"),
          expr("(__sdau * 1000000) div (n_days * wau)").as("stickiness_ppm"))
        .orderBy("week")
    }),

    // Signup -> purchase conversion latency: per user, first signup
    // and first purchase AFTER it; report the converted count, the
    // conversion rate in exact ppm, and the p50/p90 latency. Latency
    // values are exact integer micros, so interpolated percentiles
    // sit on the 1/20 value grid (≤ 2 decimals — 6dp rounding can
    // never land on a half, the q175 argument). One exchange on
    // user_id, then a 1-row summary. The percentiles ride
    // Kernels.groupQuantilesWide (exact = true — bit-identical to the
    // inlined percentile() this replaced; at 100 TB the same call
    // flips to exact = false, the q149 scale note — a latency SLO
    // only needs bucket-width precision, and exact percentile()
    // buffers the whole population).
    "q198_conversion_latency" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup",
               unix_micros(col("ts")))).as("__su"),
             count(lit(1)).as("__n"))
      val purch = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("__pu"))
      val lat = perUser.filter(col("__su").isNotNull)
        .join(purch, Seq("user_id"), "left")
        .groupBy("user_id")
        // when() nulls out pre-signup purchases, so a user whose only
        // purchases precede signup still counts as an unconverted row
        .agg(first("__su").as("__su"),
             min(when(col("__pu") >= col("__su"), col("__pu"))).as("__fp"))
        .select(col("user_id"), (col("__fp") - col("__su")).as("__lat"))
      // staged: the counts summary and the percentile probes both
      // read the per-user latency frame
      val latS = graft.ops.Staging.stage(lat)
      val counts = latS.agg(count(lit(1)).as("n_signups"),
        count(col("__lat")).as("n_converted"),
        expr("(count(__lat) * 1000000) div count(1)").as("conversion_ppm"))
      val pct = Kernels.groupQuantilesWide(
        latS.select(lit(0).as("__g"), col("__lat")), "__g", "__lat",
        Seq(0.5 -> "__p50", 0.9 -> "__p90"))
      // LEFT join, not crossJoin: the pct frame is a groupBy on a
      // constant key, which yields ZERO rows on an empty latency
      // frame — a crossJoin would annihilate the always-one-row
      // counts aggregate, while the old inline percentile() kept the
      // 1-row shape (nulls). The left join preserves it identically:
      // one matching row when input is nonempty, null probes when not.
      counts.withColumn("__g", lit(0))
        .join(broadcast(pct.select(col("__g"),
            round(col("__p50"), 6).as("p50_latency_us"),
            round(col("__p90"), 6).as("p90_latency_us"))),
          Seq("__g"), "left")
        .drop("__g")
        .orderBy("n_signups")
    }),

    // Negative funnel — "first signup → first purchase within 7 days
    // with NO error strictly between": the EXCLUSION-step pattern a
    // plain ordered funnel (q91) cannot express (the middle step must
    // be ABSENT, not present). Three user-keyed aggregate passes
    // (first signup → windowed first purchase → error-in-band count)
    // that share one hash partitioning; everything is exact
    // integer micros, the rate is exact ppm.
    "q216_negative_funnel" -> ((s, d) => {
      val ev = graft.ops.Staging.stage(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us")))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("__s"))
      val pu = su
        .join(ev.filter(col("event_type") === "purchase"),
              Seq("user_id"), "left")
        .groupBy("user_id")
        .agg(first("__s").as("__s"),
             min(when(col("us") >= col("__s") &&
                      col("us") <= col("__s") + lit(604800000000L),
                      col("us"))).as("__p"))
      pu.join(ev.filter(col("event_type") === "error"),
              Seq("user_id"), "left")
        .groupBy("user_id")
        .agg(first("__p").as("__p"),
             sum(when(col("us") > col("__s") && col("us") < col("__p"), 1L)
               .otherwise(0L)).as("__ne"))
        .agg(count(lit(1)).as("n_signups"),
             count(col("__p")).as("n_converted_7d"),
             sum(when(col("__p").isNotNull && col("__ne") === 0, 1L)
               .otherwise(0L)).as("n_clean"),
             expr("""(sum(CASE WHEN __p IS NOT NULL AND __ne = 0
                         THEN 1 ELSE 0 END) * 1000000) div count(1)""")
               .as("clean_ppm"))
        .orderBy("n_signups")
    }),

    // RFM segmentation — the marketing-analytics staple, computed
    // with DISTRIBUTED quintiles: per user recency (micros since the
    // user's last event to the global max), frequency (events) and
    // monetary (exact cents); each dimension is ranked by
    // Kernels.denseIndex over the TOTAL order (value, user_id) —
    // never a single-partition ntile window — and the quintile is
    // exact integer arithmetic ((rank·5) div n + 1). Output: users
    // and monetary mass per (r,f,m) segment. The user_id tie-break
    // makes every rank (and thus every boundary bucket) identical
    // cross-engine.
    "q219_rfm_segments" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.groupBy("user_id")
        .agg(max(unix_micros(col("ts"))).as("__last"),
             count(lit(1)).as("f"),
             sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("m"))
      val g = users.crossJoin(broadcast(
          ev.agg(max(unix_micros(col("ts"))).as("__gmax"))))
        .select(col("user_id"), (col("__gmax") - col("__last")).as("r"),
                col("f"), col("m"))
      val ranked = Kernels.denseIndex(
        Kernels.denseIndex(
          Kernels.denseIndex(g, Seq(col("r"), col("user_id")), "__ri"),
          Seq(col("f"), col("user_id")), "__fi"),
        Seq(col("m"), col("user_id")), "__mi")
      ranked.crossJoin(broadcast(g.agg(count(lit(1)).as("__n"))))
        .select(
          expr("(__ri * 5) div __n + 1").as("r_q"),
          expr("(__fi * 5) div __n + 1").as("f_q"),
          expr("(__mi * 5) div __n + 1").as("m_q"),
          col("m"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_users"), sum("m").as("cents"))
        .orderBy("r_q", "f_q", "m_q")
    }),

    // Longest consecutive-purchase-day streak per user — the classic
    // gaps-and-islands engagement metric (q68's sessionization is the
    // intra-day sibling; this is the day-grid one). Island id =
    // epoch_day − row_number over the user's DISTINCT active days: an
    // exact integer constant per consecutive run. One exchange on
    // user_id serves the distinct, the window and the rollup.
    "q246_purchase_streaks" -> ((s, d) => {
      val days = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
                expr("unix_micros(ts) div 86400000000").as("dd"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("dd")
      days.withColumn("isl", col("dd") - row_number().over(w))
        .groupBy("user_id", "isl")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").as("longest_streak"),
             sum("len").as("n_active_days"),
             count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    }),

    // Item co-visitation mining over props.k ("users who touched item
    // X also touched Y") — the recommender co-occurrence matrix, at
    // ITEM granularity where q169's basket rules were type-level.
    // Kernels.covisitPairs: per-user pairs over each user's DISTINCT
    // item set (never corpus×corpus), with the maxItemsPerUser
    // occupancy guard available for power-user skew — OFF here so the
    // oracle sees the exact full matrix (KernelsSpec pins the capped
    // pair bound on a planted power user). Top 20 by support with a
    // full integer tie-break.
    "q247_covisitation" -> ((s, d) =>
      Kernels.covisitPairs(
        Tables.events(s, d)
          .select(col("user_id"),
            get_json_object(col("props"), "$.k").cast("long").as("item"))
          .filter(col("item").isNotNull),
        "user_id", "item")
        .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
        .limit(20)),

    // Run-length encoding of per-user event streams (gaps-and-islands
    // at the VALUE level where q246's streaks were at the day level):
    // collapse consecutive same-type events into runs, then the
    // per-type run census — the session-compression / repeated-action
    // signal (a bot hammering one action shows up as max_run). Run
    // ids are a running sum of change flags over the (ts, event_id)
    // total order; one exchange on user_id serves the lag, the
    // running sum and the per-run rollup; the type census is a second
    // bounded exchange. All exact integers.
    "q254_event_rle" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("chg",
          when(lag("event_type", 1).over(w).isNull ||
               lag("event_type", 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum("chg").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "run_id", "event_type")
        .agg(count(lit(1)).as("rl"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_runs"), max("rl").as("max_run"),
             sum("rl").as("n_events"))
        .withColumn("avg_run_ppm", expr("(n_events * 1000000) div n_runs"))
        .orderBy("event_type")
    }),

    // Strict 3-step funnel with PER-STEP deadlines — signup, then
    // first click within 3 days, then first purchase within 7 days of
    // THAT click (q91 counts unordered step presence; q216 is the
    // single-deadline negative; this is the chained-deadline
    // conversion product teams actually ship). Each step's anchor is
    // the previous step's timestamp, so the chain is two conditional
    // min-joins on user_id (the q198 shape) — all exact integer
    // micros, ppm division at the end. Three exchanges on user_id at
    // any scale, no corpus-sized state.
    "q259_funnel_deadline" -> ((s, d) => {
      val ev = graft.ops.Staging.stage(Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
                unix_micros(col("ts")).as("us")))
      val day = 86400000000L
      val su = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("us"))).as("su"))
        .filter(col("su").isNotNull)
      val ck = su.join(ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us").as("cu")), Seq("user_id"), "left")
        .groupBy("user_id")
        .agg(first("su").as("su"),
             min(when(col("cu") >= col("su") &&
                      col("cu") <= col("su") + lit(3L * day), col("cu")))
               .as("ck"))
      val pu = ck.join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("pu")), Seq("user_id"), "left")
        .groupBy("user_id")
        .agg(first("ck").as("ck"),
             min(when(col("pu") >= col("ck") &&
                      col("pu") <= col("ck") + lit(7L * day), col("pu")))
               .as("pu"))
      pu.agg(count(lit(1)).as("n_signup"),
             count(col("ck")).as("n_click_3d"),
             count(col("pu")).as("n_purchase_7d"),
             expr("(count(ck) * 1000000) div count(1)").as("click_ppm"),
             expr("CASE WHEN count(ck) = 0 THEN 0 ELSE " +
               "(count(pu) * 1000000) div count(ck) END").as("purchase_ppm"))
        .orderBy("n_signup")
    }),

    // Top user-journey TRIGRAMS — 3-step path mining over each user's
    // time-ordered event stream (q97's Markov matrix is the
    // one-step/memoryless view; 3-step paths expose the journeys a
    // first-order chain cannot, e.g. view→click→purchase vs
    // view→click→error). Two lead() probes over one user_id exchange,
    // map-side partial combine on the ≤|types|³ path census, top 15
    // with full lexical tie-break. At 100 TB: one exchange + a
    // TakeOrdered — no corpus-sized state.
    "q261_path_trigrams" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("s1"), col("e2").as("s2"),
                 col("e3").as("s3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(15)
    }),

    // Cohort LTV curves — cumulative per-capita purchase revenue by
    // signup-week cohort and weeks-since-signup (q93's retention
    // matrix counts PRESENCE; LTV accumulates VALUE — the
    // unit-economics curve growth teams steer by). Weeks are exact
    // day-diff buckets from the corpus min day (the q195 rule, never
    // engine week-of-year); ages with zero purchase revenue are
    // absent and the cumsum spans ACTIVE ages (the q229 convention).
    // Exact cents, floor-div per-capita. Scale: one exchange for the
    // cohort map, one for the (cohort, age) rollup; the cumsum
    // windows over the bounded cohort×age grid, never corpus rows.
    "q262_cohort_ltv" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      val d0 = ev.agg(min("day").as("__d0"))
      val wk = graft.ops.Staging.stage(
        ev.crossJoin(broadcast(d0))
          .select(col("user_id"),
            expr("datediff(day, __d0) div 7").as("w"),
            col("event_type"), col("c")))
      val coh = graft.ops.Staging.stage(
        wk.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("w").as("cw")))
      val sizes = coh.groupBy("cw").agg(count(lit(1)).as("n_users"))
      val rev = wk.filter(col("event_type") === "purchase")
        .join(coh, "user_id")
        .filter(col("w") >= col("cw"))
        .groupBy(col("cw"), (col("w") - col("cw")).as("age"))
        .agg(sum("c").as("cents"))
      val wcum = Window.partitionBy("cw").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
      rev.withColumn("cents_cum", sum("cents").over(wcum))
        .join(sizes, "cw")
        .select(col("cw").as("cohort_week"), col("age"), col("n_users"),
          col("cents"), col("cents_cum"),
          expr("cents_cum div n_users").as("ltv_cents_per_user"))
        .orderBy("cohort_week", "age")
    }),

    // SESSION-windowed co-visitation — q247's co-occurrence matrix
    // restricted to items touched within the same 30-minute session
    // (the recommender signal production systems actually ship:
    // lifetime co-occurrence mostly measures user breadth; in-session
    // co-occurrence measures intent). Sessionization is the q23
    // gap-split (new session when the micros gap exceeds 30 min),
    // then Kernels.covisitPairs keyed on (user, session) — the same
    // occupancy-cap-ready pair kernel, with pair support counting
    // co-visiting SESSIONS. One user_id exchange serves the session
    // windows; the pair join keys on the session.
    "q270_session_covisitation" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull)
      val w = Window.partitionBy("user_id").orderBy("us", "item")
      val sess = ev
        .withColumn("__new",
          when(lag("us", 1).over(w).isNull ||
               col("us") - lag("us", 1).over(w) > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("__sid", sum("__new").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("__uk", concat_ws("#", col("user_id"), col("__sid")))
      Kernels.covisitPairs(sess, "__uk", "item")
        .withColumnRenamed("n_users", "n_sessions")
        .orderBy(col("n_sessions").desc, col("item_a"), col("item_b"))
        .limit(20)
    }),

    // Alert cooldown / notification throttling
    // (Kernels.cooldownFilter): a user's event EMITS only when at
    // least 6 hours past their previously EMITTED event — the
    // rate-limit every alerting/notification pipeline needs, and NOT
    // a window function (the gate compares against the last EMITTED
    // time; lag() would re-arm on every suppressed row). The kernel
    // is the clampedRunningSum secondary-sort scan; the oracle
    // replays the recurrence as a per-user recursive CTE stepping the
    // (us, event_id) row order. Output is the per-type suppression
    // census.
    "q278_alert_cooldown" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
                unix_micros(col("ts")).as("us"))
      Kernels.cooldownFilter(ev, "user_id", Seq("us", "event_id"),
          "us", 6L * 3600 * 1000000)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
             sum(when(col("emitted"), 1L).otherwise(0L)).as("n_emitted"))
        .withColumn("suppressed_ppm",
          expr("((n_events - n_emitted) * 1000000) div n_events"))
        .orderBy("event_type")
    }),

    // Event-time LATENESS census vs a processing-order watermark —
    // the number that sizes every withWatermark() delay: an event is
    // late by (high-water mark of event time over everything that
    // ARRIVED before it) − (its own event time). Arrival order here
    // is the hourly per-shard flush a partitioned collector produces
    // — (hour bucket, event_id mod 7 shard, event_id) — because the
    // synthetic event_id is already time-sorted (zero lateness under
    // it; a real ingest key never is). The running high-water mark is
    // Kernels.prefixMax — the prefixSum-class two-phase scan, never a
    // global single-partition window over the stream history. Late
    // events bucket by integer bit-length of their lateness in
    // seconds (the q286 rule), with a floor-ppm share of ALL events
    // per bucket.
    "q299_watermark_lateness" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .select(col("event_id"), col("us"),
          expr("us div 3600000000").as("__flush"),
          pmod(col("event_id"), lit(7L)).as("__shard"))
      val marked = Kernels.prefixMax(ev,
        Seq(col("__flush").asc, col("__shard").asc, col("event_id").asc),
        "us")
      val tot = marked.agg(count(lit(1)).as("n_total"))
      marked.filter(col("us_prevmax").isNotNull &&
          col("us_prevmax") > col("us"))
        .select(expr("(us_prevmax - us) div 1000000").as("__lsec"))
        .filter(col("__lsec") > 0)
        .select((length(expr("bin(__lsec)")) - 1).cast("long").as("bucket"),
                col("__lsec"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_late"), min("__lsec").as("min_late_sec"),
             max("__lsec").as("max_late_sec"))
        .crossJoin(broadcast(tot))
        .withColumn("late_ppm", expr("(n_late * 1000000) div n_total"))
        .orderBy("bucket")
    }),

    // Dual-rule sessionization (Kernels.cappedSessionize): a session
    // breaks on a >24 h idle gap OR when its total span would exceed
    // the 96 h hard cap — the second rule every analytics stack
    // eventually adds (q23's gap-only windows chain a steady drip of
    // sub-gap events into one unbounded "session"). NOT a window
    // function: the cap compares against the running session START,
    // which the split decision itself feeds back into — the
    // cooldownFilter recurrence class, ridden on the same
    // secondary-sort kernel scan. The oracle replays the recurrence
    // as a per-user recursive CTE. Output: top-20 users by session
    // count, exact integer census.
    // Intra-session DWELL-time histogram over q287's capped sessions:
    // the gap between consecutive events of one session, bucketed by
    // power-of-two microsecond ranges via the exact integer bit-length
    // length(bin(gap)) - 1 (the q286 rule — float log2 flips at
    // boundaries). The lag window is partitioned per (user, session) —
    // never a global sort; the oracle replays q287's recursive
    // recurrence and the same bit-length buckets.
    "q317_session_dwell_histogram" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
                unix_micros(col("ts")).as("us"))
      val sess = Kernels.cappedSessionize(ev, "user_id",
        Seq("us", "event_id"), "us",
        24L * 3600 * 1000000, 96L * 3600 * 1000000)
      val w = Window.partitionBy("user_id", "session_start")
        .orderBy("us", "event_id")
      sess.withColumn("__prev", lag("us", 1).over(w))
        .filter(col("__prev").isNotNull)
        .select((col("us") - col("__prev")).as("gap"))
        .groupBy(expr("length(bin(gap)) - 1").as("bucket"))
        .agg(count(lit(1)).as("n_gaps"),
             min("gap").as("min_gap_us"), max("gap").as("max_gap_us"))
        .orderBy("bucket")
    }),

    "q287_capped_sessions" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
                unix_micros(col("ts")).as("us"))
      Kernels.cappedSessionize(ev, "user_id", Seq("us", "event_id"),
          "us", 24L * 3600 * 1000000, 96L * 3600 * 1000000)
        .groupBy("user_id", "session_start")
        .agg(count(lit(1)).as("__n"), (max("us") - min("us")).as("__span"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("__n").as("n_events"),
             max("__n").as("max_session_events"),
             max("__span").as("max_span_us"))
        .orderBy(col("n_sessions").desc, col("user_id"))
        .limit(20)
    }),

    // Week-over-week item movers — the ops dashboard's "what changed"
    // census: item touch counts in the first vs second half of the
    // corpus time range (the q256 midpoint split), top 15 by absolute
    // delta with full integer tie-breaks, signed delta and a
    // floor-ppm change rate (0 for new items — no division by the
    // empty baseline). One exchange on item; map-side conditional
    // counts.
    "q272_wow_movers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(unix_micros(col("ts")).as("us"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull)
      val mid = ev.agg(min("us").as("__mn"), max("us").as("__mx"))
        .selectExpr("(__mn + __mx) div 2 AS mid")
      ev.crossJoin(broadcast(mid))
        .groupBy("item")
        .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("n1"),
             sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("n2"))
        .select(col("item"), col("n1"), col("n2"),
          (col("n2") - col("n1")).as("delta"),
          // (n2*1e6 div n1) − 1e6, NOT (n2−n1)*1e6 div n1: a negative
          // numerator floors differently in Spark (div truncates) vs
          // DuckDB (// floors); keeping the division positive keeps
          // the engines identical
          expr("CASE WHEN n1 = 0 THEN 0 ELSE " +
            "(n2 * 1000000) div n1 - 1000000 END").as("change_ppm"))
        .orderBy(abs(col("delta")).desc, col("item"))
        .limit(15)
    }),
  )

  val oracles: Map[String, String] = Map(

    "q169_basket_lift" ->
      """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM b),
        |per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        |        FROM b GROUP BY event_type),
        |p AS (
        |  SELECT x.event_type AS t_a, y.event_type AS t_b,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM b x JOIN b y ON x.user_id = y.user_id
        |       AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT t_a, t_b, n_both, a.n_t AS n_a, c.n_t AS n_b,
        |  CAST(floor(n_both * 1000000.0 / n_users) AS BIGINT) AS support_ppm,
        |  CAST(floor(n_both * 1000000.0 / a.n_t) AS BIGINT) AS confidence_ppm,
        |  CAST(floor(n_both * n_users * 1000000.0 / (a.n_t * c.n_t))
        |       AS BIGINT) AS lift_ppm
        |FROM p JOIN per a ON p.t_a = a.event_type
        |       JOIN per c ON p.t_b = c.event_type, n
        |ORDER BY t_a, t_b""".stripMargin,

    "q163_markov_backtest" ->
      """WITH tr AS (
        |  SELECT user_id, ts, event_type,
        |    lag(event_type, 1) OVER w AS prev,
        |    lag(ts, 1) OVER w AS prev_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tr2 AS (SELECT * FROM tr WHERE prev IS NOT NULL),
        |train AS (
        |  SELECT prev, event_type AS nxt, count(*) AS cnt FROM tr2
        |  WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1, 2),
        |model AS (
        |  SELECT prev, nxt AS predicted FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prev
        |      ORDER BY cnt DESC, nxt) AS rn FROM train)
        |  WHERE rn = 1)
        |SELECT t.prev, m.predicted, CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN t.event_type = m.predicted THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_correct,
        |  CAST(floor(sum(CASE WHEN t.event_type = m.predicted
        |                      THEN 1 ELSE 0 END) * 1000000.0 / count(*))
        |       AS BIGINT) AS accuracy_ppm
        |FROM tr2 t JOIN model m ON t.prev = m.prev
        |WHERE t.prev_ts >= TIMESTAMP '2024-01-16'
        |GROUP BY t.prev, m.predicted ORDER BY t.prev""".stripMargin,

    "q20_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q21_hourly_windows" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, event_type ORDER BY hour, event_type""".stripMargin,

    "q22_sliding_windows" ->
      """SELECT strftime(date_trunc('hour', ts) - to_hours(h), '%Y-%m-%d %H:%M:%S') AS win_start,
        | event_type, count(*) AS n_events
        |FROM events CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) s(h)
        |GROUP BY 1, event_type ORDER BY win_start, event_type""".stripMargin,

    "q23_session_windows" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ts - lag(ts, 1) OVER w > INTERVAL 30 MINUTE
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        | round(sum(value), 2) AS total_value
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    // Same sessionization as q23; the ordered-aggregate list mirrors
    // Spark's sort_array(collect_list(struct(ts, event_id, ...))) —
    // both orders are total, so the truncated sequence is identical.
    "q68_session_sequences" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ts - lag(ts, 1) OVER w > INTERVAL 30 MINUTE
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 20), '>') AS sequence
        |FROM sess GROUP BY user_id, session_id
        |HAVING count(*) >= 3
        |ORDER BY user_id, session_id""".stripMargin,

    "q41_json_struct" ->
      """SELECT event_type, count(*) AS n,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q44_map_ops" ->
      """SELECT event_type, k.key AS key, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.' || k.key) AS BIGINT)) AS BIGINT) AS sum_value
        |FROM events, unnest(json_keys(props)) AS k(key)
        |GROUP BY event_type, k.key ORDER BY event_type, key""".stripMargin,

    "q45_date_math" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | min(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS min_delay,
        | max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS max_delay,
        | round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 6) AS avg_delay
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q91_funnel_steps" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT 0 AS step_idx, 'view' AS step, (SELECT count(*) FROM s0) AS n_users
        |UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1)
        |UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2)
        |ORDER BY step_idx""".stripMargin,

    "q93_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('week', ts) AS w FROM events),
        |cohort AS (
        |  SELECT user_id, min(w) AS cw FROM ev GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT ev.user_id, cohort.cw,
        |    CAST(datediff('day', cohort.cw, ev.w) / 7 AS INT) AS week_offset
        |  FROM ev JOIN cohort ON ev.user_id = cohort.user_id)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
        |  count(*) AS n_users
        |FROM act GROUP BY cw, week_offset ORDER BY cohort_week, week_offset""".stripMargin,

    "q97_markov_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev, event_type AS next, count(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type)
        |SELECT prev, next, n,
        |  round(CAST(n AS DOUBLE) /
        |        CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE), 6) AS p
        |FROM c ORDER BY prev, next""".stripMargin,

    "q110_attribution_join" ->
      """WITH v AS (
        |  SELECT event_id AS view_id, user_id, ts AS view_ts
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts,
        |    value AS click_value
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, count(*) AS n_pairs,
        |  count(DISTINCT view_id) AS n_views_attributed,
        |  round(sum(click_value), 2) AS sum_click_value
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND c.click_ts >= v.view_ts
        |  AND c.click_ts <= v.view_ts + INTERVAL 30 MINUTE
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,

    // Replays grid + backward as-of as the same union trick the Spark
    // operator uses: events (side 0) sort before grid points (side 1)
    // at equal time, last_value IGNORE NULLS forward-fills, grid rows
    // survive. generate_series is inclusive of the aligned stop, like
    // Spark's sequence().
    "q111_resample_ffill" ->
      """WITH p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT user_id,
        |    unnest(generate_series(date_trunc('hour', mn),
        |      date_trunc('hour', mx), INTERVAL 1 HOUR)) AS grid_ts
        |  FROM (SELECT user_id, min(ts) AS mn, max(ts) AS mx
        |        FROM p GROUP BY user_id)),
        |u AS (
        |  SELECT user_id, ts AS t, value AS v, 0 AS side FROM p
        |  UNION ALL
        |  SELECT user_id, grid_ts, NULL, 1 FROM g),
        |f AS (
        |  SELECT user_id, t, side,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY t, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
        |  FROM u)
        |SELECT user_id, count(*) AS n_grid,
        |  CAST(sum(CASE WHEN fv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unfilled,
        |  round(sum(coalesce(fv, 0.0)), 2) AS sum_ffill
        |FROM f WHERE side = 1
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The q92 register replay keyed by day, then the same grid +
    // cumulative-max merge + estimate the Spark side runs.
    "q112_cumulative_distinct" ->
      """WITH e AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS b,
        |    substr(md5(CAST(user_id AS VARCHAR)), 3, 13) AS w
        |  FROM events),
        |g AS (
        |  SELECT day, b, w, length(regexp_extract(w, '^0*', 0)) AS z FROM e),
        |r AS (
        |  SELECT day, b,
        |    max(CASE WHEN z = 13 THEN 53
        |        ELSE 4 * z
        |             + (CASE substr(w, z + 1, 1)
        |                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
        |                WHEN '7' THEN 1 ELSE 0 END) + 1 END) AS m
        |  FROM g GROUP BY day, b),
        |grid AS (
        |  SELECT d.day, bb.b
        |  FROM (SELECT DISTINCT day FROM r) d
        |  CROSS JOIN (SELECT DISTINCT b FROM r) bb),
        |cum AS (
        |  SELECT grid.day, grid.b,
        |    max(r.m) OVER (PARTITION BY grid.b ORDER BY grid.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM grid LEFT JOIN r ON r.day = grid.day AND r.b = grid.b),
        |c2 AS (SELECT day, b, cm AS m FROM cum WHERE cm IS NOT NULL),
        |a AS (
        |  SELECT day, count(*) AS n_buckets,
        |    sum(1.0 / CAST((CAST(1 AS BIGINT) << m) AS DOUBLE)) AS s
        |  FROM c2 GROUP BY day),
        |f AS (
        |  SELECT day, n_buckets, 256 - n_buckets AS v,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 /
        |      (s + (256.0 - n_buckets) * 1.0) AS eraw
        |  FROM a)
        |SELECT day, n_buckets,
        |  round(CASE WHEN v > 0 AND eraw <= 2.5 * 256.0
        |        THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE)) ELSE eraw END, 6)
        |    AS cum_users_est
        |FROM f ORDER BY day""".stripMargin,

    "q116_range_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |w AS (
        |  SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW) AS n2,
        |    round(sum(value) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW), 2) AS s2
        |  FROM e)
        |SELECT user_id, max(n2) AS peak_2h_events, max(s2) AS peak_2h_value
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Replays the ranks with row_number over the same total orders
    // (0-based) and the identical integer quintile arithmetic.
    "q219_rfm_segments" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        |  FROM events),
        |u AS (
        |  SELECT user_id, max(us) AS last_us,
        |    CAST(count(*) AS BIGINT) AS f,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m
        |  FROM e GROUP BY 1),
        |g AS (
        |  SELECT user_id, (SELECT max(us) FROM e) - last_us AS r, f, m
        |  FROM u),
        |rk AS (
        |  SELECT user_id, m,
        |    row_number() OVER (ORDER BY r, user_id) - 1 AS ri,
        |    row_number() OVER (ORDER BY f, user_id) - 1 AS fi,
        |    row_number() OVER (ORDER BY m, user_id) - 1 AS mi,
        |    (SELECT CAST(count(*) AS BIGINT) FROM g) AS n
        |  FROM g)
        |SELECT (ri * 5) // n + 1 AS r_q, (fi * 5) // n + 1 AS f_q,
        |  (mi * 5) // n + 1 AS m_q,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(m) AS BIGINT) AS cents
        |FROM rk GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin,

    // Replays the three user-keyed passes; boundary semantics match
    // exactly (purchase in [s, s+7d], errors strictly inside (s, p)).
    "q216_negative_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |su AS (SELECT user_id, min(us) AS s FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT su.user_id, s,
        |    min(CASE WHEN p.us >= s AND p.us <= s + 604800000000
        |             THEN p.us END) AS pus
        |  FROM su LEFT JOIN e p
        |    ON p.user_id = su.user_id AND p.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |er AS (
        |  SELECT pu.user_id, pus,
        |    CAST(count(*) FILTER (r.us > s AND r.us < pus) AS BIGINT) AS ne
        |  FROM pu LEFT JOIN e r
        |    ON r.user_id = pu.user_id AND r.event_type = 'error'
        |  GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(count(pus) AS BIGINT) AS n_converted_7d,
        |  CAST(count(*) FILTER (pus IS NOT NULL AND ne = 0) AS BIGINT)
        |    AS n_clean,
        |  (CAST(count(*) FILTER (pus IS NOT NULL AND ne = 0) AS BIGINT)
        |   * 1000000) // CAST(count(*) AS BIGINT) AS clean_ppm
        |FROM er ORDER BY n_signups""".stripMargin,

    "q195_stickiness" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |m AS (SELECT min(day) AS d0 FROM ev),
        |wk AS (SELECT date_diff('day', d0, day) // 7 AS week, day, user_id
        |       FROM ev, m),
        |dau AS (SELECT week, CAST(sum(du) AS BIGINT) AS sdau,
        |          CAST(count(*) AS BIGINT) AS n_days
        |        FROM (SELECT week, day, count(DISTINCT user_id) AS du
        |              FROM wk GROUP BY 1, 2)
        |        GROUP BY week),
        |wau AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |        FROM wk GROUP BY week)
        |SELECT dau.week, n_days, sdau // n_days AS avg_dau, wau,
        |  (sdau * 1000000) // (n_days * wau) AS stickiness_ppm
        |FROM dau JOIN wau ON dau.week = wau.week
        |ORDER BY dau.week""".stripMargin,

    "q198_conversion_latency" ->
      """WITH su AS (
        |  SELECT user_id, min(epoch_us(ts)) AS s
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |pu AS (SELECT user_id, epoch_us(ts) AS p
        |       FROM events WHERE event_type = 'purchase'),
        |lat AS (
        |  SELECT su.user_id,
        |    min(CASE WHEN pu.p >= su.s THEN pu.p END) - any_value(su.s)
        |      AS l
        |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
        |  GROUP BY su.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(count(l) AS BIGINT) AS n_converted,
        |  (CAST(count(l) AS BIGINT) * 1000000) // count(*) AS conversion_ppm,
        |  round(quantile_cont(l, 0.5), 6) AS p50_latency_us,
        |  round(quantile_cont(l, 0.9), 6) AS p90_latency_us
        |FROM lat ORDER BY n_signups""".stripMargin,

    // Streak replay: identical island arithmetic over distinct
    // purchase days.
    "q246_purchase_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dd
        |  FROM events WHERE event_type = 'purchase'),
        |isl AS (
        |  SELECT user_id,
        |    dd - row_number() OVER (PARTITION BY user_id ORDER BY dd) AS g
        |  FROM days),
        |runs AS (
        |  SELECT user_id, g, CAST(count(*) AS BIGINT) AS len
        |  FROM isl GROUP BY user_id, g)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(count(*) AS BIGINT) AS n_streaks
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Co-visitation replay: same per-user distinct item sets and
    // ordered-pair counts, top 20 with the full tie-break.
    "q247_covisitation" ->
      """WITH ui AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL)
        |SELECT a.item AS item_a, b.item AS item_b,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM ui a JOIN ui b
        |  ON a.user_id = b.user_id AND a.item < b.item
        |GROUP BY 1, 2
        |ORDER BY n_users DESC, item_a, item_b LIMIT 20""".stripMargin,

    // RLE replay: the same (ts, event_id)-ordered change flags,
    // running-sum run ids and per-type census.
    "q254_event_rle" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type FROM events),
        |fl AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, event_type,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM fl),
        |rl AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS rl
        |  FROM runs GROUP BY user_id, run_id, event_type)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
        |  CAST(max(rl) AS BIGINT) AS max_run,
        |  CAST(sum(rl) AS BIGINT) AS n_events,
        |  (CAST(sum(rl) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
        |    AS avg_run_ppm
        |FROM rl GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Funnel replay: the same chained per-step deadline mins in
    // exact integer micros.
    "q259_funnel_deadline" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |su AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN us END) AS su
        |  FROM ev GROUP BY user_id
        |  HAVING min(CASE WHEN event_type = 'signup' THEN us END)
        |    IS NOT NULL),
        |ck AS (
        |  SELECT su.user_id, any_value(su.su) AS su,
        |    min(CASE WHEN c.us >= su.su
        |              AND c.us <= su.su + 3 * 86400000000 THEN c.us END)
        |      AS ck
        |  FROM su LEFT JOIN
        |    (SELECT user_id, us FROM ev WHERE event_type = 'click') c
        |    ON su.user_id = c.user_id
        |  GROUP BY su.user_id),
        |pu AS (
        |  SELECT ck.user_id, any_value(ck.ck) AS ck,
        |    min(CASE WHEN p.us >= ck.ck
        |              AND p.us <= ck.ck + 7 * 86400000000 THEN p.us END)
        |      AS pu
        |  FROM ck LEFT JOIN
        |    (SELECT user_id, us FROM ev WHERE event_type = 'purchase') p
        |    ON ck.user_id = p.user_id
        |  GROUP BY ck.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_signup,
        |  CAST(count(ck) AS BIGINT) AS n_click_3d,
        |  CAST(count(pu) AS BIGINT) AS n_purchase_7d,
        |  (CAST(count(ck) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
        |    AS click_ppm,
        |  CASE WHEN count(ck) = 0 THEN 0
        |       ELSE (CAST(count(pu) AS BIGINT) * 1000000) //
        |            CAST(count(ck) AS BIGINT) END AS purchase_ppm
        |FROM pu ORDER BY n_signup""".stripMargin,

    // Trigram-path replay: the same (ts, event_id)-ordered double
    // lead and top-15 census.
    "q261_path_trigrams" ->
      """WITH t AS (
        |  SELECT event_type AS s1,
        |    lead(event_type, 1) OVER w AS s2,
        |    lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
        |FROM t WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, s1, s2, s3 LIMIT 15""".stripMargin,

    // LTV replay: the same day-diff week buckets, signup cohorts,
    // active-age cumsum and floor-div per-capita cents.
    "q262_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |m AS (SELECT min(day) AS d0 FROM ev),
        |wk AS (
        |  SELECT user_id, date_diff('day', d0, day) // 7 AS w,
        |    event_type, c
        |  FROM ev, m),
        |coh AS (
        |  SELECT user_id, min(w) AS cw FROM wk
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |sizes AS (
        |  SELECT cw, CAST(count(*) AS BIGINT) AS n_users
        |  FROM coh GROUP BY cw),
        |rev AS (
        |  SELECT coh.cw, wk.w - coh.cw AS age,
        |    CAST(sum(c) AS BIGINT) AS cents
        |  FROM wk JOIN coh ON wk.user_id = coh.user_id
        |  WHERE wk.event_type = 'purchase' AND wk.w >= coh.cw
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cw, age, cents,
        |    CAST(sum(cents) OVER (PARTITION BY cw ORDER BY age
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cents_cum
        |  FROM rev)
        |SELECT cum.cw AS cohort_week, cum.age, sizes.n_users, cum.cents,
        |  cum.cents_cum, cum.cents_cum // sizes.n_users
        |    AS ltv_cents_per_user
        |FROM cum JOIN sizes ON cum.cw = sizes.cw
        |ORDER BY cohort_week, age""".stripMargin,

    // Session-covisitation replay: the same 30-minute gap split and
    // per-(user, session) distinct-item pair census.
    "q270_session_covisitation" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |fl AS (
        |  SELECT user_id, us, item,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 30 * 60 * 1000000
        |         THEN 1 ELSE 0 END AS nw
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, item)),
        |sess AS (
        |  SELECT user_id, item,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY us, item
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM fl),
        |ui AS (
        |  SELECT DISTINCT CAST(user_id AS VARCHAR) || '#' ||
        |    CAST(sid AS VARCHAR) AS uk, item
        |  FROM sess)
        |SELECT a.item AS item_a, b.item AS item_b,
        |  CAST(count(*) AS BIGINT) AS n_sessions
        |FROM ui a JOIN ui b ON a.uk = b.uk AND a.item < b.item
        |GROUP BY 1, 2
        |ORDER BY n_sessions DESC, item_a, item_b LIMIT 20""".stripMargin,

    // Cooldown replay: per-user recursive CTE stepping the same
    // (us, event_id) row order, carrying the last-EMITTED time.
    "q278_alert_cooldown" ->
      """WITH RECURSIVE t AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, us, event_type, TRUE AS emitted,
        |    us AS last_emit
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.user_id, t.rn, t.us, t.event_type,
        |    t.us >= r.last_emit + 21600000000 AS emitted,
        |    CASE WHEN t.us >= r.last_emit + 21600000000
        |         THEN t.us ELSE r.last_emit END
        |  FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN emitted THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_emitted,
        |  ((CAST(count(*) AS BIGINT) -
        |    CAST(sum(CASE WHEN emitted THEN 1 ELSE 0 END) AS BIGINT))
        |    * 1000000) // CAST(count(*) AS BIGINT) AS suppressed_ppm
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Lateness replay: the same exclusive running max (a window over
    // the oracle's single node is fine where the engine's prefixMax
    // is the 100 TB shape), seconds floor-div, bit-length buckets.
    "q299_watermark_lateness" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS us FROM events),
        |p AS (
        |  SELECT us, max(us) OVER (
        |    ORDER BY us // 3600000000, event_id % 7, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM e),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM e),
        |l AS (
        |  SELECT (pm - us) // 1000000 AS lsec
        |  FROM p WHERE pm IS NOT NULL AND pm > us),
        |lz AS (SELECT lsec FROM l WHERE lsec > 0)
        |SELECT CAST(length(bin(lsec)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_late,
        |  CAST(min(lsec) AS BIGINT) AS min_late_sec,
        |  CAST(max(lsec) AS BIGINT) AS max_late_sec,
        |  n_total,
        |  (CAST(count(*) AS BIGINT) * 1000000) // n_total AS late_ppm
        |FROM lz CROSS JOIN tot
        |GROUP BY 1, n_total ORDER BY bucket""".stripMargin,

    // Capped-session replay: the (gap OR span-cap) session-start
    // recurrence as a per-user recursive CTE stepping the
    // (us, event_id) row order — the q278 oracle pattern.
    // q287's recursive session replay + per-session lag + the exact
    // bit-length bucket.
    "q317_session_dwell_histogram" ->
      """WITH RECURSIVE t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, rn, us, us AS ss FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.user_id, t.event_id, t.rn, t.us,
        |    CASE WHEN t.us - r.us > 86400000000
        |           OR t.us - r.ss > 345600000000
        |         THEN t.us ELSE r.ss END
        |  FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1),
        |g AS (
        |  SELECT us - lag(us) OVER (PARTITION BY user_id, ss
        |    ORDER BY us, event_id) AS gap
        |  FROM r)
        |SELECT CAST(length(bin(gap)) - 1 AS BIGINT) AS bucket,
        |  count(*) AS n_gaps,
        |  CAST(min(gap) AS BIGINT) AS min_gap_us,
        |  CAST(max(gap) AS BIGINT) AS max_gap_us
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q287_capped_sessions" ->
      """WITH RECURSIVE t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, us, us AS ss FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.user_id, t.rn, t.us,
        |    CASE WHEN t.us - r.us > 86400000000
        |           OR t.us - r.ss > 345600000000
        |         THEN t.us ELSE r.ss END
        |  FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1),
        |s AS (
        |  SELECT user_id, ss, CAST(count(*) AS BIGINT) AS n,
        |    CAST(max(us) - min(us) AS BIGINT) AS span
        |  FROM r GROUP BY user_id, ss)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(max(n) AS BIGINT) AS max_session_events,
        |  CAST(max(span) AS BIGINT) AS max_span_us
        |FROM s GROUP BY user_id
        |ORDER BY n_sessions DESC, user_id LIMIT 20""".stripMargin,

    // Movers replay: same midpoint split, conditional counts and
    // |delta| ordering with integer tie-breaks.
    "q272_wow_movers" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) AS us,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |g AS (
        |  SELECT item,
        |    CAST(sum(CASE WHEN us < mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2
        |  FROM ev CROSS JOIN m GROUP BY item)
        |SELECT item, n1, n2, n2 - n1 AS delta,
        |  CASE WHEN n1 = 0 THEN 0
        |       ELSE (n2 * 1000000) // n1 - 1000000 END AS change_ppm
        |FROM g ORDER BY abs(n2 - n1) DESC, item LIMIT 15""".stripMargin,
  )
}
