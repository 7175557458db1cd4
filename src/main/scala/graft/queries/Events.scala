package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{AsOf, Cdc}
import graft.ops.Kernels
import graft.tables.Tables

/** Event-table queries: JSON extraction, tumbling/sliding/session
  * windows (batch forms of the Structured Streaming shapes in
  * graft.streaming), and the as-of join. Timestamps are emitted as
  * formatted strings so the ns-vs-us parquet logical types of the two
  * engines cannot skew the driver's hash compare.
  */
object EventQueries {
  private type Q = (SparkSession, String) => DataFrame
  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

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

    // As-of join: each event picks the user's latest order at or
    // before the event time (right side deduped for determinism).
    "q24_asof_join" -> ((s, d) => {
      val latest = Kernels.dedupKeepLast(Tables.orders(s, d),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
      AsOf.joinBackward(
          Tables.events(s, d).select("event_id", "user_id", "ts"), latest,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
                date_format(col("ts"), TsFmt).as("event_ts"),
                col("o_orderkey"), col("o_totalprice"))
        .orderBy("event_id")
    }),

    // FORWARD as-of join (AsOf.joinForward): each event picks the
    // user's EARLIEST order at or after the event time — the "next
    // action after the touchpoint" attribution lookup. DuckDB's ASOF
    // syntax is backward-only, so the oracle replays forward
    // semantics: min next date per event, then a join-back for the
    // payload (deterministic because `latest` is deduped per
    // (custkey, date)).
    "q85_asof_forward" -> ((s, d) => {
      val latest = Kernels.dedupKeepLast(Tables.orders(s, d),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
      AsOf.joinForward(
          Tables.events(s, d).select("event_id", "user_id", "ts"), latest,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
                date_format(col("ts"), TsFmt).as("event_ts"),
                col("o_orderkey"), col("o_totalprice"))
        .orderBy("event_id")
    }),

    // Max drawdown per user over the event value stream — the classic
    // quant risk metric as two running windows (cumulative equity,
    // running peak) and a difference. One shuffle on user_id serves
    // both windows (same partitioning+ordering) and the final
    // aggregate. event values are exactly-2dp, so every sum sits ON
    // the 2dp grid and round(..., 2) is half-safe; (ts, event_id)
    // ordering is tie-free at the us precision both engines compare
    // at (checked: no sub-us components, no per-user same-us pairs).
    "q89_max_drawdown" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("equity", sum("value").over(run))
        .withColumn("peak", max("equity").over(run))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
             round(max(col("peak") - col("equity")), 2).as("max_drawdown"),
             round(max("equity"), 2).as("peak_equity"),
             round(sum("value"), 2).as("final_equity"))
        .orderBy("user_id")
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

    // Trailing z-score anomaly detection — the streaming data-quality
    // gate in batch form: each event scored against the previous 10
    // events of its user ((ts, event_id) order, current row
    // excluded). Mean and variance are built from raw SUM/SUMSQ with
    // one explicit formula instead of the engines' stddev (whose
    // internal algorithms differ); the only cross-engine slack left
    // is sliding-sum addition order, ulps below the 6dp rounding and
    // the |z|>2 threshold.
    "q96_anomaly_zscore" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-10, -1)
      Tables.events(s, d)
        .withColumn("cnt", count("value").over(w))
        .withColumn("s", sum("value").over(w))
        .withColumn("ss", sum(col("value") * col("value")).over(w))
        .filter(col("cnt") === 10)
        .withColumn("mean", col("s") / lit(10.0))
        .withColumn("vr",
          (col("ss") - lit(10.0) * col("mean") * col("mean")) / lit(9.0))
        .filter(col("vr") > 0)
        .withColumn("z", (col("value") - col("mean")) / sqrt(col("vr")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_scored"),
             sum(when(abs(col("z")) > 2.0, 1L).otherwise(0L)).as("n_anomalies"),
             round(max(abs(col("z"))), 6).as("max_abs_z"))
        .orderBy("user_id")
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

    // Per-user OLS trend of value over event index — drift detection
    // as closed-form regression on aggregate sums:
    // slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). x is the 0-based
    // per-user event index, so n, Σx, Σx² are EXACT integers and the
    // only float inputs are Σy/Σxy — never an engine's own regr_*
    // implementation, whose accumulation differs. One user-keyed
    // shuffle serves the index window and the aggregate.
    "q99_trend_ols" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("x", (row_number().over(w) - 1).cast("long"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
             sum("x").as("sx"),
             sum(col("x") * col("x")).as("sxx"),
             sum("value").as("sy"),
             sum(col("x").cast("double") * col("value")).as("sxy"))
        .withColumn("slope",
          (col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
          (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")))
        .withColumn("intercept",
          (col("sy") - col("slope") * col("sx").cast("double")) /
            col("n").cast("double"))
        .select(col("user_id"), col("n"),
                round(col("slope"), 6).as("slope"),
                round(col("intercept"), 6).as("intercept"))
        .orderBy("user_id")
    }),

    // Time-weighted average value (TWAP) per user: each event's value
    // holds until the next event; the weight is that holding interval
    // in EXACT microsecond longs (lead over the tie-free (ts,
    // event_id) order), so the only doubles are value*weight products
    // and one final division. The last event per user has no interval
    // and drops out — mirrored exactly in the oracle.
    "q101_twap" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("dur",
          unix_micros(lead("ts", 1).over(w)) - unix_micros(col("ts")))
        .filter(col("dur").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
             sum("dur").as("total_us"),
             sum(col("value") * col("dur").cast("double")).as("vw"))
        .select(col("user_id"), col("n_intervals"), col("total_us"),
                round(col("vw") / col("total_us").cast("double"), 6).as("twap"))
        .orderBy("user_id")
    }),

    // Interval (range) join: lineitems shipped inside the 30-day
    // window after their order's date — the set-valued sibling of the
    // as-of join (which picks one row). The equi key (orderkey) makes
    // this a plain shuffled equi-join with the range as a post-filter
    // — the scale-safe plan; a pure range join without an equi key
    // would be a nested-loop cross product.
    "q102_interval_join" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
        .join(Tables.orders(s, d)
                .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAY"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_pairs"),
             countDistinct("o_orderkey").as("n_orders"),
             round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("o_orderpriority")),

    // Z-order (Morton) clustering key (Layout.zOrderKey): user_id and
    // event-day interleaved bit by bit — the multi-dimensional layout
    // key that keeps a 100 TB event table prunable on EITHER column
    // (LayoutSpec measures the per-file span contraction; this query
    // hash-pins the key arithmetic itself against a 21-term bit
    // replay in SQL).
    "q109_zorder_key" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("u", pmod(col("user_id").cast("long"), lit(2097152L)))
        .withColumn("d", expr("unix_micros(ts) div 86400000000"))
      ev.withColumn("zkey", graft.ops.Layout.zOrderKey(col("u"), col("d")))
        .select(col("event_id"), col("u"), col("d"), col("zkey"))
        .orderBy("zkey", "event_id").limit(50)
    }),

    // Hilbert clustering key over the same (user-bucket, day) domain
    // as q109's Morton key — the locality-tighter layout (consecutive
    // Hilbert keys are always spatially adjacent; LayoutSpec measures
    // the per-file span contraction vs Morton). Codegen'd native
    // expression (functions.HilbertKey); the oracle unrolls the same
    // 21-level xy2d descent as chained integer CTEs.
    "q237_hilbert_key" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("u", pmod(col("user_id").cast("long"), lit(2097152L)))
        .withColumn("d", expr("unix_micros(ts) div 86400000000"))
      ev.withColumn("hkey",
          graft.functions.GraftFunctions.hilbertKey(s, col("u"), col("d")))
        .select(col("event_id"), col("u"), col("d"), col("hkey"))
        .orderBy("hkey", "event_id").limit(50)
    }),

    // Hilbert range-pruned 2-D box scan — the READ path q237's key
    // exists for: Layout.hilbertCover turns the (user-bucket, day)
    // box into ≤64 contiguous key intervals (driver-side quadtree
    // descent, microseconds), the scan applies them as 1-D range
    // clauses (min/max-prunable on a hkey-clustered table) plus the
    // exact box residual. The ORACLE is the direct box predicate —
    // hash equality proves cover ∪ residual ≡ box (the cover missed
    // nothing); LayoutSpec pins exactness/bounding of the cover
    // itself against brute-force enumeration.
    "q239_hilbert_range_scan" -> ((s, d) => {
      val (x0, x1, y0, y1) = (3L, 10L, 19730L, 19745L)
      val ranges = graft.ops.Layout.hilbertCover(x0, x1, y0, y1,
        bits = 21, maxRanges = 64)
      val ev = Tables.events(s, d)
        .withColumn("u", pmod(col("user_id").cast("long"), lit(2097152L)))
        .withColumn("dd", expr("unix_micros(ts) div 86400000000"))
        .withColumn("hkey",
          graft.functions.GraftFunctions.hilbertKey(s, col("u"), col("dd")))
      ev.filter(ranges.map { case (a, b) =>
          col("hkey") >= a && col("hkey") < b }.reduce(_ || _))
        .filter(col("u").between(x0, x1) && col("dd").between(y0, y1))
        .agg(count(lit(1)).as("n_events"),
             sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
               .as("cents"),
             min("u").as("min_u"), max("u").as("max_u"),
             min("dd").as("min_d"), max("dd").as("max_d"))
        .orderBy("n_events")
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

    // KMV/theta set-operation cardinalities (Sketches.kmvMins): HLL
    // unions but cannot INTERSECT; the k-minimum-values sketch
    // estimates |click users ∩ view users| from two 64-row sketches —
    // common hashes below the combined theta, divided by theta. Exact
    // counts ride along to exhibit the estimates; every number is
    // hash-checked because the hashes, the k-selection (u-order ≡
    // hex-order) and the exact 52-bit uniforms all replay in SQL.
    "q114_kmv_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def mins(t: String) = graft.ops.Staging.stage(
        graft.ext.Sketches.kmvMins(
          ev.filter(col("event_type") === t).select("user_id"), "user_id", 64))
      val ck = mins("click")
      val vk = mins("view")
      def users(t: String) =
        ev.filter(col("event_type") === t).select("user_id").distinct()
      val theta = ck.agg(max("__u").as("__uka"))
        .crossJoin(vk.agg(max("__u").as("__ukb")))
        .select(least(col("__uka"), col("__ukb")).as("theta"))
      val interEst = ck.join(vk.select("__h"), Seq("__h"))
        .crossJoin(theta)
        .agg(sum(when(col("__u") < col("theta"), 1.0).otherwise(0.0)).as("__nc"),
             first("theta").as("__th"))
        .select(round(coalesce(col("__nc") / col("__th"), lit(0.0)), 6).as("est"))
      def row(name: String, exact: DataFrame, est: DataFrame) =
        exact.crossJoin(est)
          .select(lit(name).as("metric"), col("n_exact"), col("est"))
      row("click", users("click").agg(count(lit(1)).as("n_exact")),
          ck.agg(round(graft.ext.Sketches.kmvDistinct(64), 6).as("est")))
        .unionByName(
          row("view", users("view").agg(count(lit(1)).as("n_exact")),
              vk.agg(round(graft.ext.Sketches.kmvDistinct(64), 6).as("est"))))
        .unionByName(
          row("click_view_overlap",
              users("click").join(users("view"), "user_id")
                .agg(count(lit(1)).as("n_exact")),
              interEst))
        .orderBy("metric")
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

    // Truncated EWMA (pandas ewm(alpha=0.5, adjust=True) over the
    // last 8 observations): per-event smoothed value with weights
    // 1/2, 1/4, ... 1/256 over the trailing window, normalized by
    // the weights actually present (short prefixes). Every weight is
    // an exact power of two, so each product is a pure exponent
    // shift (never rounds) and both engines evaluate the identical
    // left-associated sum — bit-exact cross-engine, unlike the
    // recursive alpha*(1-alpha)^k form whose pow() is libm-bound
    // (the q107 lesson). One shuffle on user_id serves all 8 lags.
    "q139_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val terms = (0 to 7).map { k =>
        val v = if (k == 0) col("value") else lag("value", k).over(w)
        (coalesce(v / lit((1L << (k + 1)).toDouble), lit(0.0)),
         when(v.isNotNull, lit(math.pow(0.5, k + 1))).otherwise(lit(0.0)))
      }
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
                round(terms.map(_._1).reduce(_ + _) /
                      terms.map(_._2).reduce(_ + _), 6).as("ewma8"))
        .orderBy("event_id")
    }),

    // MERGE INTO semantics (Cdc.applyChangelog): the events stream
    // as a CDC changelog over the customer dimension — key = 11 *
    // user_id (keys past the base key space exercise the INSERT
    // branch at every SF), latest op per key wins ('purchase' = the
    // account-closing DELETE, anything else upserts value into
    // c_acctbal). The output is the merged dimension restricted to
    // the changelog's key space (c_custkey % 11 = 0), so the row set
    // stays bounded while every branch (update / insert / delete /
    // untouched passthrough) is represented. (ts, event_id) makes
    // "latest" total; event values sit on the 2dp grid, so the 2dp
    // round is exact passthrough.
    "q140_cdc_merge" -> ((s, d) => {
      val changes = Tables.events(s, d).select(
        (col("user_id") * 11).as("k"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", "D").otherwise("U").as("op"),
        col("value"))
      Cdc.applyChangelog(Tables.customer(s, d), changes,
          key = "c_custkey", changeKey = "k", ts = "ts",
          tieBreak = "event_id", opCol = "op", deleteOp = "D",
          setCols = Seq("value" -> "c_acctbal"))
        .filter(col("c_custkey") % 11 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
                col("c_mktsegment"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
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

    // Difference-in-differences over the hashed A/B arms (q156's
    // assignment) with a temporal pre/post split at 2024-01-16: the
    // causal-lift estimate that controls for arm-level baseline
    // differences. Per (arm, period) purchase rates in floored ppm of
    // exact counts; DiD = (B_post - B_pre) - (A_post - A_pre).
    "q164_did_lift" -> ((s, d) => {
      val cut = lit("2024-01-16").cast("timestamp")
      val arm = when(
        conv(substring(md5(concat(col("user_id").cast("string"),
          lit("exp1"))), 1, 8), 16, 10).cast("long") % 2L === 0L, "A")
        .otherwise("B")
      val cells = Tables.events(s, d)
        .select(arm.as("arm"),
          when(col("ts") < cut, "pre").otherwise("post").as("period"),
          col("user_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("conv"))
        .groupBy("arm", "period", "user_id")
        .agg(max("conv").as("converted"))
        .groupBy("arm", "period")
        .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
        .withColumn("rate_ppm",
          floor(col("n_conv") * 1000000.0 / col("n_users")).cast("long"))
      def cell(a: String, p: String, out: String) =
        cells.filter(col("arm") === a && col("period") === p)
          .select(col("rate_ppm").as(out))
      cell("A", "pre", "a_pre").crossJoin(cell("A", "post", "a_post"))
        .crossJoin(cell("B", "pre", "b_pre"))
        .crossJoin(cell("B", "post", "b_post"))
        .select(col("a_pre"), col("a_post"), col("b_pre"), col("b_post"),
          ((col("b_post") - col("b_pre")) - (col("a_post") - col("a_pre")))
            .as("did_ppm"))
        .orderBy("a_pre")
    }),

    // CUSUM drift detection — the sequential changepoint monitor:
    // S = max(0, S + (x - k)) per user (k = slack 2.0) with alarms
    // when S crosses h = 15.0 from below. The recurrence REUSES
    // Kernels.clampedRunningSum (CUSUM IS a clamped running sum of
    // slack-shifted values); crossings come from one lag window over
    // the scanned balances. Balances stay on the 2dp grid; the
    // threshold compares identical doubles on both engines, so the
    // >= boundary is exact.
    "q158_cusum_drift" -> ((s, d) => {
      val (k, h) = (2.0, 15.0)
      val cs = Kernels.clampedRunningSum(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
                  (col("value") - lit(k)).as("value")),
        keyCol = "user_id", orderCols = Seq("ts", "event_id"),
        valueCol = "value", floor = 0.0)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      cs.withColumn("prev", lag("balance", 1, 0.0).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
             round(max("balance"), 2).as("max_cusum"),
             sum(when(col("balance") >= h && col("prev") < h, 1L)
               .otherwise(0L)).as("n_alarms"))
        .orderBy("user_id")
    }),

    // Deterministic A/B experiment readout: users assign to arms by
    // content hash (md5 — the same decontamination-safe bucketing as
    // the dataset splits; never random()), the metric is purchase
    // rate per arm, and the lift is emitted in floored ppm. One
    // aggregate over per-user flags; the assignment is replayable by
    // construction so the experiment can be re-read from raw logs.
    "q156_ab_lift" -> ((s, d) => {
      val arm = when(
        conv(substring(md5(concat(col("user_id").cast("string"),
          lit("exp1"))), 1, 8), 16, 10).cast("long") % 2L === 0L, "A")
        .otherwise("B")
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .select(arm.as("arm"), col("converted"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_users"), sum("converted").as("n_converted"))
      val a = users.filter(col("arm") === "A")
        .select(col("n_users").as("na"), col("n_converted").as("ca"))
      val b = users.filter(col("arm") === "B")
        .select(col("n_users").as("nb"), col("n_converted").as("cb"))
      a.crossJoin(b).select(
        col("na"), col("ca"),
        floor(col("ca") * 1000000.0 / col("na")).cast("long").as("rate_a_ppm"),
        col("nb"), col("cb"),
        floor(col("cb") * 1000000.0 / col("nb")).cast("long").as("rate_b_ppm"),
        (floor(col("cb") * 1000000.0 / col("nb")).cast("long") -
         floor(col("ca") * 1000000.0 / col("na")).cast("long"))
          .as("lift_ppm"))
        .orderBy("na")
    }),

    // Clamped running balance (Kernels.clampedRunningSum): the
    // per-key sequential recurrence bal = max(0, bal + v) that NO
    // window frame expresses (the clamp feeds back) — distributed via
    // repartition + sortWithinPartitions + one constant-memory
    // mapPartitions scan (the secondary-sort pattern). The oracle
    // replays the recurrence as a recursive CTE. Balances stay on the
    // 2dp grid (q89's rule), so the 2dp rounds are exact
    // passthroughs; the scan order (ts, event_id) is total per user.
    "q151_clamped_balance" -> ((s, d) => {
      val bal = Kernels.clampedRunningSum(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value")),
        keyCol = "user_id", orderCols = Seq("ts", "event_id"),
        valueCol = "value", floor = 0.0)
      bal.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
             round(max(struct(col("ts"), col("event_id"), col("balance")))
               .getField("balance"), 2).as("final_balance"),
             round(max("balance"), 2).as("max_balance"),
             sum(col("clamped").cast("long")).as("n_clamps"))
        .orderBy("user_id")
    }),

    // Exponentially-decayed trending score per event type: each day's
    // count weighted by 2^(day - latest_day) — yesterday counts half.
    // EVERY term is a dyadic rational that fits 53 bits (counts <
    // 2^20, decay >= 2^-40 after the cutoff), so each product AND
    // every partial sum is exactly representable: the float sum is
    // EXACT and therefore summation-ORDER-INDEPENDENT — no rounding
    // needed, no distributed-sum ulp caveat (the one weighted decay
    // an engine can hash-compare raw; half-life decay with base e or
    // 0.9 has neither property). Days older than 40 are cut off
    // (weight < 2^-40 — exactly zero signal at count scale) to keep
    // the exactness bound, which is also the right freshness window.
    "q150_trending_decay" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
                 to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val withMax = daily.crossJoin(broadcast(
        daily.agg(max("day").as("dmax"))))
      withMax
        .withColumn("age", datediff(col("dmax"), col("day")))
        .filter(col("age") <= 40)
        // 1/(1<<age), not pow(2,-age): pow is libm (1-ulp-off would
        // break exactness); the shift+divide is exact by construction
        .withColumn("w", lit(1.0) / expr("shiftleft(cast(1 as bigint), age)"))
        .groupBy("event_type")
        .agg(sum(col("n") * col("w")).as("trend_score"),
             sum("n").as("n_events_40d"))
        .orderBy(col("trend_score").desc, col("event_type"))
    }),

    // Time-based LINEAR interpolation onto an hourly grid (pandas
    // interpolate(method='time') — the gap-fill q111's ffill can't
    // do): each user's grid points between their first and last event
    // get pv + (nv-pv)*(t-pt)/(nt-pt) from the surrounding events,
    // found with the SAME single-shuffle as-of machinery as q24/q85
    // (backward pass for (pt,pv), forward pass for (nt,nv) — grid
    // bounds guarantee both exist). Grid indices are exact integer
    // ceil/floor-divisions of epoch micros (never float hour math);
    // the interpolated value is emitted as FLOOR(value*1e6) — floor
    // of the bit-identical double is cross-engine-safe where
    // round(, 6) is not (the rational can sit on a 6dp half; the
    // q142 lesson).
    "q148_gap_interpolate" -> ((s, d) => {
      val H = 3600000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
                col("value"))
      val grid = ev.groupBy("user_id")
        .agg(expr(s"(min(us) + ${H - 1}) div $H").as("g0"),
             expr(s"max(us) div $H").as("g1"))
        .filter(col("g0") <= col("g1"))
        .select(col("user_id"), explode(sequence(col("g0"), col("g1"))).as("g"))
        .select(col("user_id"), col("g"),
                timestamp_micros(col("g") * H).as("gts"))
      val withPrev = AsOf.joinBackward(grid,
        ev.select(col("user_id"), col("ts"), col("us").as("pt"),
                  col("value").as("pv")),
        "user_id", "user_id", "gts", "ts", Seq("pt", "pv"))
      val both = AsOf.joinForward(withPrev,
        ev.select(col("user_id"), col("ts"), col("us").as("nt"),
                  col("value").as("nv")),
        "user_id", "user_id", "gts", "ts", Seq("nt", "nv"))
      both.select(col("user_id"), col("g"),
          date_format(col("gts"), TsFmt).as("grid_ts"),
          floor(when(col("nt") === col("pt"), col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (col("g") * H - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")) * 1000000.0)
            .cast("long").as("interp_ppm"))
        .orderBy("user_id", "g")
    }),

    // SCD type-2 history (Cdc.scd2): every event value becomes a
    // version of its user's tracked attribute with
    // [valid_from, valid_to) bounds, a version number and the
    // current flag — one window pass, no self-join. Timestamps are
    // emitted as strings (the ns-vs-us rule); version makes rows
    // unique even when two versions share a formatted second.
    "q141_scd2_history" -> ((s, d) =>
      Cdc.scd2(Tables.events(s, d)
            .select(col("user_id"), col("ts"), col("event_id"), col("value")),
          key = "user_id", ts = "ts", tieBreak = "event_id",
          attrs = Seq("value"))
        .select(col("user_id"), col("version"),
                round(col("value"), 2).as("value"),
                date_format(col("valid_from"), TsFmt).as("valid_from"),
                coalesce(date_format(col("valid_to"), TsFmt), lit("current"))
                  .as("valid_to"),
                col("is_current"))
        .orderBy("user_id", "version")),

    // Weekday seasonality index — the seasonal-adjustment primitive
    // the trend (q99), EWMA and CUSUM passes assume away: daily
    // totals, then each weekday's average daily value over the
    // all-days average. index > 1 = that weekday runs hot. Two tiny
    // aggregates over the daily frame (one exchange on date, then a
    // 7-row weekday rollup + 1-row broadcast); day names via
    // date_format 'EEEE' = DuckDB dayname (both English full names).
    // Daily totals are carried as EXACT integer cents (value is on
    // the 2dp grid, so a float daily sum lands averages exactly on
    // 2dp halves — the q14 rounding trap, hit on first contact);
    // every emitted double is then derived from identical integers
    // by identical IEEE ops on both engines.
    "q180_weekday_seasonality" -> ((s, d) => {
      // staged: the weekday rollup and the grand total both read it
      val daily = graft.ops.Staging.stage(
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .as("__cents")))
      val byDow = daily
        .groupBy(date_format(col("day"), "EEEE").as("weekday"))
        .agg(count(lit(1)).as("n_days"), sum("__cents").as("__cd"))
      val overall = daily
        .agg(count(lit(1)).as("__na"), sum("__cents").as("__ca"))
      byDow.crossJoin(broadcast(overall))
        .select(col("weekday"), col("n_days"),
          expr("__cd div n_days").as("avg_daily_cents"),
          // index in ppm, pure integer arithmetic. The cd*na*1e6
          // product rides decimal(38,0) (the q194 exact-at-any-scale
          // idiom; oracle side HUGEINT): in Long it would wrap
          // silently once a weekday's cents total passes ~25e9
          // (~$250M/day — plausible at the 100-TB scale this
          // operator targets).
          expr("""CAST((CAST(__cd AS DECIMAL(38,0)) * __na * 1000000)
                  div (CAST(__ca AS DECIMAL(38,0)) * n_days) AS BIGINT)""")
            .as("index_ppm"))
        .orderBy("weekday")
    }),

    // Kaplan-Meier survival curve — time-to-event analysis over user
    // lifetimes: duration = days between a user's first and last
    // event, "event" = the lifetime ended on a purchase (else
    // censored). S(t) = prod over steps <= t of (1 - d/n) computed as
    // exp of an ORDERED running ln-sum — both engines accumulate the
    // identical IEEE factors in the identical (duration) order, so
    // 6dp rounding is stable; the d = n absorbing step (survival 0)
    // is handled by an explicit flag so neither engine evaluates
    // ln(0). The per-user pass is one exchange on user_id (window +
    // group share it); the curve frame is distinct-durations-sized,
    // where the ordered window is by construction tiny.
    "q181_kaplan_meier" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val perUser = Tables.events(s, d)
        .withColumn("__rn", row_number().over(wu))
        .groupBy("user_id")
        .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
               .as("dur"),
             max(when(col("__rn") === 1, col("event_type"))).as("__last"))
      // staged: the total and the curve pass both read it
      val byDur = graft.ops.Staging.stage(
        perUser.groupBy("dur")
          .agg(count(lit(1)).as("n_exit"),
               sum(when(col("__last") === "purchase", 1L).otherwise(0L))
                 .as("d_events")))
      val tot = byDur.agg(sum("n_exit").as("__tot"))
      val wPrev = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCur = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, 0)
      byDur.crossJoin(broadcast(tot))
        .withColumn("n_at_risk",
          col("__tot") - coalesce(sum(col("n_exit")).over(wPrev), lit(0L)))
        .withColumn("__f",
          when(col("d_events") < col("n_at_risk"),
            log(lit(1.0) - col("d_events").cast("double") /
                col("n_at_risk").cast("double"))).otherwise(lit(0.0)))
        .withColumn("__z",
          max(when(col("d_events") === col("n_at_risk"), 1).otherwise(0))
            .over(wCur))
        .select(col("dur").as("duration_days"), col("n_at_risk"),
          col("d_events"), col("n_exit"),
          when(col("__z") === 1, 0.0)
            .otherwise(round(exp(sum(col("__f")).over(wCur)), 6))
            .as("survival"))
        .orderBy("duration_days")
    }),

    // Autocorrelation function of daily revenue at lags 1..7 — the
    // weekly-cycle diagnostic behind q180's seasonal index. Daily
    // totals in exact integer cents (q180's grid rule) cast once to
    // double; one window pass builds the 7 lag columns over the
    // days-sized frame (tiny by construction), one aggregate computes
    // all 7 Pearson coefficients (6dp absorbs the co-moment
    // merge-order ulp, the q174 contract).
    "q184_autocorrelation" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .cast("double").as("v"))
      val wDay = Window.orderBy("day")
      val ks = 1 to 7
      val lagged = daily.select(
        (col("v") +: ks.map(k => lag(col("v"), k).over(wDay).as(s"v_$k"))): _*)
      val aggs = ks.flatMap(k => Seq(
        round(corr(col("v"), col(s"v_$k")), 6).as(s"acf_$k"),
        count(col(s"v_$k")).as(s"n_$k")))
      val entries = ks.map(k => struct(lit(k).as("lag_k"),
        col(s"acf_$k").as("acf"), col(s"n_$k").as("n_pairs")))
      lagged.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(entries: _*)).as("kv"))
        .select("kv.*")
        .orderBy("lag_k")
    }),

    // Purged temporal split — the leakage-safe backtest partition for
    // time-coupled data (financial ML's "purged k-fold" boundary
    // rule): train strictly before the cut minus a 2-day embargo,
    // test strictly from the cut plus 2 days, and the embargo band
    // itself is DISCARDED so no label window straddles the boundary.
    // The cut is data-driven (min date + 20 days) and rides a 1-row
    // broadcast; the split is a map-side CASE over the scan — no
    // shuffle beyond the final count rollup. Exact integers only.
    "q187_purged_split" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
      val cut = ev.agg(date_add(min(col("day")), 20).as("__cut"))
      ev.crossJoin(broadcast(cut))
        .select(
          when(col("day") < date_sub(col("__cut"), 2), "train")
            .when(col("day") >= date_add(col("__cut"), 2), "test")
            .otherwise("purged").as("split"),
          col("event_type"), col("user_id"))
        .groupBy("split", "event_type")
        .agg(count(lit(1)).as("n_events"),
             countDistinct("user_id").as("n_users"))
        .orderBy("split", "event_type")
    }),

    // Classical decomposition of daily revenue, FULLY INTEGER: trend
    // = centered 7-day moving average as micro-cents floor division
    // (null until the window is complete on both sides), seasonal =
    // weekday mean minus grand mean (both as micro-cents floor
    // divisions — the components are DEFINED on the integer grid, so
    // both engines agree bit-for-bit with zero float anywhere),
    // residual = value - trend - seasonal. The rolling window runs
    // over the days-sized daily frame (tiny by construction); sums
    // of day-cents stay far inside Long at micro-cents scale.
    "q189_seasonal_decomposition" -> ((s, d) => {
      val daily = graft.ops.Staging.stage(
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .as("cents")))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val trended = daily
        .withColumn("__s7", sum("cents").over(w7))
        .withColumn("__n7", count(lit(1)).over(w7))
        .withColumn("trend_microcents",
          when(col("__n7") === 7, expr("(__s7 * 1000000) div 7")))
      val dow = daily
        .groupBy(date_format(col("day"), "EEEE").as("__wd"))
        .agg(sum("cents").as("__cd"), count(lit(1)).as("__nd"))
      val overall = daily.agg(sum("cents").as("__ca"), count(lit(1)).as("__na"))
      trended
        .withColumn("__wd", date_format(col("day"), "EEEE"))
        .join(broadcast(dow), "__wd")
        .crossJoin(broadcast(overall))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cents"),
          col("trend_microcents"),
          (expr("(__cd * 1000000) div __nd") -
            expr("(__ca * 1000000) div __na")).as("seasonal_microcents"),
          (col("cents") * 1000000L - col("trend_microcents") -
            (expr("(__cd * 1000000) div __nd") -
              expr("(__ca * 1000000) div __na"))).as("residual_microcents"))
        .orderBy("day")
    }),

    // Inter-event burstiness: the squared coefficient of variation of
    // each user's event gaps (cv² = n·Σg²/(Σg)² − 1; 0 for a metronome,
    // ~1 for Poisson, large for bursts). Gaps are exact micros from
    // one partitioned lag window; Σg and Σg² ride decimal(38,0) so
    // the sums are exact at any activity scale, and cv² is derived
    // from those exact integers by identical IEEE ops on both
    // engines (the q182 contract). Top 20 burstiest of the
    // sufficiently-active users.
    "q194_interevent_burstiness" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("__gap",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
        .filter(col("__gap").isNotNull)
      gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
             sum(col("__gap").cast("decimal(38,0)")).as("__s"),
             sum(col("__gap").cast("decimal(38,0)") *
                 col("__gap").cast("decimal(38,0)")).as("__sq"))
        .filter(col("n_gaps") >= 10)
        .select(col("user_id"), col("n_gaps"),
          expr("CAST(__s AS BIGINT) div n_gaps").as("mean_gap_us"),
          round(col("n_gaps").cast("double") * col("__sq").cast("double") /
                (col("__s").cast("double") * col("__s").cast("double")) -
            lit(1.0), 6).as("cv2"))
        .orderBy(col("cv2").desc, col("user_id"))
        .limit(20)
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

    // Two-sample Kolmogorov-Smirnov statistic — the distribution-
    // drift detector between two event populations (purchase vs
    // click order values): D = max over pooled distinct values of
    // |ECDF_p − ECDF_c|. The cumulative counts ride Kernels.prefixSum
    // (range-partitioned two-phase scan — NEVER a single-partition
    // global window; at 100 TB the scanned frame is bounded by
    // DISTINCT values, pre-aggregated map-side). The ECDFs, their
    // gap, and the argmax filter all derive from exact integers by
    // identical IEEE ops on both engines, so the max gap is
    // bit-identical and the `dd = max(dd)` filter selects identical
    // rows; ks_d rounds at 6dp, at_value is the smallest value
    // attaining D (exact input double).
    "q204_ks_statistic" -> ((s, d) => {
      val perVal = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("ca"),
             sum(when(col("event_type") === "click", 1L).otherwise(0L))
               .as("cb"))
      val cum = graft.ops.Staging.stage(
        Kernels.prefixSum(perVal, Seq(col("value").asc), Seq("ca", "cb")))
      val tot = cum.agg(sum("ca").as("__na"), sum("cb").as("__nb"))
      val diff = graft.ops.Staging.stage(
        cum.crossJoin(broadcast(tot))
          .select(col("value"), col("__na"), col("__nb"),
            abs(col("ca_cum").cast("double") / col("__na").cast("double") -
                col("cb_cum").cast("double") / col("__nb").cast("double"))
              .as("__d")))
      val top = diff.agg(max("__d").as("__dm"))
      diff.crossJoin(broadcast(top))
        .filter(col("__d") === col("__dm"))
        .groupBy()
        .agg(first("__na").as("n_purchase"), first("__nb").as("n_click"),
             round(first("__dm"), 6).as("ks_d"), min("value").as("at_value"))
        .orderBy("n_purchase")
    }),

    // ROC-AUC of `value` as a score for "this event is a purchase" —
    // the ML-eval primitive, computed EXACTLY via the rank-sum/
    // pair-count identity: AUC = Σ_s pos_s·(negBelow_s + neg_s/2)
    // / (nP·nN), with negBelow the EXCLUSIVE cumulative negative
    // count below score s. Per-score counts are one exchange;
    // negBelow rides Kernels.prefixSum (the q204 scan — never a
    // global window); the two weighted sums ride decimal(38,0) so
    // they are exact at any corpus size, and the final ratio is
    // derived from those exact integers by identical IEEE ops (6dp).
    "q205_roc_auc" -> ((s, d) => {
      val perScore = Tables.events(s, d)
        .groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("cp"),
             sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
               .as("cn"))
      val cum = Kernels.prefixSum(perScore, Seq(col("value").asc), Seq("cn"))
      cum.select(col("cp"), col("cn"),
          (col("cn_cum") - col("cn")).as("__below"))
        .agg(sum("cp").as("n_pos"), sum("cn").as("n_neg"),
             sum(col("cp").cast("decimal(38,0)") *
                 col("__below").cast("decimal(38,0)")).as("__s1"),
             sum(col("cp").cast("decimal(38,0)") *
                 col("cn").cast("decimal(38,0)")).as("__s2"))
        .select(col("n_pos"), col("n_neg"),
          round((col("__s1").cast("double") +
                 lit(0.5) * col("__s2").cast("double")) /
                (col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
            .as("auc"))
        .orderBy("n_pos")
    }),

    // Chi-square test of independence (event_type × weekday) — the
    // A/B-testing / drift sibling of q204/q205: does event mix depend
    // on the day of week? Float discipline: a cross-cell SUM of
    // double contributions would be partial-aggregation-order
    // dependent, so each cell's χ² contribution is (a) derived from
    // exact integers by identical IEEE ops — contrib = (obs·N −
    // rt·ct)²/(rt·ct·N) with the decimal(38,0) numerator cast to
    // double — then (b) FLOORED into exact integer ppm units, which
    // sum exactly in any order. expected_ppm is pure integer div.
    // Output: one row per cell plus an ALL/ALL total row.
    "q208_chi_square" -> ((s, d) => {
      val obs = Tables.events(s, d)
        .groupBy(col("event_type"),
                 date_format(col("ts"), "EEEE").as("weekday"))
        .agg(count(lit(1)).as("n_obs"))
      val cells = graft.ops.Staging.stage(obs
        .join(obs.groupBy("event_type").agg(sum("n_obs").as("__rt")),
              "event_type")
        .join(obs.groupBy("weekday").agg(sum("n_obs").as("__ct")), "weekday")
        .crossJoin(broadcast(obs.agg(sum("n_obs").as("__n"))))
        .select(col("event_type"), col("weekday"), col("n_obs"),
          expr("""CAST((CAST(__rt AS DECIMAL(38,0)) * __ct * 1000000)
                  div __n AS BIGINT)""").as("expected_ppm"),
          expr("""CAST(floor(
              CAST((CAST(n_obs AS DECIMAL(38,0)) * __n -
                    CAST(__rt AS DECIMAL(38,0)) * __ct) *
                   (CAST(n_obs AS DECIMAL(38,0)) * __n -
                    CAST(__rt AS DECIMAL(38,0)) * __ct) AS DOUBLE) /
              (CAST(__rt AS DOUBLE) * CAST(__ct AS DOUBLE) *
               CAST(__n AS DOUBLE)) * 1000000.0D) AS BIGINT)""")
            .as("chi2_contrib_ppm")))
      val total = cells
        .agg(sum("n_obs").as("n_obs"),
             sum("chi2_contrib_ppm").as("chi2_contrib_ppm"))
        .select(lit("ALL").as("event_type"), lit("ALL").as("weekday"),
                col("n_obs"), lit(1000000L).as("expected_ppm"),
                col("chi2_contrib_ppm"))
      cells.unionByName(total)
        .orderBy("event_type", "weekday")
    }),

    // Interval-overlap join (IntervalJoin.overlapJoin — an
    // inequality-only join condition has NO native Spark strategy;
    // naive it plans as a broadcast nested loop): q23's 30-minute
    // sessions matched against literal incident windows via the
    // time-grid bucketization (each interval explodes to its 6-hour
    // grid cells, plain equi-join on the cell, keys-dedup,
    // exact half-open predicate s_start < w_end AND w_start < s_end).
    // Replication is bounded by interval length / cell width — never
    // a cross product. Per window: overlapping sessions + distinct
    // users, exact integers.
    "q210_interval_overlap" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      val sessions = Tables.events(s, d)
        .withColumn("new_sess",
          when(unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) >
               1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_id", sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(unix_micros(min("ts")).as("s_start"),
             unix_micros(max("ts")).as("s_end"))
      val wins = Seq(
        ("w1", "2024-01-05 00:00:00", "2024-01-06 00:00:00"),
        ("w2", "2024-01-10 06:00:00", "2024-01-10 18:00:00"),
        ("w3", "2024-01-12 00:00:00", "2024-01-14 00:00:00"),
        ("w4", "2024-01-20 12:00:00", "2024-01-21 12:00:00"),
        ("w5", "2024-01-28 00:00:00", "2024-01-31 00:00:00"))
        .toDF("win_id", "__ss", "__es")
        .select(col("win_id"),
          unix_micros(to_timestamp(col("__ss"))).as("w_start"),
          unix_micros(to_timestamp(col("__es"))).as("w_end"))
      graft.ops.IntervalJoin.overlapJoin(
          sessions, "s_start", "s_end",
          wins, "w_start", "w_end",
          bucketWidth = 6L * 3600L * 1000000L)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_sessions"),
             countDistinct("user_id").as("n_users"))
        .orderBy("win_id")
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

    // Rolling 7-ACTIVE-day MEDIAN of event value — the quantile
    // sibling of q199's HLL pyramid. "7 days" = the 7 most recent
    // days PRESENT in the data (the q199/q250 active-day convention):
    // the grid zero-fills missing BUCKETS, not missing calendar days,
    // so calendar gaps compress the window rather than diluting it —
    // mirrored exactly by the oracle's rowsBetween replay. (For the
    // calendar-day variant, densify `days` over a sequence() span
    // first.) Exact rolling quantiles re-sort every window, but
    // ADDITIVE histogram counters (the q212 family) make the rolling
    // combine O(days × buckets): a dense active-day×bucket grid
    // (bounded by value-range/width, zero-filled so every bucket
    // windows over the SAME active-day list), a 7-row rolling sum per
    // bucket, then the standard in-bucket interpolation per day.
    // Every step is exact integer/rational arithmetic, so the
    // ESTIMATE is replayed bit-exactly by the oracle — approximate
    // operator, exact check (the q212 contract).
    "q229_rolling_median" -> ((s, d) => {
      val w = 5.0
      val counts = Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
                 floor(col("value") / w).cast("long").as("b"))
        .agg(count(lit(1)).as("c"))
      val days = counts.select("day").distinct()
      val buckets = counts.select("b").distinct()
      val grid = days.crossJoin(buckets)
        .join(counts, Seq("day", "b"), "left")
        .na.fill(0L, Seq("c"))
      val roll = Window.partitionBy("b").orderBy("day")
        .rowsBetween(-6, 0)
      val cum = graft.ops.Staging.stage(
        grid.withColumn("rc", sum("c").over(roll))
          .filter(col("rc") > 0))
      val wDay = Window.partitionBy("day").orderBy("b")
      val prep = cum
        .withColumn("cb", coalesce(
          sum("rc").over(wDay.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("n", sum("rc").over(Window.partitionBy("day")))
      val r = ceil(lit(0.5) * col("n"))
      prep.filter(r > col("cb") && r <= col("cb") + col("rc"))
        .select(col("day"), col("n").as("n_window"),
          round(col("b") * w + lit(w) * (r - col("cb")).cast("double") /
                col("rc"), 6).as("p50_est"))
        .orderBy("day")
    }),

    // Rolling 7-active-day distinct users — the sliding-uniques
    // product metric that is EXPENSIVE exactly (count(DISTINCT) over
    // a moving window re-scans the window per day) but O(days · 256)
    // with mergeable HLL registers: per-day register maxima, a 7-row
    // rolling max per register over the day grid, re-estimate. Same
    // register pyramid as q112 (which is the unbounded-window
    // special case); "7 days" = the 7 most recent ACTIVE days on the
    // grid, mirrored exactly by the oracle's window.
    "q199_rolling_distinct" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      val regs = graft.ops.Staging.stage(
        graft.ext.Sketches.hllRegisters(ev, "day", "user_id"))
      val grid = regs.select("day").distinct()
        .crossJoin(regs.select("__b").distinct())
      val roll = grid.join(regs, Seq("day", "__b"), "left")
        .withColumn("__cm", max("__m").over(
          w.partitionBy("__b").orderBy("day").rowsBetween(-6, 0)))
        .filter(col("__cm").isNotNull)
        .select(col("day"), col("__b"), col("__cm").as("__m"))
      graft.ext.Sketches.hllEstimate(roll, "day")
        .select(col("day"), col("n_buckets"),
                round(col("hll_distinct"), 6).as("rolling7_users_est"))
        .orderBy("day")
    }),

    // Holt's linear trend (double-exponential smoothing) over each
    // event type's daily-revenue series — the level+trend forecast
    // primitive one step past q139's flat EWMA. Daily cents are exact
    // integers (so y is an exact double); the recurrence runs in
    // Kernels.holtLinear's secondary-sort scan (series count scales
    // out, the per-series scan is constant-memory), and the oracle
    // replays the identical fp op order as a recursive CTE →
    // bit-identical levels/trends (the q151/q158 contract).
    "q231_holt_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
                 date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .cast("double").as("y"))
      Kernels.holtLinear(daily, "event_type", Seq("day"), "y",
          alpha = 0.5, beta = 0.5)
        .select(col("event_type"), col("day"),
                round(col("level"), 6).as("level"),
                round(col("trend"), 6).as("trend"))
        .orderBy("event_type", "day")
    }),

    // Lagged cross-correlation between two daily series — click
    // activity (counts) leading purchase revenue (cents) by 0..7
    // days: the lead-lag diagnostic behind "does engagement predict
    // spend". Days ride exact integer epoch-day keys (never engine
    // date arithmetic), the 8 lags are a broadcast 8-row frame so
    // the shifted join is one shuffle of the tiny daily aggregates,
    // and Pearson r per lag is derived from six exact decimal(38,0)
    // sums by textually-shared IEEE ops (the q194 cv² contract —
    // sums exact at any scale, one closed-form divide at the end,
    // 6dp).
    "q232_lag_crosscorr" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(datediff(to_date(col("ts")),
                          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("x"))
      val rev = ev.filter(col("event_type") === "purchase")
        .groupBy(datediff(to_date(col("ts")),
                          lit("1970-01-01").cast("date")).cast("long").as("ed_dd"))
        .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("yv"))
      val lags = s.range(0, 8).toDF("lag_d")
      val pairs = clicks.crossJoin(broadcast(lags))
        .withColumn("ed_dd", col("dd") + col("lag_d"))
        .join(rev, Seq("ed_dd"))
      pairs.groupBy("lag_d")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
             sum(col("x").cast("decimal(38,0)")).as("sx"),
             sum(col("yv").cast("decimal(38,0)")).as("sy"),
             sum(col("x").cast("decimal(38,0)") *
                 col("yv").cast("decimal(38,0)")).as("sxy"),
             sum(col("x").cast("decimal(38,0)") *
                 col("x").cast("decimal(38,0)")).as("sxx"),
             sum(col("yv").cast("decimal(38,0)") *
                 col("yv").cast("decimal(38,0)")).as("syy"))
        .select(col("lag_d"), col("n").cast("long").as("n_days"),
          round((col("n").cast("double") * col("sxy").cast("double") -
                 col("sx").cast("double") * col("sy").cast("double")) /
                (sqrt(col("n").cast("double") * col("sxx").cast("double") -
                      col("sx").cast("double") * col("sx").cast("double")) *
                 sqrt(col("n").cast("double") * col("syy").cast("double") -
                      col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("pearson_r"))
        .orderBy("lag_d")
    }),

    // Quantile normalization across event types (the cross-batch
    // distribution aligner from bioinformatics, equally the "make
    // feature distributions comparable across sources" step in a
    // training pipeline): rank values within each type, average each
    // rank across types up to the shortest type's length, summarize
    // per rank-decile. One exchange for the per-type row_number, one
    // for the per-rank sum — both keyed on columns whose cardinality
    // grows with the data, never all-pairs. Everything is exact
    // integers except the final per-decile mean, emitted as
    // floor(·1e4) of an exact-double product (the q142 floor-not-
    // round rule — a mean of integers CAN sit on a 6dp half).
    "q233_quantile_norm" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("cents", "event_id")
      val ranked = Tables.events(s, d)
        .select(col("event_type"),
                expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
                col("event_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
      val m = ranked.groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .agg(min("cnt").as("min_n"), count(lit(1)).as("n_types"))
      ranked.crossJoin(broadcast(m))
        .filter(col("rn") <= col("min_n"))
        .groupBy("rn", "min_n", "n_types")
        .agg(sum("cents").as("rank_cents"))
        .select(expr("((rn - 1) * 10) div min_n + 1").as("decile"),
                col("n_types"), col("rank_cents"))
        .groupBy("decile", "n_types")
        .agg(count(lit(1)).as("n_ranks"), sum("rank_cents").as("total_cents"))
        .select(col("decile"), col("n_types"), col("n_ranks"),
                col("total_cents"),
                expr("CAST(floor(total_cents * 10000.0 / (n_types * n_ranks)) AS BIGINT)")
                  .as("avg_norm_c4"))
        .orderBy("decile")
    }),

    // Point-in-time (time-travel) read over the q141 SCD2 history:
    // "what did the dimension look like at T?" for four probe
    // instants — the reproducibility primitive behind training-run
    // provenance ("rebuild the features exactly as of the snapshot").
    // Each key has at most one version valid at T (the SCD2 intervals
    // partition time from the key's first change), so the as-of read
    // is a RANGE join of the history against a broadcast 4-row probe
    // frame — a broadcast nested loop over tiny probes, never a
    // history self-join; the history build itself is q141's single
    // window pass.
    "q235_scd2_asof" -> ((s, d) => {
      val hist = Cdc.scd2(Tables.events(s, d)
            .select(col("user_id"), col("ts"), col("event_id"), col("value")),
          key = "user_id", ts = "ts", tieBreak = "event_id",
          attrs = Seq("value"))
      import s.implicits._
      val probes = Seq("2024-01-08 00:00:00", "2024-01-15 00:00:00",
          "2024-01-22 00:00:00", "2024-01-29 00:00:00").toDF("pt")
        .select(col("pt"), to_timestamp(col("pt")).as("pts"))
      hist.join(broadcast(probes),
          col("valid_from") <= col("pts") &&
            (col("valid_to").isNull || col("valid_to") > col("pts")))
        .groupBy("pt")
        .agg(count(lit(1)).as("n_users"),
             sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
               .as("total_cents"),
             max("version").cast("long").as("max_version"))
        .orderBy("pt")
    }),

    // Incremental view maintenance: a materialized per-type aggregate
    // kept current by MERGING a delta partition's partial aggregate
    // into the base's — never rescanning the base (the nightly-ingest
    // contract at 100 TB: the base agg is k rows, the delta scan is
    // one day). Everything maintained must be MERGEABLE (sum/count/
    // min/max — the same algebra behind Spark's own partial
    // aggregation; distinct counts need q112's HLL registers
    // instead). The ORACLE is the full recompute over base+delta —
    // the check IS the proof that incremental ≡ recompute.
    "q236_ivm_delta" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val cut = lit("2024-01-25").cast("date")
      def part(df: DataFrame) = df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("c"),
             min("day").as("mn"), max("day").as("mx"))
      part(ev.filter(col("day") < cut))
        .unionByName(part(ev.filter(col("day") >= cut)))
        .groupBy("event_type")
        .agg(sum("n").as("n_events"), sum("c").as("total_cents"),
             date_format(min("mn"), "yyyy-MM-dd").as("first_day"),
             date_format(max("mx"), "yyyy-MM-dd").as("last_day"))
        .orderBy("event_type")
    }),

    // Welch's unequal-variance t-test between purchase and click
    // value distributions — the two-sample inference sibling of q156's
    // proportion lift. The six sufficient statistics (n, Σx, Σx² per
    // arm) ride exact decimal(38,0); t and the Welch–Satterthwaite
    // dof are then ONE closed form over those integers, with the
    // expression TEXT shared verbatim between Spark and the oracle
    // (the q218 contract) — identical IEEE op order, 6dp.
    "q238_welch_ttest" -> ((s, d) => {
      val g = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
             sum(col("c").cast("decimal(38,0)")).as("s"),
             sum(col("c").cast("decimal(38,0)") *
                 col("c").cast("decimal(38,0)")).as("q"))
      val a = g.filter(col("event_type") === "purchase")
        .select(col("n").as("n1"), col("s").as("s1"), col("q").as("q1"))
      val b = g.filter(col("event_type") === "click")
        .select(col("n").as("n2"), col("s").as("s2"), col("q").as("q2"))
      a.crossJoin(broadcast(b)).selectExpr(
        "CAST(n1 AS BIGINT) AS n_purchase",
        "CAST(n2 AS BIGINT) AS n_click",
        s"round($WelchT, 6) AS t_stat",
        s"round($WelchDof, 6) AS welch_dof")
        .orderBy("n_purchase")
    }),

    // Calibration curve (reliability diagram) for an activity-based
    // propensity score — the ML-eval sibling of q205's ROC-AUC and
    // q204's KS: bin users by score decile (RANK arithmetic, the q84
    // rule — value thresholds can flip boundary users on an ulp) and
    // compare the bin's mean score against its observed conversion
    // rate. Score, bins and rates are ALL integer arithmetic
    // (floor-div ppm), so the row hashes raw.
    "q240_calibration" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("x"),
             max(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("y"))
      val scored = users.crossJoin(broadcast(users.agg(max("x").as("mx"))))
        .select(col("user_id"), col("y"),
                expr("(x * 1000000) div mx").as("score_ppm"))
      val ranked = Kernels.denseIndex(scored,
        Seq(col("score_ppm"), col("user_id")), "__i")
      ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("__n"))))
        .select(expr("(__i * 10) div __n + 1").as("bin"),
                col("score_ppm"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_users"), sum("score_ppm").as("__ss"),
             sum("y").as("n_pos"))
        .select(col("bin"), col("n_users"),
          expr("__ss div n_users").as("avg_score_ppm"),
          expr("(n_pos * 1000000) div n_users").as("conv_rate_ppm"))
        .orderBy("bin")
    }),

    // Confusion matrix + precision/recall/F1 at a fixed decision
    // threshold (predict converter iff ≥ 12 events) — with every
    // metric an exact integer closed form: even F1 = 2TP/(2TP+FP+FN)
    // floor-divs straight from the counts, no float in sight.
    "q241_confusion_prf" -> ((s, d) => {
      Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("x"),
             max(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("y"))
        .agg(sum(when(col("x") >= 12 && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
             sum(when(col("x") >= 12 && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
             sum(when(col("x") < 12 && col("y") === 1L, 1L).otherwise(0L)).as("fn"),
             sum(when(col("x") < 12 && col("y") === 0L, 1L).otherwise(0L)).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr("(tp * 1000000) div (tp + fp)").as("precision_ppm"),
          expr("(tp * 1000000) div (tp + fn)").as("recall_ppm"),
          expr("(2 * tp * 1000000) div (2 * tp + fp + fn)").as("f1_ppm"))
        .orderBy("tp")
    }),

    // Bootstrap confidence interval WITHOUT randomness: 32 half-
    // sample resamples keyed on md5(user, 'boot', b) parity (the q156
    // deterministic-arm idiom), each resample's conversion rate an
    // exact floor-ppm integer, and the spread of those 32 integers
    // summarized by an exact-sufficient-statistics sd (the q238
    // shared-text contract). Deterministic ⇒ replayable by the
    // oracle; the resample fan-out is a broadcast 32-row frame, one
    // shuffle total.
    "q242_bootstrap_ci" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      val bs = s.range(0, 32).toDF("b")
      users.crossJoin(broadcast(bs))
        .filter(conv(substring(md5(concat(col("user_id").cast("string"),
            lit("boot"), col("b").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2L === 0L)
        .groupBy("b")
        .agg(count(lit(1)).as("n"), sum("y").as("c"))
        .select(expr("(c * 1000000) div n").as("r"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("bn"),
             sum(col("r").cast("decimal(38,0)")).as("sr"),
             sum(col("r").cast("decimal(38,0)") *
                 col("r").cast("decimal(38,0)")).as("qr"))
        .selectExpr(
          "CAST(bn AS BIGINT) AS n_resamples",
          "CAST(sr AS BIGINT) div CAST(bn AS BIGINT) AS mean_rate_ppm",
          s"round($BootSd, 6) AS sd_rate_ppm")
        .orderBy("n_resamples")
    }),

    // Population-stability-index drift between the first two weeks
    // and the rest of the window — THE production monitor for "did
    // the feature distribution move" (the two-sample sibling of
    // q204's KS, but binned and additive so it map-reduces). Bins are
    // fixed-width integer buckets, shares Laplace(+1)-smoothed so
    // empty bins stay finite; each bin's (p−q)·ln(p/q) term is
    // computed from exact counts by shared-text IEEE ops and FLOORED
    // to integer nano-units (the q208 cross-cell rule: a float sum of
    // terms is partial-agg-order dependent, a sum of floored integers
    // is not).
    "q243_psi_drift" -> ((s, d) => {
      val binned = Tables.events(s, d)
        .select(
          when(expr("unix_micros(ts) div 86400000000") < 19738L, 1L)
            .otherwise(0L).as("ref"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 500").as("bin"))
      val g = binned.groupBy("bin")
        .agg(sum(col("ref")).as("c1"),
             sum(lit(1L) - col("ref")).as("c2"))
      val tot = g.agg(sum("c1").as("n1"), sum("c2").as("n2"),
                      count(lit(1)).as("nb"))
      g.crossJoin(broadcast(tot))
        .select(expr(s"CAST(floor(1000000000.0 * ($PsiTerm)) AS BIGINT)")
          .as("t"))
        .agg(count(lit(1)).as("n_bins"), sum("t").as("psi_e9"))
        .orderBy("n_bins")
    }),

    // Rolling 7-active-day OLS revenue slope — the windowed sibling
    // of q99's per-user trend and q229's rolling median: every OLS
    // sufficient statistic (n, Σx, Σx², Σy, Σxy with x = epoch day,
    // y = daily cents) is an EXACT-INTEGER rolling window sum, so the
    // only float op is the final shared-text slope division (6dp).
    // Handles calendar gaps correctly (x is the real day number, the
    // window is the last 7 ACTIVE days). One exchange on nothing —
    // the daily rollup feeds one ordered window pass.
    "q250_rolling_ols" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("x"))
        .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("y"))
      val w = Window.orderBy("x").rowsBetween(-6, 0)
      daily
        .select(col("x"), count(lit(1)).over(w).as("n"),
          sum("x").over(w).as("sx"),
          sum(col("x") * col("x")).over(w).as("sxx"),
          sum("y").over(w).as("sy"),
          sum(col("x") * col("y")).over(w).as("sxy"))
        .filter(col("n") === 7)
        .selectExpr("x AS day_num", "n AS n_days",
          "CAST(7 * sxy - sx * sy AS BIGINT) AS slope_num",
          "CAST(7 * sxx - sx * sx AS BIGINT) AS slope_den",
          s"round($RollingSlope, 6) AS slope_cents_per_day")
        .orderBy("day_num")
    }),

    // Weighted sampling WITHOUT floats: priority sampling (Duffield–
    // Lund–Thorup) takes the k smallest u/w priorities (u uniform,
    // w the weight), giving inclusion probability ∝ w. Here the
    // priority is the EXACT integer floor((u·2^20)/w) of a 32-bit
    // md5 hash over integer cent weights — no ln/pow/division whose
    // cross-engine ulp could flip a rank (the q84 value-threshold
    // lesson), ties broken by event_id. Deterministic ⇒ the oracle
    // replays the identical sample; at scale the top-k is the
    // standard TakeOrdered partial (k rows per partition reach the
    // final heap).
    "q248_priority_sample" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("w"))
        .filter(col("w") > 0)
        .withColumn("u",
          expr("CAST(conv(substring(md5(concat(CAST(event_id AS STRING), " +
            "'prio')), 1, 8), 16, 10) AS BIGINT)"))
        .select(col("event_id"), col("event_type"), col("w"),
                expr("(u * 1048576) div w").as("pr"))
        .orderBy("pr", "event_id").limit(32)
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

    // Deterministic class rebalancing: downsample every event type to
    // the minority class's count, keeping the md5-rank-first rows —
    // the training-set balancer that needs NO randomness (same rows
    // on every engine and every run, the q67/q156 hash-order rule).
    // One exchange for the per-type rank; at 100 TB the same rank
    // threshold comes from a count-per-class broadcast and the filter
    // is map-side.
    "q244_class_rebalance" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
                expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      val k = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .agg(min("cnt").as("k"))
      val w = Window.partitionBy("event_type")
        .orderBy(md5(concat(col("event_id").cast("string"), lit("rebal"))),
                 col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(k))
        .filter(col("rn") <= col("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"), sum("c").as("cents_kept"))
        .orderBy("event_type")
    }),

    // AMS (Alon–Matias–Szegedy) second-frequency-moment sketch vs the
    // exact F2 = Σ f_v² — the self-join-size / skew estimator that
    // needs O(R) counters where exact F2 needs the full frequency
    // table: R=64 independent ±1-signed sums S_r = Σ_v f_v·s(v,r),
    // E[S_r²] = F2, estimate = mean of S_r² (integer floor div).
    // Signs come from md5(item#r) first hex digit (the q32 simhash
    // bit rule), so both engines draw identical pseudo-randomness;
    // every sum is an exact integer — approximate operator, exact
    // replay (the q212 contract). Scale shape: the frequency frame is
    // VOCABULARY-sized (one aggregate over the corpus, map-side
    // partial combine), and the 64× estimator explode runs over that
    // vocab frame, never corpus rows; at 100 TB the sketch side
    // collapses to 64 counters per partition before the one exchange.
    "q253_ams_f2" -> ((s, d) => {
      val f = graft.ops.Staging.stage(Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull)
        .groupBy("item").agg(count(lit(1)).as("fv")))
      val exact = f.agg(sum(col("fv") * col("fv")).as("f2_exact"),
                        sum("fv").as("n_rows"))
      val est = f
        .select(col("item"), col("fv"),
                explode(expr("sequence(0, 63)")).as("r"))
        .withColumn("sgn",
          when(substring(md5(concat(col("item").cast("string"), lit("#"),
              col("r").cast("string"))), 1, 1)
            .isin("8", "9", "a", "b", "c", "d", "e", "f"), lit(1L))
          .otherwise(lit(-1L)))
        .groupBy("r").agg(sum(col("fv") * col("sgn")).as("sr"))
        .agg(sum(col("sr") * col("sr")).as("ssq"), count(lit(1)).as("nr"))
      exact.crossJoin(broadcast(est))
        .select(col("n_rows"), col("f2_exact"),
          expr("ssq div nr").as("f2_est"),
          expr("(abs(ssq div nr - f2_exact) * 1000000) div f2_exact")
            .as("err_ppm"))
        .orderBy("n_rows")
    }),

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

    // CUPED variance reduction (Deng et al. 2013, WSDM — "Improving
    // the Sensitivity of Online Controlled Experiments"): adjust each
    // user's experiment-period metric by their PRE-period metric,
    // y' = y − θ·(x − x̄), θ = cov(x,y)/var(x) — the industry-standard
    // A/B variance cut. Periods split at the exact midpoint micro of
    // the corpus time range; per-user cents ride ONE conditional
    // aggregate; treatment = user_id parity (deterministic stand-in).
    // θ and the diffs derive from exact BIGINT sums through SHARED
    // expression text (the q218/q238 rule), so both engines perform
    // the identical IEEE op sequence and 6dp rounding hashes. Scale
    // shape: one exchange on user_id, then a 2-row treatment rollup
    // and a 1-row pooled-moment frame — no corpus-sized state.
    "q256_cuped" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      val mid = ev.agg(min("us").as("__mn"), max("us").as("__mx"))
        .selectExpr("(__mn + __mx) div 2 AS mid")
      val perUser = graft.ops.Staging.stage(
        ev.crossJoin(broadcast(mid))
          .groupBy("user_id")
          .agg(coalesce(sum(when(col("us") < col("mid"), col("c"))), lit(0L))
                 .as("x"),
               coalesce(sum(when(col("us") >= col("mid"), col("c"))), lit(0L))
                 .as("y"))
          .withColumn("t", pmod(col("user_id"), lit(2L))))
      val pooled = perUser.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      val byT = perUser.groupBy("t")
        .agg(count(lit(1)).as("nt"), sum("x").as("sxt"), sum("y").as("syt"))
      val wide = byT.groupBy()
        .agg(max(when(col("t") === 0, col("nt"))).as("n0"),
             max(when(col("t") === 0, col("sxt"))).as("sx0"),
             max(when(col("t") === 0, col("syt"))).as("sy0"),
             max(when(col("t") === 1, col("nt"))).as("n1"),
             max(when(col("t") === 1, col("sxt"))).as("sx1"),
             max(when(col("t") === 1, col("syt"))).as("sy1"))
      wide.crossJoin(broadcast(pooled))
        .selectExpr("n0", "n1",
          s"round($CupedNaive, 6) AS naive_diff_cents",
          s"round($CupedTheta, 6) AS theta",
          s"round($CupedNaive - ($CupedTheta) * ($CupedXDiff), 6) " +
            "AS adj_diff_cents")
        .orderBy("n0")
    }),

    // Mutual information between event type and item bucket — the
    // feature-dependence ranking signal (q208's chi-square is the
    // NHST sibling; MI is the information-theoretic effect size):
    // I = Σ_cells (c/N)·ln(c·N/(r·s)), every factor an exact integer
    // count, each cell's term FLOORED to integer nano-nats before the
    // sum (the q252/q208 cross-cell rule — float sums of logs are
    // partial-agg-order dependent; sums of floored integers are not).
    // Scale: one contingency aggregate (cells ≤ types × buckets),
    // marginals via windows over the tiny cell frame.
    "q257_mi_nats" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          pmod(get_json_object(col("props"), "$.k").cast("long"), lit(8L))
            .as("b"))
        .filter(col("b").isNotNull)
      // staged: the marginal windows and the total both read the
      // (types × buckets)-bounded cell frame
      val cells = graft.ops.Staging.stage(
        ev.groupBy("event_type", "b").agg(count(lit(1)).as("c")))
      val wT = Window.partitionBy("event_type")
      val wB = Window.partitionBy("b")
      val tot = cells.agg(sum("c").as("n"))
      cells
        .withColumn("r", sum("c").over(wT))
        .withColumn("s", sum("c").over(wB))
        .crossJoin(broadcast(tot))
        .select(col("n"), expr(s"CAST(floor($MiTermNano) AS BIGINT)")
          .as("nano"))
        .groupBy("n")
        .agg(count(lit(1)).as("n_cells"), sum("nano").as("mi_nano"))
        .orderBy("n")
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

    // Stratified matched control construction — exact-matching causal
    // inference prep (propensity matching's integer-exact cousin):
    // users decile-bucketed by activity via the denseIndex
    // total-order rank (the q219 RFM machinery), then per decile the
    // treatment/control counts, the matchable pair count
    // min(n_t, n_c), and the arm balance (mean activity diff in
    // floor-div milli-events — a SMD stand-in that stays exact).
    // Treatment = user_id parity (the q256 deterministic stand-in).
    // Scale: denseIndex is the range-partitioned rank (never a
    // single-partition window); everything after is decile-bounded.
    "q264_matched_strata" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .withColumn("t", pmod(col("user_id"), lit(2L)))
      val ranked = Kernels.denseIndex(users, Seq(col("n"), col("user_id")),
        "__i")
      ranked.crossJoin(broadcast(users.agg(count(lit(1)).as("__tot"))))
        .select(col("t"), col("n"),
          expr("(__i * 10) div __tot + 1").as("decile"))
        .groupBy("decile")
        .agg(sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_t"),
             sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_c"),
             sum(when(col("t") === 1, col("n")).otherwise(0L)).as("__at"),
             sum(when(col("t") === 0, col("n")).otherwise(0L)).as("__ac"))
        .select(col("decile"), col("n_t"), col("n_c"),
          least(col("n_t"), col("n_c")).as("n_matched"),
          expr("CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE " +
            "(__at * 1000) div n_t - (__ac * 1000) div n_c END")
            .as("balance_milli"))
        .orderBy("decile")
    }),

    // Per-group ROC-AUC — q205's exact rank-sum AUC sliced by weekday
    // (the per-segment model-eval report: a global AUC can hide a
    // segment where the score is no better than chance). The grouped
    // cumulative runs as a window over the per-(weekday, value)
    // count frame — bounded by distinct scores per group, never
    // corpus rows (when distinct scores ARE corpus-sized, q205's
    // range-partitioned prefixSum shape is the scale path). Pair
    // counting rides decimal(38,0)/HUGEINT; one 6dp-rounded double
    // at the end (the q205 contract).
    "q267_group_auc" -> ((s, d) => {
      val perScore = Tables.events(s, d)
        .groupBy(date_format(col("ts"), "EEEE").as("weekday"), col("value"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("cp"),
             sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
               .as("cn"))
      val w = Window.partitionBy("weekday").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
      perScore
        .withColumn("below_n", sum("cn").over(w) - col("cn"))
        .groupBy("weekday")
        .agg(sum("cp").as("n_pos"), sum("cn").as("n_neg"),
             sum(col("cp").cast("decimal(38,0)") *
                 col("below_n").cast("decimal(38,0)")).as("__s1"),
             sum(col("cp").cast("decimal(38,0)") *
                 col("cn").cast("decimal(38,0)")).as("__s2"))
        .select(col("weekday"), col("n_pos"), col("n_neg"),
          round((col("__s1").cast("double") +
                 lit(0.5) * col("__s2").cast("double")) /
                (col("n_pos").cast("double") * col("n_neg").cast("double")),
            6).as("auc"))
        .orderBy("weekday")
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

    // Hill tail-index estimator over order values — the heavy-tail
    // diagnostic (is revenue power-law distributed, and how fat is
    // the tail?): alpha^-1 = mean over the top-k order statistics of
    // ln(x_i / x_k). The top-k multiset is deterministic (ties at
    // the boundary share the same cents value, so the VALUE multiset
    // is tie-break-invariant), each log term is FLOORED to nano-nats
    // before summing (the q252 rule), and alpha comes back as an
    // exact integer milli ratio. Scale: TakeOrdered for the top-k
    // (never a global sort), then a k-row aggregate.
    "q271_hill_tail_index" -> ((s, d) => {
      val k = 500
      val top = graft.ops.Staging.stage(Tables.orders(s, d)
        .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("c"), col("o_orderkey"))
        .orderBy(col("c").desc, col("o_orderkey"))
        .limit(k)
        .select("c"))
      val xk = top.agg(min("c").as("xk"))
      top.crossJoin(broadcast(xk))
        .select(col("xk"),
          expr("CAST(floor(1000000000.0 * ln(CAST(c AS DOUBLE) / " +
            "CAST(xk AS DOUBLE))) AS BIGINT)").as("nano"))
        .groupBy("xk")
        .agg(count(lit(1)).as("k"), sum("nano").as("sum_log_nano"))
        .select(col("k"), col("xk").as("xk_cents"), col("sum_log_nano"),
          expr("CASE WHEN sum_log_nano = 0 THEN 0 ELSE " +
            "(k * 1000000000000) div sum_log_nano END").as("alpha_milli"))
        .orderBy("k")
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

    // SLO error-budget burn — the daily reliability ledger every
    // on-call rotation reads: per day, the error share in exact ppm
    // and the RUNNING budget burn against a 20% error SLO
    // (burn_t = errors_t·10⁶ − 200000·n_t micro-events; cumulative
    // via the range-partitioned Kernels.prefixSum — negative values
    // are safe there, and a positive running total is exactly "budget
    // exhausted since day one"). The day frame is calendar-bounded;
    // err_ppm divides positives only (the div-vs-// trap never
    // applies).
    "q285_slo_burn" -> ((s, d) => {
      val day = Tables.events(s, d)
        .groupBy(expr("date_format(ts, 'yyyy-MM-dd')").as("day"))
        .agg(count(lit(1)).as("n_events"),
             sum(when(col("event_type") === "error", 1L).otherwise(0L))
               .as("n_errors"))
        .select(col("day"), col("n_events"), col("n_errors"),
          expr("n_errors * 1000000 - 200000 * n_events").as("__burn"))
      Kernels.prefixSum(day, Seq(col("day").asc), Seq("__burn"))
        .select(col("day"), col("n_events"), col("n_errors"),
          expr("(n_errors * 1000000) div n_events").as("err_ppm"),
          col("__burn_cum").as("burn_micro_cum"))
        .orderBy("day")
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

    // As-of join WITH a freshness tolerance (pandas merge_asof
    // `tolerance`) — the stale-reference guard: an event more than 30
    // days past the customer's latest order keeps NULL payload
    // instead of silently joining month-old state (q24 is the
    // unbounded backward as-of). Same single-shuffle union+window
    // plan; the gap test is map-side on the carried match time.
    // Output summarizes matched/stale/unmatched so the row count
    // stays audit-sized.
    "q276_asof_tolerance" -> ((s, d) => {
      val latest = Kernels.dedupKeepLast(Tables.orders(s, d),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey")))
      val bounded = AsOf.joinBackward(
        Tables.events(s, d).select("event_id", "user_id", "ts"), latest,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payload = Seq("o_orderkey"),
        toleranceSeconds = Some(30L * 86400))
      val unbounded = AsOf.joinBackward(
        Tables.events(s, d).select("event_id", "user_id", "ts"), latest,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payload = Seq("o_orderkey"))
      bounded.select(col("event_id"),
          col("o_orderkey").isNotNull.as("__m"))
        .join(unbounded.select(col("event_id"),
          col("o_orderkey").isNotNull.as("__u")), "event_id")
        .agg(count(lit(1)).as("n_events"),
             sum(when(col("__m"), 1L).otherwise(0L)).as("n_fresh"),
             sum(when(!col("__m") && col("__u"), 1L).otherwise(0L))
               .as("n_stale"),
             sum(when(!col("__u"), 1L).otherwise(0L)).as("n_unmatched"))
        .orderBy("n_events")
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

  /** q256 CUPED shared expression text (the q218/q238 rule — one
    * string, used verbatim by both engines, so every IEEE op happens
    * in the identical order): naive treatment diff of the post-period
    * means, θ = pooled cov(x,y)/var(x), pre-period mean diff. All
    * inputs are exact BIGINT sums. */
  private val CupedNaive =
    "CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
      "CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
  private val CupedXDiff =
    "CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
      "CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
  private val CupedTheta =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"

  /** q257's per-cell MI contribution in nano-nats, pre-floor (q252's
    * floored-integer cross-cell rule; shared text): (c/N)·ln(cN/(rs))
    * · 1e9 from exact integer counts. */
  private val MiTermNano =
    "1000000000.0 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) / " +
      "(CAST(r AS DOUBLE) * CAST(s AS DOUBLE)))"

  /** q250's slope over exact rolling integer sums (q238's shared-
    * text rule): (7·Σxy − Σx·Σy) / (7·Σx² − (Σx)²). */
  private val RollingSlope =
    "CAST(7 * sxy - sx * sy AS DOUBLE) / CAST(7 * sxx - sx * sx AS DOUBLE)"

  /** Sample sd over the exact resample-rate integers (q238's shared-
    * text rule): sqrt((B·Σr² − (Σr)²) / (B·(B−1))). */
  private val BootSd =
    "sqrt((CAST(bn AS DOUBLE) * CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * " +
      "CAST(sr AS DOUBLE)) / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)))"

  /** One PSI term (p−q)·ln(p/q) with Laplace(+1)-smoothed bin shares
    * — shared text (q218), derived only from exact integer counts. */
  private val PsiTerm =
    "((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)) - " +
      "(CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))) * " +
      "ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)) / " +
      "(CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE)))"

  /** Welch closed forms over the six exact sufficient statistics —
    * ONE source string each, used verbatim by the Spark selectExpr
    * AND interpolated into the DuckDB oracle, so both engines execute
    * the identical IEEE op sequence (the q218 shared-text contract).
    * V = s²/n expanded to (n·Σx² − (Σx)²) / (n·n·(n−1)). */
  private def welchV(n: String, q: String, sx: String): String =
    s"(CAST($n AS DOUBLE) * CAST($q AS DOUBLE) - CAST($sx AS DOUBLE) * " +
      s"CAST($sx AS DOUBLE)) / (CAST($n AS DOUBLE) * CAST($n AS DOUBLE) * " +
      s"(CAST($n AS DOUBLE) - 1.0))"
  private val WelchV1 = welchV("n1", "q1", "s1")
  private val WelchV2 = welchV("n2", "q2", "s2")
  private val WelchT =
    s"(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE) / " +
      s"CAST(n2 AS DOUBLE)) / sqrt($WelchV1 + $WelchV2)"
  private val WelchDof =
    s"($WelchV1 + $WelchV2) * ($WelchV1 + $WelchV2) / " +
      s"($WelchV1 * $WelchV1 / (CAST(n1 AS DOUBLE) - 1.0) + " +
      s"$WelchV2 * $WelchV2 / (CAST(n2 AS DOUBLE) - 1.0))"

  /** q237's oracle: the canonical Hilbert xy2d bit descent unrolled
    * as one chained CTE per bit level — pure BIGINT shifts/masks and
    * the reflect+swap as CASE, generated so each level provably
    * matches [[graft.functions.HilbertKernel.xy2d]]'s loop body.
    * The quadrant `(3·rx) xor ry` is emitted as the xor-free
    * polynomial `3·rx + ry − 2·rx·ry` (identical on {0,1}²), since
    * DuckDB spells bitwise xor differently from Spark. */
  private def hilbertOracleSql(bits: Int): String = {
    val n1 = (1L << bits) - 1L
    val sb = new StringBuilder
    sb.append("WITH e AS (\n")
    sb.append("  SELECT event_id, user_id % 2097152 AS x,\n")
    sb.append("    epoch_us(ts) // 86400000000 AS y,\n")
    sb.append("    CAST(0 AS BIGINT) AS hd\n  FROM events)")
    var prev = "e"
    for (k <- bits - 1 to 0 by -1) {
      val rx = s"((x >> $k) & 1)"
      val ry = s"((y >> $k) & 1)"
      val lv = s"lv$k"
      sb.append(s",\n$lv AS (\n  SELECT event_id,\n")
      sb.append(s"    CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN $n1 - y ELSE y END ELSE x END AS x,\n")
      sb.append(s"    CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN $n1 - x ELSE x END ELSE y END AS y,\n")
      sb.append(s"    hd + ${1L << (2 * k)} * (3 * $rx + $ry - 2 * $rx * $ry) AS hd\n")
      sb.append(s"  FROM $prev)")
      prev = lv
    }
    sb.append("\nSELECT e.event_id, e.x AS u, e.y AS d,\n")
    sb.append(s"  CAST(l.hd AS BIGINT) AS hkey\n")
    sb.append(s"FROM e JOIN $prev l ON l.event_id = e.event_id\n")
    sb.append("ORDER BY hkey, e.event_id LIMIT 50")
    sb.toString
  }

  /** q109's oracle: the 21-bit interleave as an explicit integer-
    * arithmetic sum (exact power-of-two literals, BIGINT throughout)
    * — generated so it provably matches [[graft.ops.Layout.zOrderKey]]
    * term for term. */
  private def zOrderOracleSql: String = {
    val terms = (0 until 21).map { i =>
      s"((u >> $i) & 1) * ${1L << (2 * i)} + ((d >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    "WITH e AS (\n" +
      "  SELECT event_id, user_id % 2097152 AS u,\n" +
      "    epoch_us(ts) // 86400000000 AS d\n" +
      "  FROM events)\n" +
      s"SELECT event_id, u, d, CAST($terms AS BIGINT) AS zkey\n" +
      "FROM e ORDER BY zkey, event_id LIMIT 50"
  }

  /** q139's oracle: the same 8 power-of-two-weighted lag terms in the
    * same left-associated order as the Spark expression (SQL `+` is
    * left-associative in both engines), built programmatically so the
    * two sides cannot drift term-wise. `value` is never NULL in
    * events, but the k=0 term keeps the same coalesce shape as the
    * lags so the expression trees stay structurally identical.
    */
  private def ewmaOracleSql: String = {
    def v(k: Int) = if (k == 0) "value" else s"lag(value, $k) OVER w"
    val num = (0 to 7)
      .map(k => s"coalesce(${v(k)} / ${1L << (k + 1)}, 0)")
      .mkString(" + ")
    val den = (0 to 7)
      .map { k =>
        val wt = java.math.BigDecimal.valueOf(math.pow(0.5, k + 1)).toPlainString
        s"(CASE WHEN ${v(k)} IS NOT NULL THEN $wt ELSE 0.0 END)"
      }
      .mkString(" + ")
    "SELECT event_id, user_id, value,\n" +
      s"  round(($num) / ($den), 6) AS ewma8\n" +
      "FROM events\n" +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)\n" +
      "ORDER BY event_id"
  }

  val oracles: Map[String, String] = Map(
    // Truncated-EWMA replay: the identical left-associated sum of
    // power-of-two-weighted lags (every product an exact exponent
    // shift; see the query comment). Generated so the 8 terms
    // provably match the Spark expression term for term.
    "q139_ewma" -> ewmaOracleSql,

    // MERGE replay: latest change per key via the same (ts desc,
    // event_id desc) top-1, FULL OUTER against customer, delete
    // filter, coalesce-based upsert — the declarative MERGE INTO.
    "q140_cdc_merge" ->
      """WITH ch AS (
        |  SELECT user_id * 11 AS k, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
        |    value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |last AS (SELECT k, op, value FROM ch WHERE rn = 1),
        |merged AS (
        |  SELECT coalesce(c.c_custkey, l.k) AS c_custkey, c.c_name,
        |    c.c_nationkey, c.c_mktsegment,
        |    CASE WHEN l.k IS NOT NULL THEN l.value ELSE c.c_acctbal END
        |      AS acctbal,
        |    l.op AS op
        |  FROM customer c FULL OUTER JOIN last l ON c.c_custkey = l.k)
        |SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |  round(acctbal, 2) AS acctbal
        |FROM merged
        |WHERE (op IS NULL OR op <> 'D') AND c_custkey % 11 = 0
        |ORDER BY c_custkey""".stripMargin,

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

    "q164_did_lift" ->
      """WITH h AS (
        |  SELECT CASE WHEN CAST(list_sum(list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(CAST(user_id AS VARCHAR) || 'exp1'),
        |                       CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) AS BIGINT)
        |      % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'pre'
        |      ELSE 'post' END AS period,
        |    user_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |  FROM events),
        |u AS (SELECT arm, period, user_id, max(conv) AS converted
        |      FROM h GROUP BY 1, 2, 3),
        |g AS (SELECT arm, period, CAST(count(*) AS BIGINT) AS n_users,
        |        CAST(sum(converted) AS BIGINT) AS n_conv
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT arm, period,
        |        CAST(floor(n_conv * 1000000.0 / n_users) AS BIGINT)
        |          AS rate_ppm
        |      FROM g),
        |ap AS (SELECT rate_ppm AS a_pre FROM r WHERE arm = 'A' AND period = 'pre'),
        |ao AS (SELECT rate_ppm AS a_post FROM r WHERE arm = 'A' AND period = 'post'),
        |bp AS (SELECT rate_ppm AS b_pre FROM r WHERE arm = 'B' AND period = 'pre'),
        |bo AS (SELECT rate_ppm AS b_post FROM r WHERE arm = 'B' AND period = 'post')
        |SELECT a_pre, a_post, b_pre, b_post,
        |  (b_post - b_pre) - (a_post - a_pre) AS did_ppm
        |FROM ap, ao, bp, bo ORDER BY a_pre""".stripMargin,

    // CUSUM replay: q151's recursive-CTE recurrence over
    // slack-shifted values, carrying the previous balance for the
    // crossing test.
    "q158_cusum_drift" ->
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value - 2.0 AS v,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, greatest(0.0, v) AS bal,
        |    CAST(0.0 AS DOUBLE) AS prev
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, greatest(0.0, r.bal + s.v), r.bal
        |  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(max(bal), 2) AS max_cusum,
        |  CAST(sum(CASE WHEN bal >= 15.0 AND prev < 15.0 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_alarms
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    // A/B replay: the 8-hex-digit md5 arm assignment (q142's
    // hex-to-int pattern) and the same floor-ppm rates.
    "q156_ab_lift" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id),
        |h AS (
        |  SELECT CASE WHEN CAST(list_sum(list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(CAST(user_id AS VARCHAR) || 'exp1'),
        |                       CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) AS BIGINT)
        |      % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    converted
        |  FROM u),
        |g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        |        CAST(sum(converted) AS BIGINT) AS n_converted
        |      FROM h GROUP BY arm),
        |a AS (SELECT n_users AS na, n_converted AS ca FROM g WHERE arm = 'A'),
        |b AS (SELECT n_users AS nb, n_converted AS cb FROM g WHERE arm = 'B')
        |SELECT na, ca,
        |  CAST(floor(ca * 1000000.0 / na) AS BIGINT) AS rate_a_ppm,
        |  nb, cb,
        |  CAST(floor(cb * 1000000.0 / nb) AS BIGINT) AS rate_b_ppm,
        |  CAST(floor(cb * 1000000.0 / nb) AS BIGINT) -
        |  CAST(floor(ca * 1000000.0 / na) AS BIGINT) AS lift_ppm
        |FROM a, b ORDER BY na""".stripMargin,

    // Clamped-balance replay: the recurrence as a recursive CTE
    // stepping rn -> rn+1 per user (same sequential fp order as the
    // partition scan, so balances are bit-identical).
    "q151_clamped_balance" ->
      """WITH RECURSIVE s AS (
        |  SELECT user_id, value AS v,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, greatest(0.0, v) AS bal,
        |    CASE WHEN v < 0.0 THEN 1 ELSE 0 END AS clamped
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, greatest(0.0, r.bal + s.v),
        |    CASE WHEN r.bal + s.v < 0.0 THEN 1 ELSE 0 END
        |  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(arg_max(bal, rn), 2) AS final_balance,
        |  round(max(bal), 2) AS max_balance,
        |  CAST(sum(clamped) AS BIGINT) AS n_clamps
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Decay replay: same dyadic weights (1.0 / (1 << age)); the sum
    // is exact (see the query comment), so trend_score hash-compares
    // RAW — no rounding on either side.
    "q150_trending_decay" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS dmax FROM daily),
        |aged AS (
        |  SELECT event_type, n, datediff('day', day, dmax) AS age
        |  FROM daily, mx WHERE datediff('day', day, dmax) <= 40)
        |SELECT event_type,
        |  sum(n * (1.0 / (CAST(1 AS BIGINT) << age))) AS trend_score,
        |  CAST(sum(n) AS BIGINT) AS n_events_40d
        |FROM aged GROUP BY event_type
        |ORDER BY trend_score DESC, event_type""".stripMargin,

    // Interpolation replay: the as-of union trick as two window
    // passes (event rows side 0, grid rows side 1; backward pass
    // ordered (t, side) so an event AT a grid instant is inclusive,
    // forward pass ordered (t, side DESC) likewise), then the
    // identical interpolation arithmetic and the floor-ppm emit.
    "q148_gap_interpolate" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |b AS (
        |  SELECT user_id, (min(us) + 3599999999) // 3600000000 AS g0,
        |         max(us) // 3600000000 AS g1
        |  FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(g0, g1)) AS g
        |  FROM b WHERE g0 <= g1),
        |u AS (
        |  SELECT user_id, CAST(g * 3600000000 AS BIGINT) AS t, 1 AS side,
        |         g, NULL::DOUBLE AS v
        |  FROM grid
        |  UNION ALL
        |  SELECT user_id, us AS t, 0 AS side, NULL::BIGINT AS g, value AS v
        |  FROM ev),
        |pw AS (
        |  SELECT *,
        |    last_value(v IGNORE NULLS) OVER bw AS pv,
        |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER bw AS pt,
        |    first_value(v IGNORE NULLS) OVER fw AS nv,
        |    first_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER fw AS nt
        |  FROM u
        |  WINDOW
        |    bw AS (PARTITION BY user_id ORDER BY t, side
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fw AS (PARTITION BY user_id ORDER BY t, side DESC
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, g,
        |  strftime(make_timestamp(t), '%Y-%m-%d %H:%M:%S') AS grid_ts,
        |  CAST(floor((CASE WHEN nt = pt THEN pv
        |    ELSE pv + (nv - pv) * CAST(t - pt AS DOUBLE)
        |         / CAST(nt - pt AS DOUBLE) END) * 1000000.0) AS BIGINT)
        |    AS interp_ppm
        |FROM pw WHERE side = 1 ORDER BY user_id, g""".stripMargin,

    "q141_scd2_history" ->
      """WITH v AS (
        |  SELECT user_id, value,
        |    row_number() OVER w AS version,
        |    ts AS valid_from, lead(ts, 1) OVER w AS valid_to
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, version, round(value, 2) AS value,
        |  strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  coalesce(strftime(valid_to, '%Y-%m-%d %H:%M:%S'), 'current')
        |    AS valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

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

    "q24_asof_join" ->
      """WITH latest AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT event_id, user_id,
        | strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS event_ts,
        | o_orderkey, o_totalprice
        |FROM (SELECT event_id, user_id, ts FROM events) e
        |ASOF LEFT JOIN latest ON e.user_id = latest.o_custkey AND e.ts >= latest.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "q85_asof_forward" ->
      """WITH latest AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1),
        |m AS (
        |  SELECT e.event_id, e.user_id, e.ts, min(l.o_orderdate) AS nxt
        |  FROM (SELECT event_id, user_id, ts FROM events) e
        |  LEFT JOIN latest l
        |    ON l.o_custkey = e.user_id AND l.o_orderdate >= e.ts
        |  GROUP BY e.event_id, e.user_id, e.ts)
        |SELECT m.event_id, m.user_id,
        | strftime(CAST(m.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS event_ts,
        | l.o_orderkey, l.o_totalprice
        |FROM m LEFT JOIN latest l
        |  ON l.o_custkey = m.user_id AND l.o_orderdate = m.nxt
        |ORDER BY event_id""".stripMargin,

    "q89_max_drawdown" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, value,
        |    sum(value) OVER w AS equity
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (
        |  SELECT user_id, value, equity,
        |    max(equity) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  round(max(peak - equity), 2) AS max_drawdown,
        |  round(max(equity), 2) AS peak_equity,
        |  round(sum(value), 2) AS final_equity
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

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

    "q96_anomaly_zscore" ->
      """WITH e AS (
        |  SELECT user_id, value,
        |    count(value) OVER w AS cnt,
        |    sum(value) OVER w AS s,
        |    sum(value * value) OVER w AS ss
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT user_id, value, s / 10.0 AS mean,
        |    (ss - 10.0 * (s / 10.0) * (s / 10.0)) / 9.0 AS vr
        |  FROM e WHERE cnt = 10),
        |sc AS (
        |  SELECT user_id, (value - mean) / sqrt(vr) AS z
        |  FROM z WHERE vr > 0)
        |SELECT user_id, count(*) AS n_scored,
        |  CAST(sum(CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  round(max(abs(z)), 6) AS max_abs_z
        |FROM sc GROUP BY user_id ORDER BY user_id""".stripMargin,

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

    "q99_trend_ols" ->
      """WITH ix AS (
        |  SELECT user_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) - 1 AS BIGINT) AS x
        |  FROM events),
        |a AS (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    sum(value) AS sy,
        |    sum(CAST(x AS DOUBLE) * value) AS sxy
        |  FROM ix GROUP BY user_id),
        |b AS (
        |  SELECT user_id, n, sy, sx,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM a)
        |SELECT user_id, n, round(slope, 6) AS slope,
        |  round((sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
        |FROM b ORDER BY user_id""".stripMargin,

    "q101_twap" ->
      """WITH iv AS (
        |  SELECT user_id, value,
        |    epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dur
        |  FROM events)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dur) AS BIGINT) AS total_us,
        |  round(sum(value * CAST(dur AS DOUBLE)) /
        |        CAST(CAST(sum(dur) AS BIGINT) AS DOUBLE), 6) AS twap
        |FROM iv WHERE dur IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q102_interval_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_pairs,
        |  count(DISTINCT o.o_orderkey) AS n_orders,
        |  round(sum(l.l_extendedprice), 2) AS sum_price
        |FROM lineitem l JOIN orders o
        |  ON l.l_orderkey = o.o_orderkey
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,

    "q109_zorder_key" -> zOrderOracleSql,

    "q237_hilbert_key" -> hilbertOracleSql(21),

    // The direct 2-D box predicate — equality against the range-
    // pruned plan proves the Hilbert cover misses nothing.
    "q239_hilbert_range_scan" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(min(user_id % 2097152) AS BIGINT) AS min_u,
        |  CAST(max(user_id % 2097152) AS BIGINT) AS max_u,
        |  CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS min_d,
        |  CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS max_d
        |FROM events
        |WHERE (user_id % 2097152) BETWEEN 3 AND 10
        |  AND (epoch_us(ts) // 86400000000) BETWEEN 19730 AND 19745
        |ORDER BY n_events""".stripMargin,

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

    // k smallest distinct hashes selected by plain hex ORDER (≡
    // u-order), exact uniforms rebuilt digit-by-digit (the q107
    // move), then (k−1)/u_k per side and common-below-theta / theta
    // for the intersection.
    "q114_kmv_overlap" ->
      """WITH ch AS (
        |  SELECT DISTINCT substring(md5(CAST(user_id AS VARCHAR)), 1, 13) AS h
        |  FROM events WHERE event_type = 'click'),
        |vh AS (
        |  SELECT DISTINCT substring(md5(CAST(user_id AS VARCHAR)), 1, 13) AS h
        |  FROM events WHERE event_type = 'view'),
        |ck AS (SELECT h FROM (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ch) WHERE rn <= 64),
        |vk AS (SELECT h FROM (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM vh) WHERE rn <= 64),
        |cku AS (SELECT h,
        |  (list_sum(list_transform(range(1, 14),
        |    i -> CAST(strpos('0123456789abcdef', substring(h, CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |         * power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) + 0.5)
        |    / 4503599627370496.0 AS u
        |  FROM ck),
        |vku AS (SELECT h,
        |  (list_sum(list_transform(range(1, 14),
        |    i -> CAST(strpos('0123456789abcdef', substring(h, CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |         * power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) + 0.5)
        |    / 4503599627370496.0 AS u
        |  FROM vk),
        |st AS (SELECT
        |  (SELECT count(*) FROM cku) AS nck, (SELECT max(u) FROM cku) AS ukc,
        |  (SELECT count(*) FROM vku) AS nvk, (SELECT max(u) FROM vku) AS ukv),
        |th AS (SELECT least(ukc, ukv) AS theta FROM st),
        |inter AS (
        |  SELECT sum(CASE WHEN cku.u < theta THEN 1.0 ELSE 0.0 END) AS nc
        |  FROM cku JOIN vku USING (h), th),
        |exb AS (
        |  SELECT count(*) AS n FROM
        |    (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') c
        |    JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'view') v
        |    USING (user_id))
        |SELECT 'click' AS metric,
        |  (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'click') AS n_exact,
        |  round(CASE WHEN nck < 64 THEN CAST(nck AS DOUBLE) ELSE 63.0 / ukc END, 6) AS est
        |FROM st
        |UNION ALL
        |SELECT 'click_view_overlap', (SELECT n FROM exb),
        |  round(coalesce((SELECT nc FROM inter) / (SELECT theta FROM th), 0.0), 6)
        |UNION ALL
        |SELECT 'view',
        |  (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'view'),
        |  round(CASE WHEN nvk < 64 THEN CAST(nvk AS DOUBLE) ELSE 63.0 / ukv END, 6)
        |FROM st
        |ORDER BY metric""".stripMargin,

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

    "q180_weekday_seasonality" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS na,
        |             CAST(sum(cents) AS BIGINT) AS ca FROM daily)
        |SELECT dayname(day) AS weekday, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(cents) AS BIGINT) // count(*) AS avg_daily_cents,
        |  CAST((CAST(sum(cents) AS HUGEINT) * any_value(o.na) * 1000000)
        |    // (CAST(any_value(o.ca) AS HUGEINT) * count(*)) AS BIGINT)
        |    AS index_ppm
        |FROM daily, o GROUP BY 1 ORDER BY weekday""".stripMargin,

    // Replays the dense grid, the 7-row rolling bucket sums, and the
    // identical interpolation text (the q212 exact-oracle-for-an-
    // approximation contract, windowed).
    "q229_rolling_median" ->
      """WITH counts AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    CAST(floor(value / 5.0) AS BIGINT) AS b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.day, bk.b, coalesce(c.c, 0) AS c
        |  FROM (SELECT DISTINCT day FROM counts) d
        |  CROSS JOIN (SELECT DISTINCT b FROM counts) bk
        |  LEFT JOIN counts c ON c.day = d.day AND c.b = bk.b),
        |roll AS (
        |  SELECT day, b,
        |    CAST(sum(c) OVER (PARTITION BY b ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rc
        |  FROM grid),
        |nz AS (SELECT * FROM roll WHERE rc > 0),
        |prep AS (
        |  SELECT day, b, rc,
        |    CAST(coalesce(sum(rc) OVER (PARTITION BY day ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb,
        |    CAST(sum(rc) OVER (PARTITION BY day) AS BIGINT) AS n
        |  FROM nz)
        |SELECT day, n AS n_window,
        |  round(b * 5.0 + 5.0 * CAST(CAST(ceil(0.5 * n) AS BIGINT) - cb
        |    AS DOUBLE) / rc, 6) AS p50_est
        |FROM prep
        |WHERE CAST(ceil(0.5 * n) AS BIGINT) > cb
        |  AND CAST(ceil(0.5 * n) AS BIGINT) <= cb + rc
        |ORDER BY day""".stripMargin,

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

    // q23's sessionization replay + a plain inequality join (fine at
    // oracle scale; the Spark side's grid bucketization must find the
    // IDENTICAL pair set).
    "q210_interval_overlap" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ts - lag(ts, 1) OVER w > INTERVAL 30 MINUTE
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id,
        |    ts
        |  FROM flagged),
        |spans AS (
        |  SELECT user_id, session_id,
        |    epoch_us(min(ts)) AS s_start, epoch_us(max(ts)) AS s_end
        |  FROM sess GROUP BY 1, 2),
        |wins AS (
        |  SELECT * FROM (VALUES
        |    ('w1', epoch_us(TIMESTAMP '2024-01-05 00:00:00'),
        |           epoch_us(TIMESTAMP '2024-01-06 00:00:00')),
        |    ('w2', epoch_us(TIMESTAMP '2024-01-10 06:00:00'),
        |           epoch_us(TIMESTAMP '2024-01-10 18:00:00')),
        |    ('w3', epoch_us(TIMESTAMP '2024-01-12 00:00:00'),
        |           epoch_us(TIMESTAMP '2024-01-14 00:00:00')),
        |    ('w4', epoch_us(TIMESTAMP '2024-01-20 12:00:00'),
        |           epoch_us(TIMESTAMP '2024-01-21 12:00:00')),
        |    ('w5', epoch_us(TIMESTAMP '2024-01-28 00:00:00'),
        |           epoch_us(TIMESTAMP '2024-01-31 00:00:00')))
        |    AS t(win_id, w_start, w_end))
        |SELECT win_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM spans JOIN wins
        |  ON s_start < w_end AND w_start < s_end
        |GROUP BY win_id ORDER BY win_id""".stripMargin,

    // The two-phase scan replayed as a plain window cumsum (fine at
    // oracle scale); identical exact ints -> identical ECDF doubles
    // -> identical max and argmax rows.
    "q204_ks_statistic" ->
      """WITH pv AS (
        |  SELECT value,
        |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS ca,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS cb
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |  GROUP BY value),
        |cum AS (
        |  SELECT value,
        |    CAST(sum(ca) OVER (ORDER BY value) AS BIGINT) AS cca,
        |    CAST(sum(cb) OVER (ORDER BY value) AS BIGINT) AS ccb
        |  FROM pv),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb FROM pv),
        |dd AS (
        |  SELECT value, na, nb,
        |    abs(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE) -
        |        CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE)) AS d
        |  FROM cum, t),
        |mx AS (SELECT max(d) AS dm FROM dd)
        |SELECT any_value(na) AS n_purchase, any_value(nb) AS n_click,
        |  round(any_value(dm), 6) AS ks_d, min(value) AS at_value
        |FROM dd, mx WHERE d = dm
        |ORDER BY n_purchase""".stripMargin,

    // Rank-sum identity replayed: exclusive cumulative negatives via
    // the same window; HUGEINT weighted sums cast to double for the
    // final identical-IEEE ratio.
    "q205_roc_auc" ->
      """WITH ps AS (
        |  SELECT value,
        |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS cp,
        |    CAST(count(*) FILTER (event_type <> 'purchase') AS BIGINT) AS cn
        |  FROM events GROUP BY value),
        |cum AS (
        |  SELECT cp, cn,
        |    CAST(sum(cn) OVER (ORDER BY value) AS BIGINT) - cn AS below_n
        |  FROM ps),
        |agg AS (
        |  SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
        |         CAST(sum(cn) AS BIGINT) AS n_neg,
        |         CAST(sum(CAST(cp AS HUGEINT) * below_n) AS HUGEINT) AS s1,
        |         CAST(sum(CAST(cp AS HUGEINT) * cn) AS HUGEINT) AS s2
        |  FROM cum)
        |SELECT n_pos, n_neg,
        |  round((CAST(s1 AS DOUBLE) + 0.5 * CAST(s2 AS DOUBLE)) /
        |        (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
        |FROM agg ORDER BY n_pos""".stripMargin,

    // Replays the exact-integer contract: per-cell ppm floors of
    // identical doubles (never a cross-cell double sum — the total
    // row sums the exact integer ppm units). HUGEINT mirrors
    // decimal(38,0); the double expression text matches the Spark
    // side operation for operation.
    "q208_chi_square" ->
      """WITH obs AS (
        |  SELECT event_type, dayname(ts) AS weekday,
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS r
        |       FROM obs GROUP BY 1),
        |ct AS (SELECT weekday, CAST(sum(n_obs) AS BIGINT) AS c
        |       FROM obs GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
        |cells AS (
        |  SELECT obs.event_type, obs.weekday, n_obs,
        |    CAST((CAST(r AS HUGEINT) * c * 1000000) // n AS BIGINT)
        |      AS expected_ppm,
        |    CAST(floor(
        |      CAST((CAST(n_obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c) *
        |           (CAST(n_obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |        AS DOUBLE) /
        |      (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS chi2_contrib_ppm
        |  FROM obs JOIN rt USING (event_type) JOIN ct USING (weekday), t)
        |SELECT event_type, weekday, n_obs, expected_ppm, chi2_contrib_ppm
        |FROM cells
        |UNION ALL
        |SELECT 'ALL', 'ALL', CAST(sum(n_obs) AS BIGINT), 1000000,
        |  CAST(sum(chi2_contrib_ppm) AS BIGINT)
        |FROM cells
        |ORDER BY event_type, weekday""".stripMargin,

    // Mirrors the flag-guarded ln-sum cumulative product; tie order
    // inside a user compares micros (epoch_us) exactly like the
    // Spark side's micro timestamps.
    "q181_kaplan_meier" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
        |      AS dur,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS last_type
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |        FROM events)
        |  GROUP BY user_id),
        |bd AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_exit,
        |         CAST(sum(CASE WHEN last_type = 'purchase' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS d_events
        |       FROM pu GROUP BY dur),
        |t AS (SELECT CAST(sum(n_exit) AS BIGINT) AS tot FROM bd),
        |cc AS (SELECT bd.*,
        |         CAST(tot - coalesce(sum(n_exit) OVER (ORDER BY dur
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS n_at_risk
        |       FROM bd, t),
        |ff AS (SELECT *,
        |         CASE WHEN d_events < n_at_risk
        |              THEN ln(1.0 - CAST(d_events AS DOUBLE) /
        |                          CAST(n_at_risk AS DOUBLE))
        |              ELSE 0.0 END AS f,
        |         max(CASE WHEN d_events = n_at_risk THEN 1 ELSE 0 END)
        |           OVER (ORDER BY dur
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
        |       FROM cc)
        |SELECT dur AS duration_days, n_at_risk, d_events, n_exit,
        |  CASE WHEN z = 1 THEN 0.0
        |       ELSE round(exp(sum(f) OVER (ORDER BY dur
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |  END AS survival
        |FROM ff ORDER BY duration_days""".stripMargin,

    "q184_autocorrelation" -> {
      val ks = 1 to 7
      val lags = ks.map(k => s"lag(v, $k) OVER (ORDER BY day) AS v_$k")
        .mkString(", ")
      val rows = ks.map(k =>
        s"""SELECT $k AS lag_k, round(corr(v, v_$k), 6) AS acf,
           |  CAST(count(v_$k) AS BIGINT) AS n_pairs FROM l""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    CAST(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
         |         AS BIGINT) AS DOUBLE) AS v
         |  FROM events GROUP BY 1),
         |l AS (SELECT v, $lags FROM daily)
         |SELECT * FROM (
         |$rows
         |) ORDER BY lag_k""".stripMargin
    },

    "q187_purged_split" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, user_id FROM events),
        |c AS (SELECT min(day) + INTERVAL 20 DAY AS cut FROM ev)
        |SELECT CASE WHEN day < cut - INTERVAL 2 DAY THEN 'train'
        |            WHEN day >= cut + INTERVAL 2 DAY THEN 'test'
        |            ELSE 'purged' END AS split,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ev, c GROUP BY 1, 2 ORDER BY split, event_type""".stripMargin,

    "q189_seasonal_decomposition" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |tr AS (SELECT day, cents,
        |         CAST(sum(cents) OVER w7 AS BIGINT) AS s7,
        |         count(*) OVER w7 AS n7
        |       FROM daily
        |       WINDOW w7 AS (ORDER BY day
        |         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dw AS (SELECT dayname(day) AS wd,
        |         CAST(sum(cents) AS BIGINT) AS cd,
        |         CAST(count(*) AS BIGINT) AS nd
        |       FROM daily GROUP BY 1),
        |o AS (SELECT CAST(sum(cents) AS BIGINT) AS ca,
        |        CAST(count(*) AS BIGINT) AS na FROM daily)
        |SELECT strftime(tr.day, '%Y-%m-%d') AS day, tr.cents,
        |  CASE WHEN n7 = 7 THEN (s7 * 1000000) // 7 END
        |    AS trend_microcents,
        |  (cd * 1000000) // nd - (ca * 1000000) // na
        |    AS seasonal_microcents,
        |  tr.cents * 1000000 - CASE WHEN n7 = 7 THEN (s7 * 1000000) // 7 END
        |    - ((cd * 1000000) // nd - (ca * 1000000) // na)
        |    AS residual_microcents
        |FROM tr JOIN dw ON dayname(tr.day) = dw.wd, o
        |ORDER BY day""".stripMargin,

    "q194_interevent_burstiness" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events),
        |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |        CAST(sum(gap) AS HUGEINT) AS s,
        |        CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sq
        |      FROM g WHERE gap IS NOT NULL
        |      GROUP BY user_id HAVING count(*) >= 10)
        |SELECT user_id, n_gaps,
        |  CAST(s AS BIGINT) // n_gaps AS mean_gap_us,
        |  round(CAST(n_gaps AS DOUBLE) * CAST(sq AS DOUBLE) /
        |        (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) - 1.0, 6) AS cv2
        |FROM a
        |ORDER BY cv2 DESC, user_id LIMIT 20""".stripMargin,

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

    // q112's register pyramid with the window swapped to the 7-row
    // rolling frame.
    "q199_rolling_distinct" ->
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
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS cm
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
        |    AS rolling7_users_est
        |FROM f ORDER BY day""".stripMargin,

    // Holt replay: the recurrence as a recursive CTE stepping
    // rn -> rn+1 per event type. The level expression `0.5*y +
    // 0.5*(l+b)` and the trend expression repeat it verbatim (the
    // kernel computes level first and reuses it — a repeated
    // subexpression evaluates bit-identically), so every row matches
    // the secondary-sort scan exactly.
    "q231_holt_trend" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, day, y,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily),
        |r AS (
        |  SELECT event_type, day, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.day, s.rn,
        |    0.5 * s.y + 0.5 * (r.l + r.b),
        |    0.5 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
        |  FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT event_type, day, round(l, 6) AS level, round(b, 6) AS trend
        |FROM r ORDER BY event_type, day""".stripMargin,

    // Cross-correlation replay: integer epoch-day keys, the same
    // 8-row lag frame (range()), HUGEINT sums mirroring the
    // decimal(38,0) sums, and the textually-identical Pearson
    // closed form.
    "q232_lag_crosscorr" ->
      """WITH ck AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |rv AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ed_dd,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yv
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT CAST(range AS BIGINT) AS lag_d FROM range(0, 8)),
        |p AS (
        |  SELECT l.lag_d, ck.x, rv.yv
        |  FROM ck CROSS JOIN l
        |  JOIN rv ON rv.ed_dd = ck.dd + l.lag_d),
        |s AS (
        |  SELECT lag_d, CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx,
        |    sum(CAST(yv AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * CAST(yv AS HUGEINT)) AS sxy,
        |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |    sum(CAST(yv AS HUGEINT) * CAST(yv AS HUGEINT)) AS syy
        |  FROM p GROUP BY lag_d)
        |SELECT lag_d, CAST(n AS BIGINT) AS n_days,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |              CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS pearson_r
        |FROM s ORDER BY lag_d""".stripMargin,

    // Quantile-norm replay: the same per-type row_number total order
    // (cents, event_id), the min-length truncation, and the identical
    // integer decile arithmetic + floor(·1e4) mean.
    "q233_quantile_norm" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, event_id
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY cents, event_id) AS rn
        |  FROM ev),
        |m AS (
        |  SELECT CAST(min(cnt) AS BIGINT) AS min_n,
        |    CAST(count(*) AS BIGINT) AS n_types
        |  FROM (SELECT event_type, count(*) AS cnt FROM ranked GROUP BY 1)),
        |pr AS (
        |  SELECT rn, min_n, n_types, CAST(sum(cents) AS BIGINT) AS rank_cents
        |  FROM ranked, m WHERE rn <= min_n GROUP BY 1, 2, 3),
        |dec AS (
        |  SELECT ((rn - 1) * 10) // min_n + 1 AS decile, n_types, rank_cents
        |  FROM pr)
        |SELECT decile, n_types, CAST(count(*) AS BIGINT) AS n_ranks,
        |  CAST(sum(rank_cents) AS BIGINT) AS total_cents,
        |  CAST(floor(sum(rank_cents) * 10000.0 / (n_types * count(*)))
        |       AS BIGINT) AS avg_norm_c4
        |FROM dec GROUP BY decile, n_types ORDER BY decile""".stripMargin,

    // As-of replay: the SCD2 intervals as one window pass, the same
    // half-open validity test against the four probe instants.
    "q235_scd2_asof" ->
      """WITH h AS (
        |  SELECT user_id, value, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id
        |                   ORDER BY ts, event_id) AS valid_to,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS version
        |  FROM events),
        |p AS (SELECT * FROM (VALUES ('2024-01-08 00:00:00'),
        |        ('2024-01-15 00:00:00'), ('2024-01-22 00:00:00'),
        |        ('2024-01-29 00:00:00')) v(pt))
        |SELECT pt, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  CAST(max(version) AS BIGINT) AS max_version
        |FROM h JOIN p
        |  ON h.valid_from <= CAST(pt AS TIMESTAMP)
        | AND (h.valid_to IS NULL OR h.valid_to > CAST(pt AS TIMESTAMP))
        |GROUP BY pt ORDER BY pt""".stripMargin,

    // IVM oracle = the FULL RECOMPUTE (no delta split): hash-equality
    // against the incremental plan proves the merge law holds.
    "q236_ivm_delta" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  strftime(min(CAST(ts AS DATE)), '%Y-%m-%d') AS first_day,
        |  strftime(max(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Welch replay: HUGEINT sufficient statistics, then the SAME
    // WelchT/WelchDof strings interpolated — textual identity is the
    // cross-engine bit-identity proof.
    "q238_welch_ttest" ->
      s"""WITH g AS (
         |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         |    sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS s,
         |    sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT) *
         |        CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS q
         |  FROM events WHERE event_type IN ('purchase', 'click')
         |  GROUP BY event_type),
         |a AS (SELECT n AS n1, s AS s1, q AS q1 FROM g WHERE event_type = 'purchase'),
         |b AS (SELECT n AS n2, s AS s2, q AS q2 FROM g WHERE event_type = 'click')
         |SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_click,
         |  round($WelchT, 6) AS t_stat,
         |  round($WelchDof, 6) AS welch_dof
         |FROM a, b ORDER BY n_purchase""".stripMargin,

    // Calibration replay: the same 0-based total-order rank
    // ((score_ppm, user_id)), integer decile arithmetic and floor-ppm
    // rates.
    "q240_calibration" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id),
        |m AS (SELECT max(x) AS mx FROM u),
        |sc AS (
        |  SELECT user_id, y, (x * 1000000) // mx AS score_ppm
        |  FROM u, m),
        |r AS (
        |  SELECT y, score_ppm,
        |    row_number() OVER (ORDER BY score_ppm, user_id) - 1 AS i,
        |    count(*) OVER () AS n
        |  FROM sc)
        |SELECT (i * 10) // n + 1 AS bin,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(score_ppm) // count(*) AS BIGINT) AS avg_score_ppm,
        |  CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS conv_rate_ppm
        |FROM r GROUP BY 1 ORDER BY bin""".stripMargin,

    // Confusion replay: identical threshold and integer floor-div
    // metric closed forms.
    "q241_confusion_prf" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN x >= 12 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN x >= 12 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN x < 12 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN x < 12 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM u)
        |SELECT tp, fp, fn, tn,
        |  (tp * 1000000) // (tp + fp) AS precision_ppm,
        |  (tp * 1000000) // (tp + fn) AS recall_ppm,
        |  (2 * tp * 1000000) // (2 * tp + fp + fn) AS f1_ppm
        |FROM c ORDER BY tp""".stripMargin,

    // Bootstrap replay: the q156 8-hex-digit md5 parity per (user, b)
    // over a 32-row range frame, floor-ppm resample rates, and the
    // BootSd shared text over HUGEINT sufficient statistics.
    "q242_bootstrap_ci" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
         |  FROM events GROUP BY user_id),
         |bs AS (SELECT CAST(range AS BIGINT) AS b FROM range(0, 32)),
         |inc AS (
         |  SELECT u.user_id, u.y, bs.b
         |  FROM u CROSS JOIN bs
         |  WHERE CAST(list_sum(list_transform(range(1, 9),
         |      i -> CAST(strpos('0123456789abcdef',
         |             substring(md5(CAST(u.user_id AS VARCHAR) || 'boot'
         |                           || CAST(bs.b AS VARCHAR)),
         |                       CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
         |           * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) AS BIGINT)
         |      % 2 = 0),
         |rt AS (
         |  SELECT (CAST(sum(y) AS BIGINT) * 1000000)
         |           // CAST(count(*) AS BIGINT) AS r
         |  FROM inc GROUP BY b),
         |st AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS bn,
         |    sum(CAST(r AS HUGEINT)) AS sr,
         |    sum(CAST(r AS HUGEINT) * CAST(r AS HUGEINT)) AS qr
         |  FROM rt)
         |SELECT CAST(bn AS BIGINT) AS n_resamples,
         |  CAST(sr AS BIGINT) // CAST(bn AS BIGINT) AS mean_rate_ppm,
         |  round($BootSd, 6) AS sd_rate_ppm
         |FROM st ORDER BY n_resamples""".stripMargin,

    // PSI replay: identical bins, smoothing, PsiTerm text and the
    // floor-to-nano integer sum.
    "q243_psi_drift" ->
      s"""WITH b AS (
         |  SELECT CASE WHEN epoch_us(ts) // 86400000000 < 19738
         |              THEN 1 ELSE 0 END AS ref,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 500 AS bin
         |  FROM events),
         |g AS (
         |  SELECT bin, CAST(sum(ref) AS BIGINT) AS c1,
         |    CAST(sum(1 - ref) AS BIGINT) AS c2
         |  FROM b GROUP BY bin),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |        CAST(sum(c2) AS BIGINT) AS n2,
         |        CAST(count(*) AS BIGINT) AS nb
         |      FROM g),
         |terms AS (
         |  SELECT CAST(floor(1000000000.0 * ($PsiTerm)) AS BIGINT) AS tm
         |  FROM g, t)
         |SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(tm) AS BIGINT) AS psi_e9
         |FROM terms ORDER BY n_bins""".stripMargin,

    // Rolling-OLS replay: the same 7-row window sums (BIGINT
    // throughout — no HUGEINT drift into the closed form) and the
    // RollingSlope shared text.
    "q250_rolling_ols" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS x,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |r AS (
         |  SELECT x,
         |    CAST(count(*) OVER w AS BIGINT) AS n,
         |    CAST(sum(x) OVER w AS BIGINT) AS sx,
         |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
         |    CAST(sum(y) OVER w AS BIGINT) AS sy,
         |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy
         |  FROM daily
         |  WINDOW w AS (ORDER BY x ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT x AS day_num, n AS n_days,
         |  CAST(7 * sxy - sx * sy AS BIGINT) AS slope_num,
         |  CAST(7 * sxx - sx * sx AS BIGINT) AS slope_den,
         |  round($RollingSlope, 6) AS slope_cents_per_day
         |FROM r WHERE n = 7 ORDER BY day_num""".stripMargin,

    // Priority-sample replay: the q156 8-hex md5 parse, the same
    // integer floor priority and (pr, event_id) top-32.
    "q248_priority_sample" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS w
        |  FROM events
        |  WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) > 0),
        |h AS (
        |  SELECT event_id, event_type, w,
        |    CAST(list_sum(list_transform(range(1, 9),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substring(md5(CAST(event_id AS VARCHAR) || 'prio'),
        |                       CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (8 - i) AS DOUBLE)))) AS BIGINT)
        |      AS u
        |  FROM ev)
        |SELECT event_id, event_type, w, (u * 1048576) // w AS pr
        |FROM h ORDER BY pr, event_id LIMIT 32""".stripMargin,

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

    // Rebalance replay: the same per-type (md5 || 'rebal', event_id)
    // rank and minority-count threshold.
    "q244_class_rebalance" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |k AS (
        |  SELECT CAST(min(cnt) AS BIGINT) AS k
        |  FROM (SELECT count(*) AS cnt FROM ev GROUP BY event_type)),
        |r AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR) || 'rebal'), event_id)
        |      AS rn
        |  FROM ev)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(c) AS BIGINT) AS cents_kept
        |FROM r, k WHERE rn <= k
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // AMS replay: identical md5-signed estimator sums over the same
    // frequency table; all BIGINT, floor division for the mean.
    "q253_ams_f2" ->
      """WITH f AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |    CAST(count(*) AS BIGINT) AS fv
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  GROUP BY 1),
        |e AS (
        |  SELECT CAST(sum(fv * fv) AS BIGINT) AS f2_exact,
        |    CAST(sum(fv) AS BIGINT) AS n_rows FROM f),
        |s AS (
        |  SELECT r.r,
        |    CAST(sum(fv * CASE WHEN substring(md5(
        |        CAST(item AS VARCHAR) || '#' || CAST(r.r AS VARCHAR)), 1, 1)
        |      IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)
        |      AS BIGINT) AS sr
        |  FROM f CROSS JOIN (SELECT unnest(range(0, 64)) AS r) r
        |  GROUP BY 1),
        |q AS (
        |  SELECT CAST(sum(sr * sr) AS BIGINT) AS ssq,
        |    CAST(count(*) AS BIGINT) AS nr FROM s)
        |SELECT n_rows, f2_exact, ssq // nr AS f2_est,
        |  (abs(ssq // nr - f2_exact) * 1000000) // f2_exact AS err_ppm
        |FROM e CROSS JOIN q ORDER BY n_rows""".stripMargin,

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

    // CUPED replay: the same midpoint split, per-user conditional
    // cents sums, and the SHARED θ / diff expression text over exact
    // BIGINT moments (textual identity ⇒ identical IEEE op order).
    "q256_cuped" -> (
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    CAST(coalesce(sum(CASE WHEN us < mid THEN c END), 0)
        |      AS BIGINT) AS x,
        |    CAST(coalesce(sum(CASE WHEN us >= mid THEN c END), 0)
        |      AS BIGINT) AS y,
        |    user_id % 2 AS t
        |  FROM ev CROSS JOIN mid GROUP BY user_id),
        |pooled AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pu),
        |wide AS (
        |  SELECT
        |    CAST(max(CASE WHEN t = 0 THEN nt END) AS BIGINT) AS n0,
        |    CAST(max(CASE WHEN t = 0 THEN sxt END) AS BIGINT) AS sx0,
        |    CAST(max(CASE WHEN t = 0 THEN syt END) AS BIGINT) AS sy0,
        |    CAST(max(CASE WHEN t = 1 THEN nt END) AS BIGINT) AS n1,
        |    CAST(max(CASE WHEN t = 1 THEN sxt END) AS BIGINT) AS sx1,
        |    CAST(max(CASE WHEN t = 1 THEN syt END) AS BIGINT) AS sy1
        |  FROM (SELECT t, count(*) AS nt, sum(x) AS sxt, sum(y) AS syt
        |        FROM pu GROUP BY t))
        |SELECT n0, n1,
        |""".stripMargin +
      s"  round($CupedNaive, 6) AS naive_diff_cents,\n" +
      s"  round($CupedTheta, 6) AS theta,\n" +
      s"  round($CupedNaive - ($CupedTheta) * ($CupedXDiff), 6) " +
      "AS adj_diff_cents\n" +
      "FROM wide CROSS JOIN pooled ORDER BY n0"),

    // MI replay: identical contingency cells, marginals and the
    // shared floored nano-nat term.
    "q257_mi_nats" -> (
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 8 AS b
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |cells AS (
        |  SELECT event_type, b, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |m AS (
        |  SELECT c,
        |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS r,
        |    CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS s,
        |    CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM cells)
        |SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(CAST(floor(""".stripMargin + MiTermNano +
      """) AS BIGINT)) AS BIGINT) AS mi_nano
        |FROM m GROUP BY n ORDER BY n""".stripMargin),

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

    // Matched-strata replay: the same (n, user_id) total-order rank
    // (row_number - 1 == denseIndex), decile arithmetic and
    // floor-div balance.
    "q264_matched_strata" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    user_id % 2 AS t
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT t, n,
        |    row_number() OVER (ORDER BY n, user_id) - 1 AS i,
        |    (SELECT count(*) FROM u) AS tot
        |  FROM u),
        |d AS (
        |  SELECT t, n, (i * 10) // tot + 1 AS decile FROM r),
        |g AS (
        |  SELECT decile,
        |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN t = 1 THEN n ELSE 0 END) AS BIGINT) AS at,
        |    CAST(sum(CASE WHEN t = 0 THEN n ELSE 0 END) AS BIGINT) AS ac
        |  FROM d GROUP BY decile)
        |SELECT decile, n_t, n_c, least(n_t, n_c) AS n_matched,
        |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0
        |       ELSE (at * 1000) // n_t - (ac * 1000) // n_c END
        |    AS balance_milli
        |FROM g ORDER BY decile""".stripMargin,

    // Grouped-AUC replay: the q205 pair-counting identity windowed
    // per weekday (dayname = date_format 'EEEE', both English full
    // names), HUGEINT sums, the identical 6dp double at the end.
    "q267_group_auc" ->
      """WITH ps AS (
        |  SELECT dayname(ts) AS weekday, value,
        |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
        |      AS cp,
        |    CAST(count(*) FILTER (event_type <> 'purchase') AS BIGINT)
        |      AS cn
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT weekday, cp, cn,
        |    CAST(sum(cn) OVER (PARTITION BY weekday ORDER BY value)
        |      AS BIGINT) - cn AS below_n
        |  FROM ps),
        |agg AS (
        |  SELECT weekday, CAST(sum(cp) AS BIGINT) AS n_pos,
        |    CAST(sum(cn) AS BIGINT) AS n_neg,
        |    CAST(sum(CAST(cp AS HUGEINT) * below_n) AS HUGEINT) AS s1,
        |    CAST(sum(CAST(cp AS HUGEINT) * cn) AS HUGEINT) AS s2
        |  FROM cum GROUP BY weekday)
        |SELECT weekday, n_pos, n_neg,
        |  round((CAST(s1 AS DOUBLE) + 0.5 * CAST(s2 AS DOUBLE)) /
        |        (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
        |FROM agg ORDER BY weekday""".stripMargin,

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

    // Hill replay: identical top-k cents multiset (tie-break-
    // invariant), floored nano logs, integer milli alpha.
    "q271_hill_tail_index" ->
      """WITH top AS (
        |  SELECT c FROM (
        |    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
        |      o_orderkey
        |    FROM orders ORDER BY c DESC, o_orderkey LIMIT 500)),
        |xk AS (SELECT CAST(min(c) AS BIGINT) AS xk FROM top),
        |t AS (
        |  SELECT xk,
        |    CAST(floor(1000000000.0 * ln(CAST(c AS DOUBLE) /
        |      CAST(xk AS DOUBLE))) AS BIGINT) AS nano
        |  FROM top CROSS JOIN xk)
        |SELECT CAST(count(*) AS BIGINT) AS k, xk AS xk_cents,
        |  CAST(sum(nano) AS BIGINT) AS sum_log_nano,
        |  CASE WHEN sum(nano) = 0 THEN 0
        |       ELSE (CAST(count(*) AS BIGINT) * 1000000000000) //
        |            CAST(sum(nano) AS BIGINT) END AS alpha_milli
        |FROM t GROUP BY xk ORDER BY k""".stripMargin,

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

    // Burn replay: same daily census, window prefix sum over the
    // calendar-bounded day frame, positive-only floor division.
    "q285_slo_burn" ->
      """WITH day AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_errors
        |  FROM events GROUP BY 1)
        |SELECT day, n_events, n_errors,
        |  (n_errors * 1000000) // n_events AS err_ppm,
        |  CAST(sum(n_errors * 1000000 - 200000 * n_events)
        |    OVER (ORDER BY day) AS BIGINT) AS burn_micro_cum
        |FROM day ORDER BY day""".stripMargin,

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

    // Tolerance replay: DuckDB ASOF LEFT JOIN carrying the matched
    // time, the identical 30-day micro gap test, same census.
    "q276_asof_tolerance" ->
      """WITH latest AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC)
        |      AS rn
        |    FROM orders) WHERE rn = 1),
        |a AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ets,
        |    o_orderkey, o_orderdate
        |  FROM (SELECT event_id, user_id, ts FROM events) e
        |  ASOF LEFT JOIN latest
        |    ON e.user_id = latest.o_custkey AND e.ts >= latest.o_orderdate),
        |f AS (
        |  SELECT event_id,
        |    (o_orderdate IS NOT NULL AND
        |     epoch_us(ets) - epoch_us(o_orderdate) <= 30 * 86400000000)
        |      AS m,
        |    o_orderdate IS NOT NULL AS u
        |  FROM a)
        |SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_fresh,
        |  CAST(sum(CASE WHEN NOT m AND u THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_stale,
        |  CAST(sum(CASE WHEN NOT u THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unmatched
        |FROM f ORDER BY n_events""".stripMargin,

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
