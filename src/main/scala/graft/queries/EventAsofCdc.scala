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

/** AS-OF / CDC / interval / layout queries: as-of joins (backward/
  * forward/tolerance), CDC merge, SCD2, IVM deltas, interval joins
  * and overlap, Z-order + Hilbert keys, KMV overlap, AMS F2.
  *
  * Split from the single EventQueries object (r16 maintainability
  * pass): entries and oracle SQL are byte-identical and compose back
  * into the driver map through [[EventQueries]].
  */
object EventAsofCdcQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

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
  )

  val oracles: Map[String, String] = Map(

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
  )
}
