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

/** Event TIME-SERIES queries: drawdown, z-score anomalies, OLS
  * trend, TWAP, EWMA/Holt, gap interpolation, CUSUM, seasonality,
  * autocorrelation, rolling median/distinct/OLS, Hill tail, SLO burn.
  *
  * Split from the single EventQueries object (r16 maintainability
  * pass): entries and oracle SQL are byte-identical and compose back
  * into the driver map through [[EventQueries]].
  */
object EventTimeSeriesQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

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

    // CUSUM drift detection — the sequential changepoint monitor:
    // S = max(0, S + (x - k)) per user (k = slack 2.0) with alarms
    // when S crosses h = 15.0 from below. The recurrence REUSES
    // Kernels.clampedRunningSum (CUSUM IS a clamped running sum of
    // slack-shifted values); crossings come from one lag window over
    // the scanned balances. Balances stay on the 2dp grid; the
    // threshold compares identical doubles on both engines, so the
    // >= boundary is exact.
    // Burst detection over the hourly event-count series (the
    // threshold form of Kleinberg 2002's burst states): an hour is
    // BURSTING when its count more than doubles the trailing-24h
    // average over a FULL window — the integer cross-multiplied test
    // c * 24 > 2 * sum24 (no division); consecutive bursting hours
    // merge into islands via the lag rule. Both windows run over the
    // hour GRID (calendar-bounded, the q282 convention). Exact
    // integers throughout.
    "q318_burst_islands" -> ((s, d) => {
      val hours = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("h"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy("h").rangeBetween(-24, -1)
      val bursts = hours
        .withColumn("__s24", sum("c").over(w))
        .withColumn("__n24", count(lit(1)).over(w))
        .filter(col("__n24") === 24 && col("c") * 24 > col("__s24") * 2)
      val isl = bursts
        .withColumn("__prev", lag("h", 1).over(Window.orderBy("h")))
        .withColumn("__new",
          when(col("__prev").isNull || col("h") - col("__prev") > 1, 1L)
            .otherwise(0L))
        .withColumn("__isl", sum("__new").over(
          Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)))
      isl.groupBy("__isl")
        .agg(count(lit(1)).as("__len"), max("c").as("__peak"))
        .agg(count(lit(1)).as("n_islands"),
             coalesce(sum("__len"), lit(0L)).as("n_burst_hours"),
             coalesce(max("__len"), lit(0L)).as("longest_island"),
             coalesce(max("__peak"), lit(0L)).as("peak_hour_count"))
        .orderBy("n_islands")
    }),

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

    // Wald's SPRT (1945) — SEQUENTIAL hypothesis stopping, the
    // always-valid A/B monitor that q156/q164/q256's fixed-horizon
    // tests are not allowed to peek at: per cohort (user_id mod 4),
    // walk the log-likelihood ratio of success (value > 5) under
    // H1 p=0.95 vs H0 p=0.85 in event-time order and stop at the
    // FIRST crossing of ln(19) / -ln(19) (alpha = beta = 0.05). The
    // LLR after (s, f) outcomes lives on the integer (s, f) lattice,
    // so the walk is two window cumsums + one shared-text gate — no
    // sequential kernel needed (contrast q158's clamp, which feeds
    // back); the first crossing is a min-struct per cohort, and
    // undecided cohorts report their full-horizon totals with
    // decision 0. Windows run per cohort — inherent to sequential
    // semantics; at scale the partition key is the experiment id.
    "q357_sprt_stopping" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        pmod(col("user_id"), lit(4L)).as("cohort"),
        col("ts"), col("event_id"),
        when(col("value") > 5, 1L).otherwise(0L).as("succ"))
      val wc = Window.partitionBy("cohort").orderBy(col("ts"), col("event_id"))
      val walked = graft.ops.Staging.stage(ev
        .withColumn("s", sum("succ").over(
          wc.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(wc).cast("long"))
        .withColumn("f", col("rn") - col("s"))
        .withColumn("dec", expr(SprtDecision)))
      val first = walked.filter(col("dec") =!= 0)
        .groupBy("cohort")
        .agg(min(struct(col("rn"), col("dec"), col("s"), col("f")))
          .as("st"))
      walked.groupBy("cohort")
        .agg(max("rn").as("trn"), max("s").as("tsc"))
        .join(first, Seq("cohort"), "left")
        .select(col("cohort"),
          coalesce(col("st.dec"), lit(0L)).as("decision"),
          coalesce(col("st.rn"), col("trn")).as("n_seen"),
          coalesce(col("st.s"), col("tsc")).as("n_succ"),
          (coalesce(col("st.rn"), col("trn")) -
            coalesce(col("st.s"), col("tsc"))).as("n_fail"))
        .withColumn("llr_nano", expr(SprtLlrNano))
        .orderBy("cohort")
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

    // Croston's method (Kernels.crostonForecast — Croston 1972) over
    // each user's daily purchase-cents series, zero-filled on the
    // observed-day grid: the INTERMITTENT-demand forecaster (size
    // smoother stepped only on demand days, interval smoother over
    // the gaps, forecast = size/interval) that q139/q231's dense
    // smoothers mis-serve when most periods are zero. Exact integer
    // cents seed the doubles; alpha and 1-alpha are interpolated
    // VERBATIM into the oracle's recursive CTE so both engines smooth
    // with identical doubles; per-user final state only (1500 rows at
    // sf0.1, the series themselves stay distributed — series count
    // scales out, each is one constant-memory pass).
    "q326_croston_intermittent" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
      val users = ev.select("user_id").distinct()
      val dem = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("__c"))
      val grid = graft.ops.Staging.stage(
        users.crossJoin(broadcast(days))
          .join(dem, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("__c"), lit(0L)).cast("double").as("y")))
      val wU = Window.partitionBy("user_id").orderBy(col("day").desc)
      graft.ops.Kernels.crostonForecast(grid, "user_id", Seq("day"), "y",
          alpha = 0.1)
        .withColumn("__rn", row_number().over(wU))
        .filter(col("__rn") === 1)
        .join(grid.filter(col("y") > 0).groupBy("user_id")
          .agg(count(lit(1)).as("__nz")), Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("__nz"), lit(0L)).as("demand_days"),
          round(col("demand_level"), 6).as("demand_level"),
          round(col("interval_level"), 6).as("interval_level"),
          round(col("forecast"), 6).as("croston_forecast"))
        .orderBy("user_id")
    }),

    // Greedy interval scheduling (Kernels.maxNonOverlap — the
    // activity-selection optimum): each event claims a value-scaled
    // service window [ts, ts + 60*floor(value) s), and per user the
    // kernel keeps the maximum set of non-overlapping windows — the
    // "how many jobs fit serially" capacity statistic. Exact integer
    // micros; the (end, start, event_id) scan order replays in the
    // oracle as a per-user recursive CTE carrying the last kept end
    // (the q326 stepping pattern). Per-user output rows.
    "q340_interval_scheduling" -> ((s, d) => {
      val iv = Tables.events(s, d).select(col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          expr("CAST(floor(value) AS BIGINT)") * lit(60000000L)).as("e_us"))
      graft.ops.Kernels.maxNonOverlap(iv, "user_id", "s_us", "e_us",
          "event_id")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
             sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("user_id")
    }),

    // Hodges-Lehmann location estimate of daily purchase revenue —
    // the median of all Walsh averages (y_i + y_j)/2 over i <= j: the
    // robust "typical day" that tolerates ~29% gross outliers where
    // the mean tolerates none and the plain median wastes efficiency.
    // Walsh averages over the calendar-bounded daily frame (30 days
    // -> 465 pairs, the bounded-product exception); cents are exact
    // integers so every average is an exact k/2 double and the
    // interpolated median lands on an exact k/4 — no rounding
    // boundary exists. percentile() bit-matches quantile_cont.
    "q339_hodges_lehmann" -> ((s, d) => {
      val daily = graft.ops.Staging.stage(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .groupBy(datediff(to_date(col("ts")),
              lit("1970-01-01").cast("date")).cast("long").as("dd"))
          .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .as("y")))
      val b = daily.select(col("dd").as("dd2"), col("y").as("y2"))
      daily.join(b, col("dd") <= col("dd2"))
        .select(((col("y") + col("y2")).cast("double") / 2.0).as("w"))
        .agg(count(lit(1)).as("n_walsh"),
             expr("percentile(w, 0.5)").as("__hl"))
        .select(col("n_walsh"), round(col("__hl"), 6).as("hl_cents"))
        .orderBy("n_walsh")
    }),

    // Mann-Kendall trend test on the daily revenue series — the
    // standard nonparametric monotone-trend detector (environmental
    // statistics' workhorse; Kendall machinery with TIME as x, so
    // only y-ties need correction): S = sum of sign(y_j - y_i) over
    // i < j in day order, tie-corrected Var(S), and the
    // continuity-corrected z — S and the tie terms exact integers,
    // z one shared-text double. Calendar-bounded pair frame.
    "q341_mann_kendall" -> ((s, d) => {
      val daily = graft.ops.Staging.stage(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .groupBy(datediff(to_date(col("ts")),
              lit("1970-01-01").cast("date")).cast("long").as("dd"))
          .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .as("y")))
      val b = daily.select(col("dd").as("dd2"), col("y").as("y2"))
      val sAgg = daily.join(b, col("dd") < col("dd2"))
        .agg(sum(when(col("y2") > col("y"), 1L)
               .when(col("y2") < col("y"), -1L).otherwise(0L)).as("s_stat"))
      val nAgg = daily.agg(count(lit(1)).as("n"))
      val ties = daily.groupBy("y").agg(count(lit(1)).as("__t"))
        .agg(coalesce(sum(expr("__t * (__t - 1) * (2 * __t + 5)")), lit(0L))
          .as("tie_term"))
      sAgg.crossJoin(broadcast(nAgg)).crossJoin(broadcast(ties))
        .select(col("n").as("n_days"), col("s_stat"), col("tie_term"),
          expr(MannKendallZ).as("z_mk"))
        .orderBy("n_days")
    }),

    // Wald-Wolfowitz RUNS test on the signs of day-over-day revenue
    // change — the randomness audit behind "is this series trending /
    // mean-reverting or noise" (too few runs = momentum, too many =
    // oscillation), complementing q184's autocorrelation with a
    // distribution-free statistic. Signs, run count R (1 + sign
    // changes) and the n+/n- split are exact integers off the
    // calendar-bounded daily frame; mu and z are shared-text doubles
    // with the degenerate one-sided case (a=0 or b=0) NULL on both
    // engines (an unguarded mu would divide by zero under ANSI).
    // Zero-diff days drop (the classical treatment).
    "q336_runs_test" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(datediff(to_date(col("ts")),
            lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("y"))
      val wD = Window.orderBy("dd") // calendar-bounded frame
      val signs = daily
        .withColumn("__diff", col("y") - lag("y", 1).over(wD))
        .filter(col("__diff").isNotNull && col("__diff") =!= 0L)
        .withColumn("__s", when(col("__diff") > 0, 1).otherwise(-1))
        .withColumn("__prev", lag("__s", 1).over(wD))
      signs.agg(
          sum(when(col("__s") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("__s") === -1, 1L).otherwise(0L)).as("b"),
          sum(when(col("__prev").isNull || col("__s") =!= col("__prev"), 1L)
            .otherwise(0L)).as("r"))
        .select(col("a").as("n_pos"), col("b").as("n_neg"),
          col("r").as("n_runs"),
          expr(RunsMu).as("mu_runs"), expr(RunsZ).as("z_runs"))
        .orderBy("n_pos")
    }),

    // Kendall tau-b between the daily click-count and purchase-cents
    // series — the RANK-free concordance correlation (q305's Spearman
    // needs ranks; Kendall reads agreement directly off value pairs
    // and carries the cleaner tie story): C, D and the three tie
    // classes are exact INTEGER pair counts over the calendar-bounded
    // daily frame (30 days -> 435 pairs — all-pairs here is a
    // bounded-frame product, the documented exception to the
    // no-cross-join rule), and tau_b = (C-D)/sqrt((n0-n1)(n0-n2)) is
    // one shared-text double at the end. Day keys are exact integer
    // epoch days (the q232 rule).
    "q335_kendall_tau" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val daily = graft.ops.Staging.stage(
        ev.groupBy(datediff(to_date(col("ts")),
            lit("1970-01-01").cast("date")).cast("long").as("dd"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
                 .as("x"),
               sum(when(col("event_type") === "purchase",
                 expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
                 .otherwise(0L)).as("y")))
      val b = daily.select(col("dd").as("dd2"), col("x").as("x2"),
        col("y").as("y2"))
      daily.join(b, col("dd") < col("dd2"))
        .agg(
          count(lit(1)).as("n_pairs"),
          // sign comparisons, not difference products: a cents-diff
          // product overflows BIGINT at corpus scale, and the two
          // engines disagree on overflow (Spark wraps, DuckDB errors)
          sum(when((col("x") < col("x2") && col("y") < col("y2")) ||
                   (col("x") > col("x2") && col("y") > col("y2")), 1L)
            .otherwise(0L)).as("conc"),
          sum(when((col("x") < col("x2") && col("y") > col("y2")) ||
                   (col("x") > col("x2") && col("y") < col("y2")), 1L)
            .otherwise(0L)).as("disc"),
          sum(when(col("x") === col("x2") && col("y") =!= col("y2"), 1L)
            .otherwise(0L)).as("tied_x"),
          sum(when(col("y") === col("y2") && col("x") =!= col("x2"), 1L)
            .otherwise(0L)).as("tied_y"),
          sum(when(col("x") === col("x2") && col("y") === col("y2"), 1L)
            .otherwise(0L)).as("tied_both"))
        .select(col("n_pairs"), col("conc"), col("disc"),
          col("tied_x"), col("tied_y"), col("tied_both"),
          expr(KendallTauB).as("tau_b"))
        .orderBy("n_pairs")
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
  )

  /** q335's tau-b closed form over exact integer pair counts — SHARED
    * text: n1 = pairs tied in x (incl. both), n2 = tied in y, tau_b =
    * (C-D)/sqrt((n0-n1)(n0-n2)); sqrt is correctly rounded on both
    * engines, every operand explicitly DOUBLE-cast. */
  private val KendallTauB =
    "round(CAST(conc - disc AS DOUBLE) / " +
      "sqrt(CAST(n_pairs - tied_x - tied_both AS DOUBLE) * " +
      "CAST(n_pairs - tied_y - tied_both AS DOUBLE)), 6)"

  /** q336's expected-runs mean and z — SHARED text over the exact
    * integer (a, b, r); the one-sided degenerate case is NULL via the
    * guard (ANSI-safe), and RunsZ embeds RunsMuBody verbatim so the
    * repeated subexpression evaluates bit-identically. */
  private val RunsMuBody =
    "CAST(2 AS DOUBLE) * CAST(a AS DOUBLE) * CAST(b AS DOUBLE) / " +
      "CAST(a + b AS DOUBLE) + CAST(1 AS DOUBLE)"
  private val RunsMu =
    s"CASE WHEN a > 0 AND b > 0 THEN round($RunsMuBody, 6) " +
      "ELSE CAST(NULL AS DOUBLE) END"
  private val RunsZ =
    "CASE WHEN a > 0 AND b > 0 THEN " +
      s"round((CAST(r AS DOUBLE) - ($RunsMuBody)) / " +
      "sqrt(CAST(2 AS DOUBLE) * CAST(a AS DOUBLE) * CAST(b AS DOUBLE) * " +
      "(CAST(2 AS DOUBLE) * CAST(a AS DOUBLE) * CAST(b AS DOUBLE) - " +
      "CAST(a + b AS DOUBLE)) / " +
      "(CAST(a + b AS DOUBLE) * CAST(a + b AS DOUBLE) * " +
      "CAST(a + b - 1 AS DOUBLE))), 6) ELSE CAST(NULL AS DOUBLE) END"

  // q357's Wald LLR shared texts live with the operator
  // (graft.ext.Sprt — cycle-free, so specs init it directly); the
  // oracle interpolates the SAME strings.
  private val SprtDecision = graft.ext.Sprt.Decision
  private val SprtLlrNano = graft.ext.Sprt.LlrNano

  /** q341's continuity-corrected Mann-Kendall z over the exact
    * integers (s_stat, n, tie_term) — SHARED text; the S = 0 branch
    * is exact, Var(S) = (n(n-1)(2n+5) - tie_term)/18. */
  private val MannKendallZ =
    "CASE WHEN s_stat > 0 THEN round(CAST(s_stat - 1 AS DOUBLE) / " +
      "sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / " +
      "CAST(18 AS DOUBLE)), 6) " +
      "WHEN s_stat < 0 THEN round(CAST(s_stat + 1 AS DOUBLE) / " +
      "sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / " +
      "CAST(18 AS DOUBLE)), 6) " +
      "ELSE CAST(0.0 AS DOUBLE) END"

  val oracles: Map[String, String] = Map(
    // SPRT replay: same cumsum lattice walk, the same shared LLR gate
    // and boundaries, first crossing via row_number, full-horizon
    // fallback for undecided cohorts.
    "q357_sprt_stopping" ->
      s"""WITH ev AS (
        |  SELECT user_id % 4 AS cohort, ts, event_id,
        |    CASE WHEN value > 5 THEN 1 ELSE 0 END AS succ
        |  FROM events),
        |wk AS (
        |  SELECT cohort,
        |    CAST(sum(succ) OVER (PARTITION BY cohort ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS s,
        |    CAST(row_number() OVER (PARTITION BY cohort
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM ev),
        |wk2 AS (SELECT cohort, s, rn, rn - s AS f FROM wk),
        |dec AS (SELECT *, $SprtDecision AS dec FROM wk2),
        |fst AS (
        |  SELECT cohort, rn, dec, s, f FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cohort ORDER BY rn)
        |      AS k
        |    FROM dec WHERE dec <> 0) WHERE k = 1),
        |tot AS (
        |  SELECT cohort, CAST(max(rn) AS BIGINT) AS trn,
        |    CAST(max(s) AS BIGINT) AS tsc
        |  FROM wk2 GROUP BY cohort),
        |o AS (
        |  SELECT t.cohort,
        |    CAST(coalesce(fst.dec, 0) AS BIGINT) AS decision,
        |    coalesce(fst.rn, t.trn) AS n_seen,
        |    coalesce(fst.s, t.tsc) AS n_succ,
        |    coalesce(fst.rn, t.trn) - coalesce(fst.s, t.tsc) AS n_fail
        |  FROM tot t LEFT JOIN fst ON t.cohort = fst.cohort)
        |SELECT cohort, decision, n_seen, n_succ, n_fail,
        |  $SprtLlrNano AS llr_nano
        |FROM o ORDER BY cohort""".stripMargin,

    // Hodges-Lehmann replay: same Walsh-average frame, quantile_cont
    // bit-matching Spark's percentile.
    "q339_hodges_lehmann" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (
        |  SELECT CAST(a.y + b.y AS DOUBLE) / 2.0 AS w
        |  FROM daily a JOIN daily b ON a.dd <= b.dd)
        |SELECT CAST(count(*) AS BIGINT) AS n_walsh,
        |  round(quantile_cont(w, 0.5), 6) AS hl_cents
        |FROM w ORDER BY n_walsh""".stripMargin,

    // Interval-scheduling replay: per-user recursive CTE stepping the
    // (end, start, event_id)-ordered intervals, carrying the last
    // kept end and the kept count.
    "q340_interval_scheduling" ->
      """WITH RECURSIVE iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 * 60
        |      AS e_us
        |  FROM events),
        |o AS (
        |  SELECT user_id, s_us, e_us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY e_us, s_us, event_id) AS rn
        |  FROM iv),
        |nn AS (SELECT user_id, max(rn) AS nmax FROM o GROUP BY user_id),
        |r AS (
        |  SELECT user_id, rn, e_us AS last_end, CAST(1 AS BIGINT) AS kept
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn,
        |    CASE WHEN o.s_us >= r.last_end THEN o.e_us ELSE r.last_end END,
        |    r.kept + CASE WHEN o.s_us >= r.last_end THEN 1 ELSE 0 END
        |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT r.user_id, CAST(nn.nmax AS BIGINT) AS n_intervals,
        |  CAST(r.kept AS BIGINT) AS n_kept
        |FROM r JOIN nn ON r.user_id = nn.user_id AND r.rn = nn.nmax
        |ORDER BY r.user_id""".stripMargin,

    // Mann-Kendall replay: same pair signs, tie census and the
    // SHARED z text.
    "q341_mann_kendall" ->
      s"""WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |ss AS (
        |  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
        |                       WHEN b.y < a.y THEN -1 ELSE 0 END)
        |    AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b ON a.dd < b.dd),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |tt AS (
        |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
        |    AS tie_term
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y))
        |SELECT n AS n_days, s_stat, tie_term, $MannKendallZ AS z_mk
        |FROM ss, nn, tt ORDER BY n_days""".stripMargin,

    // Runs-test replay: same daily cents, lag-based signs and run
    // count, the SHARED mu/z texts.
    "q336_runs_test" ->
      s"""WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |df AS (
        |  SELECT dd, y - lag(y) OVER (ORDER BY dd) AS d FROM daily),
        |sg AS (
        |  SELECT dd, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
        |  FROM df WHERE d IS NOT NULL AND d <> 0),
        |sq AS (
        |  SELECT s, lag(s) OVER (ORDER BY dd) AS prev FROM sg),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM sq)
        |SELECT a AS n_pos, b AS n_neg, r AS n_runs,
        |  $RunsMu AS mu_runs, $RunsZ AS z_runs
        |FROM c ORDER BY n_pos""".stripMargin,
    // Truncated-EWMA replay: the identical left-associated sum of
    // power-of-two-weighted lags (every product an exact exponent
    // shift; see the query comment). Generated so the 8 terms
    // provably match the Spark expression term for term.
    "q139_ewma" -> ewmaOracleSql,

    // CUSUM replay: q151's recursive-CTE recurrence over
    // slack-shifted values, carrying the previous balance for the
    // crossing test.
    // Same integer cross-multiplied burst test and lag-island scan.
    "q318_burst_islands" ->
      """WITH h AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS c
        |  FROM events GROUP BY 1),
        |wn AS (
        |  SELECT h, c,
        |    sum(c) OVER (ORDER BY h RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s24,
        |    count(*) OVER (ORDER BY h RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS n24
        |  FROM h),
        |b AS (
        |  SELECT h, c FROM wn WHERE n24 = 24 AND c * 24 > s24 * 2),
        |i AS (
        |  SELECT h, c, sum(CASE WHEN prev IS NULL OR h - prev > 1 THEN 1 ELSE 0 END)
        |      OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS isl
        |  FROM (SELECT h, c, lag(h) OVER (ORDER BY h) AS prev FROM b)),
        |g AS (
        |  SELECT isl, count(*) AS len, max(c) AS peak FROM i GROUP BY isl)
        |SELECT count(*) AS n_islands,
        |  CAST(coalesce(sum(len), 0) AS BIGINT) AS n_burst_hours,
        |  CAST(coalesce(max(len), 0) AS BIGINT) AS longest_island,
        |  CAST(coalesce(max(peak), 0) AS BIGINT) AS peak_hour_count
        |FROM g ORDER BY n_islands""".stripMargin,

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

    // Kendall replay: identical integer pair classification over the
    // same daily frame, the SHARED tau-b closed form.
    "q335_kendall_tau" ->
      s"""WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT a.x, a.y, b.x AS x2, b.y AS y2
        |  FROM daily a JOIN daily b ON a.dd < b.dd),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN (x < x2 AND y < y2) OR (x > x2 AND y > y2)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        |    CAST(sum(CASE WHEN (x < x2 AND y > y2) OR (x > x2 AND y < y2)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS disc,
        |    CAST(sum(CASE WHEN x = x2 AND y <> y2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tied_x,
        |    CAST(sum(CASE WHEN y = y2 AND x <> x2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tied_y,
        |    CAST(sum(CASE WHEN x = x2 AND y = y2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tied_both
        |  FROM p)
        |SELECT n_pairs, conc, disc, tied_x, tied_y, tied_both,
        |  $KendallTauB AS tau_b
        |FROM c ORDER BY n_pairs""".stripMargin,

    // Croston replay: the state machine as a recursive CTE stepping
    // rn -> rn+1 per user over the same zero-filled grid; the
    // smoothing constants are the Scala doubles interpolated verbatim
    // (1 - alpha is NOT retyped as 0.9 — it is whatever double the
    // kernel computed).
    "q326_croston_intermittent" ->
      s"""WITH RECURSIVE days AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        |users AS (SELECT DISTINCT user_id FROM events),
        |dem AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |g AS (
        |  SELECT u.user_id, d.day, CAST(coalesce(dem.c, 0) AS DOUBLE) AS y
        |  FROM users u CROSS JOIN days d
        |  LEFT JOIN dem ON dem.user_id = u.user_id AND dem.day = d.day),
        |s AS (SELECT user_id, day, y,
        |        row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |      FROM g),
        |nn AS (SELECT max(rn) AS nmax FROM s),
        |r AS (
        |  SELECT user_id, rn, y > 0.0 AS seen,
        |    CASE WHEN y > 0.0 THEN y END AS z,
        |    CASE WHEN y > 0.0 THEN CAST(rn AS DOUBLE) END AS p,
        |    CASE WHEN y > 0.0 THEN rn END AS ld
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |    r.seen OR s.y > 0.0,
        |    CASE WHEN s.y > 0.0 AND NOT r.seen THEN s.y
        |         WHEN s.y > 0.0 THEN ${0.1} * s.y + ${1 - 0.1} * r.z
        |         ELSE r.z END,
        |    CASE WHEN s.y > 0.0 AND NOT r.seen THEN CAST(s.rn AS DOUBLE)
        |         WHEN s.y > 0.0
        |           THEN ${0.1} * CAST(s.rn - r.ld AS DOUBLE) + ${1 - 0.1} * r.p
        |         ELSE r.p END,
        |    CASE WHEN s.y > 0.0 THEN s.rn ELSE r.ld END
        |  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1),
        |fin AS (SELECT r.* FROM r, nn WHERE r.rn = nn.nmax),
        |nz AS (SELECT user_id, CAST(count(*) AS BIGINT) AS demand_days
        |       FROM g WHERE y > 0 GROUP BY user_id)
        |SELECT f.user_id,
        |  coalesce(nz.demand_days, 0) AS demand_days,
        |  round(f.z, 6) AS demand_level,
        |  round(f.p, 6) AS interval_level,
        |  round(f.z / f.p, 6) AS croston_forecast
        |FROM fin f LEFT JOIN nz USING (user_id)
        |ORDER BY user_id""".stripMargin,

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
  )
}
