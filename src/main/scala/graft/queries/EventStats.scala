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

/** Experiment / ML-EVAL queries: A/B and DiD lift, CUPED, Kaplan-
  * Meier, purged splits, KS, ROC-AUC, chi-square, Welch, calibration,
  * confusion PRF, bootstrap CI, PSI drift, matched strata, group AUC,
  * quantile norm, rebalance, priority sampling, MI.
  *
  * Split from the single EventQueries object (r16 maintainability
  * pass): entries and oracle SQL are byte-identical and compose back
  * into the driver map through [[EventQueries]].
  */
object EventStatsQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

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

    // Nelson-Aalen cumulative hazard — q181's estimator twin (Aalen
    // 1978; the sum form H(t) = Σ d/n where KM is the product form),
    // preferred when hazard INCREMENTS are the object of interest and
    // the basis of the Fleming-Harrington survival estimate. Same
    // per-user duration/censoring construction and risk-set window as
    // q181; the curve is an ORDERED cumulative sum of d/n terms plus
    // the Σ d/n² variance numerator, both emitted as floored
    // nano-units (each term identical IEEE on both engines, summed in
    // the same duration order — no rounding boundary to sit on).
    "q324_nelson_aalen" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val perUser = Tables.events(s, d)
        .withColumn("__rn", row_number().over(wu))
        .groupBy("user_id")
        .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
               .as("dur"),
             max(when(col("__rn") === 1, col("event_type"))).as("__last"))
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
        .withColumn("__h",
          col("d_events").cast("double") / col("n_at_risk").cast("double"))
        .withColumn("__v",
          col("d_events").cast("double") /
            (col("n_at_risk").cast("double") * col("n_at_risk").cast("double")))
        .select(col("dur").as("duration_days"), col("n_at_risk"),
          col("d_events"), col("n_exit"),
          floor(sum(col("__h")).over(wCur) * 1e9).cast("long")
            .as("hazard_nano"),
          floor(sum(col("__v")).over(wCur) * 1e9).cast("long")
            .as("var_nano"))
        .orderBy("duration_days")
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

    // Two-sample Cramér-von Mises (q204's KS sharpened from the max
    // ECDF gap to the INTEGRATED squared gap — the test with power
    // against spread/shape differences a single-crossing KS misses;
    // Anderson 1962): T = nm/(n+m)^2 * Σ_pooled (F_n(x) - G_m(x))^2,
    // computed on the distinct-VALUE frame (each value contributes
    // (ca+cb) * gap^2). Per-value terms are floored to nano integers
    // BEFORE the sum (the q269 rule — float sum order never matters),
    // and the final scaling is one shared-text double expression over
    // the exact integers. Same scale shape as q204: one exchange to
    // the value frame, prefixSum scan (never a corpus-row window),
    // 1-row output.
    "q329_cramer_von_mises" -> ((s, d) => {
      val perVal = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("ca"),
             sum(when(col("event_type") === "click", 1L).otherwise(0L))
               .as("cb"))
      val cum = graft.ops.Staging.stage(
        Kernels.prefixSum(perVal, Seq(col("value").asc), Seq("ca", "cb")))
      val tot = cum.agg(sum("ca").as("na"), sum("cb").as("nb"))
      cum.crossJoin(broadcast(tot))
        .select(col("na"), col("nb"), col("ca"), col("cb"),
          expr(CvmTermNano).as("__t"))
        .groupBy("na", "nb")
        .agg(count(lit(1)).as("n_values"), sum("__t").as("cvm_sum_nano"))
        .select(col("na").as("n_purchase"), col("nb").as("n_click"),
          col("n_values"), col("cvm_sum_nano"),
          expr(CvmTNano).as("t_nano"))
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

    // QINI / UPLIFT decile table (Radcliffe 2007) — the targeting-
    // model audit q300's gains table is NOT: gains rank by response,
    // uplift ranks by a model score and asks how much INCREMENTAL
    // response treatment bought at each depth, Q(k) = cumTS -
    // cumCS * cumTN/cumCN (treated successes minus the control
    // successes scaled to the treated exposure). Treatment = user
    // parity, outcome = any purchase, score = a hash-seeded
    // deterministic stand-in with a trained scorer's exact compute
    // shape (the q142 convention). Deciles via denseIndex — the
    // range-sort + zipWithIndex kernel, never a global window (the
    // q300 rule); the cumulative frame is 10 rows. All counts exact
    // integers; the one float op is the shared-text Qini division.
    "q364_qini_uplift" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("__y"))
        .select(col("user_id"), col("__y"),
          pmod(col("user_id"), lit(2L)).as("__t"),
          conv(substring(md5(concat(col("user_id").cast("string"),
            lit("|up18"))), 1, 13), 16, 10).cast("long").as("__score"))
      val idx = Kernels.denseIndex(users,
        Seq(col("__score").desc, col("user_id").asc), "__i")
      val dec = idx.crossJoin(broadcast(idx.agg(count(lit(1)).as("__n"))))
        .select(expr("(__i * 10) div __n").as("decile"), col("__t"),
          col("__y"))
        .groupBy("decile")
        .agg(sum(when(col("__t") === 1, 1L).otherwise(0L)).as("tn"),
             sum(when(col("__t") === 0, 1L).otherwise(0L)).as("cn"),
             sum(when(col("__t") === 1, col("__y")).otherwise(0L)).as("ts"),
             sum(when(col("__t") === 0, col("__y")).otherwise(0L)).as("cs"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      dec.select(col("decile"), col("tn"), col("cn"), col("ts"), col("cs"),
          sum("tn").over(w).as("ctn"), sum("cn").over(w).as("ccn"),
          sum("ts").over(w).as("cts"), sum("cs").over(w).as("ccs"))
        .select(col("decile"), col("tn"), col("cn"), col("ts"), col("cs"),
          expr(QiniMilli).as("qini_milli"))
        .orderBy("decile")
    }),
  )

  /** q329's per-distinct-value CvM term in floored nano-nats — SHARED
    * text (multiplicity x squared ECDF gap), every literal and count
    * explicitly DOUBLE-cast (the q293 rule), floored per term so the
    * float sum order can never matter (the q269 rule). */
  private val CvmTermNano =
    "CAST(floor(CAST(1000000000 AS DOUBLE) * CAST(ca + cb AS DOUBLE) * " +
      "(CAST(ca_cum AS DOUBLE) / CAST(na AS DOUBLE) - CAST(cb_cum AS DOUBLE) / CAST(nb AS DOUBLE)) * " +
      "(CAST(ca_cum AS DOUBLE) / CAST(na AS DOUBLE) - CAST(cb_cum AS DOUBLE) / CAST(nb AS DOUBLE))) AS BIGINT)"

  /** q329's final scaling nm/(n+m)^2 over the exact integer term sum
    * — one shared-text double expression, floored nano. */
  private val CvmTNano =
    "CAST(floor(CAST(cvm_sum_nano AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / " +
      "(CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE))) AS BIGINT)"

  /** q364's cumulative Qini in floor-milli over exact integer
    * cumulative counts — ONE string, both engines; NULL when a depth
    * has no control exposure. */
  private val QiniMilli =
    "CASE WHEN ccn = 0 THEN CAST(NULL AS BIGINT) ELSE " +
      "CAST(floor(1000.0 * (CAST(cts AS DOUBLE) - CAST(ccs AS DOUBLE) * " +
      "CAST(ctn AS DOUBLE) / CAST(ccn AS DOUBLE))) AS BIGINT) END"

  val oracles: Map[String, String] = Map(
    // Qini replay: same per-user frame, the q119 strpos md5 parse for
    // the score, row_number-1 as the dense index, identical decile
    // arithmetic and cumulative windows, the shared Qini text.
    "q364_qini_uplift" ->
      s"""WITH u AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y,
        |    user_id % 2 AS t
        |  FROM events GROUP BY user_id),
        |sc AS (
        |  SELECT *,
        |    CAST(list_sum(list_transform(range(1, 14),
        |      i -> CAST(strpos('0123456789abcdef', substring(
        |             substring(md5(CAST(user_id AS VARCHAR) || '|up18'), 1, 13),
        |             CAST(i AS INTEGER), 1)) - 1 AS DOUBLE)
        |           * power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) AS BIGINT)
        |      AS score
        |  FROM u),
        |idx AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, user_id)
        |    - 1 AS BIGINT) AS i,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM sc),
        |dec AS (
        |  SELECT (i * 10) // n AS decile,
        |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn,
        |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS ts,
        |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS cs
        |  FROM idx GROUP BY 1),
        |cum AS (
        |  SELECT *,
        |    CAST(sum(tn) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ctn,
        |    CAST(sum(cn) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ccn,
        |    CAST(sum(ts) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cts,
        |    CAST(sum(cs) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ccs
        |  FROM dec)
        |SELECT decile, tn, cn, ts, cs, $QiniMilli AS qini_milli
        |FROM cum ORDER BY decile""".stripMargin,
    // CvM replay: q204's distinct-value/cumulative construction, the
    // SHARED floored nano term and final scaling.
    "q329_cramer_von_mises" ->
      s"""WITH pv AS (
        |  SELECT value,
        |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS ca,
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS cb
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |  GROUP BY value),
        |cum AS (
        |  SELECT value, ca, cb,
        |    CAST(sum(ca) OVER (ORDER BY value) AS BIGINT) AS ca_cum,
        |    CAST(sum(cb) OVER (ORDER BY value) AS BIGINT) AS cb_cum
        |  FROM pv),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb FROM pv),
        |tm AS (SELECT na, nb, $CvmTermNano AS tn FROM cum, t),
        |a AS (
        |  SELECT na, nb, CAST(count(*) AS BIGINT) AS n_values,
        |    CAST(sum(tn) AS BIGINT) AS cvm_sum_nano
        |  FROM tm GROUP BY na, nb)
        |SELECT na AS n_purchase, nb AS n_click, n_values, cvm_sum_nano,
        |  $CvmTNano AS t_nano
        |FROM a ORDER BY n_purchase""".stripMargin,

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

    // Nelson-Aalen replay: q181's per-user/risk-set construction with
    // the ordered cumulative d/n (and d/n^2 variance) sums in floored
    // nano-units.
    "q324_nelson_aalen" ->
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
        |         CAST(d_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS h,
        |         CAST(d_events AS DOUBLE) /
        |           (CAST(n_at_risk AS DOUBLE) * CAST(n_at_risk AS DOUBLE)) AS v
        |       FROM cc)
        |SELECT dur AS duration_days, n_at_risk, d_events, n_exit,
        |  CAST(floor(sum(h) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e9)
        |    AS BIGINT) AS hazard_nano,
        |  CAST(floor(sum(v) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e9)
        |    AS BIGINT) AS var_nano
        |FROM ff ORDER BY duration_days""".stripMargin,

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
  )
}
