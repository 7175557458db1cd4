package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming shapes for the events table — the streaming
  * forms of the batch queries in graft.queries.EventQueries. Each
  * transform takes a streaming (or batch — the plans are identical)
  * DataFrame with (event_id, ts: timestamp, user_id, event_type,
  * value) columns.
  *
  * Scale notes: all windowed aggregations are keyed on (window/session
  * x type/user), their state is bounded by the watermark, and late
  * data past the watermark is dropped; the custom-state running total
  * is bounded separately by an idle-timeout (see runningUserTotals) —
  * together the properties that keep state size finite on an
  * unbounded 100 TB/day stream.
  */
object Streams {

  /** Tumbling event-time windows with a watermark. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Sliding windows (length/slide), watermarked. */
  def slidingCounts(events: DataFrame, length: String = "2 hours",
                    slide: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  /** Native session windows: 30-min inactivity gap per user — the
    * streaming form of EventQueries.q23 (which computes the same
    * sessions in batch with lag/cumsum). */
  def sessionAggs(events: DataFrame, gap: String = "30 minutes",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"), col("total_value"))

  /** Streaming exact dedup on event_id within the watermark — the
    * streaming form of exact dedup (state: one key per id seen, aged
    * out by the watermark). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream attribution join: each `view`-type event joins the
    * same user's `click` within `horizon` AFTER it. Both sides are
    * watermarked and the join condition bounds click time relative to
    * view time, so Spark ages out both state stores — the pair of
    * constraints that keeps a stream-stream join's state finite on an
    * unbounded stream (an unbounded-horizon join would buffer one
    * side forever). Inner join: unattributed views drop; switch to
    * leftOuter and nulls emit once the watermark passes the horizon.
    */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
                      horizon: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id"),
              col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
              col("ts").as("click_ts"), col("value").as("click_value"))
    v.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select("view_id", "user_id", "view_ts", "click_id", "click_ts",
              "click_value")
  }

  /** Streaming document prep — the streaming form of
    * [[graft.ext.DocPrep.prepare]] for a continuously-ingested corpus
    * with (doc_id, ts, text, source) rows: content-hash dedup within
    * the watermark (state = one md5 key per distinct text seen, aged
    * out by the watermark). Keep policy: a duplicate arriving in a
    * LATER micro-batch than the original is always dropped; within
    * one micro-batch the survivor is whichever task processes its row
    * first (Spark's dropDuplicates contract) — so this agrees with
    * the batch operator's keep-lowest-id exactly when each text's
    * first occurrence arrives in an earlier micro-batch than its
    * duplicates and ids are arrival-ordered (which StreamingSpec
    * pins; [[docPrepStreamExact]] removes the within-batch caveat
    * with min-id custom state), then the SAME
    * codegen'd language-ID / quality / token projections and filters —
    * those stages are stateless, so their streaming plan is the batch
    * plan.
    */
  def docPrepStream(docs: DataFrame, textCol: String,
                    stopwords: Seq[String],
                    profiles: Seq[(String, Seq[String])],
                    minQuality: Double, keepLangs: Seq[String],
                    watermark: String = "2 hours"): DataFrame = {
    val ts = graft.ext.TextStats
    val deduped = docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
    ts.withLangScores(deduped, textCol, profiles)
      .withColumn("predicted_lang", ts.predictLang(profiles))
      .withColumn("n_tokens", ts.tokenCount(col(textCol)))
      .withColumn("quality", ts.qualityScore(col(textCol), stopwords))
      .filter(col("quality") >= minQuality &&
              col("predicted_lang").isin(keepLangs: _*))
  }

  /** Row shapes for the exact streaming doc-prep (top-level-visible
    * case classes: Catalyst's deserializer codegen requires stable
    * companions through streaming re-analysis). */
  case class HashedDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
                       source: String, content_hash: String)
  case class RawDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
                    source: String)

  /** EXACT streaming document prep: like [[docPrepStream]], but the
    * within-micro-batch duplicate survivor is deterministic —
    * keep-LOWEST-id, the batch operator's rule — instead of
    * whichever task processed its row first. [[docPrepStream]] agrees
    * with batch DocPrep only when each text's first occurrence
    * arrives before its duplicates in an earlier micro-batch AND ids
    * are arrival-ordered; this variant agrees for ANY arrival order
    * within a micro-batch (StreamingSpec pins shuffled-id agreement).
    *
    * Mechanism: rows group by content hash into
    * `flatMapGroupsWithState` (the custom-state operator — a
    * dropDuplicates cannot express min-id reconciliation): per key
    * per micro-batch the state-free group emits its min-id row and
    * marks the hash seen; later micro-batches emit nothing. State is
    * one boolean per distinct hash, aged out by an EVENT-TIME timeout
    * at (event ts + the watermark delay) — the same lifetime
    * dropDuplicatesWithinWatermark gives its keys, so state stays
    * bounded on an unbounded stream. Across micro-batches the earlier
    * batch still wins (its state marker exists) — arrival order
    * ACROSS batches is real time-ordering a stream processor must
    * respect; within a batch there is no order, which is exactly the
    * nondeterminism this variant removes. The stateless language-ID /
    * quality / token stages are the batch plan, as in
    * [[docPrepStream]].
    */
  def docPrepStreamExact(docs: DataFrame, textCol: String,
                         stopwords: Seq[String],
                         profiles: Seq[(String, Seq[String])],
                         minQuality: Double, keepLangs: Seq[String],
                         watermark: String = "2 hours"): DataFrame = {
    import docs.sparkSession.implicits._
    val delayMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
      require(iv.months == 0, "watermark must be a day-time interval")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    val hashed = docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), col(textCol).as("text"),
              col("source"), col("content_hash"))
      .as[HashedDoc]
    val winners = hashed
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, RawDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (_: String, rows: Iterator[HashedDoc], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // an earlier micro-batch won
          else {
            val w = rows.minBy(_.doc_id)
            state.update(true)
            state.setTimeoutTimestamp(
              math.max(w.ts.getTime + delayMs, state.getCurrentWatermarkMs + 1))
            Iterator(RawDoc(w.doc_id, w.ts, w.text, w.source))
          }
        })
    val ts = graft.ext.TextStats
    val df = winners.toDF()
    ts.withLangScores(df, "text", profiles)
      .withColumn("predicted_lang", ts.predictLang(profiles))
      .withColumn("n_tokens", ts.tokenCount(col("text")))
      .withColumn("quality", ts.qualityScore(col("text"), stopwords))
      .filter(col("quality") >= minQuality &&
              col("predicted_lang").isin(keepLangs: _*))
  }

  // ---- custom state: running per-user aggregates -----------------

  case class UserEvent(user_id: Long, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Row shape for the streaming CDC twin: a changelog record.
    * (ts, seq) must totally order each key's changes. */
  case class Change(k: Long, ts: Long, seq: Long, op: String, v: Double)

  /** Row shapes for the streaming clamped-balance twin. */
  case class SeqEvent(k: Long, seq: Long, v: Double)
  case class Balance(k: Long, balance: Double, n_events: Long, n_clamps: Long)

  /** Streaming twin of [[graft.ops.Kernels.clampedRunningSum]]: the
    * per-key `bal = max(floor, bal + v)` recurrence maintained in
    * constant per-key state. Within a micro-batch events sort by
    * `seq`; ACROSS batches the recurrence is order-sensitive by
    * nature, so stream ≡ batch holds under in-order arrival (the
    * incremental-funnel twin's documented contract — a late event
    * would need the whole suffix replayed, which no bounded-state
    * stream can do). Emits each key's running (balance, count,
    * clamps) per batch it appears in.
    */
  def clampedBalanceStream(events: Dataset[SeqEvent],
                           floor: Double = 0.0): Dataset[Balance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (k: Long, it: Iterator[SeqEvent], st: GroupState[Balance]) => {
          var (bal, n, cl) = st.getOption
            .map(b => (b.balance, b.n_events, b.n_clamps))
            .getOrElse((floor, 0L, 0L))
          it.toSeq.sortBy(_.seq).foreach { e =>
            val raw = bal + e.v
            if (raw < floor) { bal = floor; cl += 1 } else bal = raw
            n += 1
          }
          val b = Balance(k, bal, n, cl)
          st.update(b)
          b
        })
  }

  /** Row shapes for the streaming Holt-smoothing twin. */
  case class SeriesPoint(k: String, seq: Long, y: Double)
  case class HoltState(k: String, level: Double, trend: Double, n_points: Long)

  /** Streaming twin of [[graft.ops.Kernels.holtLinear]]: per-series
    * Holt level+trend maintained in constant state (two doubles and a
    * count per key). Same op order as the batch kernel — `α·y +
    * (1−α)·(l+b)` then `β·(l′−l) + (1−β)·b` — so under in-order
    * arrival the streamed state is bit-identical to the batch scan
    * (StreamingSpec pins it across arbitrary micro-batch splits).
    * Like the clamped-balance twin, the recurrence is order-sensitive
    * by nature: a late point would require suffix replay, which no
    * bounded-state stream can do — the documented in-order contract.
    */
  def holtStream(points: Dataset[SeriesPoint],
                 alpha: Double, beta: Double): Dataset[HoltState] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[SeriesPoint], st: GroupState[HoltState]) => {
          var (l, b, n) = st.getOption
            .map(s => (s.level, s.trend, s.n_points))
            .getOrElse((0.0, 0.0, 0L))
          it.toSeq.sortBy(_.seq).foreach { p =>
            if (n == 0L) { l = p.y; b = 0.0 }
            else {
              val lNew = alpha * p.y + (1 - alpha) * (l + b)
              b = beta * (lNew - l) + (1 - beta) * b
              l = lNew
            }
            n += 1
          }
          val s = HoltState(k, l, b, n)
          st.update(s)
          s
        })
  }

  case class CrostonState(k: String, seen: Boolean, demand_level: Double,
                          interval_level: Double, forecast: Double,
                          n_points: Long, last_demand_rn: Long)

  /** Streaming Croston — the live twin of
    * [[graft.ops.Kernels.crostonForecast]] (q326's intermittent-demand
    * smoother), carrying (seen, size level, interval level, period
    * count, last-demand index) as one small state row per series
    * across micro-batches. Demand periods step both smoothers exactly
    * like the batch kernel (same op order, same doubles); zero periods
    * only advance the period counter. `seen = false` rows are the
    * stream form of the batch kernel's pre-first-demand NULLs (their
    * levels are placeholders — read them only when seen). In-order
    * contract like [[holtStream]]: seq sorts within a micro-batch, and
    * batches must arrive in series order (a late period would need
    * suffix replay, which no bounded-state stream can do). State is
    * bounded by series count, not stream length. */
  def crostonStream(points: Dataset[SeriesPoint],
                    alpha: Double): Dataset[CrostonState] = {
    import points.sparkSession.implicits._
    val b = 1 - alpha
    points
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[SeriesPoint], st: GroupState[CrostonState]) => {
          var s = st.getOption
            .getOrElse(CrostonState(k, seen = false, 0.0, 0.0, 0.0, 0L, 0L))
          var n = s.n_points; var seen = s.seen
          var z = s.demand_level; var p = s.interval_level
          var ld = s.last_demand_rn
          it.toSeq.sortBy(_.seq).foreach { pt =>
            n += 1
            if (pt.y > 0.0) {
              if (!seen) { z = pt.y; p = n.toDouble; seen = true }
              else {
                z = alpha * pt.y + b * z
                p = alpha * (n - ld).toDouble + b * p
              }
              ld = n
            }
          }
          val out = CrostonState(k, seen, z, p,
            if (seen) z / p else 0.0, n, ld)
          st.update(out)
          out
        })
  }

  /** Stream-static PROXIMITY alerts — streaming points probed against
    * a static reference set with [[graft.ext.Spatial.gridProximityJoin]]
    * verbatim: the operator is all stateless transforms (projection,
    * 3x3 cell explode, inner join, exact distance filter), so applied
    * to a streaming frame it IS its own twin — Structured Streaming
    * plans a stream-static join, no watermark or state store, and the
    * batch operator run over the same rows gives the identical pair
    * set (StreamingSpec pins it). The geofence/anomaly-radius shape:
    * reference = known sites, stream = live positions. */
  def proximityAlertStream(points: DataFrame, idCol: String,
                           reference: DataFrame, refIdCol: String,
                           xCol: String, yCol: String,
                           radius: Double): DataFrame =
    graft.ext.Spatial.gridProximityJoin(points, idCol, reference, refIdCol,
      xCol, yCol, radius)

  case class ThrottleEvent(k: String, seq: Long, t: Long)
  case class ThrottleState(k: String, last_emit: Long)
  case class ThrottleDecision(k: String, seq: Long, t: Long,
                              emitted: Boolean)

  /** Streaming cooldown throttle — the live half of
    * [[graft.ops.Kernels.cooldownFilter]] (alerting is inherently a
    * stream; the batch kernel is its backfill/audit form): per key,
    * an event EMITS iff its time is at least `cooldown` past the last
    * EMITTED event, with the last-emit time carried as ONE long of
    * state per key across micro-batches — so a burst split across
    * batch boundaries stays suppressed (state is what a window over
    * the batch alone cannot see). Decisions stream out per event
    * (flatMapGroups); state is bounded by key cardinality, not stream
    * length. In-order contract like the Holt twin: a late event would
    * need suffix replay, which no bounded-state stream can do
    * (StreamingSpec pins stream ≡ batch across arbitrary micro-batch
    * splits, including a split mid-burst).
    */
  def cooldownStream(events: Dataset[ThrottleEvent],
                     cooldown: Long): Dataset[ThrottleDecision] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[ThrottleEvent],
         st: GroupState[ThrottleState]) => {
          var lastEmit = st.getOption.map(_.last_emit).getOrElse(0L)
          var have = st.exists
          val out = it.toSeq.sortBy(e => (e.t, e.seq)).map { e =>
            val emit = !have || e.t >= lastEmit + cooldown
            if (emit) { lastEmit = e.t; have = true }
            ThrottleDecision(k, e.seq, e.t, emit)
          }
          if (have) st.update(ThrottleState(k, lastEmit))
          out.iterator
        })
  }

  case class SessEvent(k: String, seq: Long, t: Long)
  case class SessState(k: String, ss: Long, prev: Long)
  case class SessAssign(k: String, seq: Long, t: Long, session_start: Long)

  /** Streaming dual-rule sessionizer — the live half of
    * [[graft.ops.Kernels.cappedSessionize]]: per key, an event starts
    * a new session iff it is more than `gap` past the previous event
    * OR joining would stretch the session span past `maxSpan`; the
    * (session start, previous time) pair is TWO longs of state per
    * key across micro-batches, so a session split across batch
    * boundaries keeps its start (what a per-batch window cannot see)
    * and state is bounded by key cardinality, not stream length.
    * Assignments stream out per event (flatMapGroups). In-order
    * contract like the cooldown twin — a late event would need suffix
    * replay (StreamingSpec pins stream ≡ batch across arbitrary
    * micro-batch splits, including a split mid-session).
    */
  def cappedSessionStream(events: Dataset[SessEvent], gap: Long,
                          maxSpan: Long): Dataset[SessAssign] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[SessEvent],
         st: GroupState[SessState]) => {
          var have = st.exists
          var ss = st.getOption.map(_.ss).getOrElse(0L)
          var prev = st.getOption.map(_.prev).getOrElse(0L)
          val out = it.toSeq.sortBy(e => (e.t, e.seq)).map { e =>
            if (!have) { ss = e.t; have = true }
            else if (e.t - prev > gap || e.t - ss > maxSpan) ss = e.t
            prev = e.t
            SessAssign(k, e.seq, e.t, ss)
          }
          if (have) st.update(SessState(k, ss, prev))
          out.iterator
        })
  }

  /** Streaming CDC: maintain the LATEST change per key across
    * micro-batches — the streaming half of
    * [[graft.ext.Cdc.applyChangelog]] (whose batch top-1-per-key this
    * reproduces incrementally; the downstream merge against the base
    * dimension is the same join either way). State per key is ONE
    * change record (constant size — latest-wins needs no history), so
    * total state is bounded by key cardinality, not stream length.
    * Emits each key's current latest on every micro-batch it appears
    * in; reading the last emit per key gives the batch answer
    * (CdcStreamSpec pins stream ≡ batch under arbitrary micro-batch
    * splits, including same-batch out-of-order arrival).
    *
    * EXACTLY-ONCE SINK CONTRACT: Spark's recovery redelivers
    * micro-batches (at-least-once), so the production sink is a
    * foreachBatch MERGE/upsert keyed on `k`. That sink is idempotent
    * under replay STRUCTURALLY: latest-wins is an idempotent merge —
    * maxBy(ts, seq) over state that already absorbed the batch
    * re-emits the identical record, so re-upserting it cannot change
    * the table (spec-pinned: duplicate batch delivery diffs empty
    * against single delivery). Non-keyed/append sinks do NOT get
    * this for free — they would duplicate rows on replay.
    */
  def cdcLatestChanges(changes: Dataset[Change]): Dataset[Change] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (_: Long, cs: Iterator[Change], state: GroupState[Change]) => {
          val best = (state.getOption.iterator ++ cs)
            .maxBy(c => (c.ts, c.seq))
          state.update(best)
          best
        })
  }

  /** Streaming twin of [[graft.ops.IntervalJoin.overlapJoin]] for the
    * stream-static case: a STREAM of intervals (e.g. live sessions)
    * matched against a STATIC interval table (incident/maintenance
    * windows). Identical algorithm — explode each stream interval to
    * its time-grid cells map-side, plain stream-static equi-join on
    * the cell, exact half-open predicate — so the candidate space is
    * bounded per record, STATELESS (a pair overlapping several
    * shared cells is emitted exactly once by the canonical-cell rule
    * — see [[graft.ops.IntervalJoin.overlapOnce]] — a map-side
    * filter, so no stateful dedup and no watermark is needed: the
    * static side never changes and the micro-batch boundary cannot
    * split a pair because each stream ROW carries its whole
    * interval). StreamingSpec pins the emitted pair set ≡ the batch
    * operator's under arbitrary batch splits.
    */
  def overlapJoinStream(stream: DataFrame, sStart: String, sEnd: String,
                        static: DataFrame, tStart: String, tEnd: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    import graft.ops.IntervalJoin
    val l = stream.withColumn("__cell",
      explode(IntervalJoin.cells(sStart, sEnd, bucketWidth)))
    val r = static.withColumn("__cell",
      explode(IntervalJoin.cells(tStart, tEnd, bucketWidth)))
    l.join(r, Seq("__cell"))
      .filter(IntervalJoin.overlapOnce(sStart, sEnd, tStart, tEnd,
        bucketWidth))
      .drop("__cell")
  }

  /** Per-user running totals via mapGroupsWithState — the custom-
    * state escape hatch for logic windowed aggs can't express.
    * State is bounded when `idleTimeout` is set (the production
    * default): a user idle for that long has its state emitted once
    * more and removed — unbounded user-id cardinality on an unbounded
    * stream would otherwise grow state forever. A user reappearing
    * after expiry restarts from zero, the inherent trade-off of any
    * bounded running total. `idleTimeout = None` keeps state for ever
    * (only sane for bounded key domains — and for deterministic
    * tests: processing-time timers fire on wall-clock, so
    * processAllAvailable-style test drivers never settle with them).
    */
  def runningUserTotals(events: Dataset[UserEvent],
                        idleTimeout: Option[String] = Some("1 hour")): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(timeoutConf)(
        (user: Long, evs: Iterator[UserEvent], state: GroupState[UserRunning]) => {
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
            val (n, v) = evs.foldLeft((prev.n_events, prev.total_value)) {
              case ((cn, cv), e) => (cn + 1, cv + e.value)
            }
            val next = UserRunning(user, n, v)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
        })
  }

  /** Micro-batch crawl ingest with NEAR-dup gating against DURABLE
    * signature state — the streaming twin of
    * [[graft.ext.Dedup.nearDupAgainstCorpus]] (r18 verdict item 3),
    * completing the crawl-ingest family whose exact-dedup
    * ([[docPrepStreamExact]]) and ANN-append ([[annAppendStream]])
    * twins already exist. The caller seeds `statePath/sigs` with the
    * frozen corpus's signatures ([[graft.ext.Dedup.withSimHash64]]
    * output's `simhash` column — 8 bytes of near-dup state per corpus
    * document); each micro-batch then runs the batch operator
    * verbatim against the CURRENT state: delta docs within
    * `maxHamming` of any stored signature drop, survivors land in
    * `statePath/docs` (full rows + their `simhash`) and their
    * signatures append to `statePath/sigs` — so a later re-crawl of a
    * survivor drops, across micro-batches and across restarts.
    * Stream-fed state is therefore row-for-row the sequential batch
    * fold of the same shards (StreamingSpec pins it): the operator
    * carries no cross-batch state outside the sigs dir.
    *
    * Replay safety is the [[annAppendStream]] marker convention:
    * `_stream_commits/<queryId>/<batchId>` written after both appends
    * land makes re-delivered batch ids no-ops; the crash window
    * between the appends and the marker is the usual at-least-once
    * edge of a non-transactional sink, absorbed downstream by exact
    * dedup on the id (survivor rows carry their ids; a duplicated
    * signature row only re-drops what it would drop anyway).
    *
    * Scale shape: identical to the batch operator — the delta's
    * banded signatures broadcast (or shuffle with
    * `broadcastDelta = false`), the signature state is scanned
    * map-side and never shuffled; the per-batch staged frames are
    * released at batch end through a THREAD-LOCAL staging scope
    * ([[graft.ops.Staging.scoped]]) so a long-running ingest neither
    * accumulates persisted blocks nor drains a co-resident query's
    * staged frames from the process-global registry. */
  def nearDupIngestStream(delta: DataFrame, statePath: String,
                          idCol: String, textCol: String,
                          maxHamming: Int = 3, bits: Int = 64,
                          broadcastDelta: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery =
    delta.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val queryId = Option(spark.sparkContext
          .getLocalProperty("sql.streaming.queryId")).getOrElse("default")
        val marker = new org.apache.hadoop.fs.Path(
          s"$statePath/_stream_commits/$queryId/$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          // thread-local staging scope: this batch's staged frames
          // (the operator's delta stage + the survivor stage below)
          // release on scope exit WITHOUT draining the process-global
          // registry out from under a co-resident query — releaseAll
          // from a perpetual loop would thrash every other pipeline's
          // persisted fan-out frames (r19 review)
          graft.ops.Staging.scoped {
            val sigs = spark.read.parquet(s"$statePath/sigs")
            // staged: the survivor frame feeds BOTH sinks (docs + sigs)
            val survivors = graft.ops.Staging.stage(
              graft.ext.Dedup.nearDupAgainstCorpus(batch.toDF(), idCol,
                textCol, sigs, "simhash", maxHamming, bits, broadcastDelta))
            survivors.write.mode("append").parquet(s"$statePath/docs")
            survivors.select(col("simhash")).write.mode("append")
              .parquet(s"$statePath/sigs")
          }
          fs.create(marker, true).close()
        }
        ()
      }
      .start()

  /** Micro-batch ingest into a SAVED IVF index — the streaming twin of
    * [[graft.ext.IvfIndex.append]], closing the one incremental
    * operator (r16 verdict #4) without a stream counterpart. Every
    * micro-batch is a delta shard appended at the index's FROZEN
    * centroids through the batch operator itself (same map-side cell
    * assignment, same float/int8 and label layout detection), so a
    * stream-appended index is row-for-row the batch append of the same
    * rows: append carries no cross-row or cross-batch state, and the
    * parquet append is file-additive inside the (label,) cell
    * directories. Filtered/quantized searches over the stream-fed
    * index therefore equal the batch-fed index's (StreamingSpec pins
    * both, plus the q281/q308 tiers' layout).
    *
    * Replay safety: on recovery foreachBatch RE-DELIVERS the in-flight
    * batch id, and a blind parquet append would duplicate its rows. A
    * marker file per committed batch, NAMESPACED by the streaming
    * query id (`_stream_commits/<queryId>/<batchId>` — the Delta
    * txn appId+version convention), written only after the append
    * lands, makes replayed batches no-ops. The query id is stable
    * across restarts from the same checkpoint (it lives in checkpoint
    * metadata) but FRESH for a new checkpoint, so a second query
    * appending to the same index restarts at batchId 0 WITHOUT
    * colliding with the first query's markers — batchId alone would
    * silently drop its first batches. The id is read from the
    * `sql.streaming.queryId` local property Spark sets on the stream
    * execution thread (the thread foreachBatch runs on). The remaining
    * window — a crash between append and marker — is the usual
    * at-least-once edge of a non-transactional sink, absorbed
    * downstream by [[graft.ext.IvfIndex.compact]] or an id-deduping
    * search tier (documented, not hidden).
    *
    * Scale shape: identical to the batch append — k-sized centroid
    * matrix as a plan literal, ONE map-side scan of each delta, no
    * shuffle; durable state is one empty marker file per batch. */
  def annAppendStream(delta: DataFrame, indexPath: String,
                      idCol: String, vecCol: String,
                      labelCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    delta.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val queryId = Option(spark.sparkContext
          .getLocalProperty("sql.streaming.queryId")).getOrElse("default")
        val marker = new org.apache.hadoop.fs.Path(
          s"$indexPath/_stream_commits/$queryId/$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          graft.ext.IvfIndex.append(spark, indexPath, batch.toDF(),
            idCol, vecCol, labelCol)
          fs.create(marker, true).close()
        }
        ()
      }
      .start()

  /** STREAMING CALIBRATION MONITOR — the live form of the q367
    * reliability census: the same per-document stage (hashed-feature
    * score, gate truth, the SHARED [[graft.ext.Calibration.ConfPpm]]
    * confidence link — all stateless projections, so the batch plan
    * runs unchanged on the stream) feeding a running groupBy(bin)
    * census in Complete mode. After any prefix of the stream the
    * emitted census equals the batch census over exactly the
    * documents ingested so far (StreamingSpec pins census-after-all-
    * batches ≡ batch, plus a mid-stream prefix check) — the shape a
    * serving stack uses to watch its quality filter's honesty drift
    * as the crawl mix shifts, without re-scanning the corpus.
    *
    * State is 10 bin keys × three BIGINT counters — constant forever,
    * no watermark needed: the census is a true running aggregate, not
    * a windowed one (add a time window upstream for a sliding view).
    * Downstream ECE/isotonic repair are bins-sized arithmetic on the
    * emitted rows ([[graft.ext.Calibration.isotonicFitPpm]] applies
    * to the census frame as-is). */
  def calibrationCensusStream(docs: DataFrame,
                              textCol: String = "text"): DataFrame =
    graft.ext.Calibration.confidenceCensus(docs, textCol)

  /** STREAMING DRIFT MONITOR — the live form of q377's linear-time
    * MMD (Gretton et al. JMLR'12 §6; r19 verdict item 3): the
    * consecutive-pair h-terms are independent, so the statistic is an
    * incremental mean — exactly a micro-batch shape. Consumes PAIRED
    * samples (xa, ya, xb, yb lattice arrays: pair member 2j and 2j+1
    * of the reference/candidate streams — pairing is an ingest-time
    * property, e.g. round-robin at the collector, matching the batch
    * query's denseIndex pairing) and emits the running
    * (n_pairs, sum_h_nano, mmd2_nano) census in Complete mode.
    *
    * The h-term projection is stateless and the census is a GLOBAL
    * running aggregate, so the batch plan ([[graft.ext.Drift
    * .linearMmdCensus]] — the calibrationCensusStream convention)
    * runs unchanged on the stream: state is three BIGINTs, constant
    * forever, no watermark, and after any prefix the emitted row
    * equals the batch census over exactly the pairs ingested so far
    * (StreamingSpec pins every prefix). A drift alarm is a threshold
    * on mmd2_nano downstream; add a time window upstream for a
    * sliding rather than running view. */
  def mmdDriftStream(paired: DataFrame): DataFrame =
    graft.ext.Drift.linearMmdCensus(paired)
}
