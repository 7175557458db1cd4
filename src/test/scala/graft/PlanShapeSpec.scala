package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural plan pins for the round-13 second-arc queries — the
  * scale-regression guards behind their scaladoc claims. Wall-clock
  * is 3-30× noisy on this host (see CLAUDE.md), so these assert the
  * OBSERVABLES that matter at 100 TB instead: no cartesian products,
  * bounded exchange counts, predicates evaluated at the scan.
  * Assertions are deliberately loose (≤ N exchanges, substring
  * presence) so Catalyst version drift doesn't false-alarm.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    graft.ops.Staging.releaseAll()
    p
  }

  private def exchanges(p: String): Int =
    p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))

  test("q239 hilbert range scan: predicate at the scan, no join, ≤3 exchanges") {
    val p = plan("q239_hilbert_range_scan")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Join"))
    // the range clauses + box residual fold into the scan's filter
    assert(p.contains("hilbert_key"))
    assert(exchanges(p) <= 3, p.linesIterator.filter(_.contains("Exchange"))
      .mkString("\n"))
  }

  test("q245 image dhash: banded equi-join, never all-pairs") {
    val p = plan("q245_image_dhash")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the self-join keys on the (band, value) columns
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("q249 sorted neighborhood: bucket equi-join, no global window") {
    val p = plan("q249_sorted_neighborhood")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // denseIndex range-partitions; no single-partition window over
    // the name set (the scale hazard sorted-neighborhood usually has)
    assert(!p.contains("Window [") ||
      !p.contains("SinglePartition, ENSURE_REQUIREMENTS"))
  }

  test("q251 cdc chunking: kernel cut — no window, no explode, no joins") {
    val p = plan("q251_cdc_chunking")
    assert(!p.contains("Join"))
    // the r13 weak flag: a per-position Generate + boundary Window
    // carried the full document text through the window exchange
    // (quadratic in doc length). The mapPartitions kernel must keep
    // both operators out of the plan — text never crosses an
    // exchange at all (first shuffle key is (source, md5(chunk))).
    assert(!p.contains("Window"), "boundary window reappeared")
    assert(!p.contains("Generate"), "per-position explode reappeared")
    assert(p.contains("MapPartitions"))
    assert(exchanges(p) <= 4)
  }

  test("q253 AMS: the 64x estimator explode runs over the vocabulary frame, not the corpus scan") {
    val df = SparkEntry.queries("q253_ams_f2")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    graft.ops.Staging.releaseAll()
    // the Generate(explode) must consume the staged frequency table
    // (InMemoryTableScan below it), never the raw parquet scan — at
    // 100 TB a corpus-side explode would 64x the scan
    val lines = p.linesIterator.toSeq
    val genIdx = lines.indexWhere(_.contains("Generate"))
    assert(genIdx >= 0, "expected an explode for the estimator fan-out")
    val below = lines.drop(genIdx)
    val cacheIdx = below.indexWhere(_.contains("InMemoryTableScan"))
    val scanIdx = below.indexWhere(_.contains("FileScan"))
    assert(cacheIdx >= 0 && (scanIdx < 0 || cacheIdx < scanIdx),
      "explode must sit on the vocabulary-sized frequency frame")
  }

  test("q260 histogram equalization: map-side codec chain, no join, no mid-plan shuffle") {
    val p = plan("q260_hist_equalization")
    assert(!p.contains("Join"))
    // decode -> histogram -> remap all happen in the MapPartitions
    // kernel; the only exchange is the final presentation sort
    assert(p.contains("MapPartitions"))
    assert(exchanges(p) <= 1, p.linesIterator.filter(_.contains("Exchange"))
      .mkString("\n"))
  }

  test("q261 path trigrams: one user_id exchange + TakeOrdered, no corpus-wide sort") {
    val p = plan("q261_path_trigrams")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Join"))
    assert(exchanges(p) <= 3)
  }

  test("q277 assortativity: staged degree frame, no cartesian, bounded exchanges") {
    val df = SparkEntry.queries("q277_degree_assortativity")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    graft.ops.Staging.releaseAll()
    // the (deg_u, deg_v) pair build must be two equi-joins against
    // the STAGED degree frame — an unstaged form recomputes the
    // edge distinct + degree aggregate per join side; a cartesian
    // or nested-loop form over the PAIR frames is corpus² at 100 TB.
    // (The one BroadcastNestedLoopJoin Cross is the 1-row moment ×
    // 1-row stats assembly — constant-size by construction.)
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      "only the 1-row moment × stats cross may nested-loop")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "edge-degree joins must be equi-joins")
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
      "sym + deg (twice) must read the staged frames")
    // no exchange COUNT pin here: the staged frames' one-time build
    // plans print inside the InMemoryRelation sections, so a string
    // count would tally them per consumer — the per-read cost the
    // staging already eliminated
  }

  test("q278 alert cooldown: mapPartitions kernel — no window, no per-user collect") {
    val p = plan("q278_alert_cooldown")
    // the gate compares against the last EMITTED time: lag() re-arms
    // on every suppressed row (wrong), and a collect_list buffers a
    // user's whole history on one row (OOM at 100 TB) — the kernel is
    // the secondary-sorted per-partition scan, so neither node may
    // appear
    assert(!p.contains("Window"), "cooldown regressed to a window")
    assert(!p.contains("collect_list"), "cooldown regressed to per-key collect")
    assert(p.contains("MapPartitions"))
    assert(!p.contains("CartesianProduct"))
    assert(exchanges(p) <= 3, p.linesIterator.filter(_.contains("Exchange"))
      .mkString("\n"))
  }

  test("q297 Theil–Sen: broadcast pair expansion, sort+rank median — never percentile()") {
    val df = SparkEntry.queries("q297_theil_sen")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    graft.ops.Staging.releaseAll()
    // the median must be the distributed sort + rank pick: exact
    // percentile() buffers every distinct slope in a boxed hash map
    // and sorts single-threaded at eval (measured 9.5 s over 2.9M
    // slopes at sf0.1 vs ~1 s for this shape)
    assert(!p.contains("percentile("), "median regressed to percentile()")
    // no partitioned cartesian anywhere in the visible plan (the
    // broadcast pair expansion itself executes inside the rank
    // frame's RDD-backed denseIndex build, behind Scan ExistingRDD —
    // not printable from here, so only the negative is pinnable)
    assert(!p.contains("CartesianProduct"))
  }

  test("q287 capped sessions: mapPartitions kernel — no window, no per-user collect") {
    val p = plan("q287_capped_sessions")
    // the span cap compares against the running session START — a
    // recurrence lag() cannot express; a collect_list buffers a
    // user's whole history on one row. The kernel is the
    // secondary-sorted per-partition scan; neither node may appear.
    assert(!p.contains("Window"), "sessionizer regressed to a window")
    assert(!p.contains("collect_list"),
      "sessionizer regressed to per-key collect")
    assert(p.contains("MapPartitions"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q280 interval coverage: one customer window, no per-key collect, top-k sort") {
    val p = plan("q280_interval_coverage")
    // the interval-union merge is a prefix-max window over the
    // customer exchange — NEVER a per-key collect_list of a
    // customer's intervals (unbounded row at 100 TB)
    assert(!p.contains("collect_list"))
    assert(!p.contains("Generate"))
    assert(p.contains("Window"), "prefix-max merge must ride a window")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be TakeOrdered, not a global sort")
    assert(exchanges(p) <= 5, p.linesIterator.filter(_.contains("Exchange"))
      .mkString("\n"))
  }

  test("q352 dbscan: grid equi-joins only — never all-pairs") {
    val p = plan("q352_dbscan_grid")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // candidates come from cell-key equi-joins
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("q353 pca power: checkpointed iterates, broadcast renorm, no cartesian") {
    val p = plan("q353_pca_power")
    assert(!p.contains("CartesianProduct"))
    // r21: every per-step d-row iterate is an EAGER localCheckpoint
    // (the BradleyTerry.fit discipline — measured 77→25 scheduler
    // jobs / 1441→211 tasks at sf0.1: lazy iterates re-ran their
    // chain once per consumer, and a lazy persist still let the
    // terminal action's concurrent broadcast futures race to fill the
    // caches). The terminal plan therefore roots at a checkpoint scan
    // (ExistingRDD), with only the 1-row max-abs renorm broadcast on
    // top — the Gram cache and matvec broadcasts live in the already-
    // materialized steps, not in this plan.
    assert(p.contains("ExistingRDD"), p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("BroadcastExchange"))
  }

  test("q363 burrows delta: staged counts, equi-join pair frame, no cartesian") {
    val p = plan("q363_burrows_delta")
    assert(!p.contains("CartesianProduct"))
    // the (source, word) counts and the ppm grid are persisted; the
    // pair frame joins on the word key (equi), never all-pairs
    assert(p.contains("InMemoryRelation") || p.contains("InMemoryTableScan"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
    // r19: the top-20 vocabulary cut rides TakeOrderedAndProject, not
    // a single-partition row_number window over the vocabulary frame
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q365 capped approx-LCS: the occupancy cut broadcasts the DROP set") {
    val p = plan("q365_approx_lcs_capped")
    assert(!p.contains("CartesianProduct"))
    // the r18-verdict fix under pin: the broadcast feeds a LeftAnti
    // join (remove hot hashes), and the broadcast side is filtered to
    // __nd > cap — the SMALL hot set. A keep-side broadcast would
    // show an inner join on a <= filter instead.
    assert(p.contains("LeftAnti"), "hot-hash removal must be an anti join")
    assert(p.linesIterator.exists(l => l.contains("__nd") && l.contains("> 2")),
      "broadcast side must be the __nd > cap DROP set:\n" + p)
    assert(!p.linesIterator.exists(l => l.contains("__nd") && l.contains("<= 2")),
      "no keep-side (__nd <= cap) filter may feed the join:\n" + p)
  }

  test("q364 qini: deciles ride denseIndex, no single-partition window over users") {
    val p = plan("q364_qini_uplift")
    assert(!p.contains("CartesianProduct"))
    // the user frame must NOT pass through a SinglePartition window
    // (denseIndex = range sort + zipWithIndex); the only global
    // window is over the 10-row decile frame, which plans AFTER the
    // decile aggregate
    val winIdx = p.linesIterator.zipWithIndex
      .filter(_._1.contains("Window")).map(_._2).toSeq
    val aggIdx = p.linesIterator.zipWithIndex
      .filter(_._1.contains("HashAggregate")).map(_._2).toSeq
    assert(winIdx.nonEmpty && aggIdx.nonEmpty &&
      winIdx.forall(w => aggIdx.exists(_ > w)),
      "the cumulative window must sit above a decile aggregate, not the user frame")
  }

  test("q379 held-out calibration: staged per-doc frame, broadcast-only joins past the pair stage") {
    val p = plan("q379_heldout_calibration")
    // the only nested-loop joins allowed are the bins-sized PAV
    // interval/minimax joins and the step-extension (≤ 10-row
    // broadcast frames) — every data-sized join (split labels,
    // per-doc census) must be an equi-join; never a cartesian
    assert(!p.contains("CartesianProduct"))
    // split labels and the confidence frame join on the doc key
    assert(p.contains("InMemoryRelation") || p.contains("InMemoryTableScan"))
    // train-fit map reaches test bins via broadcast, not a shuffle
    assert(p.contains("BroadcastExchange"))
  }

  test("q247 covisitation: the distinct frame is staged (one InMemory scan per side)") {
    val df = SparkEntry.queries("q247_covisitation")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // both join inputs read the persisted distinct frame, not two
    // independent parquet scans + distincts
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2)
    assert(!p.contains("CartesianProduct"))
    graft.ops.Staging.releaseAll()
  }
}
