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
