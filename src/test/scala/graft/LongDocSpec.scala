package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Long-document stress pins — the defect class the sf0.1 corpus
  * cannot surface (its documents are small): an operator that
  * materializes O(len²) bytes for one document looks fine at test SF
  * and detonates on a real corpus. q251's retired explode+window
  * formulation was exactly that shape (~len/32 boundary rows × the
  * FULL text through one exchange ⇒ ~160 GB for this fixture); the
  * kernels exercised here must stay O(len) per document.
  *
  * Guards are (a) correctness on a multi-hundred-KB document and
  * (b) a wall-clock ceiling far above honest O(len) cost but far
  * below what quadratic materialization would need on this host —
  * loose enough for the documented 3-30× host noise.
  */
class LongDocSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ~420 KB document: random words with a fixed 60-token paragraph
  // planted 3× (so dup-span operators have real work), plus small
  // companion docs so per-doc aggregation paths see >1 group
  private lazy val fixture = {
    val rnd = new scala.util.Random(7)
    def word() = (0 until (3 + rnd.nextInt(8)))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val para = (0 until 60).map(_ => word()).mkString(" ")
    val body = new StringBuilder
    var tokens = 0
    while (body.length < 420000) {
      if (tokens % 15000 == 5000) { body.append(para).append(' ') ; tokens += 60 }
      body.append(word()).append(' ')
      tokens += 1
    }
    val long = body.toString.trim
    assert(long.length > 400000)
    Seq((1L, long), (2L, "small doc " + para), (3L, "tiny document here"))
      .toDF("doc_id", "text")
  }

  private def timed[T](opName: String, ceilingSec: Double)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < ceilingSec,
      s"$opName took $secs s on a 420 KB doc — O(len) cost should be " +
        s"far under $ceilingSec s even with host noise; suspect quadratic " +
        "materialization")
    r
  }

  test("contentDefinedChunks: O(len) on a 420 KB document, lossless rebuild") {
    val chunks = graft.ext.Chunking.contentDefinedChunks(
      fixture, "text", Seq("doc_id"))
    val (n, rebuiltOk) = timed("contentDefinedChunks", 90.0) {
      val rebuilt = chunks.groupBy("doc_id")
        .agg(concat_ws("",
          array_sort(collect_list(struct(col("chunk_ix"), col("chunk"))))
            .getField("chunk")).as("rebuilt"))
      val bad = fixture.join(rebuilt, "doc_id")
        .filter(col("text") =!= col("rebuilt")).count()
      (chunks.count(), bad == 0)
    }
    assert(rebuiltOk)
    // ~len/32 chunks for the long doc — quadratic shapes can't even
    // finish, but also pin the output is chunk-sized, not position-sized
    assert(n > 2000 && n < 50000, s"chunk count $n outside the 1/32 band")
  }

  test("withDupSpanStats: planted paragraph found, linear pass") {
    val out = timed("withDupSpanStats", 90.0) {
      graft.ext.TextStats.withDupSpanStats(fixture, "doc_id", "text")
        .select("doc_id", "n_positions", "n_dup_positions")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    graft.ops.Staging.releaseAll()
    val (nPos, nDup) = out(1L)
    assert(nPos > 40000, s"long doc should have >40k gram positions, got $nPos")
    // 3 planted copies × (60-token para ⇒ 41 full-width grams each),
    // plus the copy in doc 2 — every occurrence is a dup position
    assert(nDup >= 120, s"planted dup paragraph not detected (nDup=$nDup)")
  }

  test("cutDupSpans: repeated spans removed once, linear pass") {
    val out = timed("cutDupSpans", 90.0) {
      graft.ext.TextStats.cutDupSpans(fixture, "doc_id", "text")
        .select(col("doc_id"), col("n_cut_spans"), col("n_tokens_removed"),
          length(col("text_cut")).as("cutLen"), length(col("text")).as("len"))
        .collect()
        .map(r => r.getLong(0) -> (r.getAs[Number](1).longValue,
          r.getAs[Number](2).longValue, r.getInt(3), r.getInt(4))).toMap
    }
    graft.ops.Staging.releaseAll()
    // the long doc keeps the FIRST paragraph copy, cuts the later two
    val (spans, removed, cutLen, len) = out(1L)
    assert(spans >= 2, s"expected ≥2 cut spans in the long doc, got $spans")
    assert(removed >= 100 && removed < 1000,
      s"cut token count $removed outside the planted-paragraph band")
    assert(cutLen < len)
    // the tiny doc is untouched
    assert(out(3L)._2 === 0L)
  }

  test("cutBoilerplate: cross-document template cut EVERYWHERE, linear pass") {
    val out = timed("cutBoilerplate", 90.0) {
      graft.ext.TextStats.cutBoilerplate(fixture, "doc_id", "text")
        .select(col("doc_id"), col("n_cut_spans"), col("n_tokens_removed"),
          length(col("text_cut")).as("cutLen"), length(col("text")).as("len"))
        .collect()
        .map(r => r.getLong(0) -> (r.getAs[Number](1).longValue,
          r.getAs[Number](2).longValue, r.getInt(3), r.getInt(4))).toMap
    }
    graft.ops.Staging.releaseAll()
    // the paragraph lives in docs 1 AND 2 → cross-document template.
    // Unlike cutDupSpans there is NO surviving first copy: all three
    // copies in the long doc are cut (3 spans, ~3×(60+7) tokens with
    // k=8 edge overhang), and doc 2 loses its copy too.
    val (spans, removed, cutLen, len) = out(1L)
    assert(spans >= 3, s"expected ≥3 cut spans in the long doc, got $spans")
    assert(removed >= 180 && removed < 1500,
      s"cut token count $removed outside the 3-planted-copies band")
    assert(cutLen < len)
    assert(out(2L)._2 >= 60L, "doc 2's template copy must be cut as well")
    // the tiny doc shares no 8-gram with anything — untouched
    assert(out(3L)._2 === 0L)
    // sanity vs cutDupSpans: dedup keeps one copy, boilerplate keeps none
    val dedupRemoved = graft.ext.TextStats.cutDupSpans(
        fixture, "doc_id", "text", k = 8)
      .filter(col("doc_id") === 1L)
      .select("n_tokens_removed").collect().head.getAs[Number](0).longValue
    graft.ops.Staging.releaseAll()
    assert(removed > dedupRemoved,
      s"boilerplate cut ($removed) must exceed dedup cut ($dedupRemoved) — no first-copy survivor")
  }
}
