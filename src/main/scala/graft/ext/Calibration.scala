package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Monotone (isotonic) recalibration of a binned reliability census —
  * the PAV fit (Zadrozny & Elkan KDD'02; Robertson/Wright/Dykstra
  * 1988) computed CLOSED-FORM via the minimax characterization
  *
  *   f(i) = max_{j<=i} min_{k>=i} weightedAvg(rate, bins j..k)
  *
  * so the fit needs no sequential pooling loop and no driver: three
  * broadcast joins over the (tiny, <= #bins-row) census frame. The
  * weighted interval average is the FLOORED-ppm integer
  * (sum(pass)*1e6) div sum(n); because floor is monotone and max/min
  * are attained at member values, max-min over floored averages equals
  * floor(max-min over exact averages) — i.e. the result is EXACTLY
  * floor(PAV * 1e6), bin for bin (CalibrationSpec pins this against a
  * rational-arithmetic PAV reference). Monotonicity is by
  * construction: f(i) maximizes over a set that only grows with i of
  * minima over sets that only shrink.
  *
  * Scale shape: callers bin FIRST (a map-side scan into a <= K-row
  * hash aggregate); this fit is then K^3 arithmetic on broadcast
  * frames — K is a calibration-bin count (10..100), never data-sized.
  */
object Calibration {

  /** The q367 confidence link in ppm — ONE shared text (both engines;
    * lives with the operator so the streaming twin and the oracle
    * interpolate the SAME string without touching the query objects'
    * eager init, the Agreement.KappaPpm convention): conf =
    * clamp(1/2 + margin/4) where margin/4 = score*500/n_subwords,
    * floored ONCE; all non-negative integer ops downstream, so Spark
    * `div` and DuckDB `//` agree. */
  val ConfPpm: String =
    "least(CAST(1000000 AS BIGINT), greatest(CAST(0 AS BIGINT), " +
      "CAST(500000 AS BIGINT) + CAST(floor(CAST(score AS DOUBLE) * " +
      "CAST(500 AS DOUBLE) / CAST(n_subwords AS DOUBLE)) AS BIGINT)))"

  /** Per-document confidence frame of the hashed-feature quality
    * classifier vs the repetition gate — (pass, conf_ppm) for every
    * tokenizable document. The ONE copy of the stage q367 (ECE), q373
    * (isotonic repair), q374 (Brier) and the streaming census monitor
    * all derive from (r19 review: three inline copies folded); all
    * projections are stateless, so the same plan runs on a batch
    * frame or a stream. */
  def confidencePerDoc(docs: DataFrame, textCol: String): DataFrame =
    confBase(docs, textCol, Nil)

  /** [[confidencePerDoc]] with id (and any other) columns carried —
    * the held-out evaluation (q379) joins split labels per document,
    * so the per-doc frame must keep its key. Same single-sourced
    * gate/score/link chain. */
  def confidencePerDocKeyed(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    confBase(docs, textCol, Seq(idCol))

  private def confBase(docs: DataFrame, textCol: String,
                       carry: Seq[String]): DataFrame = {
    // fail fast on a carry column colliding with the generated names
    // (r20 advice): a collision would silently produce ambiguous/
    // shadowed columns for downstream joins
    val generated = Set("n_subwords", "score", "pass", "conf_ppm")
    require(!carry.exists(generated),
      s"carry column collides with a generated name (${generated.mkString(", ")})")
    val toks = TextStats.subwordTokens(col(textCol))
    TextStats.withRepetitionStats(docs, textCol)
      .select(carry.map(col) ++ Seq(size(toks).as("n_subwords"),
        TextStats.hashedTokenScore(toks).as("score"),
        TextStats.repetitionGate.as("pass")): _*)
      .filter(col("n_subwords") > 0)
      .select(carry.map(col) ++
        Seq(col("pass"), expr(ConfPpm).as("conf_ppm")): _*)
  }

  /** The 10-bin reliability census over [[confidencePerDoc]]: per
    * confidence decile, doc count, pass count, mean confidence and
    * empirical pass rate in exact floored ppm. Map-side scan into a
    * 10-row hash aggregate; as a streaming aggregation its state is
    * 10 keys × three BIGINT counters, constant forever. */
  def confidenceCensus(docs: DataFrame, textCol: String): DataFrame =
    censusOfConfidence(confidencePerDoc(docs, textCol))

  /** The same 10-bin census over an already-computed (pass, conf_ppm)
    * frame — the held-out path bins train and test sides of ONE
    * per-doc frame, so the census body is single-sourced here. */
  def censusOfConfidence(perDoc: DataFrame): DataFrame =
    perDoc
      .select(col("pass"), col("conf_ppm"),
        expr("least(CAST(9 AS BIGINT), conf_ppm div 100000)").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
           sum("conf_ppm").as("sum_conf"),
           sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))
      .select(col("bin"), col("n_docs"), col("n_pass"),
        expr("sum_conf div n_docs").as("mean_conf_ppm"),
        expr("(n_pass * 1000000) div n_docs").as("acc_ppm"))

  /** Weighted isotonic fit of the per-bin pass rate onto the bin
    * order, in exact floored-ppm integers.
    *
    * @param bins    one row per bin: an orderable integer bin id, a
    *                positive count column, and a pass-count column
    * @param binCol  bin id column (any integral type; returned as-is)
    * @param nCol    per-bin row count (> 0 for every present bin)
    * @param passCol per-bin pass count (0 <= pass <= n)
    * @return one row per input bin: (binCol, iso_ppm) where iso_ppm is
    *         floor(PAV rate * 1e6), non-decreasing in binCol
    */
  def isotonicFitPpm(bins: DataFrame, binCol: String, nCol: String,
                     passCol: String): DataFrame = {
    val b = bins.select(col(binCol).cast("long").as("__bin"),
      col(nCol).cast("long").as("__n"), col(passCol).cast("long").as("__p"))
    // All intervals [j, k] of present bins with their floored weighted
    // average. The between-join is a BroadcastNestedLoopJoin over the
    // K-row frame — deliberate: K is bins, not rows.
    val iv = b.select(col("__bin").as("__jb"))
      .join(broadcast(b.select(col("__bin").as("__kb"))),
        col("__jb") <= col("__kb"))
      .join(broadcast(b), col("__bin").between(col("__jb"), col("__kb")))
      .groupBy("__jb", "__kb")
      .agg(expr("(sum(__p) * 1000000) div sum(__n)").as("__avg_ppm"))
    // f(i) = max over j<=i of (min over k>=i of avg(j, k)).
    b.select(col("__bin").as("__ib"))
      .join(broadcast(iv), col("__jb") <= col("__ib") &&
        col("__kb") >= col("__ib"))
      .groupBy(col("__ib"), col("__jb")).agg(min("__avg_ppm").as("__mn"))
      .groupBy("__ib").agg(max("__mn").as("iso_ppm"))
      .select(col("__ib").as(binCol), col("iso_ppm"))
  }
}
