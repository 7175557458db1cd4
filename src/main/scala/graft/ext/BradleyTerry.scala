package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley-Terry strengths from a pairwise win/loss matrix (Bradley &
  * Terry 1952), fit by the MM iteration of Hunter (Annals of
  * Statistics 2004): p_i <- w_i / sum_j m_ij / (p_i + p_j) — the
  * preference-model fit under RLHF reward data, LLM-judge arena
  * ratings, and ranker calibration.
  *
  * Everything downstream of the caller's duel aggregation is
  * NODE-sized: wins w_i, symmetric duel counts m_ij, and a fixed
  * budget of MM steps on broadcast frames (a DEFINED statistic, the
  * pinned-sweep rule). Every term floors to integer nanos before its
  * sum (the cross-cell rule), so an oracle replays bit for bit.
  * Zero-win nodes fix at 0 (the BT MLE boundary); a duel pair where
  * BOTH strengths floor to 0 is possible once duels-per-win exceeds
  * ~2e9 (floor(w*1e18/den) zeroes a node that HAS wins), so the
  * denominator term carries an explicit pa+pb=0 guard — the term
  * contributes 0 in both engines instead of Spark-NULL vs DuckDB-Inf —
  * and the update guards den=0 in turn (every opponent zeroed would
  * otherwise relocate the same divide one step downstream; such a
  * node's strength fixes at 0, the MLE boundary).
  * Per-step frames are localCheckpoint()ed: each is read twice
  * by the next step (the p_i and p_j sides), and without the lineage
  * cut t-deep nesting re-embeds the caller's duel plan 2^t times.
  *
  * Scale valve: the nano denominator term m*1e18/(p_i+p_j) sums in
  * BIGINT, which holds duel counts to ~1e9 at unit-scale strengths;
  * beyond that the accumulator flips to DECIMAL(38,0), the plan
  * unchanged.
  */
object BradleyTerry {

  /** ONE string per term (shared with any SQL replay): MM denominator
    * term, strength update, ppm share. 1e18 = the nano*nano/nano
    * rescale; parses as DOUBLE in both engines. */
  val DenomTermNano: String =
    "CASE WHEN pa + pb = 0 THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(floor(CAST(m AS DOUBLE) * 1e18 / CAST(pa + pb AS DOUBLE)) " +
      "AS BIGINT) END"
  val UpdateNano: String =
    "CASE WHEN den = 0 THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(floor(CAST(w AS DOUBLE) * 1e18 / CAST(den AS DOUBLE)) " +
      "AS BIGINT) END"
  val SharePpm: String =
    "CAST(floor(1000000.0 * CAST(p AS DOUBLE) / CAST(tot AS DOUBLE)) " +
      "AS BIGINT)"

  /** Fit strengths from aggregated duel outcomes `nwl` with columns
    * (win, lose, n): n duels won by `win` over `lose`. Returns
    * (na, w, duels, p): wins, total duels, and the nano strength
    * after `steps` MM iterations from the all-ones start. */
  def fit(nwl0: DataFrame, steps: Int = 3): DataFrame = {
    require(steps >= 1, "at least one MM step")
    val nwl = graft.ops.Staging.stageCheckpoint(
      nwl0.localCheckpoint(true))
    val pm = graft.ops.Staging.stageCheckpoint(
      nwl.select(col("win").as("na"), col("lose").as("nb"), col("n"))
        .unionByName(nwl.select(col("lose").as("na"),
          col("win").as("nb"), col("n")))
        .groupBy("na", "nb").agg(sum("n").as("m"))
        .localCheckpoint(true))
    val w = graft.ops.Staging.stageCheckpoint(
      pm.select("na").distinct()
        .join(nwl.groupBy("win").agg(sum("n").as("w"))
          .select(col("win").as("na"), col("w")), Seq("na"), "left")
        .select(col("na"), coalesce(col("w"), lit(0L)).as("w"))
        .localCheckpoint(true))
    val x0 = w.select(col("na"), lit(1000000000L).as("p"))
    def step(x0f: DataFrame): DataFrame = {
      val x = graft.ops.Staging.stageCheckpoint(x0f.localCheckpoint(true))
      val den = pm
        .join(broadcast(x.select(col("na"), col("p").as("pa"))), "na")
        .join(broadcast(x.select(col("na").as("nb"),
          col("p").as("pb"))), "nb")
        .groupBy("na").agg(sum(expr(DenomTermNano)).as("den"))
      w.join(broadcast(den), "na")
        .select(col("na"), expr(UpdateNano).as("p"))
    }
    val pLast = (1 to steps).foldLeft(x0)((x, _) => step(x))
    pLast.join(w, "na")
      .join(pm.groupBy("na").agg(sum("m").as("duels")), "na")
      .select("na", "w", "duels", "p")
  }
}
