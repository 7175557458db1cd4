package graft.ext

/** Empirical-Bayes beta-binomial shrinkage of per-group rates
  * (Robbins 1956; the Efron-Morris batting-average construction) —
  * the standard fix for small-group rate noise in curation
  * dashboards: a domain with 3 docs and a 100% keep rate should NOT
  * outrank one with 5,000 docs at 97%.
  *
  * Method of moments on the population of group rates: with
  * p_g ~ Beta(alpha, beta), E[p] = m1 and Var[p] =
  * m1(1-m1)/(alpha+beta+1), so the prior strength is
  * ab = m1(1-m1)/var - 1 and the shrunk rate is
  * (k_g + m1*ab) / (n_g + ab) — each group pulled toward the
  * population mean with force inversely proportional to its n.
  *
  * Order-free determinism: each group's rate (and squared rate)
  * floors to integer nanos BEFORE the cross-group sums (the
  * cross-cell rule), so m1/m2 derive from integer aggregates
  * (sr, sr2, g) summed in a fixed-free order. Note the squared-rate
  * product r*r is computed in DOUBLE where r can reach 1e9, so the
  * product (up to 1e18) exceeds 2^53 and rounds — Rate2Nano is
  * DETERMINISTIC because both engines evaluate the identical shared
  * text on the identical r, not because the product is an exact
  * integer; the only float ops are in these SHARED texts.
  * When the rate population is NOT overdispersed (var <= 0 or
  * ab <= 0) there is no beta prior to fit — the guard falls back to
  * the raw rate (and a NULL prior strength). */
object EmpiricalBayes {
  /** Per-group pre-aggregation terms (columns k, n). */
  val RateNano: String =
    "CAST(floor(1000000000.0 * CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) " +
      "AS BIGINT)"
  /** Squared rate in nanos from the already-floored rate (column r). */
  val Rate2Nano: String =
    "CAST(floor(CAST(r AS DOUBLE) * CAST(r AS DOUBLE) / 1000000000.0) " +
      "AS BIGINT)"

  private val M1 = "(CAST(sr AS DOUBLE) / CAST(g AS DOUBLE) / 1000000000.0)"
  private val M2 = "(CAST(sr2 AS DOUBLE) / CAST(g AS DOUBLE) / 1000000000.0)"
  private val VarT = s"($M2 - $M1 * $M1)"
  private val AbT =
    s"($M1 * (CAST(1 AS DOUBLE) - $M1) / $VarT - CAST(1 AS DOUBLE))"

  /** Prior strength alpha+beta in floored milli, NULL when the rate
    * population fits no beta prior; over columns (sr, sr2, g). */
  val AbMilli: String =
    s"CASE WHEN $VarT > CAST(0 AS DOUBLE) AND $AbT > CAST(0 AS DOUBLE) " +
      s"THEN CAST(floor(1000.0 * $AbT) AS BIGINT) " +
      "ELSE CAST(NULL AS BIGINT) END"

  /** Shrunk rate in floored ppm over columns (k, n, sr, sr2, g);
    * falls back to the raw rate when no prior fits. */
  val ShrunkPpm: String =
    s"CASE WHEN $VarT > CAST(0 AS DOUBLE) AND $AbT > CAST(0 AS DOUBLE) " +
      s"THEN CAST(floor(1000000.0 * (CAST(k AS DOUBLE) + $M1 * $AbT) / " +
      s"(CAST(n AS DOUBLE) + $AbT)) AS BIGINT) " +
      "ELSE CAST(floor(1000000.0 * CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) " +
      "AS BIGINT) END"
}
