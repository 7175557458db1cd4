package graft.ext

/** Inter-rater agreement statistics (Cohen 1960; the weighted form of
  * Cohen 1968) over a 3-level grade pair's INTEGER cell counts — the
  * agreement-beyond-chance audit of judge ensembles. Pure shared-text
  * constants (the floored-ppm contract): inputs are exact integer
  * cells/marginal products, the single float op is the final
  * division, and both engines interpolate the SAME string.
  *
  * Column contract: n (pairs), a (diagonal agreement), s = sum_i
  * r_i*c_i (chance-agreement numerator), dd = sum |i-j|*o_ij
  * (disagreement distance), e = sum |i-j|*r_i*c_j. NULL when the
  * chance denominator degenerates (all mass in one band). Products
  * stay exact in DOUBLE to ~1e7 pairs per group; the DECIMAL cast is
  * the valve beyond. */
object Agreement {
  val KappaPpm: String =
    "CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE) = CAST(s AS DOUBLE) " +
      "THEN CAST(NULL AS BIGINT) ELSE " +
      "CAST(floor(1000000.0 * (CAST(a AS DOUBLE) * CAST(n AS DOUBLE) - " +
      "CAST(s AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - " +
      "CAST(s AS DOUBLE))) AS BIGINT) END"
  val WkappaPpm: String =
    "CASE WHEN e = 0 THEN CAST(NULL AS BIGINT) ELSE " +
      "CAST(floor(1000000.0 * (CAST(1 AS DOUBLE) - CAST(n AS DOUBLE) * " +
      "CAST(dd AS DOUBLE) / CAST(e AS DOUBLE))) AS BIGINT) END"
}
