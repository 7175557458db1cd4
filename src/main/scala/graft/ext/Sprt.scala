package graft.ext

/** Wald's sequential probability ratio test (Wald 1945) — shared-text
  * constants for the LLR lattice walk over exact success/failure
  * counts: H0 p=0.85 vs H1 p=0.95 Bernoulli, alpha = beta = 0.05, so
  * the acceptance boundaries are +-ln((1-beta)/alpha) = +-ln(19)
  * exactly. A success contributes ln(0.95/0.85), a failure
  * ln(0.05/0.15); the LLR after (s, f) outcomes is a pure function of
  * the integer lattice point, so the sequential test needs no
  * sequential kernel — two window cumsums and this gate.
  *
  * ONE generator for every use site (decision gate and the nano
  * report share the term text modulo column names), interpolated into
  * both engines. */
object Sprt {
  def llrText(s: String, f: String): String =
    s"(CAST($s AS DOUBLE) * ln(CAST(0.95 AS DOUBLE) / " +
      s"CAST(0.85 AS DOUBLE)) + CAST($f AS DOUBLE) * " +
      s"ln(CAST(0.05 AS DOUBLE) / CAST(0.15 AS DOUBLE)))"

  /** 1 = accept H1, -1 = accept H0, 0 = keep sampling; over columns
    * s (successes) and f (failures). */
  val Decision: String =
    s"CAST(CASE WHEN ${llrText("s", "f")} >= ln(CAST(19 AS DOUBLE)) " +
      s"THEN 1 WHEN ${llrText("s", "f")} <= -ln(CAST(19 AS DOUBLE)) " +
      "THEN -1 ELSE 0 END AS BIGINT)"

  /** Floored nano-nat LLR over columns n_succ / n_fail. */
  val LlrNano: String =
    s"CAST(floor(1000000000.0 * ${llrText("n_succ", "n_fail")}) AS BIGINT)"
}
