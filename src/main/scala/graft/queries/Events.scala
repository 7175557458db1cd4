package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{AsOf, Cdc}
import graft.ops.Kernels
import graft.tables.Tables

/** Event-table queries: JSON extraction, tumbling/sliding/session
  * windows (batch forms of the Structured Streaming shapes in
  * graft.streaming), and the as-of join. Timestamps are emitted as
  * formatted strings so the ns-vs-us parquet logical types of the two
  * engines cannot skew the driver's hash compare.
  */
object EventQueries {
  private type Q = (SparkSession, String) => DataFrame
  private[queries] val TsFmt = "yyyy-MM-dd HH:mm:ss"


  /** q256 CUPED shared expression text (the q218/q238 rule — one
    * string, used verbatim by both engines, so every IEEE op happens
    * in the identical order): naive treatment diff of the post-period
    * means, θ = pooled cov(x,y)/var(x), pre-period mean diff. All
    * inputs are exact BIGINT sums. */
  private[queries] val CupedNaive =
    "CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
      "CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
  private[queries] val CupedXDiff =
    "CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
      "CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
  private[queries] val CupedTheta =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"

  /** q257's per-cell MI contribution in nano-nats, pre-floor (q252's
    * floored-integer cross-cell rule; shared text): (c/N)·ln(cN/(rs))
    * · 1e9 from exact integer counts. */
  private[queries] val MiTermNano =
    "1000000000.0 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) / " +
      "(CAST(r AS DOUBLE) * CAST(s AS DOUBLE)))"

  /** q250's slope over exact rolling integer sums (q238's shared-
    * text rule): (7·Σxy − Σx·Σy) / (7·Σx² − (Σx)²). */
  private[queries] val RollingSlope =
    "CAST(7 * sxy - sx * sy AS DOUBLE) / CAST(7 * sxx - sx * sx AS DOUBLE)"

  /** Sample sd over the exact resample-rate integers (q238's shared-
    * text rule): sqrt((B·Σr² − (Σr)²) / (B·(B−1))). */
  private[queries] val BootSd =
    "sqrt((CAST(bn AS DOUBLE) * CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * " +
      "CAST(sr AS DOUBLE)) / (CAST(bn AS DOUBLE) * (CAST(bn AS DOUBLE) - 1.0)))"

  /** One PSI term (p−q)·ln(p/q) with Laplace(+1)-smoothed bin shares
    * — shared text (q218), derived only from exact integer counts. */
  private[queries] val PsiTerm =
    "((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)) - " +
      "(CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))) * " +
      "ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)) / " +
      "(CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE)))"

  /** Welch closed forms over the six exact sufficient statistics —
    * ONE source string each, used verbatim by the Spark selectExpr
    * AND interpolated into the DuckDB oracle, so both engines execute
    * the identical IEEE op sequence (the q218 shared-text contract).
    * V = s²/n expanded to (n·Σx² − (Σx)²) / (n·n·(n−1)). */
  private[queries] def welchV(n: String, q: String, sx: String): String =
    s"(CAST($n AS DOUBLE) * CAST($q AS DOUBLE) - CAST($sx AS DOUBLE) * " +
      s"CAST($sx AS DOUBLE)) / (CAST($n AS DOUBLE) * CAST($n AS DOUBLE) * " +
      s"(CAST($n AS DOUBLE) - 1.0))"
  private[queries] val WelchV1 = welchV("n1", "q1", "s1")
  private[queries] val WelchV2 = welchV("n2", "q2", "s2")
  private[queries] val WelchT =
    s"(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE) / " +
      s"CAST(n2 AS DOUBLE)) / sqrt($WelchV1 + $WelchV2)"
  private[queries] val WelchDof =
    s"($WelchV1 + $WelchV2) * ($WelchV1 + $WelchV2) / " +
      s"($WelchV1 * $WelchV1 / (CAST(n1 AS DOUBLE) - 1.0) + " +
      s"$WelchV2 * $WelchV2 / (CAST(n2 AS DOUBLE) - 1.0))"

  /** q237's oracle: the canonical Hilbert xy2d bit descent unrolled
    * as one chained CTE per bit level — pure BIGINT shifts/masks and
    * the reflect+swap as CASE, generated so each level provably
    * matches [[graft.functions.HilbertKernel.xy2d]]'s loop body.
    * The quadrant `(3·rx) xor ry` is emitted as the xor-free
    * polynomial `3·rx + ry − 2·rx·ry` (identical on {0,1}²), since
    * DuckDB spells bitwise xor differently from Spark. */
  private[queries] def hilbertOracleSql(bits: Int): String = {
    val n1 = (1L << bits) - 1L
    val sb = new StringBuilder
    sb.append("WITH e AS (\n")
    sb.append("  SELECT event_id, user_id % 2097152 AS x,\n")
    sb.append("    epoch_us(ts) // 86400000000 AS y,\n")
    sb.append("    CAST(0 AS BIGINT) AS hd\n  FROM events)")
    var prev = "e"
    for (k <- bits - 1 to 0 by -1) {
      val rx = s"((x >> $k) & 1)"
      val ry = s"((y >> $k) & 1)"
      val lv = s"lv$k"
      sb.append(s",\n$lv AS (\n  SELECT event_id,\n")
      sb.append(s"    CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN $n1 - y ELSE y END ELSE x END AS x,\n")
      sb.append(s"    CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN $n1 - x ELSE x END ELSE y END AS y,\n")
      sb.append(s"    hd + ${1L << (2 * k)} * (3 * $rx + $ry - 2 * $rx * $ry) AS hd\n")
      sb.append(s"  FROM $prev)")
      prev = lv
    }
    sb.append("\nSELECT e.event_id, e.x AS u, e.y AS d,\n")
    sb.append(s"  CAST(l.hd AS BIGINT) AS hkey\n")
    sb.append(s"FROM e JOIN $prev l ON l.event_id = e.event_id\n")
    sb.append("ORDER BY hkey, e.event_id LIMIT 50")
    sb.toString
  }

  /** q109's oracle: the 21-bit interleave as an explicit integer-
    * arithmetic sum (exact power-of-two literals, BIGINT throughout)
    * — generated so it provably matches [[graft.ops.Layout.zOrderKey]]
    * term for term. */
  private[queries] def zOrderOracleSql: String = {
    val terms = (0 until 21).map { i =>
      s"((u >> $i) & 1) * ${1L << (2 * i)} + ((d >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    "WITH e AS (\n" +
      "  SELECT event_id, user_id % 2097152 AS u,\n" +
      "    epoch_us(ts) // 86400000000 AS d\n" +
      "  FROM events)\n" +
      s"SELECT event_id, u, d, CAST($terms AS BIGINT) AS zkey\n" +
      "FROM e ORDER BY zkey, event_id LIMIT 50"
  }

  /** q139's oracle: the same 8 power-of-two-weighted lag terms in the
    * same left-associated order as the Spark expression (SQL `+` is
    * left-associative in both engines), built programmatically so the
    * two sides cannot drift term-wise. `value` is never NULL in
    * events, but the k=0 term keeps the same coalesce shape as the
    * lags so the expression trees stay structurally identical.
    */
  private[queries] def ewmaOracleSql: String = {
    def v(k: Int) = if (k == 0) "value" else s"lag(value, $k) OVER w"
    val num = (0 to 7)
      .map(k => s"coalesce(${v(k)} / ${1L << (k + 1)}, 0)")
      .mkString(" + ")
    val den = (0 to 7)
      .map { k =>
        val wt = java.math.BigDecimal.valueOf(math.pow(0.5, k + 1)).toPlainString
        s"(CASE WHEN ${v(k)} IS NOT NULL THEN $wt ELSE 0.0 END)"
      }
      .mkString(" + ")
    "SELECT event_id, user_id, value,\n" +
      s"  round(($num) / ($den), 6) AS ewma8\n" +
      "FROM events\n" +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)\n" +
      "ORDER BY event_id"
  }


  // Composition of the per-family objects (r16 split — entries are
  // byte-identical to the pre-split single map; the family files own
  // the query bodies, this object owns the helpers they share).
  val queries: Map[String, Q] =
    EventWindowsQueries.queries ++ EventTimeSeriesQueries.queries ++
      EventAsofCdcQueries.queries ++ EventStatsQueries.queries

  val oracles: Map[String, String] =
    EventWindowsQueries.oracles ++ EventTimeSeriesQueries.oracles ++
      EventAsofCdcQueries.oracles ++ EventStatsQueries.oracles
}
