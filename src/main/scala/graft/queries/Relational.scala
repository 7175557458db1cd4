package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Kernels
import graft.tables.Tables

/** Relational operator queries over the driver testdata, each paired
  * with a DuckDB oracle. Covers SURVEY.md §2.1-§2.7: scans, filters,
  * joins, aggregations, dedup-keep-last, pivot/unpivot, windows,
  * top-k, set ops.
  *
  * Determinism contract: every query ends in a total ORDER BY, and
  * every floating-point aggregate is rounded identically on both the
  * Spark and oracle side (sum->2dp, ratios/avgs->6dp) so driver
  * hash-comparison is stable across engines and runs.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  /** q293's WOE log term — one ln over an exact integer ratio (the
    * q257 discipline), SHARED text. Explicit DOUBLE casts, never
    * `* 1.0`: Spark parses the 1.0 literal as DECIMAL, and the
    * decimal÷decimal result at precision 38 clamps to scale 6 —
    * a 1e-6 quantization DuckDB (whose decimal division returns
    * DOUBLE) does not apply, measured as ~1e-7 ln divergence. */
  private[queries] val WoeLn =
    "ln((CAST(n_good AS DOUBLE) * CAST(tb AS DOUBLE)) / " +
      "(CAST(n_bad AS DOUBLE) * CAST(tg AS DOUBLE)))"

  /** q293's distribution-share gap (good% − bad%), SHARED text, same
    * explicit-DOUBLE rule as [[WoeLn]]. */
  private[queries] val WoeShare =
    "CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE) - " +
      "CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)"

  /** q295's 7-day sample standard deviation from exact window moments
    * (n7 = 7 by the filter, s7 long, ss7 decimal) — SHARED text. */
  private[queries] val VolText =
    "sqrt((7.0 * CAST(ss7 AS DOUBLE) - " +
      "CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE)) / (7.0 * 6.0))"

  /** q302's varying-limit p-chart bounds (p̄ ± 3·√(p̄(1−p̄)/n)) from
    * exact integer totals — SHARED text, explicit DOUBLE casts (the
    * q293 decimal-literal rule). */
  private[queries] val PchartP = "CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)"
  private[queries] val PchartUcl =
    s"($PchartP + 3.0 * sqrt($PchartP * (1.0 - $PchartP) / CAST(n AS DOUBLE)))"
  private[queries] val PchartLcl =
    s"($PchartP - 3.0 * sqrt($PchartP * (1.0 - $PchartP) / CAST(n AS DOUBLE)))"

  /** q288's Newman modularity closed form from exact integer moments
    * (W = within_edges `w`, m = n_edges, Σd² = sum_deg_sq) — SHARED
    * expression text (the q218/q238 rule); 4m² built by double
    * multiplication so no integer power overflows at any scale. */
  private[queries] val ModularityText =
    "CAST(w AS DOUBLE) / CAST(m AS DOUBLE) - " +
      "CAST(sum_deg_sq AS DOUBLE) / " +
      "(2.0 * CAST(m AS DOUBLE) * 2.0 * CAST(m AS DOUBLE))"

  /** q277's degree-assortativity Pearson r from the exact
    * decimal/HUGEINT moment sums — SHARED expression text (the
    * q218/q238 rule). */
  private[queries] val AssortText =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - " +
      "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"

  /** q218's closed-form 3×3 normal-equation solve (Cramer), emitted
    * as ONE expression text shared VERBATIM by the Spark selectExpr
    * and the DuckDB oracle — textual identity is what makes every
    * IEEE operation order match, so the 6dp-rounded betas hash. The
    * inputs are the exact integer sufficient statistics
    * (n, Σx, Σxx, Σxy, Σyy) — decimal(38,0) on the Spark side,
    * HUGEINT in the oracle — cast to double once. */
  private[queries] def olsSelect: Seq[String] = {
    def D(c: String) = s"CAST($c AS DOUBLE)"
    val (a11, a12, a13) = (D("n"), D("s1"), D("s2"))
    val (a22, a23, a33) = (D("s11"), D("s12"), D("s22"))
    val (b1, b2, b3) = (D("sy"), D("s1y"), D("s2y"))
    val det = s"($a11 * ($a22 * $a33 - $a23 * $a23) - " +
      s"$a12 * ($a12 * $a33 - $a23 * $a13) + " +
      s"$a13 * ($a12 * $a23 - $a22 * $a13))"
    val beta0 = s"(($b1 * ($a22 * $a33 - $a23 * $a23) - " +
      s"$a12 * ($b2 * $a33 - $a23 * $b3) + " +
      s"$a13 * ($b2 * $a23 - $a22 * $b3)) / $det)"
    val beta1 = s"(($a11 * ($b2 * $a33 - $a23 * $b3) - " +
      s"$b1 * ($a12 * $a33 - $a23 * $a13) + " +
      s"$a13 * ($a12 * $b3 - $b2 * $a13)) / $det)"
    val beta2 = s"(($a11 * ($a22 * $b3 - $b2 * $a23) - " +
      s"$a12 * ($a12 * $b3 - $b2 * $a13) + " +
      s"$b1 * ($a12 * $a23 - $a22 * $a13)) / $det)"
    val sse = s"(${D("syy")} - ($b1 * $beta0 + $b2 * $beta1 + $b3 * $beta2))"
    val sst = s"(${D("syy")} - $b1 * $b1 / $a11)"
    Seq(
      "CAST(n AS BIGINT) AS n_rows",
      s"round($beta0, 6) AS beta0",
      s"round($beta1, 6) AS beta1",
      s"round($beta2, 6) AS beta2",
      s"round(1.0 - $sse / $sst, 6) AS r2")
  }

  /** q154's oracle: per-table (count, order-independent key
    * checksum) selects generated from one template — the 13-hex-digit
    * md5 replay (q107's pattern) mod 1000003, summed. */
  private[queries] def manifestOracleSql: String = {
    def h(key: String) =
      "CAST(list_sum(list_transform(range(1, 14), " +
        "i -> CAST(strpos('0123456789abcdef', " +
        s"substring(md5($key), CAST(i AS INTEGER), 1)) - 1 AS DOUBLE) " +
        "* power(2.0, CAST(4 * (13 - i) AS DOUBLE)))) AS BIGINT) % 1000003"
    def sel(t: String, key: String) =
      s"SELECT '$t' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,\n" +
        s"  CAST(sum(${h(key)}) AS BIGINT) AS key_checksum FROM $t"
    Seq(
      "customer" -> "CAST(c_custkey AS VARCHAR)",
      "documents" -> "CAST(doc_id AS VARCHAR)",
      "embeddings" -> "CAST(vec_id AS VARCHAR)",
      "events" -> "CAST(event_id AS VARCHAR)",
      "lineitem" ->
        "(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))",
      "nation" -> "CAST(n_nationkey AS VARCHAR)",
      "orders" -> "CAST(o_orderkey AS VARCHAR)",
      "part" -> "CAST(p_partkey AS VARCHAR)",
      "region" -> "CAST(r_regionkey AS VARCHAR)",
      "supplier" -> "CAST(s_suppkey AS VARCHAR)",
    ).map { case (t, k) => sel(t, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }


  /** q314's per-customer Theil term in nano-nats, pre-floor — the
    * share x/mu written as the exact-integer ratio x*n/t, SHARED text
    * so both engines run the identical IEEE sequence. */
  private[queries] val TheilTermNano =
    "1000000000.0 * ((CAST(x AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(t AS DOUBLE)) * " +
      "ln((CAST(x AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(t AS DOUBLE))"

  /** q315's shared nano-log terms and slope: unit price = pc/cq from
    * exact centi-integers; logs floor to nano-units so the moment sums
    * are exact; the slope divides the exact moments once in double. */
  private[queries] val ElastLnP =
    "1000000000.0 * ln(CAST(pc AS DOUBLE) / CAST(cq AS DOUBLE))"
  private[queries] val ElastLnQ =
    "1000000000.0 * ln(CAST(cq AS DOUBLE))"
  private[queries] val ElastSlope =
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"

  // Composition of the per-family objects (r16 split — entries are
  // byte-identical to the pre-split single map; the family files own
  // the query bodies, this object owns the helpers they share).
  val queries: Map[String, Q] =
    RelationalCoreQueries.queries ++ RelationalTpchQueries.queries ++
      RelationalGraphsQueries.queries ++ RelationalAuditQueries.queries ++
      RelationalAnalyticsQueries.queries

  val oracles: Map[String, String] =
    RelationalCoreQueries.oracles ++ RelationalTpchQueries.oracles ++
      RelationalGraphsQueries.oracles ++ RelationalAuditQueries.oracles ++
      RelationalAnalyticsQueries.oracles
}
