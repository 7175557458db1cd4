package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space distribution drift via the LINEAR-TIME MMD
  * estimator (Gretton et al. JMLR'12 §6) — the shared core of the
  * q377 driver query and [[graft.streaming.Streams.mmdDriftStream]].
  * The quadratic MMD is unusable at corpus scale; the linear
  * estimator averages h = k(x,x') + k(y,y') - k(x,y') - k(x',y) over
  * DISJOINT sample pairs — one pass, no all-pairs, and (the streaming
  * point) the statistic is a running mean of independent per-pair
  * terms, so its state is three integers regardless of how much
  * stream has flowed.
  *
  * Determinism the lattice way (texts live with the operator — the
  * Calibration.ConfPpm / PcaPower convention — so the driver query,
  * the stream twin, and the DuckDB oracle interpolate the SAME
  * strings): components quantize to floor(x * 2^20) BIGINTs upstream,
  * squared L2 distances are exact BIGINTs, and the RBF kernel
  * exp(-d2/2^41) (sigma^2 = 1 on the unit-norm scale) is one shared
  * text over those exact integers, floored to nano.
  */
object Drift {

  /** The RBF kernel in floored nano over an exact-BIGINT squared
    * distance on the 2^20 component lattice: exp(-d2 / 2^41) ==
    * exp(-||u-v||^2 / 2) at the original scale. The only float op is
    * the exp over an exact integer argument (the q369 shared exp/ln
    * convention).
    *
    * LIBM ASSUMPTION (r19 advice): the floored nano relies on JVM
    * Math.exp and DuckDB libm agreeing to the last ulp;
    * LibmLatticeSpec probes every exp argument the test corpus
    * produces and asserts a > 4096-ulp distance from the floor
    * boundaries (d2 = 0 is the designed exception — exp(0) = 1
    * exactly in any compliant libm). */
  private[graft] def mmdKernNano(d2: String): String =
    s"CAST(floor(CAST(1000000000 AS DOUBLE) * exp(CAST(0 AS DOUBLE) - " +
      s"CAST($d2 AS DOUBLE) / CAST(2199023255552 AS DOUBLE))) AS BIGINT)"

  /** The mean with a SIGN-SPLIT integer division — Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, so a negative
    * estimate (the linear MMD is unbiased and can dip below 0) must
    * divide on the non-negative magnitude in both engines. */
  private[graft] def mmdMeanNano(idiv: String): String =
    "CASE WHEN n_pairs = 0 THEN CAST(NULL AS BIGINT) " +
      s"WHEN sum_h_nano >= 0 THEN sum_h_nano $idiv n_pairs " +
      s"ELSE CAST(0 AS BIGINT) - ((CAST(0 AS BIGINT) - sum_h_nano) " +
      s"$idiv n_pairs) END"

  /** Exact-BIGINT squared L2 between two lattice arrays (Spark text;
    * the oracle replays it as a list_transform sum). */
  private[graft] def d2Text(u: String, v: String): String =
    s"aggregate(zip_with($u, $v, (p, q) -> (p - q) * (p - q)), " +
      "CAST(0 AS BIGINT), (acc, e) -> acc + e)"

  /** The per-pair h term over a PAIRED frame carrying lattice arrays
    * (xa, ya) = pair member 2j and (xb, yb) = pair member 2j+1. */
  private[graft] def hNano: Column =
    expr(mmdKernNano(d2Text("xa", "xb"))) +
      expr(mmdKernNano(d2Text("ya", "yb"))) -
      expr(mmdKernNano(d2Text("xa", "yb"))) -
      expr(mmdKernNano(d2Text("xb", "ya")))

  /** The running linear-MMD census over a paired frame: one stateless
    * h-term projection per row, then a GLOBAL aggregate —
    * (n_pairs, sum_h_nano, mmd2_nano). On a batch frame this is
    * q377's statistic stage; on a stream it is a Complete-mode
    * aggregate whose state is three BIGINTs, constant forever, and
    * after any prefix the emitted row equals the batch census over
    * exactly the pairs ingested so far (StreamingSpec pins it).
    * BIGINT headroom: |h| <= 4e9 per pair bounds sum_h at ~2e9 pairs
    * (the q369 DECIMAL-valve note beyond). */
  def linearMmdCensus(paired: DataFrame): DataFrame =
    paired.select(hNano.as("h_nano"))
      .agg(count(lit(1)).as("n_pairs"),
           coalesce(sum("h_nano"), lit(0L)).as("sum_h_nano"))
      .select(col("n_pairs"), col("sum_h_nano"),
        expr(mmdMeanNano("div")).as("mmd2_nano"))
}
