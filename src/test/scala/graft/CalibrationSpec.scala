package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins graft.ext.Calibration.isotonicFitPpm — the closed-form
  * (minimax) weighted isotonic fit — against a rational-arithmetic
  * pool-adjacent-violators reference: the operator's contract is
  * iso_ppm == floor(PAV * 1e6) bin for bin (floor commutes with
  * max/min over attained values), plus monotonicity by construction.
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference PAV in exact rationals: pools (n, p) blocks left to
    * right while a left block's rate exceeds its right neighbour's;
    * returns floor(rate * 1e6) per input position. */
  private def pavPpm(bins: Seq[(Long, Long)]): Seq[Long] = {
    // block = (sum n, sum p, member count); rates compared as cross
    // products so the arithmetic stays exact.
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(BigInt, BigInt, Int)]
    for ((n, p) <- bins) {
      blocks += ((BigInt(n), BigInt(p), 1))
      while (blocks.length >= 2 && {
        val (n2, p2, _) = blocks(blocks.length - 2)
        val (n1, p1, _) = blocks.last
        p2 * n1 > p1 * n2 // prev rate > curr rate: violator
      }) {
        val (n1, p1, c1) = blocks.remove(blocks.length - 1)
        val (n2, p2, c2) = blocks.remove(blocks.length - 1)
        blocks += ((n1 + n2, p1 + p2, c1 + c2))
      }
    }
    blocks.toSeq.flatMap { case (n, p, c) =>
      Seq.fill(c)(((p * 1000000) / n).toLong)
    }
  }

  private def fit(bins: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    val df = bins.toDF("bin", "n_docs", "n_pass")
    graft.ext.Calibration.isotonicFitPpm(df, "bin", "n_docs", "n_pass")
      .orderBy("bin")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
  }

  test("isotonic fit == floor(PAV) on hand cases (pooling, plateau, already-monotone)") {
    val cases = Seq(
      // one violator pooled: rates 0.8, 0.2, 0.5 with weights 10/10/20
      Seq((0L, 10L, 8L), (1L, 10L, 2L), (2L, 20L, 10L)),
      // already monotone: fit is the input rates
      Seq((0L, 5L, 0L), (1L, 5L, 2L), (2L, 5L, 4L), (3L, 5L, 5L)),
      // global violator: everything pools to one plateau
      Seq((0L, 1L, 1L), (1L, 1L, 0L)),
      // sparse bin ids (gaps) and heavy-weight tail pulling down
      Seq((0L, 2L, 1L), (3L, 1L, 1L), (7L, 100L, 10L), (9L, 1L, 1L)),
    )
    for (c <- cases) {
      val expected = c.map(_._1).zip(pavPpm(c.map(t => (t._2, t._3))))
      assert(fit(c) == expected, s"case $c")
    }
    graft.ops.Staging.releaseAll()
  }

  test("isotonic fit == floor(PAV) on seeded random censuses; output monotone") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val k = 2 + rnd.nextInt(9)
      val bins = (0 until k).map { i =>
        val n = 1L + rnd.nextInt(50)
        (i.toLong, n, (rnd.nextDouble() * (n + 1)).toLong.min(n))
      }
      val got = fit(bins)
      val expected = bins.map(_._1).zip(pavPpm(bins.map(t => (t._2, t._3))))
      assert(got == expected, s"bins $bins")
      assert(got.map(_._2) == got.map(_._2).sorted, s"not monotone: $got")
    }
    graft.ops.Staging.releaseAll()
  }
}
