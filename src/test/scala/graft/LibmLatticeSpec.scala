package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r19 advice item: shared floor-lattice texts whose float chain
  * passes through a TRANSCENDENTAL (ln/exp) depend on the JVM and
  * DuckDB libm agreeing to the last ulp — division/multiplication
  * paths are IEEE-deterministic, but a libm result landing exactly on
  * a floor boundary could flip one integer unit between engines. This
  * spec turns that assumption into a checked property: for every
  * reachable (or every actually-occurring) transcendental argument,
  * the pre-floor value must sit THOUSANDS of ulps away from the
  * integer lattice, so any last-ulp-accurate libm floors identically.
  * A platform libm change that breaks last-ulp accuracy, or a new
  * argument drifting near a boundary, fails here in sbt test instead
  * of as a cross-SF hash flake.
  */
class LibmLatticeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ulpsToBoundary(v: Double): Double = {
    val d = math.min(v - math.floor(v), math.ceil(v) - v)
    d / math.ulp(v)
  }

  test("HbEstMilliText linear-counting branch: all 63 ln arguments far from the milli lattice") {
    // the ONLY enumerable transcendental in the suite: zeros in 1..63
    // (zeros = 0 takes the raw division branch; zeros = 64 means an
    // empty ball, unreachable — every node's own hash occupies one
    // register). Golden pins catch a libm CHANGE outright; the
    // distance property proves a one-ulp disagreement cannot flip the
    // floored milli.
    var sum = 0L
    for (z <- 1 to 63) {
      val v = 1000.0 * (64.0 * math.log(64.0 / z.toDouble))
      assert(ulpsToBoundary(v) > 4096.0,
        s"zeros=$z pre-floor milli $v sits near the integer lattice")
      sum += math.floor(v).toLong
    }
    // golden pins (this JVM's Math.log; fdlibm-compatible)
    def milli(z: Int): Long =
      math.floor(1000.0 * (64.0 * math.log(64.0 / z.toDouble))).toLong
    assert(milli(1) == 266168L && milli(2) == 221807L &&
      milli(17) == 84842L && milli(32) == 44361L && milli(63) == 1007L,
      "platform libm changed ln's last-ulp behavior — re-audit the " +
        "HbEstMilliText floor lattice before trusting cross-engine hashes")
    assert(sum == 3903991L)
  }

  test("MmdKernNano: every exp argument occurring at sf0.001 floors safely at nano") {
    // replicate q377's lattice chain in plain JVM arithmetic: the
    // quantization and d2 are exact integers, so the ONLY libm call
    // is the final exp — probe the actual arguments the test corpus
    // produces (plus the d2 = 0 identity, where exp(0) = 1 is exact
    // in any compliant libm and the floor is boundary-exact BY
    // DESIGN, both engines landing on 1e9).
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("label")),
        r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1048576.0).toLong)
    val xs = emb.filter(_._2 < 5).sortBy(_._1).map(t => quant(t._3))
    val ys = emb.filter(_._2 >= 5).sortBy(_._1).map(t => quant(t._3))
    val n = math.min(xs.length, ys.length)
    def d2(u: Array[Long], v: Array[Long]): Long =
      u.zip(v).map { case (p, q) => (p - q) * (p - q) }.sum
    val args = (0 until n / 2).flatMap { j =>
      val (xa, ya, xb, yb) = (xs(2 * j), ys(2 * j), xs(2 * j + 1), ys(2 * j + 1))
      Seq(d2(xa, xb), d2(ya, yb), d2(xa, yb), d2(xb, ya))
    }
    assert(args.nonEmpty)
    args.distinct.foreach { a =>
      if (a == 0L) {
        assert(1.0e9 * math.exp(0.0) == 1.0e9) // exact by IEEE
      } else {
        val v = 1.0e9 * math.exp(0.0 - a.toDouble / 2199023255552.0)
        assert(ulpsToBoundary(v) > 4096.0,
          s"d2=$a pre-floor nano $v sits near the integer lattice")
      }
    }
  }
}
