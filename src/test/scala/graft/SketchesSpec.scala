package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estimate(values: Seq[String]): Double =
    Sketches.hllDistinct(
      values.map(v => ("g", v)).toDF("grp", "v"), "grp", "v")
      .head().getAs[Double]("hll_distinct")

  test("hllDistinct is insensitive to duplicates — the sketch property") {
    val distinct = (1 to 300).map(i => s"value_$i")
    val base = estimate(distinct)
    val withDups = estimate(distinct ++ distinct ++ distinct.take(50))
    assert(base == withDups) // identical registers, bit-identical estimate
  }

  test("hllDistinct tracks the true cardinality within HLL error") {
    // 256 registers -> ~1.04/sqrt(256) = 6.5% relative standard error;
    // assert a generous 3-sigma band
    for (n <- Seq(100, 1000)) {
      val est = estimate((1 to n).map(i => s"item_$i"))
      assert(math.abs(est - n) / n < 0.20, s"n=$n est=$est")
    }
  }

  test("hllDistinct: small groups fall in the linear-counting regime and stay close") {
    val est = estimate((1 to 10).map(i => s"x$i"))
    assert(math.abs(est - 10) < 2, s"est=$est")
  }

  test("hllDistinct validates p") {
    val df = Seq(("g", "v")).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(df, "grp", "v", p = 10) // not whole hex chars
    }
  }
}
