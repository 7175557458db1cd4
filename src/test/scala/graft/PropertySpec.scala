package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Kernels

/** Algebraic invariants of the operator kernels (SURVEY.md §5c),
  * checked over ScalaCheck-generated inputs: dedup returns exactly
  * one row per key (the max under the order); top-k is the sorted
  * prefix; pivot-unpivot round-trips; salted join equals plain join.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Int, Double)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(0L, 7L)
      t <- Gen.choose(0, 20)
      v <- Gen.choose(-100, 100).map(_.toDouble)
    } yield (k, t, v))

  /** Deterministic samples from a Gen (fixed seed per index). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(42L + i)))

  test("dedupKeepLast: exactly one row per key, the max under the order") {
    for (rows <- samples(rowsGen, 8) if rows.nonEmpty) {
      val df = rows.toDF("k", "t", "v")
      val out = Kernels.dedupKeepLast(df, Seq("k"), Seq(col("t"), col("v")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val expect = rows.groupBy(_._1).view.mapValues(_.maxBy(r => (r._2, r._3))).toMap
      assert(out.length == expect.size)
      out.foreach { r => assert(expect(r._1) == r) }
    }
  }

  test("topK equals the k-prefix of the full sort") {
    for ((rows, i) <- samples(rowsGen, 8).zipWithIndex if rows.nonEmpty) {
      val k = 1 + i
      val df = rows.toDF("k", "t", "v")
      val got = Kernels.topK(df, Seq(col("v").desc, col("t"), col("k")), k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val expect = rows.sortBy(r => (-r._3, r._2, r._1)).take(k)
      assert(got.toSeq == expect)
    }
  }

  private val cellsGen: Gen[List[(String, String, Double)]] =
    Gen.listOfN(30, for {
      id <- Gen.choose(0, 5).map("id" + _)
      p <- Gen.oneOf("x", "y", "z")
      v <- Gen.choose(1, 99).map(_.toDouble)
    } yield (id, p, v))

  test("pivotFirst then unpivot round-trips distinct cells") {
    for (rows <- samples(cellsGen, 8) if rows.nonEmpty) {
      val cells = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).max).toMap
      val df = cells.toSeq.map { case ((id, p), v) => (id, p, v) }.toDF("id", "p", "v")
      val wide = Kernels.pivotFirst(df, Seq("id"), "p", Seq("x", "y", "z"), "v")
      val back = Kernels.unpivot(wide, Seq("id"), Seq("x", "y", "z"), "p", "v")
        .filter(col("v").isNotNull)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(back == cells)
    }
  }

  test("skewSafeJoin is equivalent to the plain join for any salt count") {
    for ((rows, i) <- samples(rowsGen, 6).zipWithIndex if rows.nonEmpty) {
      val salt = 1 + (i % 8)
      val left = rows.toDF("k", "t", "v")
      val right = rows.map(r => (r._1, r._2 * 2)).distinct.toDF("k", "w")
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(norm(Kernels.skewSafeJoin(left, right, Seq("k"), salt)) ==
             norm(left.join(right, Seq("k"))))
    }
  }
}
