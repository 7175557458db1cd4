package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bytes8MaxKernel, GraftFunctions}

/** The packed-register kernel under HyperBall (r19 verdict item 1):
  * bytewise max over longs packing 8 unsigned bytes, each < 0x80.
  */
class Bytes8MaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(bytes: Array[Int]): Long =
    bytes.foldLeft(0L)((acc, b) => (acc << 8) | b.toLong)

  private def refMax(a: Long, b: Long): Long = {
    var r = 0L
    var k = 0
    while (k < 8) {
      val sh = (7 - k) * 8
      val ab = (a >>> sh) & 0xFF
      val bb = (b >>> sh) & 0xFF
      r = (r << 8) | math.max(ab, bb)
      k += 1
    }
    r
  }

  test("kernel == per-byte max on random sub-0x80 bytes (SWAR precondition)") {
    val rnd = new scala.util.Random(20)
    for (_ <- 1 to 2000) {
      val a = pack(Array.fill(8)(rnd.nextInt(128)))
      val b = pack(Array.fill(8)(rnd.nextInt(128)))
      assert(Bytes8MaxKernel.max(a, b) == refMax(a, b),
        s"a=$a b=$b")
    }
    // boundary bytes: 0 (identity), 45 (register max), 127 (SWAR cap)
    for (x <- Seq(0, 1, 45, 127); y <- Seq(0, 1, 45, 127)) {
      val a = pack(Array.fill(8)(x))
      val b = pack(Array.fill(8)(y))
      assert(Bytes8MaxKernel.max(a, b) == pack(Array.fill(8)(math.max(x, y))))
    }
    assert(Bytes8MaxKernel.max(0L, 0L) == 0L)
  }

  test("aggregate folds to the per-byte group max and stays on HashAggregate") {
    val rnd = new scala.util.Random(21)
    val rows = (1 to 400).map { i =>
      (i % 7, pack(Array.fill(8)(rnd.nextInt(46)))) }
    val df = rows.toDF("k", "g")
      .groupBy("k")
      .agg(GraftFunctions.bytes8MaxAgg(spark, col("g")).as("m"))
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).reduce(refMax) }
    assert(got == want)
    // the single mutable LongType buffer must keep the fold on
    // HashAggregateExec's UnsafeRow fast path (map-side partials +
    // whole-stage codegen) — a Sort/ObjectHash demotion would undo
    // the point of packing
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate") && !p.contains("ObjectHashAggregate"), p)
    // AQE's final-plan rendering marks codegen stages with the *(n)
    // prefix rather than the literal WholeStageCodegen node name
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
    assert(p.contains("partial_bytes8_max_agg"),
      "map-side partial aggregation must engage:\n" + p)
  }

  test("scalar bytes8_max under codegen matches the kernel") {
    val rnd = new scala.util.Random(22)
    val rows = (1 to 200).map { _ =>
      (pack(Array.fill(8)(rnd.nextInt(128))),
       pack(Array.fill(8)(rnd.nextInt(128)))) }
    val got = rows.toDF("a", "b")
      .select(GraftFunctions.bytes8Max(spark, col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map { case (a, b) => refMax(a, b) })
  }
}
