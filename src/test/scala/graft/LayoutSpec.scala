package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zOrderKey interleaves bits (hand case + identities)") {
    // a=5 (101) -> positions 0,4 = 17; b=3 (011) -> positions 1,3 = 10
    val out = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("a", "b")
      .withColumn("z", Layout.zOrderKey($"a", $"b", bits = 3))
      .orderBy("a", "b").collect().map(_.getAs[Long]("z"))
    assert(out.toSeq == Seq(0L, 42L, 27L, 21L))
    // a-only bits land on even positions (1+4+16), b-only on odd (2+8+32)
  }

  test("zOrderKey validates bits") {
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(lit(1L), lit(1L), bits = 0)
    }
  }

  test("clusterBy on the z key bounds per-file spans in BOTH dimensions") {
    // the full 64x64 grid; each output partition is a contiguous z
    // range = (approximately) a square tile, so BOTH u and d spans
    // stay near sqrt(cell count) — a u-only sort leaves d unbounded
    val grid = spark.range(0, 4096)
      .select(($"id" / 64).cast("long").as("u"), ($"id" % 64).as("d"))
    val z = Layout.clusterBy(
      grid.withColumn("z", Layout.zOrderKey($"u", $"d", bits = 6)), $"z", 16)
    val spans = z.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("u") - min("u")).as("su"), (max("d") - min("d")).as("sd"))
      .collect()
    assert(spans.length == 16)
    // range boundaries are sampled, so a partition can straddle two
    // 16x16 tiles — still categorically tighter than the full range
    assert(spans.forall(r => r.getAs[Long]("su") <= 32 &&
                             r.getAs[Long]("sd") <= 32))
    val bySingle = grid.repartitionByRange(16, $"u").sortWithinPartitions($"u")
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max("d") - min("d")).as("sd")).collect()
    assert(bySingle.forall(_.getAs[Long]("sd") == 63L),
      "u-only sort cannot bound d — the contrast that makes z-order worth it")
  }

  test("hilbertKey: hand case (order-2 curve) + the defining Hamiltonian property") {
    // bits=1: the 2x2 U-curve (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
    assert(Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).map { case (x, y) =>
      graft.functions.HilbertKernel.xy2d(x, y, 1)
    } == Seq(0L, 1L, 2L, 3L))
    // Defining property: keys over the full 8x8 grid are a
    // permutation of 0..63 AND consecutive keys are Manhattan-adjacent
    // cells — a Hamiltonian path, which Morton is NOT (it jumps).
    val cells = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val byKey = cells.map { case (x, y) =>
      graft.functions.HilbertKernel.xy2d(x, y, 3) -> ((x, y))
    }.sortBy(_._1)
    assert(byKey.map(_._1) == (0L until 64L))
    assert(byKey.sliding(2).forall { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      (x1 - x2).abs + (y1 - y2).abs == 1
    })
    val morton = cells.map { case (x, y) =>
      (0 until 3).map(i =>
        ((x >> i) & 1L) * (1L << (2 * i)) + ((y >> i) & 1L) * (1L << (2 * i + 1))
      ).sum -> ((x, y))
    }.sortBy(_._1)
    assert(!morton.sliding(2).forall { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      (x1 - x2).abs + (y1 - y2).abs == 1
    })
  }

  test("hilbertKey column ≡ kernel, and range files span no wider than Morton's") {
    val grid = spark.range(0, 4096)
      .select(($"id" / 64).cast("long").as("u"), ($"id" % 64).as("d"))
    val keyed = grid
      .withColumn("h", graft.functions.GraftFunctions.hilbertKey(spark, $"u", $"d", bits = 6))
      .withColumn("z", Layout.zOrderKey($"u", $"d", bits = 6))
    // codegen path ≡ JVM kernel, checked without a UDF on purpose
    assert(keyed.select("u", "d", "h").collect().forall(r =>
      r.getLong(2) ==
        graft.functions.HilbertKernel.xy2d(r.getLong(0), r.getLong(1), 6)))
    def totalSpan(key: String): Long =
      Layout.clusterBy(keyed, col(key), 16)
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max("u") - min("u")) + (max("d") - min("d"))).as("s"))
        .collect().map(_.getAs[Long]("s")).sum
    val (hs, zs) = (totalSpan("h"), totalSpan("z"))
    assert(hs <= zs, s"hilbert total span $hs should not exceed morton $zs")
  }

  test("d2xy is the exact inverse of xy2d over a full grid") {
    val hk = graft.functions.HilbertKernel
    assert((0L until (1L << 10)).forall { d =>
      val (x, y) = hk.d2xy(d, 5)
      hk.xy2d(x, y, 5) == d
    })
  }

  test("hilbertCover: exact when unbounded, superset-never-miss when capped") {
    val hk = graft.functions.HilbertKernel
    val rnd = new scala.util.Random(5)
    val bits = 6
    for (_ <- 1 to 25) {
      val x0 = rnd.nextInt(60).toLong; val x1 = x0 + rnd.nextInt(63 - x0.toInt)
      val y0 = rnd.nextInt(60).toLong; val y1 = y0 + rnd.nextInt(63 - y0.toInt)
      val boxKeys = (for (x <- x0 to x1; y <- y0 to y1)
        yield hk.xy2d(x, y, bits)).toSet
      def covered(rs: Seq[(Long, Long)]) =
        rs.flatMap { case (a, b) => a until b }.toSet
      // unbounded: the cover is EXACTLY the box's key set
      val exact = Layout.hilbertCover(x0, x1, y0, y1, bits, maxRanges = 100000)
      assert(covered(exact) == boxKeys)
      // capped: never misses a box key, and stays within cap + merge slack
      val capped = Layout.hilbertCover(x0, x1, y0, y1, bits, maxRanges = 8)
      assert(boxKeys.subsetOf(covered(capped)))
      assert(capped.size <= 8 + 4 * bits,
        s"cap 8 with descent slack, got ${capped.size} ranges")
      // ranges are sorted, disjoint, merged
      assert(capped.sliding(2).forall {
        case Seq((_, b1), (a2, _)) => b1 < a2
        case _ => true
      })
    }
  }
}
