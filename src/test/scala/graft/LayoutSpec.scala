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
}
