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

  test("cmsLookup: estimate >= exact always, and equals exact when no collision") {
    val toks = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(s"tok_$i"))
      .map(Tuple1(_)).toDF("tok")
    val counters = Sketches.cmsCounters(toks, "tok")
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("c_exact"))
    val est = Sketches.cmsLookup(exact, "tok", counters).collect()
    est.foreach { r =>
      assert(r.getAs[Long]("c_est") >= r.getAs[Long]("c_exact"),
        s"CMS undercounted ${r.getAs[String]("tok")}")
    }
    // 50 tokens into 4 rows x 4096 buckets: collisions are vanishingly
    // unlikely, so the min over rows recovers the exact count
    assert(est.forall(r => r.getAs[Long]("c_est") == r.getAs[Long]("c_exact")))
  }

  test("cmsCounters: counter table is bounded by depth * 16^hexChars and additive") {
    val toks = (1 to 2000).map(i => Tuple1(s"t${i % 37}")).toDF("tok")
    val counters = Sketches.cmsCounters(toks, "tok", depth = 2, hexChars = 1)
    assert(counters.count() <= 2 * 16)
    // additivity: sketch(a union b) == sketch(a) + sketch(b) per bucket
    val (a, b) = ((1 to 40).map(i => Tuple1(s"w$i")).toDF("tok"),
                  (20 to 60).map(i => Tuple1(s"w$i")).toDF("tok"))
    val merged = Sketches.cmsCounters(a, "tok", 2, 1)
      .unionByName(Sketches.cmsCounters(b, "tok", 2, 1))
      .groupBy("__j", "__b").agg(sum("__c").as("__c"))
    val whole = Sketches.cmsCounters(a.unionByName(b), "tok", 2, 1)
    assert(merged.orderBy("__j", "__b").collect().toSeq ==
      whole.orderBy("__j", "__b").collect().toSeq)
  }

  test("histQuantiles: estimates within one bucket width of exact, monotone in p") {
    val vals = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val counters = Sketches.histCounters(vals, "grp", "v", width = 16.0)
    assert(counters.count() <= math.ceil(1001 / 16.0).toLong + 1)
    val qs = Sketches.histQuantiles(counters, "grp", 16.0, Seq(0.5, 0.9, 0.99))
      .orderBy("p").collect()
    val exact = Map(0.5 -> 500.0, 0.9 -> 900.0, 0.99 -> 990.0)
    qs.foreach { r =>
      val (p, est) = (r.getAs[Double]("p"), r.getAs[Double]("q_est"))
      assert(math.abs(est - exact(p)) <= 16.0, s"p=$p est=$est")
    }
    assert(qs.map(_.getAs[Double]("q_est")).toSeq.sliding(2).forall(s => s(0) <= s(1)))
  }

  test("weighted histCounters == counters over weight-expanded rows") {
    val rows = Seq(("g", 5.0, 3L), ("g", 20.0, 1L), ("g", 37.0, 2L))
    val weighted = Sketches.histCounters(rows.toDF("grp", "v", "w"),
      "grp", "v", 16.0, weight = col("w"))
    val expanded = Sketches.histCounters(
      rows.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
        .toDF("grp", "v"), "grp", "v", 16.0)
    assert(weighted.orderBy("__b").collect().toSeq ==
      expanded.orderBy("__b").collect().toSeq)
    // and the default weight reduces to plain counts
    val q = Sketches.histQuantiles(weighted, "grp", 16.0, Seq(0.5))
      .head().getAs[Double]("q_est")
    val qe = Sketches.histQuantiles(expanded, "grp", 16.0, Seq(0.5))
      .head().getAs[Double]("q_est")
    assert(q == qe)
  }

  test("histCounters are additive: sketch(a ++ b) == merged per-bucket sums") {
    val a = (1 to 300).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val b = (200 to 600).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val merged = Sketches.histCounters(a, "grp", "v", 16.0)
      .unionByName(Sketches.histCounters(b, "grp", "v", 16.0))
      .groupBy("grp", "__b").agg(sum("__c").as("__c"))
    val whole = Sketches.histCounters(a.unionByName(b), "grp", "v", 16.0)
    assert(merged.orderBy("__b").collect().toSeq ==
      whole.orderBy("__b").collect().toSeq)
  }

  test("cmsLookup broadcasts the counter table — probe side never shuffles on the join") {
    val toks = (1 to 100).map(i => Tuple1(s"t$i")).toDF("tok")
    val counters = Sketches.cmsCounters(toks, "tok", depth = 2, hexChars = 2)
    val plan = Sketches.cmsLookup(toks.limit(5), "tok", counters, 2, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("kmvMins: exact below k, estimate within error above, partition-invariant") {
    def mins(vals: Seq[String], k: Int) =
      Sketches.kmvMins(vals.map(Tuple1(_)).toDF("v"), "v", k)
    // exact regime: fewer than k distinct values -> est == n exactly
    val small = mins((1 to 40).map(i => s"u$i") ++ (1 to 10).map(i => s"u$i"), 64)
    assert(small.agg(Sketches.kmvDistinct(64).as("e"))
      .head().getAs[Double]("e") == 40.0)
    // full regime: RSE ~ 1/sqrt(k-2); allow a generous 3-sigma band
    val big = mins((1 to 1000).map(i => s"user_$i"), 64)
    val est = big.agg(Sketches.kmvDistinct(64).as("e")).head().getAs[Double]("e")
    assert(math.abs(est - 1000) / 1000 < 0.45, s"est=$est")
    // content-derived: identical under any partitioning
    val a = mins((1 to 500).map(i => s"x$i"), 32).orderBy("__h").collect().toSeq
    val b = Sketches.kmvMins(
      (1 to 500).map(i => Tuple1(s"x$i")).toDF("v").repartition(11), "v", 32)
      .orderBy("__h").collect().toSeq
    assert(a == b)
  }

  test("kmv intersection: common-below-theta / theta tracks the true overlap") {
    def mins(n: Int, k: Int) =
      Sketches.kmvMins((1 to n).map(i => Tuple1(s"id_$i")).toDF("v"), "v", k)
    val ka = mins(200, 64)   // A = 1..200
    val kb = mins(400, 64)   // B = 1..400, so A ∩ B = A (200 ids)
    val theta = math.min(
      ka.agg(max("__u")).head().getDouble(0),
      kb.agg(max("__u")).head().getDouble(0))
    val common = ka.join(kb.select("__h"), Seq("__h"))
      .filter(col("__u") < theta).count()
    val est = common / theta
    assert(math.abs(est - 200) / 200 < 0.45, s"est=$est")
  }

  test("SketchStore: a CMS segment log merges to the EXACT union sketch") {
    import graft.ext.SketchStore
    val dir = java.nio.file.Files.createTempDirectory("sketch_store")
      .toString + "/cms"
    val a = (1 to 80).map(i => Tuple1(s"w${i % 23}")).toDF("tok")
    val b = (1 to 60).map(i => Tuple1(s"w${i % 31}")).toDF("tok")
    SketchStore.save(Sketches.cmsCounters(a, "tok", 2, 2), dir)
    SketchStore.append(Sketches.cmsCounters(b, "tok", 2, 2), dir)
    val merged = SketchStore.load(spark, dir, Seq("__j", "__b"), "__c")
    val whole = Sketches.cmsCounters(a.unionByName(b), "tok", 2, 2)
    assert(merged.orderBy("__j", "__b").collect().toSeq ==
      whole.orderBy("__j", "__b").collect().toSeq)
    intercept[IllegalArgumentException] {
      SketchStore.load(spark, dir, Seq("__j", "__b"), "__c", merge = "avg")
    }
  }

  test("SketchStore: HLL registers max-merge; estimate-on-read equals single-shot") {
    import graft.ext.SketchStore
    val dir = java.nio.file.Files.createTempDirectory("sketch_store")
      .toString + "/hll"
    val all = (1 to 400).map(i => ("g", s"item_$i"))
    val (h1, h2) = (all.take(250), all.drop(200)) // overlapping segments
    SketchStore.save(
      Sketches.hllRegisters(h1.toDF("grp", "v"), "grp", "v"), dir)
    SketchStore.append(
      Sketches.hllRegisters(h2.toDF("grp", "v"), "grp", "v"), dir)
    val regs = SketchStore.load(spark, dir, Seq("grp", "__b"), "__m",
      merge = "max")
    val est = Sketches.hllEstimate(regs, "grp")
      .head().getAs[Double]("hll_distinct")
    val whole = Sketches.hllDistinct(all.toDF("grp", "v"), "grp", "v")
      .head().getAs[Double]("hll_distinct")
    assert(math.abs(est - whole) < 1e-9, s"$est vs $whole")
  }

  test("SketchStore: hist counters sum-merge; quantiles equal single-shot") {
    import graft.ext.SketchStore
    val dir = java.nio.file.Files.createTempDirectory("sketch_store")
      .toString + "/hist"
    val a = (1 to 500).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val b = (300 to 900).map(i => ("g", i.toDouble)).toDF("grp", "v")
    SketchStore.save(Sketches.histCounters(a, "grp", "v", 16.0), dir)
    SketchStore.append(Sketches.histCounters(b, "grp", "v", 16.0), dir)
    val merged = SketchStore.load(spark, dir, Seq("grp", "__b"), "__c")
    val viaStore = Sketches.histQuantiles(merged, "grp", 16.0, Seq(0.5, 0.9))
      .orderBy("p").collect().map(_.getAs[Double]("q_est")).toSeq
    val whole = Sketches.histQuantiles(
        Sketches.histCounters(a.unionByName(b), "grp", "v", 16.0),
        "grp", 16.0, Seq(0.5, 0.9))
      .orderBy("p").collect().map(_.getAs[Double]("q_est")).toSeq
    assert(viaStore == whole)
  }
}
