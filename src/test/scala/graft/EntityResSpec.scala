package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.EntityRes
import graft.functions.JaroWinklerKernel

/** Pins the two scale bounds of the entity-resolution candidate
  * generator (the r12 verdict's one `weak` flag):
  *
  *  1. comparisons are a function of DISTINCT names, so duplicating
  *     the corpus leaves the pair count unchanged (the naive
  *     row-level block join grew it quadratically);
  *  2. the `maxBlockNames` occupancy guard bounds in-sub-block
  *     distinct names, so pairs grow linearly — not quadratically —
  *     in the number of distinct names per block, while same-name
  *     clustering is structurally immune to the cap.
  *
  * Plus the q179 derivation proof: the distinct-name reciprocal-best
  * computation must equal the row-level brute force on inputs that
  * exercise the singleton-reciprocal path the driver testdata's
  * repeated names never rank into the top-25.
  */
class EntityResSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vocabulary(n: Int): Seq[String] =
    (0 until n).map(i => f"entity name number $i%04d")

  test("candidate pairs are vocabulary-bounded: constant under corpus duplication") {
    val vocab = vocabulary(20)
    def corpus(copies: Int) =
      (0 until 20 * copies).map(i => (i.toLong, vocab(i % 20), "blk"))
        .toDF("id", "name", "b")
    def pairs(copies: Int): Long = {
      val n = EntityRes.candidateNamePairs(
        graft.ops.Staging.stage(
          EntityRes.nameGroups(corpus(copies), "id", "name", col("b"))),
        maxBlockNames = 10000).count()
      graft.ops.Staging.releaseAll()
      n
    }
    val atN = pairs(5)     // 100 rows
    val at4N = pairs(20)   // 400 rows
    assert(atN == 190L)    // C(20, 2) — distinct names only
    assert(at4N == atN)    // 4x corpus, identical comparison bill
  }

  test("occupancy guard: pairs follow sub-bucket occupancy, linear not quadratic") {
    val d = 240
    val cap = 24 // -> nsub = 10
    val names = vocabulary(d)
    val df = names.zipWithIndex
      .map { case (nm, i) => (i.toLong, nm, "blk") }
      .toDF("id", "name", "b")
    val groups = graft.ops.Staging.stage(
      EntityRes.nameGroups(df, "id", "name", col("b")))
    val got = EntityRes.candidateNamePairs(groups, maxBlockNames = cap).count()
    // replay the guard's deterministic sub-bucketing to get the
    // expected occupancy profile
    val occ = groups
      .select(pmod(xxhash64(col("__nm")), lit(10L)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    graft.ops.Staging.releaseAll()
    val expected = occ.map(c => c * (c - 1) / 2).sum
    assert(got == expected)              // pairs == Σ C(occupancy, 2)
    assert(occ.max <= 3L * cap)          // no runaway bucket
    val unguarded = d.toLong * (d - 1) / 2
    assert(got * 4 < unguarded)          // the bill actually shrank
  }

  test("same-name rows always cluster, even when the cap splits their block") {
    // 6 mutually-dissimilar names x 5 copies under ONE block, with a
    // cap small enough to split cross-name pairing into many
    // sub-buckets: exact-duplicate clustering must be unaffected.
    val names = Seq("alpha assembly", "bravo bracket", "charlie casing",
                    "delta dynamo", "echo enclosure", "foxtrot flange")
    val rows = for {
      (nm, g) <- names.zipWithIndex
      j <- 0 until 5
    } yield ((g * 10 + j).toLong, nm, "blk")
    val got = EntityRes.resolve(rows.toDF("id", "name", "b"),
        "id", "name", col("b"), threshold = 0.9, maxBlockNames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.ops.Staging.releaseAll()
    val want = rows.map { case (id, _, _) => id -> (id / 10) * 10 }.toMap
    assert(got == want)
  }

  test("occupancy breach emits the per-call signal; an unsplit run stays silent") {
    // a guard that silently degrades recall is indistinguishable from
    // full recall — the breach must be observable (r13 advice), and
    // PER CALL rather than via shared state that concurrent resolves
    // would clobber (r14 advice)
    // un-split run: 6 names, cap 10000 — no signal
    val small = vocabulary(6).zipWithIndex
      .map { case (nm, i) => (i.toLong, nm, "blk") }.toDF("id", "name", "b")
    val (smallDf, smallBreach) =
      EntityRes.resolveSignaled(small, "id", "name", col("b"), 0.99)
    smallDf.count()
    graft.ops.Staging.releaseAll()
    assert(smallBreach.isEmpty,
      "no block was split — the signal must stay quiet")
    // split run: 40 names under one block, cap 4 — the guard engages
    val big = vocabulary(40).zipWithIndex
      .map { case (nm, i) => (i.toLong, nm, "blk") }.toDF("id", "name", "b")
    // the check is synchronous at pair-build time: resolveSignaled's
    // plan construction already fires it — the breach arrives with
    // the frame, before any action on it
    val (bigDf, breach) = EntityRes.resolveSignaled(
      big, "id", "name", col("b"), 0.99, maxBlockNames = 4)
    assert(breach.nonEmpty, "guard split a block but no signal fired")
    bigDf.count()
    graft.ops.Staging.releaseAll()
    val (namesInSplit, maxSub) = breach.get
    assert(namesInSplit === 40L)  // every name sat in the split block
    assert(maxSub === 10L)        // ceil(40 / 4)
  }

  test("q179 distinct-name derivation == row-level brute force (singleton reciprocal links)") {
    val parts: Seq[(Long, String)] = Seq(
      1L -> "acme alpha widget",     // repeated group {1,2,9}
      2L -> "acme alpha widget",
      9L -> "acme alpha widget",
      3L -> "acme bravo unit one",   // singleton pair {3,4}: mutual
      4L -> "acme bravo unit on",
      6L -> "acme alpha widgex",     // singleton whose best is group
                                     // rep 1 - NOT mutual (1's best is 2)
      7L -> "acme zulu qqqqxxkk",    // singleton, likely no >=0.9 match
      10L -> "zeta one two three",   // second block: singleton pair
      11L -> "zeta one two thre")
    // row-level brute force with the SAME kernel = the r12 algorithm
    def jw(a: String, b: String): Double =
      JaroWinklerKernel.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
    val byBlk = parts.groupBy(_._2.split(" ").head)
    val half = byBlk.values.flatMap { ps =>
      for {
        (k1, n1) <- ps; (k2, n2) <- ps if k1 < k2
        s = jw(n1, n2) if s >= 0.9
      } yield (k1, k2, s)
    }.toSeq
    val both = half ++ half.map { case (a, b, s) => (b, a, s) }
    val best = both.groupBy(_._1).map { case (k, cs) =>
      k -> cs.minBy { case (_, p, s) => (-s, p) } }
    val mutual = half.filter { case (k1, k2, _) =>
      best.get(k1).exists(_._2 == k2) && best.get(k2).exists(_._2 == k1) }
    val expected = mutual.map { case (k1, k2, _) =>
      (k1, k2, jw(parts.toMap.apply(k1), parts.toMap.apply(k2))) }
      .sortBy { case (k1, k2, s) => (-s, k1, k2) }.take(25)
    // the input must actually exercise the paths under test
    assert(expected.contains((1L, 2L, 1.0)))
    assert(expected.exists { case (a, b, s) => a == 3L && b == 4L && s < 1.0 })
    assert(expected.exists { case (a, b, _) => a == 10L && b == 11L })
    assert(!expected.exists { case (a, b, _) => a == 6L || b == 6L })

    val dir = Files.createTempDirectory("erq179").toString
    parts.toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q179_reciprocal_match")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    graft.ops.Staging.releaseAll()
    assert(got == expected)
  }

  test("sortedNeighborhoodPairs: exactly the within-window sorted pairs, d·w bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // duplicate names on purpose: multiplicities collapse before pairing
    val rows = (1 to 120).map(i =>
      (i.toLong, s"n${rnd.nextInt(40)}%03d-${rnd.nextInt(3)}"))
    val w = 4
    val got = graft.ext.EntityRes.sortedNeighborhoodPairs(
        rows.toDF("id", "name"), "id", "name", window = w)
      .collect()
      .map(r => (r.getAs[String]("__nma"), r.getAs[String]("__nmb")))
      .toSeq.sorted
    graft.ops.Staging.releaseAll()
    val names = rows.map(_._2).distinct.sorted
    val expected = (for {
      i <- names.indices; j <- (i + 1) until math.min(i + w + 1, names.size)
    } yield (names(i), names(j))).sorted
    assert(got == expected)
    // linear candidate bound: d·w − w(w+1)/2 for d > w
    assert(got.size == names.size * w - w * (w + 1) / 2)
  }

  test("blockedPairs: valve bounds the comparison bill; identity under the cap") {
    // 3 blocks x 100 rows
    val rows = (0 until 300).map(i => (i.toLong, s"blk${i % 3}", s"p$i"))
      .toDF("id", "b", "payload")
    val df = graft.ops.Staging.stage(rows)

    // under the cap: the plain block self-join, signal silent
    val (un, s1) = EntityRes.blockedPairsSignaled(df, "b", "id", 10000)
    val unPairs = un.collect().map(r =>
      (r.getAs[String]("b"), r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[String]("payload_a"), r.getAs[String]("payload_b")))
    assert(s1.isEmpty)
    assert(unPairs.length == 3 * 100 * 99 / 2)
    assert(unPairs.forall { case (_, a, bb, pa, pb) =>
      a < bb && pa == s"p$a" && pb == s"p$bb" })

    // over the cap: every block splits into ceil(100/30) = 4
    // sub-buckets; the pair count is EXACTLY Σ_(block,sub) C(d, 2)
    // over the same hash assignment — the derivation proof — and
    // strictly below the uncapped quadratic bill; the breach signals
    val (capped, s2) = EntityRes.blockedPairsSignaled(df, "b", "id", 30)
    val n = capped.count()
    assert(s2.isDefined)
    val bucketBill = rows
      .select(col("b"),
        pmod(xxhash64(col("id").cast("string")), lit(4L)).as("s"))
      .groupBy("b", "s").count().collect()
      .map { r => val c = r.getAs[Long]("count"); c * (c - 1) / 2 }.sum
    assert(n == bucketBill, s"pairs $n != sub-bucket bill $bucketBill")
    assert(n < unPairs.length)
    // capped pairs are a subset of the uncapped pairs
    val unSet = unPairs.map(t => (t._2, t._3)).toSet
    assert(capped.collect().forall(r =>
      unSet((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))))
    graft.ops.Staging.releaseAll()
  }
}
