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

  test("chunkDocuments: chunks reconstruct the original token stream losslessly") {
    val docGen: Gen[List[String]] = Gen.listOfN(20, for {
      n <- Gen.choose(1, 120)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d1", "e"))
    } yield ws.mkString(" "))
    for ((texts, i) <- samples(docGen, 4).zipWithIndex) {
      val (maxT, ov) = Seq((7, 0), (7, 3), (16, 5), (40, 8))(i)
      val step = maxT - ov
      val df = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = graft.ext.Chunking.chunkDocuments(df, $"text", maxT, ov)
        .select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      texts.zipWithIndex.foreach { case (t, id) =>
        val toks = t.split(" ", -1)
        val cs = chunks(id.toLong)
        // chunk ids are dense from 0
        assert(cs.map(_._2).toSeq == cs.indices.toSeq)
        // every chunk except the last is full-size; none exceeds maxT
        assert(cs.init.forall(_._4 == maxT) && cs.last._4 <= maxT)
        // dropping each later chunk's overlap prefix rebuilds the doc
        val rebuilt = cs.head._3.split(" ", -1).toSeq ++
          cs.tail.toSeq.flatMap(_._3.split(" ", -1).drop(ov).toSeq)
        assert(rebuilt == toks.toSeq,
          s"doc $id (${toks.length} toks, max=$maxT ov=$ov) failed reconstruction")
        // chunk k starts exactly at k*step
        cs.foreach { case (_, k, text, _) =>
          assert(text.split(" ", -1).head == toks(k * step))
        }
      }
    }
  }

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

  test("nearDupAgainstCorpus equals the driver-side all-pairs filter on random docs") {
    // random docs over a tiny vocabulary force genuine near-collisions;
    // survivors must be exactly the delta docs whose signature is
    // beyond hamming 3 of EVERY corpus signature
    val docGen: Gen[List[String]] = Gen.listOfN(24, for {
      n <- Gen.choose(3, 8)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield toks.mkString(" "))
    for ((texts, trial) <- samples(docGen, 4).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (corpus, delta) = docs.partition(_._1 % 2 == 0)
      val corpusSigs = graft.ext.Dedup.withSimHash64(
        corpus.toDF("doc_id", "text"), "text")
      val sigOf = corpusSigs.collect()
        .map(r => r.getAs[String]("simhash")).toSeq
      val deltaSigs = graft.ext.Dedup.withSimHash64(
          delta.toDF("doc_id", "text"), "text").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash"))
      def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
      val expect = deltaSigs.filter { case (_, s) =>
        !sigOf.exists(c => ham(s, c) <= 3) }.map(_._1).toSet
      val got = graft.ext.Dedup.nearDupAgainstCorpus(
          delta.toDF("doc_id", "text"), "doc_id", "text",
          corpusSigs.select("simhash"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"trial $trial diverged from the all-pairs filter")
    }
    graft.ops.Staging.releaseAll()
  }

  test("resampleTopK selections nest: top-k is a subset of top-(k+1)") {
    // Gumbel top-k orders by a fixed per-row score, so growing k can
    // only ADD rows — the nesting property that makes token-budget
    // ladders comparable (same reason deterministicSample nests)
    val w = (0L until 40L).map(i => (i, (i % 13).toDouble)).toDF("id", "wt")
    val sets = (1 to 8).map { k =>
      graft.ext.Dsir.resampleTopK(w, $"id", $"wt", k, temperature = 2.0,
          salt = "nest")
        .select("id").as[Long].collect().toSet
    }
    sets.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), "top-k must nest within top-(k+1)")
    }
    assert(sets.last.size == 8)
  }

  test("zOrderKey is injective on the bit domain and order-preserving per quadrant") {
    val pairGen: Gen[List[(Long, Long)]] = Gen.listOfN(80, for {
      a <- Gen.choose(0L, 255L)
      b <- Gen.choose(0L, 255L)
    } yield (a, b))
    for (pairs <- samples(pairGen, 3)) {
      val distinctPairs = pairs.distinct
      val zs = distinctPairs.toDF("a", "b")
        .withColumn("z", graft.ops.Layout.zOrderKey($"a", $"b", bits = 8))
        .select("a", "b", "z").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      // injective: distinct (a,b) -> distinct z
      assert(zs.values.toSeq.distinct.size == distinctPairs.size)
      // z is bounded by the interleaved width
      assert(zs.values.forall(z => z >= 0 && z < (1L << 16)))
      // growing either coordinate alone can only grow z (bit dominance)
      distinctPairs.foreach { case (a, b) =>
        for (((a2, b2), z2) <- zs if a2 >= a && b2 >= b)
          assert(z2 >= zs((a, b)) || (a2 == a && b2 == b))
      }
    }
  }

  test("histQuantiles brackets the exact quantile within one bucket width") {
    val valGen: Gen[List[Double]] = Gen.listOfN(200,
      Gen.choose(0, 5000).map(_.toDouble / 7.0))
    for (vals <- samples(valGen, 4); width <- Seq(8.0, 32.0)) {
      val df = vals.map(("g", _)).toDF("grp", "v")
      val counters = graft.ext.Sketches.histCounters(df, "grp", "v", width)
      val sorted = vals.sorted
      graft.ext.Sketches.histQuantiles(counters, "grp", width, Seq(0.25, 0.5, 0.9))
        .collect().foreach { r =>
          val p = r.getAs[Double]("p")
          val est = r.getAs[Double]("q_est")
          val exact = sorted(math.ceil(p * vals.size).toInt - 1)
          assert(math.abs(est - exact) <= width,
            s"p=$p width=$width est=$est exact=$exact")
        }
    }
  }

  test("containment dominates Jaccard and both sit in [0,1] on random docs") {
    val docGen: Gen[List[String]] = Gen.listOfN(14, for {
      n <- Gen.choose(3, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield ws.mkString(" "))
    for (texts <- samples(docGen, 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, "g", t) }
        .toDF("id", "grp", "text")
      val cont = graft.ext.Dedup.exactContainmentPairs(df, "id", "text", "grp",
          k = 2, threshold = 0.0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b")))).toMap
      val jac = graft.ext.Dedup.exactJaccardPairs(df, "id", "text", "grp",
          k = 2, threshold = 0.0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          r.getAs[Double]("jaccard"))).toMap
      assert(cont.keySet == jac.keySet)
      cont.foreach { case (pair, (ca, cb)) =>
        assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
        // max containment >= jaccard (inter/min-size >= inter/union)
        assert(math.max(ca, cb) >= jac(pair) - 1e-9, s"$pair")
      }
    }
  }

  test("Bmp codec: random images round-trip; resample invariants hold") {
    import graft.ext.Multimodal.Bmp
    val imgGen: Gen[(Int, Int, Array[Byte])] = for {
      w <- Gen.choose(1, 23)
      h <- Gen.choose(1, 17)
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    samples(imgGen, 25).foreach { case (w, h, rgb) =>
      // encode -> decode is the identity on pixels and dims
      val Some((dw, dh, back)) = Bmp.decode(Bmp.encode(w, h, rgb))
      assert(dw == w && dh == h && back.toSeq == rgb.toSeq, s"${w}x$h")
      // identity resize = source, for both resamplers
      assert(Bmp.resampleNearest(w, h, rgb, w, h).toSeq == rgb.toSeq)
      assert(Bmp.resampleBilinear(w, h, rgb, w, h).toSeq == rgb.toSeq)
      // nearest only ever emits source bytes; both emit the right size
      val nr = Bmp.resampleNearest(w, h, rgb, 5, 4)
      val bl = Bmp.resampleBilinear(w, h, rgb, 5, 4)
      assert(nr.length == 5 * 4 * 3 && bl.length == 5 * 4 * 3)
      val srcBytes = rgb.toSet
      assert(nr.forall(srcBytes.contains), "nearest invents no pixel values")
      // bilinear outputs stay inside the source min/max per image
      val lo = rgb.map(_ & 0xff).min; val hi = rgb.map(_ & 0xff).max
      assert(bl.forall(b => (b & 0xff) >= lo && (b & 0xff) <= hi),
        "bilinear is a convex combination")
    }
  }

  test("weightedSampleK nests in k and respects the priority order") {
    val df = (0L until 60L).map(i => (i, "g", (i % 9 + 1).toDouble))
      .toDF("id", "grp", "w")
    val sets = (1 to 10).map { k =>
      graft.ext.Sampling.weightedSampleK(df, $"id", $"w", "grp", k, salt = "pn")
        .select("id").as[Long].collect().toSet
    }
    sets.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), "E-S top-k must nest within top-(k+1)")
    }
    assert(sets.last.size == 10)
  }

  test("applyChangelog equals a driver-side reference merge on random changelogs") {
    val changeGen: Gen[List[(Long, Long, Long, String, Double)]] =
      Gen.listOfN(40, for {
        k <- Gen.choose(0L, 9L) // overlaps AND exceeds the base key range
        ts <- Gen.choose(0L, 5L) // small range -> frequent ts ties
        op <- Gen.oneOf("U", "U", "D") // deletes ~1/3
        v <- Gen.choose(0, 500).map(_ / 10.0)
      } yield (k, ts, 0L, op, v))
    val baseRows = (0L to 5L).map(k => (k, s"n$k", k * 10.0))
    for ((raw, i) <- samples(changeGen, 6).zipWithIndex if raw.nonEmpty) {
      // unique seq per row makes (ts, seq) total, like a changelog LSN
      val rows = raw.zipWithIndex.map { case ((k, ts, _, op, v), j) =>
        (k, ts, j.toLong, op, v)
      }
      val out = graft.ext.Cdc.applyChangelog(
          baseRows.toDF("k", "name", "bal"),
          rows.toDF("ck", "ts", "seq", "op", "v"),
          "k", "ck", "ts", "seq", "op", "D", Seq("v" -> "bal"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      // reference: latest change per key by (ts, seq), applied to a map
      val latest = rows.groupBy(_._1).map { case (k, cs) =>
        k -> cs.maxBy(c => (c._2, c._3))
      }
      val base = baseRows.map(r => r._1 -> r).toMap
      val expected = (base.keySet ++ latest.keySet).toSeq.sorted.flatMap { k =>
        (base.get(k), latest.get(k)) match {
          case (_, Some(c)) if c._4 == "D" => None
          case (Some(b), Some(c)) => Some((k, b._2, c._5))
          case (Some(b), None) => Some((k, b._2, b._3))
          case (None, Some(c)) => Some((k, null, c._5))
          case (None, None) => None
        }
      }
      assert(out == expected, s"sample $i diverged")
    }
  }

  test("JaroWinklerKernel matches an independent reference bit-for-bit on random strings") {
    // reference written in a different style (explicit match-index
    // lists instead of the kernel's greedy flag arrays) so a shared
    // bug cannot hide; formula constants per the pinned contract
    def refJw(a: String, b: String): Double = {
      val (l1, l2) = (a.length, b.length)
      if (l1 == 0 && l2 == 0) return 1.0
      if (l1 == 0 || l2 == 0) return 0.0
      val win = math.max(math.max(l1, l2) / 2 - 1, 0)
      val taken = scala.collection.mutable.Set[Int]()
      val mIdx = (0 until l1).flatMap { i =>
        (((i - win) max 0) until ((i + win + 1) min l2))
          .find(j => !taken.contains(j) && a(i) == b(j))
          .map { j => taken += j; (i, j) }
      }
      val m = mIdx.length
      if (m == 0) return 0.0
      val bOrder = mIdx.map(_._2).sorted
      val t = mIdx.map(_._1).sorted.zip(bOrder)
        .count { case (i, j) => a(i) != b(j) } / 2
      var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
      if (sim > 0.7) {
        val p = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
        sim += p * 0.1 * (1.0 - sim)
      }
      sim
    }
    val strGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', ' ')).map(_.mkString))
    val pairGen = for { a <- strGen; b <- strGen } yield (a, b)
    samples(pairGen, 400).foreach { case (a, b) =>
      val got = graft.functions.JaroWinklerKernel.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      val want = refJw(a, b)
      assert(java.lang.Double.doubleToLongBits(got) ==
             java.lang.Double.doubleToLongBits(want),
        s"jw('$a','$b'): got $got want $want")
    }
  }

  test("cappedSessionize: span cap, boundary justification, per-key independence (random streams)") {
    // r15 verdict item: property-pin the dual-rule recurrence. Three
    // invariants beyond the hand cases: (1) every session's span stays
    // <= maxSpan; (2) every session boundary is JUSTIFIED — the gap
    // rule or the span cap fired, never a spurious split; (3) a key's
    // assignment is independent of which other keys share the frame.
    val streamGen: Gen[List[(Long, Long, Int)]] =
      Gen.listOfN(80, for {
        k <- Gen.choose(0L, 3L)
        t <- Gen.choose(0L, 120L)
        v <- Gen.choose(0, 9)
      } yield (k, t, v))
    for ((rows, i) <- samples(streamGen, 4).zipWithIndex) {
      val (gap, maxSpan) = Seq((3L, 10L), (10L, 25L), (0L, 5L), (5L, 0L))(i)
      val df = rows.toDF("k", "t", "v")
      val got = Kernels.cappedSessionize(df, "k", Seq("t"), "t", gap, maxSpan)
        .select("k", "t", "session_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // reference fold over the (k, t)-sorted stream (tie order is
      // irrelevant to the recurrence: equal times keep the session)
      val ref = rows.map(r => (r._1, r._2)).sorted
        .foldLeft((List.empty[(Long, Long, Long)], -1L, 0L, 0L)) {
          case ((acc, curK, start, prev), (k, t)) =>
            val s =
              if (k != curK) t
              else if (t - prev > gap || t - start > maxSpan) t
              else start
            ((k, t, s) :: acc, k, s, t)
        }._1.reverse
      assert(got.sorted.toSeq == ref.sorted,
        s"sample $i (gap=$gap span=$maxSpan) diverged from the reference fold")
      val byKeySession = got.groupBy(r => (r._1, r._3))
      // (1) span cap: max event time within a session <= start + maxSpan
      byKeySession.foreach { case ((k, s), es) =>
        assert(es.map(_._2).max <= s + maxSpan,
          s"key $k session $s exceeds maxSpan=$maxSpan")
        assert(es.map(_._2).min == s, "session_start must be its first event time")
      }
      // (2) every boundary justified: for consecutive sessions of a
      // key, the new session's first event was EITHER > gap past the
      // previous session's last event, OR > maxSpan past its start
      got.groupBy(_._1).foreach { case (k, es) =>
        val sess = es.sortBy(e => (e._2, e._3)).toList
        sess.zip(sess.drop(1)).foreach { case ((_, tPrev, sPrev), (_, tNext, sNext)) =>
          if (sNext != sPrev)
            assert(tNext - tPrev > gap || tNext - sPrev > maxSpan,
              s"key $k split at $tNext without gap or cap firing")
        }
      }
      // (3) per-key independence: sessionizing one key's rows alone
      // yields the identical assignment
      val loneKey = rows.head._1
      val lone = Kernels.cappedSessionize(
          rows.filter(_._1 == loneKey).toDF("k", "t", "v"),
          "k", Seq("t"), "t", gap, maxSpan)
        .select("k", "t", "session_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(lone.sorted.toSeq == got.filter(_._1 == loneKey).sorted.toSeq,
        "a key's sessions must not depend on other keys in the frame")
    }
  }

  test("prefixMax equals the brute-force running max on random input") {
    // r15 verdict item: the distributed two-pass prefix max (per-
    // partition sweep + broadcast per-partition offsets) must equal
    // the driver-side strictly-previous running maximum, first row
    // null, for any value pattern — including ties and descending runs.
    val valsGen: Gen[List[Long]] =
      Gen.listOfN(70, Gen.choose(-50L, 50L))
    for (vs <- samples(valsGen, 4)) {
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = Kernels.prefixMax(df, Seq(col("id")), "v")
        .select("id", "v_prevmax").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      graft.ops.Staging.releaseAll()
      var run = Option.empty[Long]
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(got(i.toLong) == run,
          s"row $i: prefixMax=${got(i.toLong)} != reference=$run")
        run = Some(run.fold(v)(math.max(_, v)))
      }
    }
  }

  test("rendezvous hashing: movers land ONLY on the new shard, ~1/(k+1) of them") {
    import org.apache.spark.sql.functions._
    // the HRW guarantee q263 banks on: growing k=4 -> k=5 moves
    // exactly the ids whose k=5 argmax IS the new shard (plain mod-k
    // would reshuffle (k-1)/k of them)
    val ids = spark.range(0, 2000).toDF("id")
    val hh = ids.select(col("id"), explode(expr("sequence(0, 4)")).as("sh"))
      .withColumn("h", md5(concat(col("id").cast("string"), lit("#"),
        col("sh").cast("string"))))
    def arg(maxSh: Int) = hh.filter(col("sh") <= maxSh).groupBy("id")
      .agg(max(struct(col("h"), col("sh"))).as("m"))
      .select(col("id"), col("m.sh").as(s"s$maxSh"))
    val j = arg(3).join(arg(4), "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val movers = j.filter { case (_, a, b) => a != b }
    assert(movers.nonEmpty)
    assert(movers.forall(_._3 == 4), "every mover must land on the NEW shard")
    // expected moved fraction 1/5 = 400 of 2000; allow a wide band
    assert(movers.length > 250 && movers.length < 560,
      s"moved ${movers.length}/2000, expected ~400")
  }

  test("gridRangeJoin ≡ brute-force all-pairs on random point clouds (property)") {
    val ptsGen: Gen[List[(Double, Double)]] = Gen.listOfN(120, for {
      x <- Gen.choose(-1000, 1000).map(_ / 500.0) // [-2, 2] on a lattice
      y <- Gen.choose(-1000, 1000).map(_ / 500.0)
    } yield (x, y))
    for ((pts, i) <- samples(ptsGen, 3).zipWithIndex) {
      val r = Seq(0.05, 0.11, 0.4)(i)
      val df = pts.zipWithIndex.map { case ((x, y), id) => (id.toLong, x, y) }
        .toDF("id", "x", "y")
      val grid = graft.ext.Spatial.gridRangeJoin(df, "id", "x", "y", r)
        .collect().map(q => (q.getLong(0), q.getLong(1))).toSeq
      val brute = for {
        (a, ia) <- pts.zipWithIndex; (b, ib) <- pts.zipWithIndex
        if ia < ib
        if (a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2) <= r * r
      } yield (ia.toLong, ib.toLong)
      // the lattice coordinates make boundary ties common — exactly
      // the pairs a mis-sized grid would drop
      assert(grid.toSet == brute.toSet && grid.size == brute.size,
        s"sample $i r=$r: grid ${grid.size} vs brute ${brute.size}")
    }
  }

  test("maxNonOverlap is optimal vs interval-scheduling DP on random instances (property)") {
    val ivGen: Gen[List[(Long, Long)]] = Gen.listOfN(40, for {
      s <- Gen.choose(0L, 80L)
      d <- Gen.choose(1L, 15L)
    } yield (s, s + d))
    for ((iv, i) <- samples(ivGen, 4).zipWithIndex) {
      val kept = Kernels.maxNonOverlap(
          iv.zipWithIndex.map { case ((s, e), id) => ("k", id.toLong, s, e) }
            .toDF("k", "id", "s", "e"),
          "k", "s", "e", "id")
        .filter(col("kept")).count()
      // exact optimum: DP over end-sorted intervals,
      // opt(j) = max(opt(j-1), 1 + opt(last compatible before j))
      val sorted = iv.sortBy(x => (x._2, x._1)).toArray
      val opt = new Array[Int](sorted.length + 1)
      for (j <- 1 to sorted.length) {
        val (sj, _) = sorted(j - 1)
        var p = j - 1
        while (p > 0 && sorted(p - 1)._2 > sj) p -= 1
        opt(j) = math.max(opt(j - 1), 1 + opt(p))
      }
      assert(kept == opt(sorted.length),
        s"sample $i: greedy $kept vs DP optimum ${opt(sorted.length)}")
    }
  }

  test("winnowing guarantee: any shared run of >= w+k-1 tokens shares a fingerprint (property)") {
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen: Gen[(List[String], List[String], List[String])] = for {
      run <- Gen.listOfN(7, Gen.oneOf(vocab)) // w + k - 1 = 7
      pre1 <- Gen.listOfN(6, Gen.oneOf(vocab))
      suf1 <- Gen.listOfN(6, Gen.oneOf(vocab))
      pre2 <- Gen.listOfN(6, Gen.oneOf(vocab))
    } yield (run, pre1 ++ run ++ suf1, pre2 ++ run)
    for (((_, d1, d2), i) <- samples(docGen, 5).zipWithIndex) {
      val fps = graft.ext.TextStats.winnowFingerprints(
          Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
            .toDF("doc_id", "text"),
          "doc_id", "text", k = 4, w = 4)
        .collect().map(r => (r.getLong(0), r.getString(2)))
      val h1 = fps.filter(_._1 == 1L).map(_._2).toSet
      val h2 = fps.filter(_._1 == 2L).map(_._2).toSet
      assert((h1 intersect h2).nonEmpty,
        s"sample $i: 7-token shared run produced no shared fingerprint")
    }
  }

  test("dbscan ≡ brute-force DBSCAN on random point clouds (property)") {
    val ptsGen: Gen[List[(Double, Double)]] = Gen.listOfN(90, for {
      x <- Gen.choose(-200, 200).map(_ / 100.0) // [-2, 2] on a lattice
      y <- Gen.choose(-200, 200).map(_ / 100.0)
    } yield (x, y))
    for ((pts, i) <- samples(ptsGen, 3).zipWithIndex) {
      val (r, minPts) = Seq((0.3, 3), (0.5, 4), (0.8, 5))(i)
      val df = pts.zipWithIndex.map { case ((x, y), id) => (id.toLong, x, y) }
        .toDF("id", "x", "y")
      val got = graft.ext.Spatial.dbscan(df, "id", "x", "y", r, minPts)
        .collect().map(q => (q.getLong(0), q.getLong(1), q.getString(2)))
        .toSet
      // reference: O(n^2) neighborhoods, union-find-by-min over
      // core-core pairs, border = min cluster among core neighbors
      val n = pts.length
      def close(a: Int, b: Int): Boolean = {
        val dx = pts(a)._1 - pts(b)._1; val dy = pts(a)._2 - pts(b)._2
        dx * dx + dy * dy <= r * r
      }
      val nbrs = (0 until n).map(a =>
        (0 until n).filter(b => b != a && close(a, b)))
      val isCore = (0 until n).map(a => nbrs(a).size >= minPts - 1)
      val root = Array.tabulate(n)(identity)
      def find(a: Int): Int = { if (root(a) != a) root(a) = find(root(a)); root(a) }
      for (a <- 0 until n if isCore(a); b <- nbrs(a) if isCore(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) root(rb) = ra else root(ra) = rb }
      }
      val want = (0 until n).flatMap { a =>
        if (isCore(a)) Some((a.toLong, find(a).toLong, "core"))
        else {
          val coreNbrs = nbrs(a).filter(isCore)
          if (coreNbrs.nonEmpty)
            Some((a.toLong, coreNbrs.map(c => find(c).toLong).min, "border"))
          else None
        }
      }.toSet
      assert(got == want, s"sample $i r=$r minPts=$minPts: " +
        s"${(got diff want).take(5)} vs ${(want diff got).take(5)}")
    }
  }

  test("PcaPower.topComponent aligns with the dominant axis of stretched clouds (property)") {
    // clouds stretched 10x along a random unit axis u: the second
    // moment's top eigendirection is u, and with that eigengap three
    // power steps from all-ones must land within cos > 0.99 of it
    val d = 6
    val cloudGen: Gen[(List[Double], List[List[Double]])] = for {
      axis <- Gen.listOfN(d, Gen.choose(-100, 100).map(_ / 100.0))
        .suchThat(a => math.sqrt(a.map(x => x * x).sum) > 0.3)
      coefs <- Gen.listOfN(80, for {
        t <- Gen.choose(-100, 100).map(_ / 10.0) // along-axis, +/-10
        n <- Gen.listOfN(d, Gen.choose(-100, 100).map(_ / 100.0)) // noise +/-1
      } yield (t, n))
    } yield (axis, coefs.map { case (t, n) =>
      val nrm = math.sqrt(axis.map(x => x * x).sum)
      axis.map(_ / nrm).zip(n).map { case (u, eps) => t * u + eps }
    })
    for (((axis, rows), i) <- samples(cloudGen, 3).zipWithIndex) {
      val df = rows.zipWithIndex
        .map { case (v, id) => (id.toLong, v.map(_.toFloat)) }
        .toDF("id", "vec")
      val loading = graft.ext.PcaPower.topComponent(df, "vec", steps = 3)
        .orderBy("dim").collect().map(_.getLong(1).toDouble / 1e9)
      val nrmA = math.sqrt(axis.map(x => x * x).sum)
      val u = axis.map(_ / nrmA)
      val nrmL = math.sqrt(loading.map(x => x * x).sum)
      val cos = math.abs(
        u.zip(loading).map { case (a, b) => a * b }.sum / nrmL)
      assert(cos > 0.99, s"sample $i: |cos(loading, axis)| = $cos")
    }
  }

  test("BradleyTerry.fit ≡ sequential floored-MM replay; the rule converges to the MLE (property)") {
    val duelGen: Gen[List[(String, String, Long)]] = {
      val names = Vector("a", "b", "c", "d", "e", "f")
      Gen.listOfN(14, for {
        i <- Gen.choose(0, names.size - 1)
        j <- Gen.choose(0, names.size - 1) if i != j
        n <- Gen.choose(1L, 40L)
      } yield (names(i), names(j), n))
    }
    // plain-Scala replay of the kernel's floored nano arithmetic —
    // the SAME IEEE ops in the same order per term
    def replay(duels: List[(String, String, Long)],
               steps: Int): Map[String, (Long, Long)] = {
      val m = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      duels.foreach { case (wn, ln, n) =>
        m((wn, ln)) += n; m((ln, wn)) += n
      }
      val nodes = m.keys.map(_._1).toSeq.distinct.sorted
      val w = nodes.map(na =>
        na -> duels.filter(_._1 == na).map(_._3).sum).toMap
      var p = nodes.map(_ -> 1000000000L).toMap
      for (_ <- 1 to steps) {
        p = nodes.map { na =>
          val den = nodes.filter(nb => nb != na && m((na, nb)) > 0)
            .map(nb => math.floor(
              m((na, nb)).toDouble * 1e18 / (p(na) + p(nb)).toDouble).toLong)
            .sum
          na -> math.floor(w(na).toDouble * 1e18 / den.toDouble).toLong
        }.toMap
      }
      nodes.map(na => na -> (w(na), p(na))).toMap
    }
    for ((duels, i) <- samples(duelGen, 3).zipWithIndex) {
      // 1) the distributed fit IS the sequential replay, bit for bit
      val fit = graft.ext.BradleyTerry.fit(
          duels.toDF("win", "lose", "n"), steps = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      val want = replay(duels, 3)
      fit.foreach { case (na, w, pNano) =>
        assert((w, pNano) == want(na),
          s"sample $i node $na: got ($w, $pNano), want ${want(na)}")
      }
      // 2) the update RULE lands on the BT stationarity manifold:
      // w_i = p_i * sum_j m_ij/(p_i+p_j) at a deep (cheap, sequential)
      // horizon — a wrong rule would fix an O(1) distance away, while
      // MM's linear rate leaves < 0.1% residual by 5000 steps here
      val deep = replay(duels, 5000)
      val p = deep.view.mapValues(_._2.toDouble / 1e9).toMap
      val m = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      duels.foreach { case (wn, ln, n) =>
        m((wn, ln)) += n; m((ln, wn)) += n
      }
      deep.foreach { case (na, (w, pNano)) =>
        if (w == 0L) assert(pNano == 0L, s"sample $i: zero-win $na")
        else {
          val expected = p.keys.filter(_ != na)
            .map(nb => m((na, nb)) / (p(na) + p(nb))).sum * p(na)
          assert(math.abs(expected - w) < math.max(1e-3 * w, 1e-3),
            s"sample $i node $na: stationarity residual " +
              s"${expected - w} (w=$w)")
        }
      }
    }
  }

  test("kappa ppm statistics ≡ textbook Cohen/weighted kappa on random grade tables (property)") {
    val gradesGen: Gen[List[(Long, Long)]] = Gen.listOfN(50, for {
      ga <- Gen.choose(0L, 2L); gb <- Gen.choose(0L, 2L)
    } yield (ga, gb))
    val cases = samples(gradesGen, 3) :+
      List.tabulate(9)(i => (i % 3L, i % 3L)) // identical judges → kappa 1
    for ((gs, i) <- cases.zipWithIndex) {
      val n = gs.size.toLong
      val a = gs.count { case (x, y) => x == y }.toLong
      val dd = gs.map { case (x, y) => math.abs(x - y) }.sum
      def r(v: Long) = gs.count(_._1 == v).toLong
      def c(v: Long) = gs.count(_._2 == v).toLong
      val sS = (0L to 2L).map(v => r(v) * c(v)).sum
      val e = (for { x <- 0L to 2L; y <- 0L to 2L }
        yield math.abs(x - y) * r(x) * c(y)).sum
      val row = Seq((n, a, dd, sS, e)).toDF("n", "a", "dd", "s", "e")
        .select(expr(graft.ext.Agreement.KappaPpm).as("k"),
          expr(graft.ext.Agreement.WkappaPpm).as("wk"))
        .collect().head
      val kWant = if (n * n == sS) None else Some(math.floor(
        1e6 * (a.toDouble * n - sS) / (n.toDouble * n - sS)).toLong)
      val wkWant = if (e == 0L) None else Some(math.floor(
        1e6 * (1.0 - n.toDouble * dd / e.toDouble)).toLong)
      assert((if (row.isNullAt(0)) None else Some(row.getLong(0))) == kWant,
        s"sample $i kappa")
      assert((if (row.isNullAt(1)) None else Some(row.getLong(1))) == wkWant,
        s"sample $i weighted kappa")
      if (i == cases.size - 1) {
        assert(row.getLong(0) == 1000000L && row.getLong(1) == 1000000L,
          "identical judges must score kappa = 1")
      }
    }
  }

  test("DP Laplace noise: sign balance, mean |X| = 1/eps, exact eps power-of-two scaling") {
    // 4096 hash-seeded uniforms through the q356 mechanism at c = 0
    // (pure noise): the empirical draw must look Laplace(1/eps), and
    // eps = 1/4 must scale eps = 1's core by EXACTLY 4 (division by
    // 0.25 is a power-of-two rescale — bit-exact in IEEE)
    val rows = spark.range(4096)
      .select(expr("conv(substring(md5(CAST(id AS STRING)), 1, 13), 16, 10)")
        .cast("long").as("h"), lit(0L).as("c"))
      .select(
        expr(graft.queries.TextCurationQueries.DpNoisyMilli("1")).as("n1"),
        expr(graft.queries.TextCurationQueries.DpNoisyMilli("0.25")).as("n4"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toDouble
    val posFrac = rows.count(_._1 >= 0) / n
    assert(posFrac > 0.45 && posFrac < 0.55, s"sign balance $posFrac")
    val meanAbs1 = rows.map(r => math.abs(r._1) / 1000.0).sum / n
    assert(meanAbs1 > 0.9 && meanAbs1 < 1.1,
      s"mean |X| at eps=1: $meanAbs1, want ~1")
    val meanAbs4 = rows.map(r => math.abs(r._2) / 1000.0).sum / n
    assert(meanAbs4 > 3.6 && meanAbs4 < 4.4,
      s"mean |X| at eps=1/4: $meanAbs4, want ~4")
    rows.foreach { case (a, b) =>
      assert(math.abs(b - 4L * a) <= 4L,
        s"eps scaling broke: eps1=$a eps025=$b (want 4x up to floor)")
    }
  }

  test("SPRT window walk: first crossing ≡ the sequential scan definition (property)") {
    // the q357 formulation replaces the sequential test's scan with
    // cumsum windows + the lattice gate; pin its (decision, n_seen)
    // against a literal one-at-a-time walk using the same IEEE ops
    val streamGen: Gen[List[Int]] =
      Gen.listOfN(300, Gen.frequency(9 -> Gen.const(1), 1 -> Gen.const(0)))
    for ((bits, i) <- samples(streamGen, 3).zipWithIndex) {
      val df = bits.zipWithIndex
        .map { case (b, t) => (0L, t.toLong, b.toLong) }
        .toDF("cohort", "t", "succ")
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort").orderBy("t")
      val walked = df
        .withColumn("s", sum("succ").over(
          wc.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(wc).cast("long"))
        .withColumn("f", col("rn") - col("s"))
        .withColumn("dec", expr(graft.ext.Sprt.Decision))
        .filter(col("dec") =!= 0)
        .orderBy("rn").limit(1)
        .collect().headOption.map(r => (r.getLong(6), r.getLong(4)))
      // sequential definition: stop at the FIRST prefix whose LLR
      // crosses — same formula, evaluated fresh per prefix
      val l1 = math.log(0.95 / 0.85); val l0 = math.log(0.05 / 0.15)
      val bound = math.log(19.0)
      var (s, f) = (0L, 0L)
      var want: Option[(Long, Long)] = None
      for ((b, t) <- bits.zipWithIndex if want.isEmpty) {
        if (b == 1) s += 1 else f += 1
        val llr = s.toDouble * l1 + f.toDouble * l0
        if (llr >= bound) want = Some((1L, t + 1L))
        else if (llr <= -bound) want = Some((-1L, t + 1L))
      }
      assert(walked == want, s"sample $i: window walk $walked vs scan $want")
    }
  }

  test("EB shrinkage contracts: between raw and population mean; smaller n shrinks harder (property)") {
    val groupsGen: Gen[List[(Long, Long)]] = Gen.listOfN(24, for {
      n <- Gen.choose(1L, 200L)
      k <- Gen.choose(0L, n)
    } yield (n, k))
    for ((gs0, i) <- samples(groupsGen, 3).zipWithIndex) {
      // plant an equal-rate pair at different n for the monotonicity leg
      val gs = (40L, 30L) :: (400L, 300L) :: gs0
      val df = gs.toDF("n", "k")
        .withColumn("r", expr(graft.ext.EmpiricalBayes.RateNano))
        .withColumn("r2", expr(graft.ext.EmpiricalBayes.Rate2Nano))
      val mom = df.agg(sum("r").as("sr"), sum("r2").as("sr2"),
        count(lit(1)).as("g"))
      val out = df.crossJoin(broadcast(mom))
        .select(col("n"), col("k"),
          expr(graft.ext.EmpiricalBayes.AbMilli).as("ab"),
          expr(graft.ext.EmpiricalBayes.ShrunkPpm).as("sp"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      val m1 = gs.map { case (n, k) =>
        math.floor(1e9 * k.toDouble / n).toLong }.sum.toDouble /
        gs.size / 1e9
      out.foreach { case (n, k, ab, sp) =>
        val raw = 1e6 * k.toDouble / n
        if (ab.isDefined) {
          val lo = math.min(raw, 1e6 * m1) - 1
          val hi = math.max(raw, 1e6 * m1) + 1
          assert(sp >= lo && sp <= hi,
            s"sample $i ($n,$k): shrunk $sp outside [$lo, $hi]")
        } else assert(math.abs(sp - math.floor(raw).toLong) <= 0,
          s"sample $i: no-prior fallback must be the raw rate")
      }
      val small = out.find(o => o._1 == 40L && o._2 == 30L).get._4
      val big = out.find(o => o._1 == 400L && o._2 == 300L).get._4
      if (out.head._3.isDefined) {
        val target = 1e6 * m1
        assert(math.abs(small - target) <= math.abs(big - target) + 1,
          s"sample $i: n=40 ($small) must sit closer to the mean " +
            s"(${target.toLong}) than n=400 ($big)")
      }
    }
  }

  test("Kneser-Ney term: p(.|w1) sums to exactly 1 over the full vocab (property)") {
    // the smoother's defining invariant: the discounted mass D*N1+(w1.)
    // exactly funds the continuation distribution, so summing the
    // SHARED KnTermNano expression over observed AND unseen w2 must
    // return 1 per context (up to the 1e-9 nano floor per term)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docGen: Gen[List[List[String]]] =
      Gen.listOfN(12, Gen.choose(2, 15).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab))))
    for ((docs, i) <- samples(docGen, 3).zipWithIndex) {
      val bigrams = docs.flatMap(d => d.zip(d.tail))
      val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nfol = bigrams.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.size.toLong).toMap
      val npre = bigrams.groupBy(_._2).view
        .mapValues(_.map(_._1).distinct.size.toLong).toMap
      val bt = c12.size.toLong
      // npre = 0 with c12 = 0 means p = 0 exactly (ln would be -inf);
      // those rows carry no mass, so the sum runs over the rest
      val rows = (for { w1 <- c1.keys.toSeq; w2 <- vocab } yield
        (w1, w2, c12.getOrElse((w1, w2), 0L), c1(w1), nfol(w1),
          npre.getOrElse(w2, 0L), bt))
        .filter(r => r._3 > 0 || r._6 > 0)
      val sums = rows.toDF("w1", "w2", "c12", "c1", "nfol", "npre", "bt")
        .select(col("w1"),
          expr(graft.queries.TextCurationQueries.KnTermNano).as("nano"))
        .groupBy("w1").agg(sum(expr("exp(CAST(nano AS DOUBLE) / 1e9)")).as("p"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      sums.foreach { case (w1, p) =>
        assert(math.abs(p - 1.0) < 1e-6,
          s"sample $i: sum p(.|$w1) = $p, expected 1")
      }
    }
  }
}
