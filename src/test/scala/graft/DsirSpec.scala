package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dsir

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the cat sat on the mat", true),
    (1L, "the dog sat on the rug", true),
    (2L, "der hund sitzt auf dem teppich", false),
    (3L, "le chat est sur le tapis", false),
    (4L, "the cat and the dog sat", true),
    (5L, "", false),
  ).toDF("doc_id", "text", "is_en")

  test("importance weights point toward the target distribution") {
    val w = Dsir.withImportanceWeights(corpus, "doc_id", "text", $"is_en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // disjoint vocabularies: every target doc outscores every non-target
    val tgt = Seq(0L, 1L, 4L).map(w(_).getAs[Double]("llr_per_gram"))
    val non = Seq(2L, 3L).map(w(_).getAs[Double]("llr_per_gram"))
    assert(tgt.min > non.max)
    // empty text: no grams, zero weight (the left-join/coalesce path)
    assert(w(5L).getAs[Long]("n_grams") == 0L)
    assert(w(5L).getAs[Double]("llr") == 0.0)
    assert(w(5L).getAs[Double]("llr_per_gram") == 0.0)
    // grams = unigrams + bigrams = n + (n-1)
    assert(w(0L).getAs[Long]("n_grams") == 6 + 5)
  }

  test("importance weights are invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.withImportanceWeights(df, "doc_id", "text", $"is_en")
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("n_grams"), r.getAs[Double]("llr")))
    val a = run(corpus)
    val b = run(corpus.repartition(7))
    assert(a.length == b.length)
    a.zip(b).foreach { case ((na, la), (nb, lb)) =>
      assert(na == nb)
      assert(math.abs(la - lb) < 1e-9) // sum order may differ at ulp level
    }
  }

  test("cross-entropy: rare text scores higher than corpus boilerplate") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the rug"),
      (2L, "the cat sat on the hat"),
      (3L, "zq xv qj wk vx jq zz qq"),
    ).toDF("doc_id", "text")
    val x = Dsir.withCrossEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    assert(x(3L) > x(0L) && x(3L) > x(1L) && x(3L) > x(2L))
  }

  test("cross-entropy matches a driver-side replay exactly on tiny data") {
    val docs = Seq((0L, "a b a"), (1L, "b c")).toDF("doc_id", "text")
    val out = Dsir.withCrossEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("xent")))).toMap
    def bucket(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    def gramsOf(t: String): Seq[String] = {
      val tk = t.split(" ", -1).toSeq
      tk ++ (if (tk.length >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq else Nil)
    }
    val all = Seq("a b a", "b c").flatMap(gramsOf)
    val cnt = all.groupBy(bucket).map { case (b, g) => b -> g.size.toDouble }
    val r = all.size.toDouble
    def xent(t: String): Double = {
      val gs = gramsOf(t)
      gs.map(g => -math.log((cnt(bucket(g)) + 1.0) / (r + 4096.0))).sum / gs.size
    }
    assert(out(0L)._1 == 5L)
    assert(math.abs(out(0L)._2 - xent("a b a")) < 1e-12)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - xent("b c")) < 1e-12)
  }

  test("non-default bucket widths: narrower buckets still separate the target") {
    // hexChars=2 (256 buckets): collisions rise but target separation
    // on disjoint vocabularies must hold at any width
    val w = Dsir.withImportanceWeights(corpus, "doc_id", "text", $"is_en",
        hexChars = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("llr_per_gram")).toMap
    assert(Seq(0L, 1L, 4L).map(w).min > Seq(2L, 3L).map(w).max)
    intercept[IllegalArgumentException] {
      Dsir.withImportanceWeights(corpus, "doc_id", "text", $"is_en",
        hexChars = 7)
    }
  }

  test("resampleTopK: temperature 0 is plain top-k; noise is content-keyed") {
    val w = Seq((1L, 10.0), (2L, 8.0), (3L, 6.0), (4L, 4.0), (5L, 2.0))
      .toDF("id", "wt")
    val t0 = Dsir.resampleTopK(w, $"id", $"wt", 2, temperature = 0.0)
      .select("id").as[Long].collect().toSet
    assert(t0 == Set(1L, 2L))
    // schema unchanged (score column dropped)
    assert(Dsir.resampleTopK(w, $"id", $"wt", 2).columns.toSeq == Seq("id", "wt"))
    // same data, any partitioning -> same selected set
    val a = Dsir.resampleTopK(w, $"id", $"wt", 3, salt = "s")
      .select("id").as[Long].collect().toSet
    val b = Dsir.resampleTopK(w.repartition(5), $"id", $"wt", 3, salt = "s")
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 3)
    // a dominant weight always survives the noise
    val boosted = w.withColumn("wt", when($"id" === 5L, 1e6).otherwise($"wt"))
    val c = Dsir.resampleTopK(boosted, $"id", $"wt", 1)
      .select("id").as[Long].collect()
    assert(c.sameElements(Array(5L)))
  }

  test("bucketKl: single group scores ~0 against itself; drifted group scores higher") {
    import org.apache.spark.sql.functions._
    // one group IS the corpus -> its distribution only differs from
    // the corpus model through its own smoothing (same counts, same
    // totals) -> KL exactly 0
    val one = corpus.filter($"text" =!= "").withColumn("g", lit("all"))
    val self = Dsir.bucketKl(one, "doc_id", "text", "g")
      .head().getAs[Double]("kl")
    assert(math.abs(self) < 1e-12, s"self-KL was $self")
    graft.ops.Staging.releaseAll()
    // an English group vs a corpus dominated by it: the non-English
    // sliver must be the more divergent group, and both KLs >= 0
    val grouped = corpus.filter($"text" =!= "")
      .withColumn("g", when($"is_en", "en").otherwise("other"))
    val kl = Dsir.bucketKl(grouped, "doc_id", "text", "g")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kl")).toMap
    assert(kl.values.forall(_ >= 0.0), s"KL must be non-negative: $kl")
    assert(kl("other") > kl("en"),
      s"the minority distribution must diverge more: $kl")
    graft.ops.Staging.releaseAll()
  }

  test("sourceKlMatrix: vacuous vocabulary valve == full vocab; real cut shrinks the grid; totals broadcast") {
    val docs = Seq(
      ("a", "the cat sat on the mat"),
      ("a", "the dog sat"),
      ("b", "the cat ran far away"),
      ("b", "a dog ran")).toDF("source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source_a", "source_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val full = rows(Dsir.sourceKlMatrix(docs, "source", "text"))
    graft.ops.Staging.releaseAll()
    // r17 verdict item 6: a cut that keeps everything must be a
    // NO-OP — topV >= |V| and minCount = 1 reproduce the full grid
    val vacuous = rows(Dsir.sourceKlMatrix(docs, "source", "text",
      minCount = 1L, topV = Some(1000)))
    graft.ops.Staging.releaseAll()
    assert(vacuous == full, "vacuous top-V/minCount cut must equal full vocab")
    assert(full.map(_._3).distinct.size == 1 && full.head._3 > 0,
      "every ordered pair sees the same joint-vocab term count")
    // a real cut: minCount = 2 drops hapax terms -> fewer grid terms,
    // and the matrix stays well-formed (both ordered pairs present)
    val cut = rows(Dsir.sourceKlMatrix(docs, "source", "text", minCount = 2L))
    graft.ops.Staging.releaseAll()
    assert(cut.map(t => (t._1, t._2)) == full.map(t => (t._1, t._2)))
    assert(cut.head._3 < full.head._3, "minCount=2 must shrink the vocabulary")
    // intent hint (r17 verdict finding 2): the sources frame enters
    // the grid cross join as a BROADCAST, never a shuffled NL join
    val plan = Dsir.sourceKlMatrix(docs, "source", "text")
      .queryExecution.executedPlan.toString
    graft.ops.Staging.releaseAll()
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast cross join in:\n$plan")
  }
}
