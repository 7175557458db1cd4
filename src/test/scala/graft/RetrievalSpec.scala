package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Retrieval, TextStats}

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- BM25 ------------------------------------------------------

  test("withBm25 reproduces the hand-computed score on a tiny corpus") {
    val docs = Seq((0L, "cat dog"), (1L, "cat cat cat dog"), (2L, "fish"))
      .toDF("doc_id", "text")
    val out = Retrieval.withBm25(docs, "text", Seq("cat"))
      .orderBy("doc_id").collect()
    // N=3, dl=(2,4,1), sum_dl=7, avgdl=7/3, df(cat)=2
    val n = 3.0; val df = 2.0; val avgdl = 7.0 / n
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def score(tf: Double, dl: Double): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(out(0).getAs[Double]("bm25") - score(1, 2)) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("bm25") - score(3, 4)) < 1e-12)
    assert(out(2).getAs[Double]("bm25") == 0.0) // tf=0 scores exactly 0
    assert(out.map(_.getAs[Long]("dl")).toSeq == Seq(2L, 4L, 1L))
    assert(out.map(_.getAs[Long]("n_hits")).toSeq == Seq(1L, 3L, 0L))
  }

  test("withBm25: multi-term scores sum per-term; rarer term earns more") {
    val docs = Seq(
      (0L, "alpha beta beta beta"),
      (1L, "alpha gamma gamma gamma"),
      (2L, "alpha alpha alpha alpha"),
      (3L, "beta delta delta delta")).toDF("doc_id", "text")
    val both = Retrieval.withBm25(docs, "text", Seq("alpha", "beta"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    val a = Retrieval.withBm25(docs, "text", Seq("alpha"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    val b = Retrieval.withBm25(docs, "text", Seq("beta"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(math.abs(both(id) - (a(id) + b(id))) < 1e-12,
        s"doc $id: ${both(id)} != ${a(id)} + ${b(id)}")
    }
    // beta (df=2) discriminates more than alpha (df=3) at equal tf/dl
    assert(b(3L) > a(1L))
  }

  // ---- PMI collocations ------------------------------------------

  test("collocationsPmi counts and scores exactly on a tiny corpus") {
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val out = TextStats.collocationsPmi(docs, "text", minCount = 1L)
      .orderBy("w1", "w2").collect()
    // tokens: 7; unigrams a:3 b:3 c:1; bigrams "a b":3 "b a":1 "b c":1
    val rows = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getAs[Double]("pmi")))
    assert(rows.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == Seq(
      ("a", "b", 3L, 3L, 3L), ("b", "a", 1L, 3L, 3L), ("b", "c", 1L, 3L, 1L)))
    val exp = Map(("a", "b") -> math.log(3.0 * 7 / (3.0 * 3)),
                  ("b", "a") -> math.log(1.0 * 7 / (3.0 * 3)),
                  ("b", "c") -> math.log(1.0 * 7 / (3.0 * 1)))
    rows.foreach { t =>
      assert(math.abs(t._6 - exp((t._1, t._2))) < 1e-12, s"pmi of ${(t._1, t._2)}")
    }
  }

  // ---- class-based TF-IDF ----------------------------------------

  test("distinctiveTerms: ubiquitous terms score 0, exclusive terms ln(nGroups)") {
    val docs = Seq(("g1", "a a b"), ("g2", "a c")).toDF("grp", "text")
    val out = Retrieval.distinctiveTerms(docs, "grp", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getAs[Double]("score"))).toMap
    assert(out(("g1", "a"))._3 == 0.0) // in every group -> ln(1) = 0
    assert(out(("g2", "a"))._3 == 0.0)
    assert(math.abs(out(("g1", "b"))._3 - math.log(2.0)) < 1e-12)
    assert(math.abs(out(("g2", "c"))._3 - math.log(2.0)) < 1e-12)
    assert(out(("g1", "a"))._1 == 2L && out(("g1", "a"))._2 == 2L)
  }

  test("collocationsPmi: minCount prunes the bigram tail before the joins") {
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val out = TextStats.collocationsPmi(docs, "text", minCount = 2L).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "a" && out(0).getString(1) == "b")
  }

  test("withBm25 top-k plan: broadcast stats row, TakeOrdered, pruned stats scan") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val q = Retrieval.withBm25(docs, "text", Seq("join", "vector"))
      .select($"doc_id", round($"bm25", 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id").limit(10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered, not sort+limit:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"the 1-row stats aggregate must broadcast:\n$plan")
    // the corpus-stats pass must scan ONLY the text column
    assert(plan.contains("ReadSchema: struct<text:string>"),
      s"stats scan must prune to text:\n$plan")
  }

  // ---- persistent inverted index ----------------------------------

  private def topDocs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("doc_id", "bm25").as[(Long, Double)].collect().toSeq

  test("InvertedIndex: search ≡ scan-path BM25 top-k; scan prunes term partitions") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val terms = Seq("join", "vector", "scan")
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString
    graft.ext.InvertedIndex.build(docs, "doc_id", "text", dir)
    val viaIndex = graft.ext.InvertedIndex.search(spark, dir, terms, k = 10)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p#"),
      s"index search must prune term-prefix partitions:\n$plan")
    val got = topDocs(viaIndex)
    val exp = graft.ext.Retrieval.withBm25(docs, "text", terms)
      .orderBy($"bm25".desc, $"doc_id").limit(10)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == exp.map(_._1))
    got.zip(exp).foreach { case ((_, a), (_, b)) =>
      // scan path sums terms in fixed order, index path sums posting
      // rows — equal up to aggregation-order ulps
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
    graft.ops.Staging.releaseAll()
  }

  test("InvertedIndex.append: build(half)+append(half) ≡ build(full)") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val terms = Seq("join", "batch")
    val half1 = docs.filter($"doc_id" % 2 === 0)
    val half2 = docs.filter($"doc_id" % 2 =!= 0)
    val incDir = java.nio.file.Files.createTempDirectory("invinc").toString
    val fullDir = java.nio.file.Files.createTempDirectory("invfull").toString
    graft.ext.InvertedIndex.build(half1, "doc_id", "text", incDir)
    graft.ext.InvertedIndex.append(spark, incDir, half2, "doc_id", "text")
    graft.ext.InvertedIndex.build(docs, "doc_id", "text", fullDir)
    val inc = topDocs(graft.ext.InvertedIndex.search(spark, incDir, terms, k = 10))
    graft.ops.Staging.releaseAll()
    val full = topDocs(graft.ext.InvertedIndex.search(spark, fullDir, terms, k = 10))
    graft.ops.Staging.releaseAll()
    assert(inc.map(_._1) == full.map(_._1))
    inc.zip(full).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
  }
}
