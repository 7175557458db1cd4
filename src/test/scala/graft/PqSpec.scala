package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Pq, Similarity}

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val gf = graft.functions.GraftFunctions

  // Hadamard sign patterns: mutually orthogonal, all norm 2 — so every
  // constructed vector has the SAME norm (sqrt(8)) and its normalized
  // subvectors take at most 4 distinct values per subspace, which a
  // K=4 codebook represents exactly (PQ is lossless on this corpus).
  private val pool: Seq[Seq[Double]] = Seq(
    Seq(1.0, 1.0, 1.0, 1.0), Seq(1.0, -1.0, 1.0, -1.0),
    Seq(1.0, 1.0, -1.0, -1.0), Seq(1.0, -1.0, -1.0, 1.0))

  private lazy val corpus = {
    // first 4 vectors are (p0,p0)..(p3,p3): the lowest-id seeds cover
    // every pool value in both subspaces
    val combos = Seq((0, 0), (1, 1), (2, 2), (3, 3),
      (0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 3), (2, 0), (3, 1))
    combos.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, (pool(a) ++ pool(b)).map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("VecNormalize yields unit vectors and passes zero vectors through") {
    val rows = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 0.0)))
      .toDF("id", "v")
      .withColumn("n", gf.vecNormalize(spark, col("v")))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Double](2) == Seq(0.6, 0.8))
    assert(rows(1).getSeq[Double](2) == Seq(0.0, 0.0))
  }

  test("PqEncode assigns the L2-nearest codeword per subspace, lower index on tie") {
    val books: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),   // subspace 0
      Seq(Seq(2.0, 2.0), Seq(-2.0, -2.0))) // subspace 1
    val rows = Seq(
      (1L, Seq(0.1, 0.1, -1.0, -1.0)),  // -> (0, 1)
      (2L, Seq(0.9, 0.9, 3.0, 1.0)),    // -> (1, 0)
      (3L, Seq(0.5, 0.5, 0.0, 0.0)),    // both-equidistant -> (0, 0)
      (4L, Seq(1.0, 2.0, 3.0)))         // dims mismatch -> null
      .toDF("id", "v")
      .withColumn("codes", gf.pqEncode(spark, col("v"), typedLit(books)))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Int](2) == Seq(0, 1))
    assert(rows(1).getSeq[Int](2) == Seq(1, 0))
    assert(rows(2).getSeq[Int](2) == Seq(0, 0))
    assert(rows(3).isNullAt(2))
  }

  test("PqAdcScore sums table entries at the coded offsets (codegen path)") {
    val table = Seq(10.0, 20.0, 30.0, 40.0, 1.0, 2.0, 3.0, 4.0) // M=2, K=4
    val rows = Seq(
      (1L, Seq(0, 3)),  // 10 + 4
      (2L, Seq(2, 1)),  // 30 + 2
      (3L, Seq(4, 0)),  // out-of-range code -> null
      (4L, Seq(0, 1, 2))) // 8 % 3 != 0 -> null
      .toDF("id", "codes")
      .withColumn("s", gf.pqAdcScore(spark, col("codes"), typedLit(table)))
      .orderBy("id").collect()
    assert(rows(0).getDouble(2) == 14.0)
    assert(rows(1).getDouble(2) == 32.0)
    assert(rows(2).isNullAt(2) && rows(3).isNullAt(2))
  }

  test("pqTopK equals brute force on a corpus the codebook represents exactly") {
    val queries = corpus.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rnk").collect().toSet
    val viaPq = Pq.pqTopK(corpus, queries, "vec_id", "embedding", k = 3,
        m = 2, kCodes = 4, sweeps = 2)
      .select("query_id", "neighbor_id", "rnk").collect().toSet
    assert(viaPq == exact)
    // and the re-ranked production path agrees too
    val reranked = Pq.pqTopK(corpus, queries, "vec_id", "embedding", k = 3,
        m = 2, kCodes = 4, sweeps = 2, rerankFactor = 2)
      .select("query_id", "neighbor_id", "rnk").collect().toSet
    assert(reranked == exact)
  }

  test("ivfPqTopK at full probe equals brute force on the lossless corpus") {
    // nProbe = nCentroids: every cell is read, so IVF cannot lose a
    // candidate; the codebook is lossless on this corpus, so ADC
    // ordering is exact; rerank headroom then makes the composition
    // exactly brute force — a REAL correctness signal for the cell
    // filter + code scan + re-rank join (the q52 trick, PQ edition).
    val queries = corpus.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rnk").collect().toSet
    val viaIvfPq = Pq.ivfPqTopK(corpus, queries, "vec_id", "embedding", k = 3,
        nCentroids = 4, nProbe = 4, m = 2, kCodes = 4, sweeps = 2,
        rerankFactor = 2)
      .select("query_id", "neighbor_id", "rnk").collect().toSet
    assert(viaIvfPq == exact)
  }

  test("IvfPqIndex: save/load round-trips models and search; cell pruning holds") {
    import graft.ext.IvfPqIndex
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val queries = corpus.filter(col("vec_id") < 3)
    val idx = IvfPqIndex.build(corpus, "vec_id", "embedding",
      nCentroids = 4, m = 2, kCodes = 4, sweeps = 2)
    val inMem = idx.search(queries, corpus, "vec_id", "embedding",
        k = 3, nProbe = 2, rerankFactor = 2)
      .collect().map(_.toSeq).toSet
    idx.save(dir)
    val loaded = IvfPqIndex.load(spark, dir)
    assert(loaded.centroids == idx.centroids)
    assert(loaded.codebooks == idx.codebooks)
    val viaDisk = loaded.search(queries, corpus, "vec_id", "embedding",
      k = 3, nProbe = 2, rerankFactor = 2)
    assert(viaDisk.collect().map(_.toSeq).toSet == inMem)
    val plan = viaDisk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"loaded IVF-PQ search must prune cell partitions:\n$plan")
  }

  test("codebook training is deterministic and keeps empty cells") {
    val b1 = Pq.trainCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4)
    val b2 = Pq.trainCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4)
    assert(b1 == b2)
    assert(b1.size == 2 && b1.forall(book => book.size == 4 && book.forall(_.size == 4)))
    // every trained codeword is one of the 4 normalized pool values
    // (the corpus is exactly representable): |entry| = 1/sqrt(8) at 9dp
    val mag = BigDecimal(1 / math.sqrt(8.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    b1.flatten.flatten.foreach(x => assert(math.abs(math.abs(x) - mag) < 1e-9))
    // dims not divisible by m fails fast on the driver
    assertThrows[IllegalArgumentException] {
      Pq.trainCodebooks(corpus, "vec_id", "embedding", m = 3, k = 4)
    }
  }
}
