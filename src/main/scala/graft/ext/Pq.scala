package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the ANN MEMORY path that complements the
  * IVF/LSH candidate-generation paths ([[Similarity]], [[IvfIndex]]):
  * each vector is stored as M small codes (M bytes at K<=256) instead
  * of 4*dims float bytes — 32x smaller for the 64-dim corpus — and a
  * query scores a row with M table lookups (asymmetric distance,
  * ADC) instead of a dims-length dot product. At 10^9+ vectors this
  * is what makes the index fit executor memory at all; production
  * systems compose it with IVF cells (IVF-PQ). Jegou et al., "Product
  * Quantization for Nearest Neighbor Search" (TPAMI 2011) — public
  * method, original implementation.
  *
  * Cosine reduction: corpus and queries are unit-normalized first
  * (native [[graft.functions.VecNormalize]]), so inner product IS
  * cosine and decomposes additively over subspaces — the property ADC
  * needs.
  *
  * Scale shape: codebooks are trained with per-subspace Lloyd sweeps
  * where the assignment ([[graft.functions.PqEncode]], codebooks as a
  * literal — no codebook join) runs map-side and only M*K*dsub-double
  * partial sums cross the exchange per partition
  * ([[graft.functions.VectorSum]] after a posexplode of the M codes).
  * The posexplode multiplies TRAINING rows only — at 100 TB you train
  * on a bounded sample (standard practice; the codebook has M*K*dsub
  * parameters, thousands of vectors suffice) and encode the full
  * corpus in one map-side scan. Search is one scan of the M-byte
  * codes with the query tables riding along in a broadcast — the same
  * no-shuffle shape as [[Similarity.bruteForceTopK]] but reading
  * codes, not vectors. Queries are assumed driver-small (collected to
  * build their ADC tables), like the centroid matrix in [[IvfIndex]].
  *
  * Determinism: seeds are the K lowest-id vectors' subvectors,
  * assignment ties break toward the lower codeword, means are rounded
  * to 9 decimals (the [[Similarity.ivfCentroids]] rule — partition
  * scheduling cannot leak into the codebook), and final ranking ties
  * break by neighbor id.
  */
object Pq {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** Per-subspace Lloyd training over UNIT-NORMALIZED vectors.
    * Returns the [m][j][dsub] codebook tensor (driver-resident; at
    * M=8, K=16, dsub=8 it is 1024 doubles — rides into every later
    * scan as a literal). `corpus` must carry `idCol` and a
    * float/double array `vecCol` whose dims are divisible by m. */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, sweeps: Int = 2): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && k >= 1 && sweeps >= 0, "m, k must be >= 1; sweeps >= 0")
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    val norm = corpus.select(col(idCol).cast("long").as("id"),
      gf.vecNormalize(spark, Similarity.asDouble(col(vecCol))).as("v"))
    // seeds: subvectors of the k lowest-id vectors ("first" strategy —
    // the pinned deterministic configuration, see ivfCentroids)
    val seedRows = norm.orderBy(col("id")).limit(k).collect()
    require(seedRows.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val dims = seedRows.head.getSeq[Double](1).size
    require(dims % m == 0, s"vector dims $dims not divisible by m = $m")
    val dsub = dims / m
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      seedRows.toSeq.map(_.getSeq[Double](1).slice(mi * dsub, (mi + 1) * dsub))
    }
    for (_ <- 0 until sweeps) {
      val sums = norm
        .withColumn("codes", gf.pqEncode(spark, col("v"), typedLit(books)))
        .select(col("v"), posexplode(col("codes")).as(Seq("m", "code")))
        .withColumn("sub", slice(col("v"), col("m") * lit(dsub) + lit(1), lit(dsub)))
        .groupBy("m", "code")
        .agg(gf.vectorSum(spark, col("sub")).as("vs"))
        .select(col("m"), col("code"), col("vs.sum").as("s"), col("vs.n").as("n"))
        .collect()
      val byCell = sums.map(r =>
        (r.getInt(0), r.getInt(1)) -> ((r.getSeq[Double](2), r.getLong(3)))).toMap
      books = books.zipWithIndex.map { case (book, mi) =>
        book.zipWithIndex.map { case (old, j) =>
          byCell.get((mi, j)) match {
            case Some((s, n)) if n > 0 => s.map(x => round9(x / n))
            case _ => old // empty cells keep their previous codeword
          }
        }
      }
    }
    books
  }

  /** Map-side corpus encode: (id, codes array<int>) — the stored PQ
    * index (M small ints per vector; a production layout packs them
    * to M bytes). One scan, no shuffle. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    corpus.select(col(idCol).cast("long").as("id"),
      gf.pqEncode(spark,
        gf.vecNormalize(spark, Similarity.asDouble(col(vecCol))),
        typedLit(books)).as("codes"))
  }

  /** Flattened ADC table for one (already unit-normalized) query:
    * entry m*K + j = IP(query subvector m, codeword j). Driver-side:
    * M*K*dsub multiplications per query. */
  def adcTable(qVec: Seq[Double], books: Seq[Seq[Seq[Double]]]): Seq[Double] = {
    val m = books.size
    val dsub = books.head.head.size
    require(qVec.size == m * dsub,
      s"query dims ${qVec.size} != codebook dims ${m * dsub}")
    books.zipWithIndex.flatMap { case (book, mi) =>
      book.map { cw =>
        var s = 0.0
        var i = 0
        while (i < dsub) { s += qVec(mi * dsub + i) * cw(i); i += 1 }
        s
      }
    }
  }

  /** IVF-PQ: the production composition (the FAISS `IVFx,PQy` shape)
    * — IVF cells bound WHICH rows a query reads (nProbe of nCentroids
    * cells), PQ codes bound HOW MANY bytes each read row costs (M
    * codes, not dims floats). A search therefore scans
    * ~corpus * nProbe/nCentroids rows at M bytes each — both axes of
    * the 10^9-vector cost cut in one plan — then re-ranks the top
    * rerankFactor*k ADC candidates exactly from the float vectors.
    * Cells come from [[Similarity.ivfCentroids]] and codebooks from
    * [[trainCodebooks]] (both deterministic); the cell filter is an
    * IN-list over the probed cells, so a cell-partitioned saved
    * layout ([[IvfIndex.save]]) prunes partition directories at the
    * scan exactly like the float/int8 paths. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int,
                nCentroids: Int = 16, nProbe: Int = 4,
                m: Int = 8, kCodes: Int = 64, sweeps: Int = 2,
                rerankFactor: Int = 16,
                codebooks: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids, "need 1 <= nProbe <= nCentroids")
    IvfPqIndex.build(corpus, idCol, vecCol, nCentroids, m, kCodes, sweeps,
        codebooks)
      .search(queries, corpus, idCol, vecCol, k, nProbe, rerankFactor)
  }

  /** PQ ANN top-k: train (or reuse) codebooks, encode the corpus,
    * score every (query, code-row) pair by ADC table sum, take top k
    * per query. `rerankFactor > 0` adds the production re-rank: top
    * rerankFactor*k ADC candidates re-scored EXACTLY from the float
    * vectors (the quantization-error absorber, same shape as
    * [[IvfIndex.searchQuantized]]). Output matches the other ANN
    * paths: (query_id, neighbor_id, cosine_sim, rnk) — with
    * rerankFactor = 0 the `cosine_sim` column holds the ADC
    * approximation, rounded like its siblings. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int,
             m: Int = 8, kCodes: Int = 16, sweeps: Int = 2,
             rerankFactor: Int = 0,
             codebooks: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    val books = codebooks.getOrElse(
      trainCodebooks(corpus, idCol, vecCol, m, kCodes, sweeps))
    val codes = encode(corpus, idCol, vecCol, books)
      .withColumnRenamed("id", "neighbor_id")
    // queries are driver-small: collect to build per-query ADC tables
    val qRows = queries.select(col(idCol).cast("long").as("id"),
        gf.vecNormalize(spark, Similarity.asDouble(col(vecCol))).as("v"))
      .collect()
    import spark.implicits._
    val qdf = qRows.toSeq
      .map(r => (r.getLong(0), adcTable(r.getSeq[Double](1), books)))
      .toDF("query_id", "adc_table")
    val scored = codes.crossJoin(broadcast(qdf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", gf.pqAdcScore(spark, col("codes"), col("adc_table")))
      .select("query_id", "neighbor_id", "sim")
    if (rerankFactor <= 0) Similarity.rerankTopK(scored, k)
    else {
      val cands = Similarity.rerankTopK(scored, k * rerankFactor)
        .select("query_id", "neighbor_id")
      val corpusV = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        Similarity.asDouble(col(vecCol)).as("c_vec"))
      val qv = queries.select(col(idCol).cast("long").as("query_id"),
        Similarity.asDouble(col(vecCol)).as("q_vec"))
      val exact = corpusV.join(broadcast(cands), "neighbor_id")
        .join(broadcast(qv), "query_id")
        .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
        .select("query_id", "neighbor_id", "sim")
      Similarity.rerankTopK(exact, k)
    }
  }
}
