package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`), UDF-free.
  *
  * Two paths:
  *  - bruteForceTopK: exact cosine top-k by broadcasting the (small)
  *    query set against the corpus — one scan, no shuffle of the
  *    corpus, TakeOrdered per query. Right answer when |queries| is
  *    small; the corpus side streams at any scale.
  *  - lshTopK: random-hyperplane LSH bucketing (deterministic
  *    hash-derived planes) — corpus shuffles once on the bucket key,
  *    and each query only compares against its bucket's candidates.
  *    The 100 TB path: candidate count is corpus/2^planes per bucket.
  */
object Similarity {

  /** Elementwise-double dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cast array<float> to array<double> for numerically-stable math. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Exact cosine top-k: for each query vector (small set, broadcast),
    * the k nearest corpus vectors by cosine similarity.
    * Determinism: ties broken by neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val gf = graft.functions.GraftFunctions
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
    // Partial top-k aggregate instead of a row_number window: only k
    // pairs per partition per query reach the shuffle, vs shuffling
    // every (corpus x query) scored row. Same answer, same tie-break
    // (score desc, id asc).
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
      .groupBy("query_id")
      .agg(gf.topKByScore(spark, col("sim"), col("neighbor_id"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
              round(col("hit.score"), 6).as("cosine_sim"),
              (col("pos") + 1).as("rnk"))
  }

  /** Sign-bucket key: one bit per hyperplane from the sign of
    * dot(vec, plane_j) — the native fused
    * [[graft.functions.HyperplaneBucket]] expression. */
  def withLshBucket(df: DataFrame, vecCol: String, planes: Int,
                    out: String = "bucket"): DataFrame =
    df.withColumn(out,
      graft.functions.GraftFunctions.hyperplaneBucket(
        df.sparkSession, col(vecCol), planes))

  /** IVF (inverted-file) ANN: partition the corpus into `nCentroids`
    * Voronoi cells around deterministic seed centroids (the lowest-id
    * vectors — production would run a few k-means sweeps, same plan
    * shape), then search only the `nProbe` cells nearest each query,
    * re-ranking exactly.
    *
    * Scale shape: the centroid matrix lives on the driver (it does in
    * any IVF build) and rides into the plan as a literal, so cell
    * assignment is a MAP-SIDE fold ([[graft.functions.NearestCentroids]])
    * — no crossJoin with the centroid table, no per-vector row_number
    * window, zero corpus shuffle (round 1 shuffled corpus x nCentroids
    * rows here). The query side broadcasts, and the final top-k is the
    * partial [[graft.functions.TopKByScore]] aggregate, so only k rows
    * per partition per query reach the one remaining exchange. Each
    * query touches ~corpus/nCentroids*nProbe candidates — the
    * structure that keeps ANN sublinear at 10^9+ vectors.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    // Seed centroids, sorted by id so centroid INDEX order equals id
    // order (the expression tie-breaks on index; round 1 tie-broke on
    // cent_id — same ordering).
    val cents: Seq[Seq[Double]] = corpus
      .select(col(idCol).cast("long").as("id"), asDouble(col(vecCol)).as("v"))
      .orderBy(col("id")).limit(nCentroids)
      .collect().toSeq.map(_.getSeq[Double](1))
    val centsLit = typedLit(cents)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec"))
      .withColumn("cell", gf.nearestCentroids(spark, col("c_vec"), centsLit, 1)(0))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("cell", explode(gf.nearestCentroids(spark, col("q_vec"), centsLit, nProbe)))
    c.join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
      .groupBy("query_id")
      .agg(gf.topKByScore(spark, col("sim"), col("neighbor_id"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
              round(col("hit.score"), 6).as("cosine_sim"),
              (col("pos") + 1).as("rnk"))
  }

  /** Exact near-duplicate pairs (cosine >= threshold) through a banded
    * random-hyperplane candidate generator: `bands` independent bands
    * of `planesPerBand` sign bits (one fused [[withLshBucket]] call
    * computes all bands' bits); a pair is a candidate iff it collides
    * in at least one band, and every candidate is verified with the
    * exact cosine — the q31 MinHash pattern applied to embedding
    * space. Shuffle volume is O(n·bands) band keys plus the verified
    * candidates, never the O(n^2) crossJoin. Recall is a deterministic
    * property of the fixed hash-derived planes: a true pair at angle θ
    * is missed with probability (1-(1-θ/π)^P)^B — ~6e-4 at cos 0.5
    * with the default P=3, B=21 — and the driver oracle checks the
    * output against the exact pair set at test scale.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, bands: Int = 21,
                      planesPerBand: Int = 3): DataFrame = {
    require(bands >= 1 && planesPerBand >= 1 && bands * planesPerBand <= 63,
      "bands*planesPerBand must fit in a long's sign-free bits")
    val e = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = withLshBucket(e, "vec", bands * planesPerBand, "sig")
    val mask = (1L << planesPerBand) - 1L
    // Bands unrolled statically (bands is a plan-time constant).
    val bandVals = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * planesPerBand).bitwiseAND(lit(mask)).as("bval"))): _*)
    val banded = sig.select(col("id"), explode(bandVals).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val cand = banded.select(col("id").as("id_a"), col("band"), col("bval"))
      .join(banded.select(col("id").as("id_b"), col("band"), col("bval")),
            Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = e.select(col("id").as("id_a"), col("vec").as("va"))
    val vb = e.select(col("id").as("id_b"), col("vec").as("vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("sim", graft.functions.GraftFunctions.cosineSimilarity(
        df.sparkSession, col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("cosine_sim"))
  }

  /** ANN top-k: candidates share the query's LSH bucket; exact cosine
    * re-rank within the bucket. Trades recall for a 2^planes candidate
    * reduction. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    val c = withLshBucket(
        corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec")),
        "c_vec", planes)
    val q = withLshBucket(
        queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec")),
        "q_vec", planes)
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", graft.functions.GraftFunctions.cosineSimilarity(
        corpus.sparkSession, col("c_vec"), col("q_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
              round(col("sim"), 6).as("cosine_sim"), col("rnk"))
  }
}
