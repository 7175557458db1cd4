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
    * re-ranking exactly. Corpus shuffles once on cell id; each query
    * touches corpus/nCentroids*nProbe candidates — the structure that
    * keeps ANN sublinear at 10^9+ vectors.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    val cents = broadcast(
      corpus.orderBy(col(idCol)).limit(nCentroids)
        .select(col(idCol).as("cent_id"), asDouble(col(vecCol)).as("cent_vec")))
    def assign(df: DataFrame, id: String, vec: String, probes: Int): DataFrame = {
      val wc = Window.partitionBy(id).orderBy(col("cent_sim").desc, col("cent_id"))
      df.crossJoin(cents)
        .withColumn("cent_sim", gf.cosineSimilarity(spark, col(vec), col("cent_vec")))
        .withColumn("cent_rank", row_number().over(wc))
        .filter(col("cent_rank") <= probes)
        .drop("cent_vec", "cent_sim", "cent_rank")
    }
    val c = assign(corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("c_vec")), "neighbor_id", "c_vec", 1)
    val q = assign(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("q_vec")), "query_id", "q_vec", nProbe)
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "cent_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
              round(col("sim"), 6).as("cosine_sim"), col("rnk"))
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
