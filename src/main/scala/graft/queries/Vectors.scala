package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.tables.Tables

/** Embedding-similarity queries over the embeddings table. */
object VectorQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact brute-force cosine top-3 for 10 query vectors.
    "q34_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 3)
        .orderBy("query_id", "rnk")
    }),

    // LSH-bucketed ANN variant (scale path; approximate => no SQL
    // oracle, rows-only check).
    "q35_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 3, planes = 6)
        .orderBy("query_id", "rnk")
    }),

    // IVF-bucketed ANN (rows-only: approximate by construction).
    "q43_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ext.Similarity.ivfTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 3,
          nCentroids = 16, nProbe = 3)
        .orderBy("query_id", "rnk")
    }),

    // Embedding-cosine near-duplicate pairs: all-pairs sim >= 0.5
    // (the embedding-space dedup mode; LSH-bucketed q35 is the
    // at-scale candidate generator for the same test).
    "q42_embedding_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), graft.ext.Similarity.asDouble(col("embedding")).as("vec"))
      val a = e.select(col("vec_id").as("id_a"), col("vec").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("vec").as("vb"))
      a.crossJoin(broadcast(b))
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", graft.functions.GraftFunctions.cosineSimilarity(
          s, col("va"), col("vb")))
        .filter(col("sim") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("cosine_sim"))
        .orderBy("id_a", "id_b")
    }),

    // Per-label centroid aggregation: elementwise mean over vectors
    // (array aggregation without UDAFs — posexplode + groupBy).
    "q36_label_centroid_norm" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(avg(col("x").cast("double")).as("m"), count(lit(1)).as("cnt"))
        .groupBy("label")
        .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"),
             max("cnt").as("n_vectors"))
        .orderBy("label")),
  )

  val oracles: Map[String, String] = Map(
    "q34_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.vec[i] * t.vec[i]))
        |      / (q.nrm * t.nrm) AS sim
        |  FROM m q, m t WHERE q.vec_id < 10 AND t.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rnk FROM p)
        |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,

    "q42_embedding_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x*x))) AS nrm FROM n),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, 65), i -> a.vec[i] * b.vec[i]))
        |      / (a.nrm * b.nrm) AS sim
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(sim, 6) AS cosine_sim FROM p
        |WHERE sim >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "q36_label_centroid_norm" ->
      """WITH e AS (
        |  SELECT label, i, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(1, 65) r(i)),
        |c AS (SELECT label, i, avg(x) AS m, count(*) AS cnt FROM e GROUP BY label, i)
        |SELECT label, round(sqrt(sum(m*m)), 6) AS centroid_norm,
        |  max(cnt) AS n_vectors
        |FROM c GROUP BY label ORDER BY label""".stripMargin,
  )
}
