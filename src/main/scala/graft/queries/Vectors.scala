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
