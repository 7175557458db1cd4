package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A persistent IVF (inverted-file) ANN index — the production form of
  * [[Similarity.ivfTopK]], which (correctly for a driver-contract
  * query) rebuilds its centroids inline on every call. At 10^9+
  * vectors the index build is a one-off batch step and searches are
  * the hot path, so the two are separated:
  *
  *  - [[IvfIndex.build]]: k-means centroids ([[Similarity.ivfCentroids]],
  *    deterministic Lloyd sweeps) + map-side cell assignment — one
  *    scan per sweep plus one for assignment, no corpus shuffle.
  *  - [[IvfIndex.save]]: corpus written as parquet PARTITIONED BY
  *    cell (the inverted file literally becomes the directory
  *    layout), centroid matrix written alongside as a tiny parquet.
  *  - [[IvfIndex.load]] + [[IvfIndex.search]]: a query probes nProbe
  *    cells; the `cell IN (...)` filter prunes to those partition
  *    directories at the SCAN (PartitionFilters — verified by spec),
  *    so a search reads corpus/nCentroids*nProbe bytes, not the
  *    corpus. Re-rank is the shared exact-cosine + partial-top-k tail.
  *
  * The searched-side join broadcasts the (small) query set; the index
  * side never shuffles. Cluster note: at petabyte scale `save` is the
  * same plan with a bucketed/sorted-within-partitions writer and the
  * centroid matrix in a metastore — the layout and search shapes are
  * identical.
  */
final case class IvfIndex(centroids: Seq[Seq[Double]], assigned: DataFrame) {

  /** Top-k by cosine over the nProbe nearest cells per query. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nProbe: Int): DataFrame = {
    val spark = assigned.sparkSession
    val gf = graft.functions.GraftFunctions
    val centsLit = typedLit(centroids)
    val q = queries.select(col(idCol).as("query_id"),
        Similarity.asDouble(col(vecCol)).as("q_vec"))
      .withColumn("cell",
        explode(gf.nearestCentroids(spark, col("q_vec"), centsLit, nProbe)))
    // The probed cell set is tiny (|queries| x nProbe distinct values);
    // materializing it into an IN-list filter lets a parquet-backed
    // `assigned` prune partition directories at the scan. (For the
    // in-memory path the filter is a no-op correctness-wise.)
    val cells = q.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    Similarity.rerankTopK(
      assigned
        .filter(col("cell").isin(cells: _*))
        .join(broadcast(q), "cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
        .select("query_id", "neighbor_id", "sim"),
      k)
  }

  /** Persist the index: `path/corpus` partitioned by cell (the
    * inverted file as directory layout), `path/centroids` as a tiny
    * (cell, vec) parquet. */
  def save(path: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }
}

object IvfIndex {

  /** Build the index over `corpus`: deterministic k-means centroids +
    * map-side cell assignment. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nCentroids: Int = 16, kmeansSweeps: Int = 2): IvfIndex = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    val e = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("c_vec"))
    val cents = Similarity.ivfCentroids(e, "neighbor_id", "c_vec",
      nCentroids, kmeansSweeps)
    val assigned = e.withColumn("cell",
      gf.nearestCentroids(spark, col("c_vec"), typedLit(cents), 1)(0))
    IvfIndex(cents, assigned)
  }

  /** Load a saved index. The corpus frame is a plain partitioned
    * parquet scan — search()'s cell filter prunes its directories. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("vec")).toSeq).toSeq
    val corpus = spark.read.parquet(s"$path/corpus")
      .select(col("neighbor_id"), col("c_vec"), col("cell").cast("int").as("cell"))
    IvfIndex(cents, corpus)
  }
}
