package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A persistent IVF-PQ ANN index — the composition [[Pq.ivfPqTopK]]
  * builds inline, separated into a one-off batch build and a hot
  * search path (the [[IvfIndex]] lifecycle, PQ edition). The stored
  * row is (id, cell, M code ints): at M=8 a production byte-packed
  * layout is 8 bytes/vector + the cell key — the index for 10^9
  * vectors fits a handful of executors, which is the entire point of
  * PQ. Searches read nProbe/nCentroids of the rows (cell directory
  * pruning, same IN-list shape as [[IvfIndex]]) at M bytes each, and
  * re-rank exactly from the ORIGINAL float corpus, which the index
  * deliberately does not store.
  *
  * Layout on disk: `path/corpus` parquet partitioned by cell
  * (column `pq_codes` — named distinctly from the int8 layout's
  * `codes` so [[IvfIndex.load]]'s layout detection cannot mistake
  * one for the other), `path/centroids` (cell, vec), and
  * `path/codebooks` (m, j, vec) — both tiny driver-side tables.
  *
  * Determinism: centroids and codebooks come from the deterministic
  * trainers ([[Similarity.ivfCentroids]], [[Pq.trainCodebooks]]);
  * build → save → load → search is spec-pinned equal to the inline
  * [[Pq.ivfPqTopK]] result.
  */
final case class IvfPqIndex(centroids: Seq[Seq[Double]],
                            codebooks: Seq[Seq[Seq[Double]]],
                            indexed: DataFrame) {

  /** Two-stage search: ADC over the probed cells' code rows (native
    * [[graft.functions.PqAdcScore]], query tables broadcast), top
    * rerankFactor*k candidates per query re-scored exactly from
    * `floatCorpus`. The corpus never shuffles in either stage. */
  def search(queries: DataFrame, floatCorpus: DataFrame,
             idCol: String, vecCol: String, k: Int,
             nProbe: Int, rerankFactor: Int = 16): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.size,
      "need 1 <= nProbe <= nCentroids")
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    val spark = indexed.sparkSession
    val gf = graft.functions.GraftFunctions
    val qRows = queries.select(col(idCol).cast("long").as("id"),
        gf.vecNormalize(spark, Similarity.asDouble(col(vecCol))).as("v"))
      .collect()
    import spark.implicits._
    val qdf = qRows.toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1),
        Pq.adcTable(r.getSeq[Double](1), codebooks)))
      .toDF("query_id", "q_vec", "adc_table")
      .withColumn("cell",
        explode(gf.nearestCentroids(spark, col("q_vec"), typedLit(centroids), nProbe)))
      .select("query_id", "cell", "adc_table")
    val cells = qdf.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val approx = indexed
      .filter(col("cell").isin(cells: _*)) // prunes saved cell directories
      .join(broadcast(qdf), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("asim", gf.pqAdcScore(spark, col("pq_codes"), col("adc_table")))
      .groupBy("query_id")
      .agg(gf.topKByScore(spark, col("asim"), col("neighbor_id"),
        rerankFactor * k).as("hits"))
      .select(col("query_id"), explode(col("hits")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"))
    val floats = floatCorpus.select(col(idCol).cast("long").as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("c_vec"))
    val qvecs = queries.select(col(idCol).cast("long").as("query_id"),
      Similarity.asDouble(col(vecCol)).as("q_vec"))
    Similarity.rerankTopK(
      floats.join(broadcast(approx), "neighbor_id")
        .join(broadcast(qvecs), "query_id")
        .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
        .select("query_id", "neighbor_id", "sim"),
      k)
  }

  /** Persist: cell-partitioned code rows + the two tiny model tables. */
  def save(path: String): Unit = {
    val spark = indexed.sparkSession
    import spark.implicits._
    indexed.select("neighbor_id", "pq_codes", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    codebooks.zipWithIndex
      .flatMap { case (book, m) => book.zipWithIndex.map { case (cw, j) => (m, j, cw) } }
      .toDF("m", "j", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }
}

object IvfPqIndex {

  /** Build: deterministic IVF centroids + PQ codebooks, then ONE
    * corpus scan emits the stored (id, cell, codes) layout — cell
    * assignment and PQ encode are both map-side against literal
    * models. `codebooks` overrides training (reuse across indexes /
    * train on a sample). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nCentroids: Int = 16, m: Int = 8, kCodes: Int = 64,
            sweeps: Int = 2,
            codebooks: Option[Seq[Seq[Seq[Double]]]] = None): IvfPqIndex = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    val e = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("c_vec"))
    val cents = Similarity.ivfCentroids(e, "neighbor_id", "c_vec",
      nCentroids, sweeps)
    val books = codebooks.getOrElse(
      Pq.trainCodebooks(corpus, idCol, vecCol, m, kCodes, sweeps))
    val indexed = e.select(col("neighbor_id"),
      gf.nearestCentroids(spark, col("c_vec"), typedLit(cents), 1)(0).as("cell"),
      gf.pqEncode(spark, gf.vecNormalize(spark, col("c_vec")),
        typedLit(books)).as("pq_codes"))
    IvfPqIndex(cents, books, indexed)
  }

  /** Load a saved index; the corpus frame is a plain partitioned
    * parquet scan, so search()'s cell IN-list prunes directories. */
  def load(spark: SparkSession, path: String): IvfPqIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("vec")).toSeq).toSeq
    val books = spark.read.parquet(s"$path/codebooks")
      .orderBy("m", "j").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](r.fieldIndex("vec")).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(_._2).toSeq }
    val corpus = spark.read.parquet(s"$path/corpus")
      .select(col("neighbor_id"), col("pq_codes"),
        col("cell").cast("int").as("cell"))
    IvfPqIndex(cents, books, corpus)
  }
}
