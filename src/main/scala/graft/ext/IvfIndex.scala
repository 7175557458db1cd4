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
  *    scan per sweep plus one for assignment, no corpus shuffle. The
  *    assignment also carries int8 codes ([[graft.functions.Int8Quantize]])
  *    so either storage layout can be saved.
  *  - [[IvfIndex.save]]: corpus written as parquet PARTITIONED BY
  *    cell (the inverted file literally becomes the directory
  *    layout), centroid matrix written alongside as a tiny parquet.
  *    [[IvfIndex.saveQuantized]] writes (scale, codes) INSTEAD of the
  *    float vectors — 4x less index storage, and a search scans 4x
  *    fewer bytes.
  *  - [[IvfIndex.load]] + [[IvfIndex.search]]/[[IvfIndex.searchQuantized]]:
  *    a query probes nProbe cells; the `cell IN (...)` filter prunes
  *    to those partition directories at the SCAN (PartitionFilters —
  *    verified by spec), so a search reads corpus/nCentroids*nProbe
  *    bytes, not the corpus. Re-rank is the shared exact-cosine +
  *    partial-top-k tail.
  *
  * The searched-side join broadcasts the (small) query set; the index
  * side never shuffles. Cluster note: at petabyte scale `save` is the
  * same plan with a bucketed/sorted-within-partitions writer and the
  * centroid matrix in a metastore — the layout and search shapes are
  * identical.
  */
final case class IvfIndex(centroids: Seq[Seq[Double]], assigned: DataFrame) {

  private def probedCells(queries: DataFrame, idCol: String, vecCol: String,
                          nProbe: Int): (DataFrame, Seq[Int]) = {
    val spark = assigned.sparkSession
    val gf = graft.functions.GraftFunctions
    val q = queries.select(col(idCol).as("query_id"),
        Similarity.asDouble(col(vecCol)).as("q_vec"))
      .withColumn("cell",
        explode(gf.nearestCentroids(spark, col("q_vec"), typedLit(centroids), nProbe)))
    // The probed cell set is tiny (|queries| x nProbe distinct values);
    // materializing it into an IN-list filter lets a parquet-backed
    // `assigned` prune partition directories at the scan. (For the
    // in-memory path the filter is a no-op correctness-wise.)
    (q, q.select("cell").distinct().collect().map(_.getInt(0)).toSeq)
  }

  /** Top-k by cosine over the nProbe nearest cells per query. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nProbe: Int): DataFrame = {
    require(assigned.columns.contains("c_vec"),
      "index was saved quantized — use searchQuantized (float re-rank " +
        "comes from the original corpus, not the index)")
    val spark = assigned.sparkSession
    val gf = graft.functions.GraftFunctions
    val (q, cells) = probedCells(queries, idCol, vecCol, nProbe)
    Similarity.rerankTopK(
      assigned
        .filter(col("cell").isin(cells: _*))
        .join(broadcast(q), "cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
        .select("query_id", "neighbor_id", "sim"),
      k)
  }

  /** Quantized two-stage search: (1) score every vector in the probed
    * cells with the asymmetric int8-x-float cosine
    * ([[graft.functions.Int8CosineSim]]) reading ONLY the int8 codes —
    * 4x less scan bandwidth than the float path — keeping the
    * `rerankFactor * k` best approximate candidates per query via the
    * partial top-k aggregate; (2) re-rank those few candidates EXACTLY
    * from `floatCorpus` (the original float vectors, which the
    * quantized index does not store). The candidate set
    * (|queries| * rerankFactor * k ids) broadcasts into the corpus
    * scan, so stage 2 shuffles k rows per partition per query and the
    * corpus itself never shuffles in either stage.
    *
    * int8 relative error is <= scale/2 per element (~0.4% of the max
    * component), so the approximate ordering differs from exact only
    * between near-tied neighbors — rerankFactor=4 headroom makes the
    * final top-k match the float IVF path on all but adversarially
    * tied data (q63 pins the recall).
    */
  def searchQuantized(queries: DataFrame, floatCorpus: DataFrame,
                      idCol: String, vecCol: String,
                      k: Int, nProbe: Int, rerankFactor: Int = 4): DataFrame = {
    require(assigned.columns.contains("q"),
      "index carries no int8 codes (built by an older layout?)")
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    val spark = assigned.sparkSession
    val gf = graft.functions.GraftFunctions
    val (q, cells) = probedCells(queries, idCol, vecCol, nProbe)
    val approx = assigned
      .filter(col("cell").isin(cells: _*))
      .join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("asim", gf.int8Cosine(spark, col("q"), col("q_vec")))
      .groupBy("query_id")
      .agg(gf.topKByScore(spark, col("asim"), col("neighbor_id"),
        rerankFactor * k).as("hits"))
      .select(col("query_id"), explode(col("hits")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"))
    val floats = floatCorpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("c_vec"))
    val qvecs = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("q_vec"))
    Similarity.rerankTopK(
      floats.join(broadcast(approx), "neighbor_id")
        .join(broadcast(qvecs), "query_id")
        .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
        .select("query_id", "neighbor_id", "sim"),
      k)
  }

  /** Metadata-FILTERED index search — [[Similarity.filteredTopK]]'s
    * pre-filter semantics surviving at index scale: top-k cosine
    * among probed-cell vectors whose `label` EQUALS the query's. The
    * filter cuts candidates BEFORE ranking (a post-filtered fixed-k
    * ANN result starves recall on low-selectivity labels); on a
    * labeled SAVED index ([[IvfIndex.buildLabeled]] + [[save]], which
    * partitions by (label, cell)) both the label and the probed-cell
    * IN-lists prune parquet DIRECTORIES at the scan, so a search
    * reads only its own label's probed cells —
    * corpus/(labels·nCentroids)·|query labels|·nProbe bytes, never
    * the corpus (PartitionFilters spec-pinned, like [[search]]).
    *
    * Recall note: cells are clustered on geometry alone (labels
    * change per query; re-clustering per label would be |labels|
    * index builds), so a label that occupies few vectors of each
    * probed cell has fewer same-label candidates — raise nProbe to
    * compensate (the q281 driver pin measures exactly this). At
    * nProbe = nCentroids this is EXACTLY filteredTopK (spec-pinned).
    */
  def searchFiltered(queries: DataFrame, idCol: String, vecCol: String,
                     labelCol: String, k: Int, nProbe: Int): DataFrame = {
    require(assigned.columns.contains("label"),
      "index carries no label column — build it with IvfIndex.buildLabeled")
    require(assigned.columns.contains("c_vec"),
      "index was saved quantized — use searchFilteredQuantized (float " +
        "re-rank comes from the original corpus, not the index)")
    val spark = assigned.sparkSession
    val gf = graft.functions.GraftFunctions
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("__ql"),
        Similarity.asDouble(col(vecCol)).as("q_vec"))
      .withColumn("cell",
        explode(gf.nearestCentroids(spark, col("q_vec"), typedLit(centroids),
          nProbe)))
    // tiny driver collect (|queries| x nProbe pairs): literal IN-lists
    // are what parquet partition pruning can push to the directory
    // listing — the label list and cell list prune independently
    // (their product is a superset of the true pair set; the residual
    // equality filter below is exact)
    val probed = q.select(col("__ql"), col("cell")).distinct().collect()
    val labels = probed.map(_.get(0)).distinct.toSeq
    val cells = probed.map(_.getInt(1)).distinct.toSeq
    Similarity.rerankTopK(
      assigned
        .filter(col("label").isin(labels: _*) && col("cell").isin(cells: _*))
        .join(broadcast(q), "cell")
        .filter(col("label") === col("__ql") &&
          col("neighbor_id") =!= col("query_id"))
        .withColumn("sim",
          gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
        .select("query_id", "neighbor_id", "sim"),
      k)
  }

  /** [[searchFiltered]] over the QUANTIZED labeled layout — the r15
    * scoped gap: the 4x-smaller index now serves label-filtered
    * queries. Two stages, the [[searchQuantized]] (q63) shape under
    * (label, cell) directory pruning:
    *  (1) asymmetric int8-x-float cosine over the probed SAME-LABEL
    *      candidates reading only the int8 codes (the label IN-list
    *      and cell IN-list prune parquet directories independently;
    *      the residual label equality is exact), keeping the
    *      `rerankFactor * k` best approximate candidates per query;
    *  (2) exact re-rank of those few candidates from `floatCorpus`
    *      (the original float vectors, which the quantized index does
    *      not store).
    * Pre-filter semantics are preserved in BOTH stages — candidates
    * are label-matched before any ranking, so a low-selectivity label
    * loses no slots to other labels' neighbors. Same recall note as
    * [[searchFiltered]]: raise nProbe for labels thin in each cell.
    */
  def searchFilteredQuantized(queries: DataFrame, floatCorpus: DataFrame,
                              idCol: String, vecCol: String,
                              labelCol: String, k: Int, nProbe: Int,
                              rerankFactor: Int = 4): DataFrame = {
    require(assigned.columns.contains("label"),
      "index carries no label column — build it with IvfIndex.buildLabeled")
    require(assigned.columns.contains("q"),
      "index carries no int8 codes — use searchFiltered on the float layout")
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    val spark = assigned.sparkSession
    val gf = graft.functions.GraftFunctions
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("__ql"),
        Similarity.asDouble(col(vecCol)).as("q_vec"))
      .withColumn("cell",
        explode(gf.nearestCentroids(spark, col("q_vec"), typedLit(centroids),
          nProbe)))
    // the searchFiltered pruning discipline: literal IN-lists reach
    // the parquet directory listing; the pair product is a superset,
    // the equality filter below exact
    val probed = q.select(col("__ql"), col("cell")).distinct().collect()
    val labels = probed.map(_.get(0)).distinct.toSeq
    val cells = probed.map(_.getInt(1)).distinct.toSeq
    val approx = assigned
      .filter(col("label").isin(labels: _*) && col("cell").isin(cells: _*))
      .join(broadcast(q), "cell")
      .filter(col("label") === col("__ql") &&
        col("neighbor_id") =!= col("query_id"))
      .withColumn("asim", gf.int8Cosine(spark, col("q"), col("q_vec")))
      .groupBy("query_id")
      .agg(gf.topKByScore(spark, col("asim"), col("neighbor_id"),
        rerankFactor * k).as("hits"))
      .select(col("query_id"), explode(col("hits")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"))
    val floats = floatCorpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("c_vec"))
    val qvecs = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("q_vec"))
    Similarity.rerankTopK(
      floats.join(broadcast(approx), "neighbor_id")
        .join(broadcast(qvecs), "query_id")
        .withColumn("sim", gf.cosineSimilarity(spark, col("c_vec"), col("q_vec")))
        .select("query_id", "neighbor_id", "sim"),
      k)
  }

  /** Persist the index: `path/corpus` partitioned by cell (the
    * inverted file as directory layout — a labeled index partitions
    * by (label, cell), so filtered searches prune label directories
    * first), `path/centroids` as a tiny (cell, vec) parquet. */
  def save(path: String): Unit = {
    val parts = if (assigned.columns.contains("label"))
      Seq("label", "cell") else Seq("cell")
    IvfIndex.clusterForWrite(
        assigned.select((Seq("neighbor_id", "c_vec") ++ parts).map(col): _*),
        parts)
      .write.mode("overwrite").partitionBy(parts: _*).parquet(s"$path/corpus")
    saveCentroids(path)
  }

  /** Persist the QUANTIZED index: int8 codes + per-vector scale
    * instead of float vectors (4x smaller; searches scan 4x fewer
    * bytes). Searching a quantized index re-ranks from the original
    * float corpus ([[searchQuantized]]). */
  def saveQuantized(path: String): Unit = {
    // a labeled build keeps its (label, cell) layout in the quantized
    // tier too — filtered int8 searches prune label directories the
    // same way the float tier does
    val parts = if (assigned.columns.contains("label"))
      Seq("label", "cell") else Seq("cell")
    IvfIndex.clusterForWrite(
        assigned.select((Seq(col("neighbor_id"), col("q.scale").as("scale"),
          col("q.codes").as("codes")) ++ parts.map(col)): _*),
        parts)
      .write.mode("overwrite").partitionBy(parts: _*).parquet(s"$path/corpus")
    saveCentroids(path)
  }

  private def saveCentroids(path: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }
}

object IvfIndex {

  /** Cluster an inverted-file frame on its partition columns before a
    * partitionBy write (guide §6 — the Iceberg hash distribution-mode
    * equivalent). r22, measured: every corpus write ran as ONE task
    * opening |label|x|cell| parquet writers SERIALLY (1.3-1.8 s per
    * generation at sf0.1 — the dominant cost of the whole lifecycle
    * quartet); unclustered at scale it is also the classic small-files
    * explosion (M scan tasks x P directories = M·P files). The
    * explicit-count repartition spreads writer creation across the
    * session parallelism (a user count, so AQE cannot coalesce it back
    * to one task) and each directory's rows land in exactly the tasks
    * that hash there — O(P) output files instead of O(M·P). Cluster
    * note: at very large per-cell volumes add
    * spark.sql.files.maxRecordsPerFile to split the per-directory
    * file; the clustering itself is the scale-correct layout.
    * Result-invisible: same rows, same directories, only file count /
    * in-file order change, and every serve path re-ranks through
    * order-insensitive aggregates. */
  private def clusterForWrite(df: DataFrame, parts: Seq[String]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(n, parts.map(col): _*)
  }

  /** Build the index over `corpus`: deterministic k-means centroids +
    * map-side cell assignment (+ int8 codes for the quantized layout —
    * computed in the same scan). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nCentroids: Int = 16, kmeansSweeps: Int = 2,
            seedStrategy: String = "first"): IvfIndex = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    val e = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("c_vec"))
    val cents = Similarity.ivfCentroids(e, "neighbor_id", "c_vec",
      nCentroids, kmeansSweeps, seedStrategy)
    val assigned = e
      .withColumn("cell", gf.nearestCentroids(spark, col("c_vec"), typedLit(cents), 1)(0))
      .withColumn("q", gf.int8Quantize(spark, col("c_vec")))
    IvfIndex(cents, assigned)
  }

  /** [[build]] carrying a label column, for metadata-filtered search
    * ([[IvfIndex.searchFiltered]]): centroids are clustered on
    * geometry alone (unchanged from [[build]] — labels are a filter,
    * not a metric), but the assignment keeps `label`, and [[save]]
    * then partitions the inverted file by (label, cell) so a filtered
    * search prunes to its own label's probed cells at the directory
    * listing. */
  def buildLabeled(corpus: DataFrame, idCol: String, vecCol: String,
                   labelCol: String, nCentroids: Int = 16,
                   kmeansSweeps: Int = 2,
                   seedStrategy: String = "first"): IvfIndex = {
    val spark = corpus.sparkSession
    val gf = graft.functions.GraftFunctions
    val e = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("label"),
      Similarity.asDouble(col(vecCol)).as("c_vec"))
    val cents = Similarity.ivfCentroids(e, "neighbor_id", "c_vec",
      nCentroids, kmeansSweeps, seedStrategy)
    val assigned = e.withColumn("cell",
        gf.nearestCentroids(spark, col("c_vec"), typedLit(cents), 1)(0))
      .withColumn("q", gf.int8Quantize(spark, col("c_vec")))
    IvfIndex(cents, assigned)
  }

  /** Append a DELTA shard to a saved index at the saved (FIXED)
    * centroids — the incremental-maintenance path: a growing corpus
    * re-clusters rarely (centroids drift slowly) but ingests new
    * vectors continuously, so the delta is assigned map-side against
    * the frozen centroid matrix and appended into the same
    * cell-partitioned layout (parquet mode=append adds files inside
    * the existing cell directories; searches prune exactly as
    * before). The stored layout is detected and matched — int8 codes
    * for a quantized index, float vectors otherwise. No shuffle, no
    * rewrite of existing data; one scan of the delta.
    *
    * Approximation note: appended vectors land in the cell of the
    * ORIGINAL centroids, exactly like the vectors at build time —
    * search over build(a)+append(b) equals search over the
    * build(a∪b)-at-a's-centroids index (the spec pins equality with
    * exhaustive probes, where any centroid set is exact). Re-cluster
    * (rebuild) when drift degrades recall.
    */
  def append(spark: SparkSession, path: String, delta: DataFrame,
             idCol: String, vecCol: String,
             labelCol: Option[String] = None): Unit = {
    val gf = graft.functions.GraftFunctions
    val cents = readCentroids(spark, path)
    val stored = spark.read.parquet(s"$path/corpus").columns
    val quantized = stored.contains("codes")
    // a LABELED index ([[IvfIndex.buildLabeled]]) partitions by
    // (label, cell): the delta must carry labels too, or appended
    // vectors would be invisible to every filtered search — refuse
    // loudly rather than silently drop them from the label
    // directories. Conversely a label on an unlabeled index would
    // fork the directory layout.
    val labeled = stored.contains("label")
    require(labeled == labelCol.isDefined,
      if (labeled) "index is label-partitioned — pass labelCol so the " +
        "delta lands inside the label directories filtered search prunes"
      else "index has no label partitioning — labelCol would fork the " +
        "stored layout; rebuild with buildLabeled instead")
    val base = delta.select(
      Seq(col(idCol).as("neighbor_id"),
          Similarity.asDouble(col(vecCol)).as("c_vec")) ++
        labelCol.map(c => col(c).as("label")).toSeq: _*)
    val assigned = base.withColumn("cell",
      gf.nearestCentroids(spark, col("c_vec"), typedLit(cents), 1)(0))
    val parts = if (labeled) Seq("label", "cell") else Seq("cell")
    val out =
      if (quantized)
        assigned.withColumn("q", gf.int8Quantize(spark, col("c_vec")))
          .select((Seq(col("neighbor_id"), col("q.scale").as("scale"),
                       col("q.codes").as("codes")) ++ parts.map(col)): _*)
      else
        assigned.select((Seq(col("neighbor_id"), col("c_vec")) ++
          parts.map(col)): _*)
    clusterForWrite(out, parts)
      .write.mode("append").partitionBy(parts: _*).parquet(s"$path/corpus")
  }

  /** Re-cluster a saved index into a FRESH GENERATION at `destPath` —
    * the other half of the [[append]] lifecycle: appends assign at
    * frozen centroids, so a corpus that drifts (new topics, new
    * embedding regions) crowds into whatever cells existed at build
    * time until probing degrades. Compaction recomputes centroids
    * over the CURRENT corpus and rewrites the cell layout; writing a
    * new generation rather than overwriting in place is deliberate —
    * it is both the only safe plan (a path cannot be overwritten
    * while being read) and the production pattern (searches flip to
    * the new generation atomically; the old one is dropped after).
    *
    * Layout is preserved: a float index rebuilds as float; a
    * quantized index re-clusters on the DEQUANTIZED vectors (cell
    * routing is approximate by construction) while carrying its
    * stored (scale, codes) through BIT-IDENTICALLY — compaction never
    * re-quantizes, so repeated compactions do not accumulate loss.
    * One scan per k-means sweep plus one assignment scan, map-side
    * like [[build]]; no corpus shuffle.
    */
  def compact(spark: SparkSession, path: String, destPath: String,
              nCentroids: Int = 16, kmeansSweeps: Int = 2,
              seedStrategy: String = "first"): Unit = {
    require(destPath != path,
      "compaction writes a new index generation — give it a fresh path")
    val gf = graft.functions.GraftFunctions
    // fold tombstoned ids OUT before re-clustering: the new generation
    // is physically delete-free (and carries no tombstone set), and
    // the k-means geometry fits the surviving corpus only
    val raw = dropTombstoned(spark, path,
      spark.read.parquet(s"$path/corpus"))
    if (raw.columns.contains("codes")) {
      // a labeled quantized index recompacts with its labels —
      // saveQuantized detects the column and keeps the (label, cell)
      // layout; stored (scale, codes) pass through bit-identically
      val qcols = Seq(col("neighbor_id"),
          struct(col("scale"), col("codes")).as("q")) ++
        (if (raw.columns.contains("label")) Seq(col("label")) else Nil)
      val vecs = raw.select(qcols: _*)
        .withColumn("c_vec", gf.int8Dequantize(spark, col("q")))
      val cents = Similarity.ivfCentroids(vecs, "neighbor_id", "c_vec",
        nCentroids, kmeansSweeps, seedStrategy)
      val assigned = vecs.withColumn("cell",
        gf.nearestCentroids(spark, col("c_vec"), typedLit(cents), 1)(0))
      IvfIndex(cents, assigned).saveQuantized(destPath)
    } else {
      // a labeled float index recompacts with its labels — save()
      // detects the column and keeps the (label, cell) layout
      val cols = Seq(col("neighbor_id"), col("c_vec")) ++
        (if (raw.columns.contains("label")) Seq(col("label")) else Nil)
      val e = raw.select(cols: _*)
      val cents = Similarity.ivfCentroids(e, "neighbor_id", "c_vec",
        nCentroids, kmeansSweeps, seedStrategy)
      val assigned = e.withColumn("cell",
        gf.nearestCentroids(spark, col("c_vec"), typedLit(cents), 1)(0))
      IvfIndex(cents, assigned).save(destPath)
    }
  }

  /** MERGE independently built shard indexes into one — the
    * MULTI-NODE BUILD story the [[append]]/[[compact]] lifecycle
    * doesn't cover (append ingests deltas at one index's frozen
    * centroids; compact re-clusters one index). Here each shard owner
    * runs [[build]]/[[buildLabeled]] over its slice IN PARALLEL — the
    * k-means sweeps, the expensive multi-scan step, never see the
    * full corpus — and the merged index is the UNION OF CELLS: shard
    * i's cell c relabels to c + Σ_{j<i} k_j, the centroid matrices
    * concatenate in path order, and every vector KEEPS its shard
    * assignment. Merge moves bytes and remaps one partition column;
    * it recomputes no geometry — one map-side scan per shard, no
    * k-means, no shuffle (the coarse-codebook-concatenation merge;
    * same invariant as [[append]]: every vector sits in the cell of
    * the centroid matrix that assigned it).
    *
    * Search semantics: a query probes the nProbe nearest of the
    * Σ k_i union cells. At exhaustive probes the union index IS a
    * rebuild (every vector scanned — the spec pins equality with the
    * exact tier); at fixed nProbe the union's cells are shard-count×
    * finer than a same-k rebuild's, so scale nProbe by the shard
    * count to hold the scanned fraction constant. Shard layouts must
    * agree (all float or all quantized; labels on all or none) —
    * refused loudly otherwise, the [[append]] convention. */
  def merge(spark: SparkSession, paths: Seq[String],
            destPath: String): Unit = {
    require(paths.size >= 2, "merge needs at least two shard indexes")
    // a repeated shard path would pass every other guard (identical
    // layouts trivially agree) and silently append the shard's
    // vectors twice under two cell ranges — the same silent-
    // duplication class the destination-corpus rerun guard closes
    require(paths.distinct.size == paths.size,
      s"duplicate shard paths in merge: ${paths.mkString(", ")}")
    require(!paths.contains(destPath),
      "merge writes a new index generation — give it a fresh path")
    // the per-shard corpus writes below are mode=append (each shard
    // adds its files into the shared layout), so a retried or rerun
    // merge into a non-empty destination would silently DUPLICATE
    // every shard's vectors while the centroid overwrite made the
    // index look clean — refuse loudly instead (r19 review)
    val destCorpus = new org.apache.hadoop.fs.Path(s"$destPath/corpus")
    val destFs = destCorpus.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(!destFs.exists(destCorpus),
      s"merge destination $destPath already holds a corpus — a rerun " +
        "would append duplicate vectors; give it a fresh path")
    val shards = paths.map { p =>
      (readCentroids(spark, p), spark.read.parquet(s"$p/corpus")) }
    val layouts = shards.map(_._2.columns.toSet).distinct
    require(layouts.size == 1,
      s"shard layouts must agree (all float or all quantized, labels " +
        s"on all or none); got ${layouts.map(_.toSeq.sorted).mkString(" vs ")}")
    val labeled = layouts.head.contains("label")
    val parts = if (labeled) Seq("label", "cell") else Seq("cell")
    val offsets = shards.map(_._1.size).scanLeft(0)(_ + _)
    shards.zip(offsets).foreach { case ((_, corpus), off) =>
      clusterForWrite(
          corpus.withColumn("cell", col("cell").cast("int") + lit(off)),
          parts)
        .write.mode("append").partitionBy(parts: _*)
        .parquet(s"$destPath/corpus")
    }
    import spark.implicits._
    shards.flatMap(_._1).zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$destPath/centroids")
    // a shard's live tombstones carry over (merge moves bytes — the
    // cell relabel is irrelevant to an id-keyed set), so
    // delete-then-merge stays correct without forcing a compaction
    paths.foreach { p =>
      tombstones(spark, p).foreach(_.write.mode("append")
        .parquet(s"$destPath/tombstones"))
    }
  }

  /** TOMBSTONE-DELETE ids from a saved index — the retention /
    * right-to-be-forgotten path the build/append/compact/merge
    * lifecycle needs to be operable: a delete CANNOT rewrite the
    * cell-partitioned corpus (that is a full-index pass per request),
    * so it appends the ids to an id-keyed tombstone set at
    * `path/tombstones` instead. [[load]] anti-joins the set, so every
    * serve path — float or quantized, filtered or not — excludes
    * deleted vectors from the next load on; [[compact]] folds the
    * tombstones into the fresh generation PHYSICALLY and does not
    * carry the set forward (the delete-then-compact pattern: logical
    * now, physical at the next rewrite the lifecycle was doing
    * anyway). Cost is O(|ids|): one tiny parquet append, corpus
    * untouched.
    *
    * Semantics: deletes are idempotent (re-deleting an id adds a row
    * the anti-join already absorbs) and PERMANENT until a compact —
    * in particular, [[append]]-ing a vector under a tombstoned id
    * stays invisible until the next generation; re-ingest under a
    * fresh id, or compact first (the standard tombstone trade).
    * `idCol`'s type must match the index's stored id type. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             idCol: String): Unit = {
    // a mistyped path would otherwise silently create an orphan
    // tombstone set and the intended delete never takes effect —
    // refuse unless an index actually lives here (the compact/merge
    // guard convention; r19 advice)
    val cents = new org.apache.hadoop.fs.Path(s"$path/centroids")
    val fs = cents.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(cents),
      s"no index at $path (centroids missing) — delete would write an " +
        "orphan tombstone set no load ever reads")
    ids.select(col(idCol).as("neighbor_id")).distinct()
      .write.mode("append").parquet(s"$path/tombstones")
  }

  /** Tombstone-PRESSURE census — the operability half of the
    * [[delete]] retention story: between compactions the tombstone
    * set only grows, and with it (a) the broadcast the serve-path
    * anti-join ships to every executor and (b) the fraction of
    * scanned cell bytes that are dead weight. Per cell: stored rows,
    * tombstoned rows (distinct ids — re-deletes don't inflate), live
    * rows, and the dead fraction in floored ppm; one `cell = -1`
    * TOTALS row carries the index-wide census plus orphaned
    * tombstones (ids matching no stored row — deletes of never-
    * ingested or already-compacted ids; absorbed harmlessly by the
    * anti-join but a signal of caller confusion).
    *
    * COMPACT-WHEN bound: [[compact]] folds the set physically, so the
    * operating rule is to compact once EITHER the total dead fraction
    * passes ~200000 ppm (20% of scanned bytes wasted — the classic
    * LSM dead-ratio trigger) OR the tombstone count passes the
    * broadcast-join comfort bound (~10M ids at 8 bytes ≈ 80 MB
    * driver/executor-resident — beyond that the serve anti-join
    * flips to a shuffle and every query pays it). Both observables
    * are THIS census's totals row.
    *
    * Scale shape: one corpus scan into a cells-sized aggregate, one
    * tombstone scan, one cells-keyed left join; the totals row is a
    * 1-row union. Never query-path work — an operator's dashboard
    * call. */
  def tombstonePressure(spark: SparkSession, path: String): DataFrame = {
    val corpus = spark.read.parquet(s"$path/corpus")
    val ts = tombstones(spark, path)
      .map(_.select("neighbor_id").distinct())
      .getOrElse(corpus.select("neighbor_id").limit(0))
    val perCell = corpus
      .join(ts.withColumn("__dead", lit(1L)), Seq("neighbor_id"), "left")
      .groupBy(col("cell").cast("int").as("cell"))
      .agg(count(lit(1)).as("n_stored"),
           sum(when(col("__dead").isNotNull, 1L).otherwise(0L))
             .as("n_tombstoned"))
    val orphans = ts.join(corpus.select("neighbor_id"),
        Seq("neighbor_id"), "left_anti")
      .agg(count(lit(1)).as("__orph"))
    // coalesce (r20 advice): on an EMPTY corpus sum() yields NULL, so
    // without it the totals row would read NULL n_stored/n_live and a
    // dashboard caller's getLong would NPE — an all-zero totals row is
    // the correct empty-index census (the linearMmdCensus convention)
    val totals = perCell
      .agg(coalesce(sum("n_stored"), lit(0L)).as("n_stored"),
           coalesce(sum("n_tombstoned"), lit(0L)).as("n_tombstoned"))
      .crossJoin(broadcast(orphans))
      .select(lit(-1).as("cell"), col("n_stored"),
        col("n_tombstoned"), col("__orph").as("n_orphan_tombstones"))
    perCell
      .select(col("cell"), col("n_stored"), col("n_tombstoned"),
        lit(0L).as("n_orphan_tombstones"))
      .unionByName(totals)
      .select(col("cell"), col("n_stored"), col("n_tombstoned"),
        (col("n_stored") - col("n_tombstoned")).as("n_live"),
        expr("CASE WHEN n_stored > 0 THEN (n_tombstoned * 1000000) " +
          "div n_stored ELSE CAST(0 AS BIGINT) END").as("dead_ppm"),
        col("n_orphan_tombstones"))
      .orderBy("cell")
  }

  /** The live tombstone set of a saved index (empty frame absent —
    * never null), id-keyed like the corpus. */
  private def tombstones(spark: SparkSession,
                         path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(s"$path/tombstones"))
    else None
  }

  /** Anti-join a corpus frame against the tombstone set, if any.
    * Between compactions the set is deletes-sized (<< corpus), so AQE
    * resolves the anti-join as a broadcast; the corpus-side cell
    * filters still push through the join's left side, so partition
    * pruning is unchanged. */
  private def dropTombstoned(spark: SparkSession, path: String,
                             corpus: DataFrame): DataFrame =
    tombstones(spark, path).fold(corpus)(t =>
      corpus.join(t, Seq("neighbor_id"), "left_anti"))

  private def readCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("vec")).toSeq).toSeq

  /** Load a saved index (either layout — float or quantized; detected
    * from the stored schema). The corpus frame is a plain partitioned
    * parquet scan — search()'s cell filter prunes its directories. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val cents = readCentroids(spark, path)
    // tombstoned ids drop here, so EVERY serve path over the loaded
    // index (search / searchQuantized / searchFiltered[Quantized])
    // excludes deletes without knowing they exist
    val raw = dropTombstoned(spark, path,
      spark.read.parquet(s"$path/corpus"))
    val corpus =
      if (raw.columns.contains("codes"))
        raw.select(Seq(col("neighbor_id"),
            struct(col("scale"), col("codes")).as("q"),
            col("cell").cast("int").as("cell")) ++
          (if (raw.columns.contains("label")) Seq(col("label")) else Nil): _*)
      else
        raw.select(Seq(col("neighbor_id"), col("c_vec"),
            col("cell").cast("int").as("cell")) ++
          (if (raw.columns.contains("label")) Seq(col("label")) else Nil): _*)
    IvfIndex(cents, corpus)
  }
}
