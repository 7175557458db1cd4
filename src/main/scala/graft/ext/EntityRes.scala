package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution — the record-linkage pipeline
  * assembled from this library's primitives: a blocking key bounds
  * the candidate-pair space (never all-pairs), the native codegen'd
  * Jaro-Winkler expression scores every in-block pair, pairs at or
  * above the match threshold become edges, and connected components
  * (min-label) produce one cluster id per entity. The reference
  * engine has no fuzzy-matching surface; this is a pure extension
  * operator in the 100-TB-pipeline family (vendor/master-data dedup,
  * author disambiguation, crawl-source canonicalization).
  *
  * Scale shape: one exchange on the blocking key, the in-block pair
  * join (quadratic ONLY within a block — choose blocks accordingly,
  * or LSH-bucket first), the scored-pair frame staged once, then the
  * adaptive CC (driver union-find under the size gate, O(log
  * diameter) label sweeps above it). The threshold comparison is
  * bit-safe cross-engine because the JW kernel is pinned to the
  * rapidfuzz-lineage IEEE operation order (see
  * [[graft.functions.JaroWinklerKernel]]).
  */
object EntityRes {

  /** Cluster rows whose `nameCol` matches within a block at
    * `threshold` Jaro-Winkler similarity or above. Returns
    * (id, component): one row per entity that participates in at
    * least one match pair; min member id labels the cluster.
    * Singletons (no match) are absent — callers left-join and
    * coalesce to self-label, the [[Dedup.connectedComponents]]
    * convention.
    */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
              blockCol: Column, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    val spark = df.sparkSession
    val p = graft.ops.Staging.stage(
      df.select(col(idCol).as("__id"), col(nameCol).as("__nm"),
                blockCol.as("__blk")))
    val a = p.select(col("__blk"), col("__id").as("__ida"),
                     col("__nm").as("__nma"))
    val b = p.select(col("__blk"), col("__id").as("__idb"),
                     col("__nm").as("__nmb"))
    val pairs = graft.ops.Staging.stage(
      a.join(b, Seq("__blk")).filter(col("__ida") < col("__idb"))
        .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
          graft.functions.GraftFunctions
            .jaroWinkler(spark, col("__nma"), col("__nmb")).as("jw"))
        .filter(col("jw") >= threshold)
        .select("id_a", "id_b"))
    Dedup.connectedComponents(pairs)
  }
}
