package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EventQueries, FinComposite, Relational, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` maps one entry per implemented operator family from
  * SURVEY.md §2 (plus the 100-TB extension operators: dedup,
  * similarity search, text analysis, event windows, multimodal
  * plumbing). `oracleSql` holds the DuckDB-equivalent SQL for every
  * query — since r18 ALL queries carry one (approximate ANN outputs
  * are deterministic per SF and hash-pinned SF-aware, q35/q43).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows > 0. The rank()-shaped composite: dedup-keep-last -> join ->
    * broadcast join -> regex filter -> top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q04_rank_segments")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ FinComposite.queries

  /** DuckDB-equivalent SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ FinComposite.oracles
}
