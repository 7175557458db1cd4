package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared harness for iterative sweep operators (PageRank, BFS/SSSP,
  * label propagation, k-core, connected components): the two
  * primitives every sweep loop needs, factored so each operator's
  * loop is only its own relaxation rule (r12 verdict #4).
  *
  *  - [[symmetrize]]/[[symmetrizeW]]: both edge orientations in ONE
  *    pass over the input (explode, map-side). The union form every
  *    operator used before r13 read the caller's edge pipeline twice
  *    — for the driver graph queries that duplicated the whole
  *    lineitem⋈orders⋈distinct build into both legs.
  *  - [[pin]]: eager materialization of a sweep-shared frame with its
  *    hash partitioning DECLARED. Under AQE both a lazy cache and a
  *    plain localCheckpoint report unknown partitioning downstream
  *    (probed on this Spark build), so sweep joins silently
  *    re-exchanged the EDGE frame every sweep — the exact shuffle
  *    staging exists to avoid, and at 100 TB the dominant per-sweep
  *    cost (edge frame >> node frame). See
  *    [[org.apache.spark.sql.execution.GraftPartitionedCheckpoint]].
  */
object Sweep {

  /** Both orientations of an edge list in one pass: (src, dst) rows. */
  def symmetrize(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))

  /** Weighted twin of [[symmetrize]]: (src, dst, w) rows. */
  def symmetrizeW(edges: DataFrame, aCol: String, bCol: String,
                  w: Column): DataFrame =
    edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst"), w.as("w")),
        struct(col(bCol).as("src"), col(aCol).as("dst"), w.as("w"))))
      .as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"),
              col("__e.w").as("w"))

  /** Eagerly materialize `df` hash-partitioned on `keys` with the
    * partitioning declared, so downstream sweep joins co-locate with
    * no re-exchange. Blocks are registered with [[Staging]] for
    * release; superseded per-sweep pins should be freed with
    * [[Staging.dropCheckpoint]] once their successor is material. */
  def pin(df: DataFrame, keys: String*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ck = org.apache.spark.sql.execution.GraftPartitionedCheckpoint(
      df, keys, n)
    Staging.stageCheckpoint(ck)
    ck
  }
}
