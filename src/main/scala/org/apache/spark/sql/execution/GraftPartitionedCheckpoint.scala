package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Partitioning-preserving eager checkpoint — the one capability
  * Spark 4.1 exposes no public API for.
  *
  * Iterative sweep operators (PageRank, BFS, label propagation, …)
  * stage a degree-annotated adjacency once and join a node-sized rank
  * frame against it every sweep. For that staging to pay off, the
  * consumer side must SEE the adjacency's hash partitioning — but
  * under AQE both `persist()` (the cache boundary reports its
  * partitioning as unknown to downstream ENSURE_REQUIREMENTS
  * planning) and `localCheckpoint(true)` (`LogicalRDD` is created
  * with `UnknownPartitioning(0)`; probed on this Spark build) hide
  * it, so every sweep silently re-exchanged the EDGE frame — the
  * exact shuffle staging exists to avoid, and at 100 TB the dominant
  * per-sweep cost.
  *
  * This shim lives in Spark's execution package to reach the
  * package-private [[LogicalRDD]]: it repartitions on the keys with
  * an EXPLICIT partition count (a user-specified count is never
  * coalesced by AQE, so the physical layout is exactly
  * `HashPartitioning(keys, n)`), checkpoints eagerly, and rebuilds
  * the LogicalRDD with that partitioning DECLARED. The declaration is
  * sound by construction — it only ever states the partitioning the
  * repartition in the same call just produced (mis-declaring a
  * partitioning would silently mis-join, which is why the repartition
  * is fused into this helper rather than taken on trust from the
  * caller). The equivalent public-API route is a bucketed warehouse
  * table — correct at 100 TB for cross-job reuse, absurdly heavy for
  * an in-query staged frame.
  */
object GraftPartitionedCheckpoint {

  /** `df` eagerly checkpointed with layout AND declared partitioning
    * `HashPartitioning(keys, numPartitions)`. The checkpoint's blocks
    * are the caller's to release (see
    * [[graft.ops.Staging.stageCheckpoint]]). */
  def apply(df: DataFrame, keys: Seq[String], numPartitions: Int): DataFrame = {
    // BEFORE any work: an empty key list must fail here, not in the
    // post-materialization declaration — by then a full checkpoint
    // job has run and its blocks are cached but never registered for
    // release (callers stage only on successful return)
    require(keys.nonEmpty, "need at least one key")
    require(numPartitions > 0, "need a positive partition count")
    val ck = graft.ops.Sweep.withoutAqe(
        df.sparkSession.asInstanceOf[SparkSession]) {
      df.repartition(numPartitions, keys.map(col): _*)
        .localCheckpoint(true)
    }
    declare(df.sparkSession.asInstanceOf[SparkSession], ck, keys,
            numPartitions)
  }

  /** [[apply]] fused with a row count: the count() action that
    * materializes the local checkpoint RETURNS the row count, so a
    * sweep operator that needs N (every PageRank variant fetches the
    * node count once to seed 1/N) gets it from the SAME scheduler job
    * that pins the frame — the r14 shape ran `pin(deg)` then
    * `deg.count()`, one whole job re-scanning the just-written blocks
    * for a number the materialization pass already knew (r14 verdict
    * item: sweep cost is per-job scheduling, not data movement).
    *
    * Mirrors Dataset.localCheckpoint(eager=true) at the RDD layer —
    * toRdd.map(_.copy()) (the physical rows are reused UnsafeRows;
    * caching without the copy aliases every row to the last one
    * scanned, silent corruption), RDD-level localCheckpoint, then the
    * counting action — and declares the partitioning the same way. */
  def withCount(df: DataFrame, keys: Seq[String],
                numPartitions: Int): (DataFrame, Long) = {
    require(keys.nonEmpty, "need at least one key") // see apply()
    require(numPartitions > 0, "need a positive partition count")
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val (rep, rdd, n) = graft.ops.Sweep.withoutAqe(spark) {
      val rep = df.repartition(numPartitions, keys.map(col): _*)
        .queryExecution
      val rdd = rep.toRdd.map(_.copy())
      rdd.localCheckpoint()
      (rep, rdd, rdd.count()) // one materializing job; count rides it free
    }
    val declared = LogicalRDD(
      rep.analyzed.output, rdd,
      HashPartitioning(resolve(keys, rep.analyzed.output), numPartitions),
      Nil, isStreaming = false, None)(spark, None, None)
    (Dataset.ofRows(spark, declared), n)
  }

  private def declare(spark: SparkSession, ck: DataFrame, keys: Seq[String],
                      numPartitions: Int): DataFrame =
    ck.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val declared = LogicalRDD(
          l.output, l.rdd,
          HashPartitioning(resolve(keys, l.output), numPartitions),
          Nil, l.isStreaming, l.stream)(spark, None, None)
        Dataset.ofRows(spark, declared)
      case _ =>
        // localCheckpoint not rooting at LogicalRDD would be a Spark
        // behavior change; degrade to the undeclared checkpoint
        // (correct, just re-exchanged) rather than failing the query
        ck
    }

  private def resolve(keys: Seq[String],
                      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = {
    require(keys.nonEmpty, "need at least one key")
    keys.map { k =>
      // exactly-one match, or refuse: declaring a partitioning on
      // an ambiguous name could state a layout the data does not
      // have, which silently MIS-JOINS (wrong results, not a slow
      // plan). Unreachable via the repartition above (col(k) on a
      // duplicate name already throws AMBIGUOUS_REFERENCE), but
      // the declaration is the dangerous half — guard it directly.
      val matches = output.filter(_.name == k)
      require(matches.size == 1,
        s"key '$k' matches ${matches.size} checkpoint output columns " +
          s"(${output.map(_.name).mkString(", ")}) — refusing to " +
          "declare a partitioning on an ambiguous or missing name")
      matches.head
    }
  }
}
