package graft

import org.apache.spark.sql.SparkSession

/** Recommended session construction for the engine: sensible local
  * shuffle parallelism, AQE (runtime coalescing, broadcast
  * conversion, skew-join splitting), UTC, and the native function
  * registrations. A user of the reference library switching to this
  * engine starts here.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Defense-in-depth (round 6 postmortem): cap plan-string
      // rendering at 1 MB so a future lineage bug degrades to
      // truncated debug strings instead of GiB-scale driver
      // allocations. NOT a fix for lineage growth — iterative
      // operators must checkpoint (see Dedup.connectedComponents).
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)

  /** Build (or reuse) the session and register the graft SQL
    * functions. */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark
  }
}
