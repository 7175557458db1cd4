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

  /** Build (or reuse) the session and register the graft SQL
    * functions. */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark
  }
}
