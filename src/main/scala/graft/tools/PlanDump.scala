package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev instrumentation: print the formatted physical plan of named
  * SparkEntry queries (exchange/scan census — the .explain loop the
  * build brief prescribes). Not part of the driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq())
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"==== $name ====")
        val df = fn(spark, sfDir)
        // r22: formatted explain (numbered operator list + details —
        // PushedFilters/ReadSchema/build sides), the artifact format
        // plans/ has carried since r21
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        graft.ops.Staging.releaseAll()
      }
    spark.stop()
  }
}
