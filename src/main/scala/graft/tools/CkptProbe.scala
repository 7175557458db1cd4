package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 50, i)).toDF("k", "v")
      .repartition(32, col("k"))
    val ck = df.localCheckpoint(true)
    println("analyzed: " + ck.queryExecution.analyzed.getClass)
    ck.queryExecution.analyzed match {
      case g: org.apache.spark.sql.execution.GraftPinnedRDD =>
        println("GraftPinnedRDD partitioning: " + g.partitioning)
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        println("LogicalRDD partitioning: " + l.outputPartitioning)
        println("LogicalRDD ordering: " + l.outputOrdering.mkString(","))
      case other => println("other: " + other)
    }
    // does a join against a co-partitioned frame avoid an exchange?
    val agg = (1 to 50).map(i => (i, i * 10)).toDF("k", "cnt")
      .groupBy("k").agg(sum("cnt").as("s"))
    val j = ck.join(agg, "k")
    j.collect()
    println(j.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("ExistingRDD")).mkString("\n"))
    spark.stop()
  }
}
