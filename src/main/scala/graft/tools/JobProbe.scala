package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev instrumentation: run named SparkEntry queries and report
  * scheduler-level cost — jobs launched, stages completed, tasks run,
  * wall seconds — the observables behind "fixed per-sweep job
  * overhead" claims (r12 verdict: the graph-sweep class spends its
  * bench time on scheduling, not data). Usage:
  *
  * {{{
  * SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.JobProbe /root/testdata/sf0.1 q90,q121"
  * }}}
  *
  * Not part of the driver contract; a measurement harness only.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    // warm codegen/ICU out of the first measurement
    spark.range(1000000).selectExpr("sum(id)", "max(upper('warm'))").collect()
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    (1 to passes).foreach { pass =>
      graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
        .foreach { case (name, fn) =>
          jobs.set(0); stages.set(0); tasks.set(0)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val secs = (System.nanoTime() - t0) / 1e9
          graft.ops.Staging.releaseAll()
          Thread.sleep(300) // let the async listener drain
          println(f"[probe] p$pass $name%-28s jobs=${jobs.get}%4d stages=${stages.get}%4d tasks=${tasks.get}%6d wall=$secs%7.2f s")
        }
    }
    spark.stop()
  }
}
