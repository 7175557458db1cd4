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
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
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
    // SPARK_GRAFT_PROBE_VERBOSE=1 names each job (callsite + stage
    // count) as it starts — the map from a query's job COUNT to which
    // plan steps those jobs actually are, without the Spark UI
    val verbose = sys.env.get("SPARK_GRAFT_PROBE_VERBOSE").contains("1")
    // verbose per-job timing (r21): job wall = end - start, plus the
    // GAP since the previous job's end — driver-side work (planning,
    // collects, plan-string rendering) lives in the gaps, executor
    // work in the job walls. The start map is keyed by jobId.
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lastEndNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val k = jobs.incrementAndGet()
        jobStartNs.put(j.jobId, System.nanoTime())
        if (verbose) {
          val desc = j.stageInfos.map(_.name).mkString(" | ")
          println(f"[probe]   job#$k%-3d stages=${j.stageInfos.size}%3d  $desc")
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val now = System.nanoTime()
        val st = Option(jobStartNs.remove(j.jobId)).getOrElse(now)
        val prev = lastEndNs.getAndSet(now)
        if (verbose) {
          val gap = if (prev == 0L) 0.0 else (st - prev).max(0L) / 1e9
          println(f"[probe]   job ${j.jobId}%-4d wall=${(now - st) / 1e9}%6.3f s  gap_before=$gap%6.3f s")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    // warm codegen/ICU out of the first measurement
    spark.range(1000000).selectExpr("sum(id)", "max(upper('warm'))").collect()
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    // final pass per query wins: caches are warm, so the counts are
    // the steady-state structural cost (jobs/stages/tasks are
    // deterministic observables — the signal the host's 3-30× wall
    // noise can't fake; wall is best-of-passes, reported for color)
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, (Int, Int, Int, Double)]
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
          val bestWall = results.get(name).map(_._4.min(secs)).getOrElse(secs)
          results(name) = (jobs.get, stages.get, tasks.get, bestWall)
        }
    }
    // optional artifact (third CLI arg): one JSON object per round,
    // committed beside the bench so structural perf is diffable.
    // Locale.ROOT, not the f-interpolator: a comma-decimal default
    // locale (de_DE) would render 0,53 — invalid JSON.
    args.lift(2).foreach { outPath =>
      val rows = results.map { case (n, (j, st, t, w)) =>
        val ws = String.format(java.util.Locale.ROOT, "%.2f", Double.box(w))
        s"""    "$n": {"jobs": $j, "stages": $st, "tasks": $t, "wall_best_sec": $ws}"""
      }.mkString(",\n")
      val json =
        s"""{
           |  "sf_dir": "$sfDir",
           |  "passes": $passes,
           |  "cpus": $cpus,
           |  "note": "counts are from the final (warm) pass; wall is best-of-passes",
           |  "queries": {
           |$rows
           |  }
           |}
           |""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[probe] wrote $outPath")
    }
    spark.stop()
  }
}
