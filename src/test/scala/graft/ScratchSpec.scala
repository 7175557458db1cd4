package graft

import org.scalatest.funsuite.AnyFunSuite

/** TEMPORARY measurement harness — deleted before commit. */
class ScratchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("time new queries at sf0.1") {
    val d = "/root/testdata/sf0.1"
    for (q <- Seq("q65_decontamination", "q68_session_sequences",
                  "q70_redaction", "q71_shard_packing", "q64_dup_components",
                  "q69_curation_pipeline")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      graft.ops.Staging.releaseAll()
      println(f"$q%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
  }
}
