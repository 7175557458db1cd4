package graft
import org.apache.spark.sql.SparkSession
import graft.finlogic.FinData
object DemoDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val data = FinData.load(spark, "/tmp/cvmdata/financials.parquet",
      "/tmp/cvmdata/trades.parquet", "/tmp/cvmdata/language.parquet")
    println("=== info ==="); data.info("/tmp/cvmdata").show(false)
    println("=== searchCompany(petro) ==="); data.searchCompany("petro").show(false)
    println("=== rank(by total_assets) ==="); data.rank(rankBy = "total_assets").show(false)
    val co = data.company(9512, accUnit = "b")
    println("=== company.info ==="); co.info().show(false)
    println("=== report(assets) ==="); co.report("assets").show(false)
    println("=== report(income_statement) en ==="); co.report("income_statement").show(false)
    println("=== indicators ==="); co.indicators().show(40, false)
    // probe: unknown identifier
    try { data.company(42) } catch { case e: NoSuchElementException => println("PROBE unknown id -> " + e.getMessage) }
    // probe: min_volume excludes SMALLCO
    println("PROBE companies loaded = " + data.financials.select("cvm_id").distinct().count())
    spark.stop()
  }
}
