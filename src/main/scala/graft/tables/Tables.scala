package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md). Plain parquet
  * scans — filters/projections chained by callers reach the scan via
  * Catalyst pushdown, so keep these as bare `spark.read.parquet`.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)   = table(s, d, "region")
  def nation(s: SparkSession, d: String)   = table(s, d, "nation")
  def customer(s: SparkSession, d: String) = table(s, d, "customer")
  def supplier(s: SparkSession, d: String) = table(s, d, "supplier")
  def part(s: SparkSession, d: String)     = table(s, d, "part")
  def orders(s: SparkSession, d: String)   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark vectorized reader rejects. Read nanos as Long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * microsecond TimestampType column. `div` (integer division) is
    * required: epoch-nanos ~1.7e18 exceeds 2^53, so a double round-trip
    * would lose precision. Truncation (floor for positive epochs)
    * matches DuckDB's ns->us cast. Note: setting the flag mutates
    * the session conf — subsequent ns parquet reads in the same
    * session also come back as Long. A per-read form was investigated
    * (r3): `ParquetOptions` in Spark 4.1.2 accepts no nanosAsLong
    * key, and both schema inference (eager) and the vectorized reader
    * (at execution) consult the session conf, so a set/restore wrapper
    * would race lazy execution. The flag only changes how
    * TIMESTAMP(NANOS) columns are read — no other testdata table has
    * one — so the stickiness is benign and kept.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
