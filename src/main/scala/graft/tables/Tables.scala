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

  /** events.parquet has shipped `ts` in two physical encodings across
    * testdata generations, so the loader adapts to whichever is on disk
    * and always hands callers a session-TZ `TimestampType` column:
    *
    *  - parquet TIMESTAMP(NANOS): the Spark vectorized reader rejects
    *    it, so read nanos as Long (`spark.sql.legacy.parquet.
    *    nanosAsLong`) and convert via `timestamp_micros(ts div 1000)`.
    *    `div` (integer division) is required: epoch-nanos ~1.7e18
    *    exceeds 2^53, so a double round-trip would lose precision, and
    *    truncation matches DuckDB's ns->us cast. The flag mutates the
    *    session conf (no per-read form in Spark 4.1.2 — r3 audit), but
    *    only TIMESTAMP(NANOS) columns are affected and no other
    *    testdata table has one, so the stickiness is benign.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ; cast to TimestampType (identity on the stored
    *    micros — every entry point pins spark.sql.session.timeZone=UTC)
    *    so downstream window/date_format/unix_micros code is unchanged.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
