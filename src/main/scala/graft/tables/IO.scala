package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers beyond bare parquet scans: schema'd CSV and
  * JSON-lines read/write, hive-style partitioned parquet layout, and
  * bucketed tables for co-located (shuffle-free) joins.
  *
  * Scale notes:
  *  - Partitioned layout (`writePartitioned`) turns equality/range
  *    predicates on the partition column into directory pruning — the
  *    scan never opens non-matching files (PartitionFilters in the
  *    plan, verified in PartitionedIOSpec).
  *  - Bucketed tables pre-shuffle data by join key at write time; a
  *    join of two tables bucketed on the same key by the same count
  *    runs with zero Exchange — the 100 TB answer to repeated big-big
  *    joins on a stable key.
  */
object IO {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC read/write — the other columnar format large estates carry
    * (Hive-era tables); Spark's native vectorized ORC reader pushes
    * filters and prunes columns exactly like the parquet path. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Hive-style partitioned parquet: one directory per value of
    * `partitionCols` (choose low-cardinality columns). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table (requires a catalog table, not a
    * bare path — Spark persists bucket metadata in the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
