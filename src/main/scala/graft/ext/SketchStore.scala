package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured persistence for sketch tables — the incremental
  * corpus-statistics story at 100 TB. All three portable sketches
  * ([[Sketches.cmsCounters]] frequency, [[Sketches.histCounters]]
  * quantiles, [[Sketches.hllDistinct]]'s register table cardinality)
  * are MERGEABLE: counters merge by per-bucket SUM, HLL registers by
  * per-bucket MAX. That makes maintenance append-only:
  *
  *  - [[append]] writes a delta corpus's sketch as a NEW parquet
  *    segment — it never reads, locks, or rewrites the store. A
  *    daily-crawl pipeline sketches only the delta (bounded rows,
  *    map-side partial agg) regardless of how big the corpus has
  *    grown.
  *  - [[load]] folds all segments with the sketch's merge function —
  *    a groupBy over segments × buckets rows, still bounded by the
  *    sketch size times the segment count, never by the corpus.
  *  - [[compact]] collapses the segment log back to one segment when
  *    the log gets long.
  *
  * Because the merges are exact (sums and maxes commute with union),
  * a store built from any partition of the corpus into segments
  * EQUALS the single-shot sketch of the whole corpus — pinned by
  * spec, not approximate. Contrast [[IvfIndex.append]], where
  * appending at frozen centroids is only search-equivalent.
  */
object SketchStore {

  /** Overwrite the store with `sketch` as its single segment. */
  def save(sketch: DataFrame, path: String): Unit =
    sketch.write.mode("overwrite").parquet(path)

  /** Add `sketch` (a delta corpus's sketch) as a new segment.
    * Append-only: no read-modify-write, safe to run while readers
    * [[load]] older segments. */
  def append(sketch: DataFrame, path: String): Unit =
    sketch.write.mode("append").parquet(path)

  /** Fold the segment log into one sketch table: group by `keyCols`,
    * merge `valueCol` with "sum" (additive counters) or "max" (HLL
    * registers). */
  def load(spark: SparkSession, path: String, keyCols: Seq[String],
           valueCol: String, merge: String = "sum"): DataFrame = {
    val m = merge match {
      case "sum" => sum(valueCol)
      case "max" => max(valueCol)
      case other => throw new IllegalArgumentException(
        s"merge must be 'sum' or 'max', got '$other'")
    }
    spark.read.parquet(path)
      .groupBy(keyCols.map(col): _*).agg(m.as(valueCol))
  }

  /** Rewrite the segment log as a single merged segment at `dest`
    * (write-then-swap belongs to the caller's orchestration layer, as
    * with [[IvfIndex.compact]]). */
  def compact(spark: SparkSession, path: String, dest: String,
              keyCols: Seq[String], valueCol: String,
              merge: String = "sum"): Unit =
    save(load(spark, path, keyCols, valueCol, merge), dest)
}
