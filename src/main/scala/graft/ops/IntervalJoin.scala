package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join — the temporal operator Spark
  * SQL has no native strategy for (an inequality-only join condition
  * plans as BroadcastNestedLoopJoin: O(|L|·|R|) compares and a
  * broadcast requirement). Matches every left interval to every
  * right interval with `lStart < rEnd AND rStart < lEnd`
  * (half-open overlap).
  *
  * Scale shape — the time-grid bucketization standard in stream/
  * temporal engines: each interval explodes to the grid cells it
  * covers (`floor(start/w) … floor(end/w)` — replication bounded by
  * interval length / w + 1, NEVER a cross product), the join is a
  * plain equi-join on the cell, overlapping pairs found in several
  * shared cells are deduplicated by keys, and the exact overlap
  * predicate filters the cell-coarse candidates. Pick `bucketWidth`
  * near the typical interval length: too small inflates replication,
  * too large inflates candidate pairs per cell — both degrade
  * gracefully, neither is quadratic in table size.
  */
object IntervalJoin {

  /** Overlap-join `left` and `right` on Long interval columns
    * (epoch micros or any integer timeline). `lKeys`/`rKeys` must
    * uniquely identify rows on their side (used to deduplicate
    * multi-cell matches). Returns all left columns plus all right
    * columns of matching pairs. */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  lKeys: Seq[String],
                  right: DataFrame, rStart: String, rEnd: String,
                  rKeys: Seq[String],
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def cells(s: String, e: String): Column =
      sequence(floor(col(s) / bucketWidth).cast("long"),
               floor(col(e) / bucketWidth).cast("long"))
    val l = left.withColumn("__cell", explode(cells(lStart, lEnd)))
    val r = right.withColumn("__cell", explode(cells(rStart, rEnd)))
    l.join(r, Seq("__cell"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .dropDuplicates(lKeys ++ rKeys)
      .drop("__cell")
  }
}
