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
  * plain equi-join on the cell, and the exact overlap predicate
  * filters the cell-coarse candidates. A pair overlapping across
  * SEVERAL shared cells is emitted exactly once by the CANONICAL-CELL
  * rule: only the first cell of the intersection,
  * `floor(max(lStart, rStart)/w)` — a cell both sides always cover —
  * may emit, which is a stateless map-side filter (no dedup
  * exchange, and the same rule keeps the streaming twin
  * [[graft.streaming.Streams.overlapJoinStream]] stateless). Pick
  * `bucketWidth` near the typical interval length: too small
  * inflates replication, too large inflates candidates per cell —
  * both degrade gracefully, neither is quadratic in table size.
  */
object IntervalJoin {

  private[graft] def cells(s: String, e: String, w: Long): Column =
    sequence(floor(col(s) / w).cast("long"), floor(col(e) / w).cast("long"))

  /** The overlap predicate + canonical-cell exactly-once rule shared
    * by the batch and streaming forms. */
  private[graft] def overlapOnce(lStart: String, lEnd: String,
                                 rStart: String, rEnd: String,
                                 w: Long): Column =
    col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
      col("__cell") ===
        floor(greatest(col(lStart), col(rStart)) / w).cast("long")

  /** Overlap-join `left` and `right` on Long interval columns
    * (epoch micros or any integer timeline). Returns all left
    * columns plus all right columns of matching pairs, each pair
    * exactly once. */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__cell", explode(cells(lStart, lEnd, bucketWidth)))
    val r = right.withColumn("__cell", explode(cells(rStart, rEnd, bucketWidth)))
    l.join(r, Seq("__cell"))
      .filter(overlapOnce(lStart, lEnd, rStart, rEnd, bucketWidth))
      .drop("__cell")
  }
}
