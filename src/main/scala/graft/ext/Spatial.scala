package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar range joins without a cross join — the spatial self-join
  * class (points within distance `r` of each other), grid-bucketed so
  * the candidate set is LOCAL-density-bounded instead of all-pairs.
  *
  * The textbook fixed-grid scheme (e.g. the GRID partitioning of
  * spatial join processing, Patel & DeWitt SIGMOD'96 — public
  * literature): hash each point to the integer cell
  * `(floor(x/r), floor(y/r))`; any pair within L2 distance `r` is then
  * in the same or an 8-adjacent cell, so candidates reduce to
  * same-or-neighbor-cell pairs and the exact distance filter runs only
  * on those.
  *
  * Half-plane trick: rather than exploding one side into all 9
  * neighbor cells (9x shuffle volume), the probe side replicates into
  * the 4 HALF-PLANE offsets {(1,-1),(1,0),(1,1),(0,1)} — the set D
  * with D ∪ -D = the 8 neighbors, each unordered cross-cell pair
  * materializing exactly once (from whichever endpoint's cell + δ
  * lands on the other's) — and same-cell pairs join with an id-order
  * predicate. 4x replication of the POINT frame (id, x, y only — at
  * 100 TB the payload columns rejoin by id afterward), one shuffle on
  * the cell key, candidates bounded by 5 x the max cell occupancy per
  * point. Dense-cell skew is the operator's contract boundary: cell
  * width is `r` by construction, so a hot cell means genuinely
  * r-clustered data, which any within-r join must enumerate.
  */
object Spatial {

  /** All unordered pairs of `points` rows within L2 distance `radius`,
    * as (id_a, id_b, dist2) with id_a < id_b and dist2 the exact
    * squared distance — left un-rooted so the oracle replay shares the
    * IEEE sequence (subtract, square, add; no sqrt).
    *
    * The boundary is CLOSED (dist <= radius), and the grid guarantee
    * covers it: |xa-xb| <= r implies the cells differ by at most 1 in
    * each axis even when floor lands the endpoints on opposite cell
    * edges. */
  def gridRangeJoin(points: DataFrame, idCol: String,
                    xCol: String, yCol: String,
                    radius: Double): DataFrame = {
    require(radius > 0.0, "radius must be positive")
    val home = points.select(
      col(idCol).as("id"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"),
      floor(col(xCol).cast("double") / radius).cast("long").as("cx"),
      floor(col(yCol).cast("double") / radius).cast("long").as("cy"))
    val other = home.select(col("id").as("id2"), col("x").as("x2"),
      col("y").as("y2"), col("cx").as("cx2"), col("cy").as("cy2"))
    // half-plane offsets: D ∪ -D = the 8 neighbors, no overlap
    val probes = home.select(col("id"), col("x"), col("y"),
        explode(typedLit(Seq((1, -1), (1, 0), (1, 1), (0, 1)))).as("d"),
        col("cx"), col("cy"))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("d._1")).as("jx"), (col("cy") + col("d._2")).as("jy"))
    val pairCols = Seq("id", "x", "y", "id2", "x2", "y2").map(col)
    val crossCell = probes.join(other,
        col("jx") === col("cx2") && col("jy") === col("cy2"))
      .select(pairCols: _*)
    val sameCell = home.join(other,
        col("cx") === col("cx2") && col("cy") === col("cy2") &&
          col("id") < col("id2"))
      .select(pairCols: _*)
    val d2 = (col("x") - col("x2")) * (col("x") - col("x2")) +
      (col("y") - col("y2")) * (col("y") - col("y2"))
    crossCell.unionByName(sameCell)
      .filter(d2 <= lit(radius * radius))
      .select(least(col("id"), col("id2")).as("id_a"),
        greatest(col("id"), col("id2")).as("id_b"),
        d2.as("dist2"))
  }
}
