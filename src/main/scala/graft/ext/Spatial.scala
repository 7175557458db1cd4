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

  /** Asymmetric PROBE-vs-REFERENCE form of [[gridRangeJoin]]: every
    * (probe, reference) pair within `radius`, as (probe_id, ref_id,
    * dist2). The probe side explodes to its full 3x3 cell
    * neighborhood (9 offsets — the half-plane trick needs both
    * endpoints indexed symmetrically, which a probe-vs-static join
    * does not have), the reference indexes at its home cell only, and
    * only cell-collided pairs pay the exact distance test.
    *
    * Every transform is STATELESS (projection, explode, inner join,
    * filter), so the probe side may be a STREAMING frame — the
    * operator then IS its own streaming twin: Structured Streaming
    * plans it as a stream-static join, the reference stays a batch
    * frame re-read per micro-batch (or broadcast when small), and no
    * watermark or state store is involved
    * ([[graft.streaming.Streams.proximityAlertStream]] is this call;
    * StreamingSpec pins stream ≡ batch). At 100 TB the reference is
    * the big side: it shuffles once on the cell key per batch plan,
    * probes carry 9 small rows each. */
  def gridProximityJoin(probe: DataFrame, probeIdCol: String,
                        reference: DataFrame, refIdCol: String,
                        xCol: String, yCol: String,
                        radius: Double): DataFrame = {
    require(radius > 0.0, "radius must be positive")
    val ref = reference.select(
      col(refIdCol).as("ref_id"),
      col(xCol).cast("double").as("x2"),
      col(yCol).cast("double").as("y2"),
      floor(col(xCol).cast("double") / radius).cast("long").as("cx2"),
      floor(col(yCol).cast("double") / radius).cast("long").as("cy2"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probes = probe.select(
        col(probeIdCol).as("probe_id"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"),
        explode(typedLit(offsets)).as("d"),
        floor(col(xCol).cast("double") / radius).cast("long").as("cx"),
        floor(col(yCol).cast("double") / radius).cast("long").as("cy"))
      .select(col("probe_id"), col("x"), col("y"),
        (col("cx") + col("d._1")).as("jx"), (col("cy") + col("d._2")).as("jy"))
    val d2 = (col("x") - col("x2")) * (col("x") - col("x2")) +
      (col("y") - col("y2")) * (col("y") - col("y2"))
    probes.join(ref, col("jx") === col("cx2") && col("jy") === col("cy2"))
      .filter(d2 <= lit(radius * radius))
      .select(col("probe_id"), col("ref_id"), d2.as("dist2"))
  }

  /** DBSCAN (Ester et al. KDD'96) over the plane, composed from the
    * grid range join and min-label connected components — density
    * clustering at grid-join cost, never all-pairs:
    *
    *  - core iff |N_eps(p)| >= minPts, SELF INCLUDED (the paper's
    *    convention), i.e. >= minPts - 1 grid-join neighbors;
    *  - clusters = connected components of the core-core eps graph,
    *    labeled by MIN core id (deterministic);
    *  - border = non-core with >= 1 core neighbor, attached to the
    *    MIN cluster among its core neighbors — the deterministic
    *    resolution of classic DBSCAN's scan-order-dependent border
    *    assignment;
    *  - everything else is noise and is NOT in the returned frame.
    *
    * Returns (id, cluster, role) with role in {core, border}. Cost:
    * one grid join, one degree aggregate, components over the core
    * subgraph only (noise and borders never enter the sweeps), one
    * anti-join + min-aggregate for borders. Dense-cell skew is the
    * grid join's documented contract; everything downstream is
    * node-sized. */
  def dbscan(points: DataFrame, idCol: String, xCol: String,
             yCol: String, radius: Double, minPts: Int): DataFrame = {
    require(minPts >= 2, "minPts < 2 makes every point a core")
    val pairs = graft.ops.Staging.stage(
      gridRangeJoin(points, idCol, xCol, yCol, radius)
        .select("id_a", "id_b"))
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val core = graft.ops.Staging.stage(
      sym.groupBy("id").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= minPts - 1).select("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("id_a")), "id_a")
      .join(core.select(col("id").as("id_b")), "id_b")
    val comp = Dedup.connectedComponents(coreEdges)
    val coreLab = core.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
    val borderLab = sym
      .join(core, Seq("id"), "left_anti")
      .join(coreLab.select(col("id").as("nb"), col("cluster")), "nb")
      .groupBy("id").agg(min("cluster").as("cluster"))
    coreLab.withColumn("role", lit("core"))
      .unionByName(borderLab.withColumn("role", lit("border")))
  }
}
