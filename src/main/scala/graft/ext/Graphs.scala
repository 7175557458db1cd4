package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring. Connected components (the dedup-cluster
  * primitive) lives in [[Dedup.connectedComponents]]; this adds the
  * other workhorse: PageRank, the importance score behind
  * link-graph-weighted corpus curation (e.g. Common-Crawl harmonic/
  * PageRank centrality as a document quality prior).
  */
object Graphs {

  /** PageRank over an UNDIRECTED graph given as an edge list (each
    * edge walked both ways; no dangling-mass correction needed since
    * every node has degree >= 1). Fixed `iterations` of
    * `pr' = (1-d)/N + d * sum_{u~v} pr(u)/deg(u)` from the uniform
    * start — the deterministic fixed-iteration form (an epsilon stop
    * would couple the result to float noise).
    *
    * Scale shape: the degree-annotated symmetric adjacency is staged
    * once and reused by every sweep (one shuffle to build); each
    * iteration is one join of the (nodes-sized) rank frame against it
    * plus one aggregate — the plan stays constant-size per iteration,
    * and the rank frame never exceeds one row per node. N rides along
    * as a broadcast single-row aggregate, not a driver collect.
    *
    * Determinism: additions inside the per-node mass sum commute at
    * ulp level only; consumers must order on the ROUNDED score with a
    * node tie-break (the q80 rule). The (1-d) constant is emitted as
    * the IEEE subtraction `1.0 - d`, which an oracle must replay as
    * `(1.0 - 0.85)` — the decimal literal 0.15 parses to a DIFFERENT
    * double.
    *
    * Returns (node, degree, pr).
    */
  /** `dedupEdges = false` skips the symmetric-union distinct — one
    * full edge-list shuffle — when the caller guarantees the input
    * has no duplicate or reversed-duplicate edges (e.g. a DISTINCT
    * bipartite projection whose two id spaces are prefix-disjoint:
    * both walk directions are then unique by construction). */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
               iterations: Int = 3, damping: Double = 0.85,
               dedupEdges: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // Every shared frame is staged: sym feeds deg and adj; deg feeds
    // adj, N, the uniform start, and the final degree join; adj and
    // each iteration's rank frame feed every sweep. Unstaged, each
    // iteration's lineage re-derives deg/N from raw scans and the
    // plan grows a full copy of the edge pipeline per sweep (26
    // parquet scans at 3 iterations when first written); staged, each
    // sweep is a constant-size plan over two cached tables.
    val symRaw = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    val sym = graft.ops.Staging.stage(
      if (dedupEdges) symRaw.distinct() else symRaw)
    val deg = graft.ops.Staging.stage(
      sym.groupBy("src").agg(count(lit(1)).as("deg")))
    // Pin the cached adjacency's partitioning to the sweep-join key:
    // AQE broadcasts the (small) degree side, which would leave adj
    // on sym's (src, dst) partitioning and re-shuffle it EVERY sweep;
    // repartitioned on src, each sweep shuffles only the rank frame
    // (one row per node) plus the inherent per-sweep mass aggregate.
    val adj = graft.ops.Staging.stage(
      sym.join(deg, "src").repartition(col("src")))
    val nAgg = deg.agg(count(lit(1)).cast("double").as("__n"))
    val init = deg.select(col("src").as("node")).crossJoin(broadcast(nAgg))
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
    val terminal = (1 to iterations).foldLeft(init) { (pr, _) =>
      graft.ops.Staging.stage(
        adj.join(pr, col("src") === col("node"))
          .groupBy("dst")
          .agg(sum(col("pr") / col("deg")).as("__mass"))
          .crossJoin(broadcast(nAgg))
          .select(col("dst").as("node"),
            (lit(1.0 - damping) / col("__n") +
              lit(damping) * col("__mass")).as("pr")))
    }
    terminal.join(deg, col("node") === col("src"))
      .select(col("node"), col("deg").as("degree"), col("pr"))
  }

  /** Enumerate triangles of an undirected graph: input pairs are
    * normalized to distinct x<y edges (self-loops dropped), then the
    * oriented wedge join e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) emits each
    * triangle EXACTLY once as (a < b < c). The orientation is the
    * standard distributed-triangle trick: because every edge points
    * low→high, no triangle is found in more than one rotation, so no
    * post-hoc /3 or /6 correction (and at scale, orienting by DEGREE
    * instead of id bounds the wedge fan-out of hub nodes — same join
    * shape, swap the comparator). Returns (a, b, c).
    */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = graft.ops.Staging.stage(
      edges.select(least(col(aCol), col(bCol)).as("x"),
                   greatest(col(aCol), col(bCol)).as("y"))
        .filter(col("x") < col("y"))
        .distinct())
    e.select(col("x").as("a"), col("y").as("b"))
      .join(e.select(col("x").as("b"), col("y").as("c")), "b")
      .join(e.select(col("x").as("a"), col("y").as("c")), Seq("a", "c"))
      .select("a", "b", "c")
  }
}
