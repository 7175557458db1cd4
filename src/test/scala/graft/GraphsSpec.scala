package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Graphs

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: star center outranks leaves; mass is conserved") {
    // undirected star: c - l1..l4
    val edges = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"), ("c", "l4"))
      .toDF("a", "b")
    val pr = Graphs.pageRank(edges, "a", "b", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pr")).toMap
    assert(pr.size == 5)
    val leaves = pr.filter(_._1 != "c").values.toSeq
    assert(leaves.forall(v => pr("c") > v))
    // every leaf sees the identical (symmetric) neighborhood
    assert(leaves.forall(v => math.abs(v - leaves.head) < 1e-12))
    // PageRank distributes total mass 1 across nodes (undirected
    // graphs have no dangling leak)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: a regular graph stays uniform at any iteration count") {
    // 4-cycle: every node degree 2 -> uniform is the fixed point
    val edges = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "1"))
      .toDF("a", "b")
    for (it <- Seq(1, 4)) {
      val pr = Graphs.pageRank(edges, "a", "b", iterations = it)
        .collect().map(_.getAs[Double]("pr"))
      assert(pr.length == 4)
      assert(pr.forall(v => math.abs(v - 0.25) < 1e-12), s"it=$it: ${pr.toSeq}")
    }
  }

  test("pageRank: degree column reports the symmetric degree") {
    val edges = Seq(("c", "l1"), ("c", "l2"), ("l1", "c")).toDF("a", "b")
    val deg = Graphs.pageRank(edges, "a", "b", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("degree")).toMap
    // duplicate/reversed edges collapse in the symmetric distinct
    assert(deg == Map("c" -> 2L, "l1" -> 1L, "l2" -> 1L))
  }

  test("triangles: each triangle exactly once, normalization handles dups/reversals/loops") {
    // triangle 1-2-3 plus a dangling edge; edges arrive messy:
    // reversed, duplicated, and with a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 4L))
      .toDF("u", "v")
    val tri = Graphs.triangles(edges, "u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.toSeq == Seq((1L, 2L, 3L)))
    // square without a diagonal has no triangle
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    assert(Graphs.triangles(square, "u", "v").count() == 0)
    // K4 has exactly binom(4,3) = 4 triangles, each once
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("u", "v")
    val t4 = Graphs.triangles(k4, "u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(t4 == Set((1L,2L,3L), (1L,2L,4L), (1L,3L,4L), (2L,3L,4L)))
    graft.ops.Staging.releaseAll()
  }
}
