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
}
