package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph2

/** Planted-graph semantics for BFS hop distances and label-propagation
  * communities — the hash gate proves engine parity on the purchase
  * graph; these pin the traversal rules on graphs small enough to
  * verify by eye.
  */
class Graph2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def nodes(ns: Long*) = ns.toDF("node")

  test("bfs: a path graph reads one node per hop, tail unreached as -1") {
    // 1-2-3-4-5 path, seed 1, 3 hops → 5 is unreached
    val got = Graph2.bfsHopsOf(
      sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L),
      nodes(1L, 2L, 3L, 4L, 5L), nodes(1L), hops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, -1L -> 1L))
  }

  test("bfs: distances are MIN over paths (cycle reached from both sides)") {
    // 6-cycle from one seed: hops 0,1,1,2,2,3
    val got = Graph2.bfsHopsOf(
      sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 1L),
      nodes(1L, 2L, 3L, 4L, 5L, 6L), nodes(1L), hops = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("bfs: multi-source seeds take the nearer seed's distance") {
    // path 1-2-3-4-5, seeds {1, 5} → hops 0,1,2,1,0
    val got = Graph2.bfsHopsOf(
      sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L),
      nodes(1L, 2L, 3L, 4L, 5L), nodes(1L, 5L), hops = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }

  test("labelProp: two triangles with one bridge hold separate communities") {
    // triangle {1,2,3} - bridge 3-4 - triangle {4,5,6}: each node's
    // neighborhood majority stays inside its own triangle, so two
    // sweeps keep two communities of 3 (min-label CC would merge all 6)
    val e = sym(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L)
    val got = Graph2.labelPropOf(e, nodes(1L, 2L, 3L, 4L, 5L, 6L),
      sweeps = 2, topK = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._2).sum == 6L)
    assert(got.size == 2, s"expected two communities, got $got")
  }

  test("labelProp: an isolated node keeps its own label") {
    val got = Graph2.labelPropOf(sym(1L -> 2L), nodes(1L, 2L, 99L),
      sweeps = 2, topK = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.contains(99L))
    assert(got(99L) == 1L)
  }

  test("labelProp: vote ties break to the SMALLEST label") {
    // after one self-voting sweep: node 1 sees {3, 1} → 1,
    // node 2 sees {3, 2} → 2, node 3 sees {1, 2, 3} all tied → 1
    val got = Graph2.labelPropOf(sym(1L -> 3L, 2L -> 3L), nodes(1L, 2L, 3L),
      sweeps = 1, topK = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }
}
