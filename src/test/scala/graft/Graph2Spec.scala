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

  // ------------------------------------------------- assortativity

  test("assortativity: a star graph reads exactly -1 (pure hub-to-leaf)") {
    import spark.implicits._
    // hub 0 to leaves 1..3, both directions in the list
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = graft.operators.Graph2.assortativityOf(edges).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == -1.0)
  }

  test("assortativity: two disjoint cliques of different degree read exactly 1") {
    import spark.implicits._
    // K3 (deg 2) + K4 (deg 3): endpoint degrees always equal -> r = 1
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val k4 = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L))
    val und = k3 ++ k4
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = graft.operators.Graph2.assortativityOf(edges).collect().head
    assert(r.getLong(0) == 9L)
    // sqrt-product rounding leaves the ratio within 1 ulp of 1
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("assortativity: a degree-regular graph has zero variance and reads NULL") {
    import spark.implicits._
    // a 4-cycle: every node degree 2
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = graft.operators.Graph2.assortativityOf(edges).collect().head
    assert(r.isNullAt(1))
  }

  // --------------------------------------------------- modularity

  test("modularity: two disjoint triangles read Q = 0.5 exactly (textbook value)") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L).toDF("node")
    val rows = graft.operators.Graph2.modularityOf(edges, nodes, sweeps = 3)
      .collect()
    val total = rows.filter(_.getLong(0) == -1L).head
    // per community: intra_dir = 6, d_c = 6, D = 12 → (6·12 − 36)/144 = 0.25
    assert(total.getDouble(total.fieldIndex("contribution")) == 0.5)
    val per = rows.filter(_.getLong(0) != -1L)
    assert(per.length == 2)
    per.foreach { r =>
      assert(r.getLong(r.fieldIndex("intra_edges")) == 3L)
      assert(r.getLong(r.fieldIndex("d_c")) == 6L)
      assert(r.getDouble(r.fieldIndex("contribution")) == 0.25)
    }
  }

  test("modularity: a perfectly bipartite assignment reads negative Q (every edge crosses)") {
    import spark.implicits._
    // star: LP labels hub and leaves differently enough that some
    // edges cross; plant the pathological case directly via one sweep
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("node")
    val rows = graft.operators.Graph2.modularityOf(edges, nodes, sweeps = 1).collect()
    val total = rows.filter(_.getLong(0) == -1L).head
    // after 1 sweep every node adopts label 0 → one community, Q = 0
    // (all edges intra, but d_c = 2m ⇒ intra·D − d_c² = 0)
    assert(total.getDouble(total.fieldIndex("contribution")) == 0.0)
  }
}
