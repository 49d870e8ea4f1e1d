package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Semantics of the triangle-count and Jaccard link-score projections
  * on hand-built graphs (the hash gate proves engine parity on the
  * co-purchase construction; these pin the math).
  */
class GraphTriangleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(es: (Long, Long, Long)*) =
    es.toDF("s1", "s2", "n_common")

  test("triangles: K4 gives every node 3 triangles, degree 3") {
    // complete graph on {1,2,3,4}: C(4,3)=4 triangles, each node in 3
    val e = edges((1L, 2L, 9L), (1L, 3L, 9L), (1L, 4L, 9L),
      (2L, 3L, 9L), (2L, 4L, 9L), (3L, 4L, 9L))
    val got = Graph.trianglesOf(e, maxEdges = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 4)
    assert(got.forall { case (_, deg, tri) => deg == 3L && tri == 3L })
  }

  test("triangles: a path has none; nodes still appear with 0") {
    val e = edges((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L))
    val got = Graph.trianglesOf(e, maxEdges = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.forall(_._3 == 0L))
  }

  test("triangles: the maxEdges cut keeps the strongest edges, (s1,s2) tie-break") {
    // triangle {1,2,3} strong, edge (1,4) weak: cut at 3 edges drops (1,4)
    val e = edges((1L, 2L, 9L), (1L, 3L, 9L), (2L, 3L, 9L), (1L, 4L, 1L))
    val got = Graph.trianglesOf(e, maxEdges = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))     // node 4's only edge was cut
    assert(got.forall(_._3 == 1L))
  }

  test("jaccard pairs: closed-form overlap on hand-built sets, rank and cut") {
    // c1 parts {1,2,3,4}, c2 {1,2,3}, c3 {1,2,9,10}:
    //   (c1,c2) inter 3, union 4  → 0.75
    //   (c1,c3) inter 2, union 6  → 0.333333
    //   (c2,c3) inter 2, union 5  → 0.4
    val cp = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 9L), (3L, 10L)).toDF("cust", "p")
    val pairs = cp.as("a").join(cp.as("b"),
        col("a.p") === col("b.p") && col("a.cust") < col("b.cust"))
      .groupBy(col("a.cust").as("c1"), col("b.cust").as("c2"))
      .agg(count(lit(1)).as("inter"))
    val degrees = cp.groupBy("cust").agg(count(lit(1)).as("deg"))
    val got = Graph.jaccardPairsOf(pairs, degrees, minInter = 2, topK = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 2)                            // topK cut applied
    assert(got(0) == ((1L, 2L, 3L, 4L, 3L, 0.75)))     // strongest pair first
    assert(got(1) == ((2L, 3L, 2L, 3L, 4L, 0.4)))
  }

  test("jaccard pairs: minInter prunes singleton-overlap pairs") {
    val cp = Seq((1L, 1L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("cust", "p")
    val pairs = cp.as("a").join(cp.as("b"),
        col("a.p") === col("b.p") && col("a.cust") < col("b.cust"))
      .groupBy(col("a.cust").as("c1"), col("b.cust").as("c2"))
      .agg(count(lit(1)).as("inter"))
    val degrees = cp.groupBy("cust").agg(count(lit(1)).as("deg"))
    assert(Graph.jaccardPairsOf(pairs, degrees, minInter = 2, topK = 10).count() == 0L)
    assert(Graph.jaccardPairsOf(pairs, degrees, minInter = 1, topK = 10).count() == 1L)
  }
}
