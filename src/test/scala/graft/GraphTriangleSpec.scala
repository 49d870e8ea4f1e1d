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

  test("hits: one-sweep hand numbers; shared authority outranks; scores L1-normalize") {
    // hubs {1,2}, auths {10,20}: 1→10, 2→10, 2→20 (unit weights)
    // sweep 1: a = (2/3, 1/3); h = (0.4, 0.6)
    val e = Seq((1L, 10L, 1.0), (2L, 10L, 1.0), (2L, 20L, 1.0))
      .toDF("hub", "auth", "w")
    val one = Graph.hitsOf(e, iters = 1, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(one(("authority", 10L)) - 2.0 / 3) < 1e-6)
    assert(math.abs(one(("authority", 20L)) - 1.0 / 3) < 1e-6)
    assert(math.abs(one(("hub", 1L)) - 0.4) < 1e-6)
    assert(math.abs(one(("hub", 2L)) - 0.6) < 1e-6)
    // more sweeps keep the ordering and the L1 normalization
    val three = Graph.hitsOf(e, iters = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(three.filter(_._1 == "hub").map(_._3).sum > 0.999)
    assert(three.filter(_._1 == "authority").map(_._3).sum > 0.999)
    val byKey = three.map(t => (t._1, t._2) -> t._3).toMap
    assert(byKey(("authority", 10L)) > byKey(("authority", 20L)))
    assert(byKey(("hub", 2L)) > byKey(("hub", 1L)))
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
