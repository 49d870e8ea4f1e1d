package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph analytics over relational edges. Complements
  * [[Dedup.nearDupClusters]] (unweighted label propagation): PageRank
  * propagates WEIGHTED mass, the other canonical big-data iterative
  * pattern (ref has no graph surface; this is §2.7 extension work).
  */
object Graph {

  /** Weighted PageRank over the customer→supplier purchase graph:
    * an edge (c, s) with weight = number of lineitems c bought from s.
    * Node ids share one key space via parity (customer 2k, supplier
    * 2k+1). Damping d=0.85, a FIXED `iters` sweeps from the uniform
    * start — fixed so the DuckDB oracle can unroll the same loop as
    * CTEs and hash-match bit-for-bit semantics (suppliers are sinks in
    * this bipartite graph, so dangling mass simply decays; both
    * engines drop it identically).
    *
    * Scale shape: each sweep is one shuffle join of ranks×edges on src
    * (both sides hash-partitioned on the same key — AQE reuses the
    * exchange) plus a map-side-combined sum over dst. Rank state is
    * one row per NODE, never materialized on the driver; 3 sweeps = 3
    * shuffles of node-count rows, independent of edge skew (a hot
    * supplier only concentrates its dst-sum, which partial aggregation
    * absorbs map-side). The final top-k is a TakeOrdered, not a global
    * sort.
    */
  def pageRankQuery(t: Tables, iters: Int = 3, d: Double = 0.85,
      topK: Int = 20): DataFrame = {
    val edges = t.orders
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
    val nodes = t.customer.select((col("c_custkey") * 2).as("node"))
      .unionAll(t.supplier.select((col("s_suppkey") * 2 + 1).as("node")))
    pageRankOf(edges, nodes, iters, d, topK)
  }

  /** ONE damped sweep — shared verbatim by the fixed-iteration form
    * and the convergence form, so "stopping after k sweeps returns
    * bit-for-bit pageRankOf(iters = k)" is structural, not two
    * hand-synchronized copies of the arithmetic.
    */
  private def sweep(edges: DataFrame, outw: DataFrame, nodes: DataFrame,
      nTotal: DataFrame, ranks: DataFrame, d: Double): DataFrame = {
    val contribs = edges
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .join(outw, "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("rank") * col("w") / col("wout")).as("contrib"))
    nodes.crossJoin(broadcast(nTotal))
      .join(contribs, Seq("node"), "left")
      .select(col("node"),
        (lit(1 - d) / col("n") + lit(d) * coalesce(col("contrib"), lit(0.0))).as("rank"))
  }

  private def uniformRanks(nodes: DataFrame, nTotal: DataFrame): DataFrame =
    nodes.crossJoin(broadcast(nTotal))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))

  private def topKRanks(ranks: DataFrame, topK: Int): DataFrame =
    ranks
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(topK)

  /** Library form over explicit `(src, dst, w)` edges and a `node`
    * universe (nodes with no in-edges keep the teleport floor; nodes
    * absent from `nodes` receive no rank even if edges mention them).
    */
  def pageRankOf(edges: DataFrame, nodes: DataFrame, iters: Int = 3,
      d: Double = 0.85, topK: Int = 20): DataFrame = {
    val outw = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    val nTotal = nodes.agg(count(lit(1)).cast("double").as("n"))

    var ranks = uniformRanks(nodes, nTotal)
    for (i <- 1 to iters) {
      ranks = sweep(edges, outw, nodes, nTotal, ranks, d)
      // Lineage cut every 5 sweeps (the Dedup.nearDupClusters cadence):
      // each sweep nests the previous plan, so analysis cost and the
      // re-derivation of edges/outw grow with iters — fine at the
      // default 3, fatal for a library caller at iters ≈ 20. A reliable
      // checkpoint when a checkpoint dir is configured (bounded replay
      // after executor loss); localCheckpoint otherwise (local/test
      // mode trade — executor loss fails the job instead of replaying
      // from sweep 0). Skipped on the final sweep: the caller's action
      // materializes it anyway.
      if (i % 5 == 0 && i < iters) {
        ranks =
          if (ranks.sparkSession.sparkContext.getCheckpointDir.isDefined) {
            val persisted = ranks.persist()
            val cp = persisted.checkpoint()
            persisted.unpersist(blocking = false)
            cp
          } else ranks.localCheckpoint()
      }
    }
    topKRanks(ranks, topK)
  }

  def pageRankSql(iters: Int = 3, d: Double = 0.85, topK: Int = 20): String = {
    val base =
      s"""WITH edges AS (
         |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
         |    CAST(count(*) AS DOUBLE) AS w
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2
         |), outw AS (SELECT src, sum(w) AS wout FROM edges GROUP BY src),
         |nodes AS (
         |  SELECT c_custkey * 2 AS node FROM customer
         |  UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier
         |), nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nt)""".stripMargin
    val sweeps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, sum(r.rank * e.w / o.wout) AS contrib
         |  FROM edges e JOIN r${i - 1} r ON r.node = e.src JOIN outw o ON o.src = e.src
         |  GROUP BY e.dst
         |), r$i AS (
         |  SELECT nd.node, ${1 - d} / nt.n + $d * coalesce(c.contrib, 0) AS rank
         |  FROM nodes nd CROSS JOIN nt LEFT JOIN c$i c ON c.node = nd.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$sweeps
       |SELECT node, round(rank, 6) AS rank FROM r$iters
       |ORDER BY round(rank, 6) DESC, node LIMIT $topK""".stripMargin
  }

  /** [[pageRankOf]] with an L1-delta CONVERGENCE stop — the control a
    * library caller needs that the fixed-sweep gated form (kept as the
    * oracle twin) deliberately lacks: sweeps run until
    * Σ|rank−prevRank| < tol or `maxIters`, whichever first. The
    * per-sweep plan is IDENTICAL to the fixed form's, so stopping
    * after k sweeps returns bit-for-bit `pageRankOf(…, iters = k)` —
    * that equivalence is the spec. The delta is a 1-row aggregate
    * collected per sweep (the changed-count stop of
    * `Dedup.nearDupClusters`, mass instead of labels); edges and
    * out-weights are cached across sweeps since convergence mode
    * re-reads them O(sweeps) times, and lineage is cut on the same
    * 5-sweep cadence. Returns the converged top-k and the sweep count.
    */
  def pageRankConvergedWithSweeps(edges: DataFrame, nodes: DataFrame,
      maxIters: Int = 50, d: Double = 0.85, topK: Int = 20,
      tol: Double = 1e-6): (DataFrame, Int) = {
    val e = edges.cache()
    val outw = e.groupBy("src").agg(sum(col("w")).as("wout")).cache()
    val nTotal = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = uniformRanks(nodes, nTotal).cache()
    var sweeps = 0
    var delta = Double.MaxValue
    while (sweeps < maxIters && delta >= tol) {
      var next = sweep(e, outw, nodes, nTotal, ranks, d).cache()
      delta = next.join(ranks.select(col("node"), col("rank").as("prev")), "node")
        .agg(sum(abs(col("rank") - col("prev"))).as("d")).head().getDouble(0)
      sweeps += 1
      if (sweeps % 5 == 0) {
        val cut =
          if (next.sparkSession.sparkContext.getCheckpointDir.isDefined) next.checkpoint()
          else next.localCheckpoint()
        next.unpersist(blocking = false)
        next = cut
      }
      ranks.unpersist(blocking = false)
      ranks = next
    }
    e.unpersist(blocking = false)
    outw.unpersist(blocking = false)
    (topKRanks(ranks, topK), sweeps)
  }

  def pageRankConverged(edges: DataFrame, nodes: DataFrame, maxIters: Int = 50,
      d: Double = 0.85, topK: Int = 20, tol: Double = 1e-6): DataFrame =
    pageRankConvergedWithSweeps(edges, nodes, maxIters, d, topK, tol)._1

  // --------------------------------------------------------- k-core

  /** k-core of the customer↔supplier purchase graph (undirected,
    * unweighted distinct trading pairs): iteratively peel nodes of
    * degree < k until fixpoint — the third canonical iterative graph
    * pattern next to [[pageRankOf]] (weighted mass) and
    * [[graft.operators.Dedup.nearDupClusters]] (label propagation),
    * and the standard "dense enough to matter" filter before
    * community/embedding work on an interaction graph.
    *
    * Equivalence with the unrolled-CTE DuckDB oracle is UNCONDITIONAL:
    * both run exactly `iters` peel rounds (a round past the fixpoint
    * is a no-op in both engines — the early stop here is purely a cost
    * optimization, taken when a round's survivor count is unchanged),
    * then recompute final degrees over the surviving induced subgraph.
    *
    * Scale shape per round: two semi-joins of the edge list against
    * the shrinking alive set plus one map-side-combined degree count —
    * only (node) keys shuffle, never adjacency lists; the alive set
    * re-caches per round and peeling depth is bounded by `iters`, not
    * by graph diameter.
    */
  def kCoreOf(edges: DataFrame, k: Int, iters: Int = 6): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .cache()
    var alive = und.select(col("a").as("node")).distinct().cache()
    var prev = alive.count()
    var r = 0
    var fixed = false
    while (r < iters && !fixed) {
      val next = und
        .join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .groupBy(col("a"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("a").as("node"))
        .cache()
      val n = next.count()
      alive.unpersist(blocking = false)
      alive = next
      fixed = n == prev
      prev = n
      r += 1
    }
    val out = und
      .join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
      .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
      .groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("degree"))
      .select(col("node"),
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier")).as("kind"),
        (col("node") / lit(2)).cast("long").as("key"),
        col("degree"))
      .orderBy("node")
    und.unpersist(blocking = false)
    out
  }

  def kCoreQuery(t: Tables, k: Int = 8, iters: Int = 6): DataFrame =
    kCoreOf(
      t.orders
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct(),
      k, iters)

  def kCoreSql(k: Int = 8, iters: Int = 6): String = {
    val base =
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), und AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        |alive0 AS (SELECT DISTINCT a AS node FROM und)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""alive$i AS (
         |  SELECT a AS node FROM und
         |  WHERE a IN (SELECT node FROM alive${i - 1})
         |    AND b IN (SELECT node FROM alive${i - 1})
         |  GROUP BY a HAVING count(*) >= $k
         |)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds
       |SELECT a AS node,
       |  CASE WHEN a % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  CAST(a // 2 AS BIGINT) AS key, count(*) AS degree
       |FROM und
       |WHERE a IN (SELECT node FROM alive$iters)
       |  AND b IN (SELECT node FROM alive$iters)
       |GROUP BY a ORDER BY a""".stripMargin
  }
}
