package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-7 TPC-H coverage extension: the four remaining query SHAPES
  * this schema can express (no partsupp table, no
  * commitdate/receiptdate/shipmode columns — q2/q9/q11/q16/q20 need
  * partsupp and are out of schema; q12/q21 keep their aggregation and
  * correlation structure over the columns that exist).
  *
  * Broadcast policy follows [[Relational]]: no forced hints on
  * SF-proportional tables — the threshold planner / AQE decide.
  */
object Relational4 {

  /** Market-basket co-purchase lift: part pairs appearing in the same
    * order, scored lift = P(a,b) / (P(a)·P(b)) — the classic
    * association query. The pair self-join is keyed on l_orderkey and
    * BOUNDED: baskets hold ~4-7 items, so pairs per order are ~n²/2 of
    * a small n, never corpus². Margins are one aggregate; the 1-row
    * order count broadcasts; parts-per-pair dedups inside the order
    * first (quantity repeats must not double-count a basket). Only
    * (orderkey, partkey) pairs shuffle. Top-k by (lift, pair) is a
    * TakeOrdered. Probabilities round to 9dp before the lift ratio so
    * the division is engine-portable; lift rounds to 6dp.
    */
  def qMarketBasket(t: Tables, minCo: Long = 3, topK: Int = 25): DataFrame = {
    val items = t.lineitem.select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
      // pin the basket-pair expansion width — the C(basket,2) fanout's
      // row cost ≫ its byte size, so AQE's bytes-based coalescing
      // under-parallelizes the co-occurrence join (the
      // Graph.jaccardPairsQuery finding, guide §2.5)
      .repartition(t.spark.sparkContext.defaultParallelism, col("okey"))
    val nOrders = t.orders.agg(countDistinct(col("o_orderkey")).cast("double").as("n"))
    val freq = items.groupBy("part").agg(count(lit(1)).as("n_part"))
    val a = items.select(col("okey"), col("part").as("part_a"))
    val b = items.select(col("okey"), col("part").as("part_b"))
    val co = a.join(b, Seq("okey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCo)
    co
      .join(freq.select(col("part").as("part_a"), col("n_part").as("n_a")), Seq("part_a"))
      .join(freq.select(col("part").as("part_b"), col("n_part").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_co"),
        round(round(col("n_co") / col("n"), 9) /
          (round(col("n_a") / col("n"), 9) * round(col("n_b") / col("n"), 9)), 6).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  def qMarketBasketSql(minCo: Long = 3, topK: Int = 25): String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
       |), n AS (SELECT CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS n FROM orders),
       |freq AS (SELECT part, count(*) AS n_part FROM items GROUP BY part),
       |co AS (
       |  SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_co
       |  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
       |  GROUP BY 1, 2 HAVING count(*) >= $minCo
       |)
       |SELECT part_a, part_b, n_co,
       |  round(round(n_co / n.n, 9) /
       |    (round(fa.n_part / n.n, 9) * round(fb.n_part / n.n, 9)), 6) AS lift
       |FROM co
       |JOIN freq fa ON fa.part = co.part_a
       |JOIN freq fb ON fb.part = co.part_b
       |CROSS JOIN n
       |ORDER BY lift DESC, part_a, part_b
       |LIMIT $topK""".stripMargin

  /** TPC-H Q12 shape: two-way conditional counts per line status over
    * the orders⋈lineitem join (the original buckets shipmodes by
    * late-commit; this schema buckets return flags by order priority —
    * the same single-pass conditional aggregation over a fact join).
    */
  def q12PriorityCounts(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_returnflag"))

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q15: top supplier(s) by quarter revenue — the revenue
    * aggregate is computed ONCE and joined against its own max (a
    * 1-row broadcast cross join, the scalar-subquery idiom), never
    * recomputed per row. Revenue is summed in exact integer cents so
    * the max-equality compare cannot split float ties.
    */
  def q15TopSupplier(t: Tables): DataFrame = {
    val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
      .cast("long")
    val revenue = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"), cents.as("cents"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("cents")).as("total_cents"))
    val top = revenue.agg(max(col("total_cents")).as("max_cents"))
    revenue
      .crossJoin(broadcast(top))
      .filter(col("total_cents") === col("max_cents"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("total_cents") / 100.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_cents / 100.0 AS total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_cents = (SELECT max(total_cents) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17: revenue impact of small-quantity lines — each line
    * compares against 20% of ITS part's average quantity. The
    * correlated scalar subquery becomes one per-part aggregate joined
    * back to the fact (two scans of lineitem, one shuffle each; at
    * 100 TB the per-part agg is the map-side-combined cheap pass).
    */
  def q17SmallQtyRevenue(t: Tables): DataFrame = {
    val partAvg = t.lineitem
      .groupBy(col("l_partkey").as("p_key"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    t.lineitem
      .join(partAvg, col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS p_key, avg(l_quantity) AS avg_qty
      |      FROM lineitem GROUP BY l_partkey) pa
      |  ON l.l_partkey = pa.p_key
      |WHERE l.l_quantity < 0.2 * pa.avg_qty""".stripMargin

  /** TPC-H Q21 shape: suppliers who alone returned lines on shared
    * orders — EXISTS (another supplier on the order) AND NOT EXISTS
    * (another supplier with a returned line). The double correlation
    * becomes one per-order aggregate (distinct suppliers, distinct
    * returning suppliers) joined to the returned lines — one pass over
    * lineitem for the correlation instead of two correlated rescans
    * per row, then semi-join semantics via plain filters.
    */
  def q21WaitingSupplier(t: Tables): DataFrame = {
    // two distinct-counts over the same grouping would plan as one
    // Expand (×2 row multiplier) feeding the aggregate; the two-level
    // form — per-(order, supplier) partial first, then per-order counts
    // — aggregates each lineitem row once, both levels map-side partial
    val perSupp = t.lineitem
      .groupBy(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("returned"))
    val perOrder = perSupp
      .groupBy(col("okey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("returned")).as("n_ret_supp"))
    t.lineitem
      .filter(col("l_returnflag") === "R")
      .join(t.orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .join(perOrder, col("l_orderkey") === col("okey"))
      // other suppliers exist on the order; none of THEM returned
      .filter(col("n_supp") > 1 && col("n_ret_supp") === 1)
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH per_order AS (
      |  SELECT l_orderkey AS okey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT s_suppkey, s_name, count(*) AS numwait
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
      |JOIN per_order ON l_orderkey = okey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l_returnflag = 'R' AND n_supp > 1 AND n_ret_supp = 1
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey
      |LIMIT 100""".stripMargin

  /** Single-pass column profiler (the data-quality audit every
    * pipeline runs before training on a new drop): per-column null
    * count, min, max, mean over the fact table, emitted in long form
    * (one row per column). ALL columns profile in ONE map-side-combined
    * aggregate — the scan happens once however many columns are
    * profiled, then `stack` pivots the 1-row wide result into rows.
    * Exact distinct counts are deliberately absent: n columns of
    * `count(distinct)` in one pass costs an Expand ×(n+1) of the
    * 100 TB scan — the scalable cardinality answer is the HLL path
    * (`q_approx_distinct`), one sketch column per profiled column.
    */
  def profileColumnsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        round(min(col(c)), 2).as(s"${c}_min"),
        round(max(col(c)), 2).as(s"${c}_max"),
        round(avg(col(c)), 4).as(s"${c}_mean"))
    }
    val stackArgs = cols
      .map(c => s"'$c', ${c}_nulls, ${c}_min, ${c}_max, ${c}_mean")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, min_val, max_val, mean_val)"))
      .orderBy("col_name")
  }

  def profileColumns(t: Tables): DataFrame =
    profileColumnsOf(t.lineitem, Seq("l_quantity", "l_extendedprice", "l_discount"))

  val profileColumnsSql: String =
    """WITH s AS (
      |  SELECT
      |    count(*) - count(l_quantity) AS q_nulls,
      |    round(min(l_quantity), 2) AS q_min, round(max(l_quantity), 2) AS q_max,
      |    round(avg(l_quantity), 4) AS q_mean,
      |    count(*) - count(l_extendedprice) AS p_nulls,
      |    round(min(l_extendedprice), 2) AS p_min, round(max(l_extendedprice), 2) AS p_max,
      |    round(avg(l_extendedprice), 4) AS p_mean,
      |    count(*) - count(l_discount) AS d_nulls,
      |    round(min(l_discount), 2) AS d_min, round(max(l_discount), 2) AS d_max,
      |    round(avg(l_discount), 4) AS d_mean
      |  FROM lineitem
      |)
      |SELECT 'l_quantity' AS col_name, q_nulls AS n_nulls, q_min AS min_val, q_max AS max_val, q_mean AS mean_val FROM s
      |UNION ALL
      |SELECT 'l_extendedprice', p_nulls, p_min, p_max, p_mean FROM s
      |UNION ALL
      |SELECT 'l_discount', d_nulls, d_min, d_max, d_mean FROM s
      |ORDER BY col_name""".stripMargin
}
