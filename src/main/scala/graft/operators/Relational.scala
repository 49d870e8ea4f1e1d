package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** General relational query capability over the star schema.
  *
  * The reference's query surface is the implicit relational algebra of
  * its pipelines (scan → map → reduce → load); here it is expressed as
  * declarative plans so Catalyst does pushdown/pruning/join-ordering.
  *
  * Broadcast policy: only *bounded* dimensions (nation = 25 rows,
  * region = 5 — fixed by the schema, independent of scale factor) carry
  * a forced `broadcast()` hint. SF-proportional tables
  * (customer/supplier/part) are left to the size-threshold planner and
  * AQE: they broadcast while they fit and degrade to a shuffle join at
  * 100 TB instead of OOM-ing the build side.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. Single shuffle (partial aggs
    * map-side); doubles rounded to 2dp to be oracle-stable.
    */
  def q1PricingSummary(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: two fact joins shuffle on their
    * keys; customer filter is pushed below the join. Top-k is a
    * TakeOrdered (no global sort shuffle).
    */
  def q3ShippingPriority(t: Tables): DataFrame =
    t.customer
      .filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** [[q3ShippingPriority]] over the pre-bucketed fact tables
    * ([[graft.sources.Bucketed]]): same result, but orders⋈lineitem on
    * the bucket key plans with zero shuffle exchanges — the scans are
    * already hash-partitioned — and the groupBy (clustered on
    * l_orderkey) reuses that partitioning too. Customer is
    * SF-proportional, so it carries no forced hint — the threshold
    * planner broadcasts it while small (keeping the probe side's
    * bucket partitioning), and falls back to a shuffle join at scale.
    */
  def q3Bucketed(t: Tables): DataFrame = {
    val (orders, lineitem) = graft.sources.Bucketed.ordersLineitem(t)
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style regional revenue. Bounded dims (nation/region) are
    * hint-broadcast; customer/supplier grow ∝ SF so the planner/AQE
    * decide their join strategy (broadcast while small, shuffle at
    * scale). The big shuffles are lineitem⋈orders and the final agg.
    */
  def q5RegionRevenue(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))

  val q5Sql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** GROUP BY + HAVING: customers with ≥3 open-or-filled orders. */
  def qGroupByHaving(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_spent"))
      .filter(col("n_orders") >= 3)
      .orderBy(col("o_custkey"))

  val qGroupByHavingSql: String =
    """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
      |FROM orders
      |WHERE o_orderstatus IN ('O', 'F')
      |GROUP BY o_custkey
      |HAVING count(*) >= 3
      |ORDER BY o_custkey""".stripMargin

  /** Window rank: top-5 customers by balance per market segment. */
  def qWindowRank(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val qWindowRankSql: String =
    """SELECT c_mktsegment, rn, c_custkey, c_name, round(c_acctbal, 2) AS acctbal
      |FROM (
      |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 5
      |ORDER BY c_mktsegment, rn""".stripMargin

  /** Running sum over an ordered window (per-supplier cumulative
    * quantity). Frame order is total (shipdate, orderkey, linenumber)
    * so double accumulation order — hence the value — is deterministic.
    */
  def qWindowRunning(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.lineitem
      .filter(col("l_suppkey") <= 10)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_quantity")).over(w), 2).as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val qWindowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey <= 10
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** EXISTS — left semi join (big-order customers). */
  def qSemiJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 400000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** NOT EXISTS — left anti join (customers with no pending orders). */
  def qAntiJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_orderstatus") === "P").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** Top-N per group via window (3 priciest orders per priority). */
  def qTopKPerGroup(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val qTopKPerGroupSql: String =
    """SELECT o_orderpriority, rn, o_orderkey, round(o_totalprice, 2) AS totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin
}
