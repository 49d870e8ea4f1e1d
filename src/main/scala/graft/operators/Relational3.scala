package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-4 relational coverage: the classic TPC-H query shapes the
  * driver schema can express faithfully (the testdata star schema has
  * no partsupp / l_shipmode / c_phone, so Q2/Q9/Q12/Q16/Q20 have no
  * faithful form; Q4/Q19/Q22 are adapted to the available columns as
  * noted per query).
  *
  * Scale notes common to all: part/nation/region/supplier are
  * broadcast (at 100 TB they are MBs to low GBs vs a multi-TB fact
  * side); lineitem⋈orders shuffles once on the order key; every agg is
  * partial map-side first. Doubles are rounded (2dp money, 4dp
  * percentages, 6dp ratios) and every ORDER BY ends in a unique key so
  * the oracle hash is accumulation-order-stable.
  */
object Relational3 {

  /** TPC-H Q4 shape: priority count of orders with a late-shipped line
    * (no l_commitdate/l_receiptdate in this schema; "late" is adapted
    * to shipped >90 days after the order date). EXISTS = left-semi
    * join whose correlated predicate rides the join condition.
    */
  def q4OrderPriority(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .join(t.lineitem.select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q6: forecasting revenue change — a pure scan+filter+agg
    * with every predicate pushed to the parquet scan. The 100 TB plan
    * is one partial-agg pass, no shuffle of any width beyond 1 row.
    */
  def q6ForecastRevenue(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  val q6Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q7: volume shipping between a set of nations (a 3-nation
    * set rather than one pair, so the tiny sf0.001 slice still has
    * qualifying traffic). The bounded nation dim is joined twice
    * (supplier side and customer side) — both hint-broadcast;
    * customer/supplier grow ∝ SF so their join strategy is
    * planner-decided (broadcast while small, shuffle at scale).
    */
  def q7VolumeShipping(t: Tables): DataFrame = {
    val n1 = t.nation.select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter(col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
        col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
        col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      // exact integer-cent summation: a double sum rounded to 2dp can
      // land a cent off the oracle when the true value sits on a .xx5
      // boundary (accumulation order differs across engines)
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")) / lit(100.0)).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(volume_cents) AS BIGINT) / 100.0 AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year,
      |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS volume_cents
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      |    AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      |    AND n1.n_name <> n2.n_name)
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8: market share of one supplier nation inside one region's
    * PROMO-part volume, per order year. The share is a conditional-sum
    * ratio computed in a single aggregation (no second pass).
    */
  def q8MarketShare(t: Tables): DataFrame = {
    val suppNation = t.nation.select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val custRegion = t.nation
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("n_nationkey").as("c_nkey"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem
      .join(t.part.filter(col("p_type") === "PROMO"), col("l_partkey") === col("p_partkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custRegion), col("c_nationkey") === col("c_nkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0.0))) / sum(vol),
        6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    """SELECT o_year,
      |  round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 6) AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS volume,
      |    n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q10: top-20 customers by returned-item revenue in a
    * quarter. Global top-k ends as a TakeOrdered, not a full sort.
    */
  def q10ReturnedItems(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS acctbal,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name, round(c_acctbal, 2)
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q13: distribution of orders-per-customer, zero-order
    * customers included — the filter must live in the outer-join
    * condition, not a WHERE, to keep them.
    */
  def q13OrderDistribution(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "5-LOW").select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14: promo revenue percentage for one month — conditional
    * sum over a part join (planner-decided strategy: part grows ∝ SF,
    * so no forced broadcast), single partial agg.
    */
  def q14PromoRevenue(t: Tables): DataFrame = {
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) / sum(vol),
        4).as("promo_revenue"))
  }

  val q14Sql: String =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** TPC-H Q18: large-quantity orders — the HAVING pre-aggregates
    * lineitem down to qualifying order keys BEFORE joining back, so
    * the join input is the small filtered set, not raw lineitem.
    */
  def q18LargeOrders(t: Tables): DataFrame = {
    val big = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty_raw"))
      .filter(col("sum_qty_raw") > 200)
    t.orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("totalprice"),
        round(col("sum_qty_raw"), 2).as("sum_qty"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  round(o_totalprice, 2) AS totalprice, round(sum_qty_raw, 2) AS sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty_raw
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(l_quantity) > 200) big ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q19 shape: disjunctive brand/size/quantity predicate over a
    * part join (no p_container / l_shipmode in this schema — the
    * disjunction uses brand+size+quantity bands). Part grows ∝ SF so
    * the join strategy is planner-decided. Catalyst extracts the
    * common l_partkey=p_partkey conjunct; the OR-of-ANDs residual
    * stays a codegen filter.
    */
  def q19Disjunctive(t: Tables): DataFrame =
    t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 25) && col("l_quantity").between(20, 30)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  val q19Sql: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q22 shape: high-balance customers with no recent urgent
    * orders, grouped by nation (this schema has no c_phone, so the
    * country-code grouping becomes c_nationkey; every customer has
    * orders, so the NOT EXISTS is scoped to recent URGENT ones). The
    * global average is a broadcast 1-row cross join; the NOT EXISTS is
    * a left-anti join.
    */
  def q22IdleBalance(t: Tables): DataFrame = {
    val avgBal = t.customer.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val urgent = t.orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    t.customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** Time-range window frame: 7-day rolling revenue per supplier —
    * RANGE BETWEEN over event time, not row counts (the frame every
    * rolling-metric dashboard needs). Ordered by epoch seconds so the
    * frame bound is engine-portable; the window shuffles once on the
    * supplier key. Cents-exact summation for rounding stability.
    */
  def qWindowRange(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-7L * 86400 + 1, Window.currentRow)
    t.lineitem
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        unix_timestamp(col("l_shipdate")).as("epoch_s"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long").as("cents"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        (sum(col("cents")).over(w) / lit(100.0)).as("rev_7d"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  val qWindowRangeSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(cents) OVER (PARTITION BY l_suppkey ORDER BY epoch_s
      |    RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS rev_7d
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    epoch(l_shipdate) AS epoch_s,
      |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
      |  FROM lineitem
      |  WHERE l_suppkey <= 5)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Aggregate-kernel coverage in one pass: max_by/min_by (argmax),
    * bool_or/bool_and, count_if, and an order-stable array_agg
    * (sort_array ∘ collect_list — collect order is nondeterministic,
    * the sort makes it canonical). One partial-agg shuffle.
    */
  def qAggKernels(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        // composite integer key (cents·10⁷ + orderkey): arg-max needs a
        // scalar ordering key portable across engines, and the orderkey
        // term makes price ties deterministic
        max_by(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long") * 10000000L + col("o_orderkey")).as("priciest_order"),
        min_by(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long") * 10000000L + col("o_orderkey")).as("cheapest_order"),
        bool_or(col("o_orderstatus") === "P").as("any_pending"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        count_if(col("o_orderstatus") === "F").as("n_filled"),
        // canonical string, not a raw array: collect order is engine-
        // dependent and an empty group must read '' on both engines
        concat_ws(",", sort_array(collect_list(
          when(col("o_orderkey") <= 50, col("o_orderkey").cast("string"))))).as("small_keys"))
      .orderBy(col("o_orderpriority"))

  val qAggKernelsSql: String =
    """SELECT o_orderpriority,
      |  arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS priciest_order,
      |  arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS cheapest_order,
      |  bool_or(o_orderstatus = 'P') AS any_pending,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_filled,
      |  coalesce(array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))
      |    FILTER (o_orderkey <= 50)), ','), '') AS small_keys
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * (status, priority), (status), and grand total in ONE pass (Spark
    * expands the sets inside a single Expand + aggregate, not three
    * scans). Nulls-first ordering per cross-engine convention.
    */
  def qGroupingSets(t: Tables): DataFrame =
    t.orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / lit(100.0)).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** HyperLogLog++ approximate distinct users per event type, HASH-
    * GATED against the exact count (r13: was rows-only — the raw
    * estimate is engine-specific by construction, so the driver row
    * now carries the exact count plus the |approx − exact| ≤ 10%
    * verdict instead; `tol` is 2× the default 5% rsd, the q_hll_gate
    * recipe). At 100 TB approx_count_distinct is THE distinct-count
    * tool — fixed-size sketches merge map-side instead of shuffling
    * every distinct key. The raw estimate stays reachable via this
    * aggregation (Relational3Spec pins its relative error directly).
    */
  def qApproxDistinct(t: Tables, tol: Double = 0.10): DataFrame =
    t.events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          lit(tol) * col("exact_users").cast("double")).as("within_tol"))
      .orderBy(col("event_type"))

  val qApproxDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS within_tol
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val q22Sql: String =
    """SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT'
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin
}
