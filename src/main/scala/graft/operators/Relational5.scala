package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-11 relational coverage: the five TPC-H shapes Relational3
  * skipped for lack of a `partsupp` table — Q2/Q9/Q11/Q16/Q20 —
  * adapted to the driver schema by DERIVING the supply relation from
  * lineitem (a supplier "supplies" a part iff it ever shipped it; its
  * unit cost is the cheapest observed unit price). Each adaptation
  * keeps the query's canonical shape — that is the point of the
  * exercise, not the TPC-H predicate constants:
  *
  *   Q2  — correlated MIN subquery (cheapest supplier per part)
  *   Q9  — multi-way star join + profit expression per nation/year
  *   Q11 — global scalar subquery as a HAVING threshold
  *   Q16 — count-DISTINCT with a NOT-IN exclusion subquery
  *   Q20 — nested aggregation feeding a semi-join
  *
  * Arithmetic discipline (the [[Relational3]] policy): money rides
  * exact integer cents (`round(x*100)::long`), unit costs ride integer
  * MILLI-cents via integral division (`DIV` / DuckDB `//` — identical
  * on the all-positive domain), so no double ever crosses an
  * aggregation and every hash-gated value is engine-exact. Every
  * ORDER BY ends in a unique key.
  *
  * Scale notes: part/supplier/nation/region are broadcast dims; the
  * derived supply relation aggregates lineitem once on
  * (partkey, suppkey) — at 100 TB that is THE fact-side shuffle, and
  * it carries two longs per row. The correlated min (Q2) and the
  * scalar threshold (Q11) re-aggregate the already-aggregated supply
  * rows (|parts|-sized, not fact-sized), so each query still shuffles
  * the fact table exactly once.
  */
object Relational5 {

  /** Cheapest observed unit cost per (part, supplier) pair, in exact
    * integer milli-cents: cents*1000 DIV quantity. Quantities are
    * integer-valued in this schema, prices 2dp — both sides of the
    * division are exact longs, so MIN is engine-deterministic.
    */
  private def supplyCost(t: Tables): DataFrame =
    t.lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) * 1000 DIV CAST(l_quantity AS BIGINT)").as("mc"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("mc")).as("cost_mc"))

  /** TPC-H Q2 shape: minimum-cost supplier. For every small STANDARD
    * part, the EUROPE supplier offering it at the lowest derived unit
    * cost — the correlated-MIN-subquery pattern, expressed as an
    * aggregate-and-join-back (groupBy part → min cost → equi-join on
    * the min) so Catalyst plans two shuffles over |supply| rows
    * instead of a per-row subquery. Ties keep every minimal supplier,
    * exactly like the SQL `= (SELECT min ...)` form.
    */
  def q2MinCostSupplier(t: Tables): DataFrame = {
    val eligible = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val parts = t.part
      .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_name")
    val cand = supplyCost(t)
      .join(eligible, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "cost_mc")
    val minc = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("cost_mc")).as("min_mc"))
    cand
      .join(minc, col("p_partkey") === col("mk") && col("cost_mc") === col("min_mc"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_name"), (col("cost_mc") / lit(100000.0)).as("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH supply AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000 // CAST(l_quantity AS BIGINT)) AS cost_mc
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eligible AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |cand AS (
      |  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, cost_mc
      |  FROM supply JOIN eligible ON l_suppkey = s_suppkey
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_size <= 10 AND p_type = 'STANDARD'),
      |minc AS (SELECT p_partkey AS mk, min(cost_mc) AS min_mc FROM cand GROUP BY p_partkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  CAST(cost_mc AS BIGINT) / 100000.0 AS unit_cost
      |FROM cand JOIN minc ON p_partkey = mk AND cost_mc = min_mc
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q9 shape: product-type profit. Profit of every 'red' part
    * shipment by supplier nation and order year; supply cost is
    * adapted to 60% of the part's retail price (no ps_supplycost).
    * One fact-side shuffle on the order key; part (pre-filtered,
    * ~1/|adjectives| of an already-bounded dim) and nation broadcast.
    */
  def q9ProductProfit(t: Tables): DataFrame = {
    val redParts = t.part.filter(col("p_name").like("red %"))
      .select("p_partkey", "p_retailprice")
    t.lineitem
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(round((col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")) * 100).cast("long"))
        / lit(100.0)).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE 'red %'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 shape: important stock. Per-part traded value through
    * ASIA suppliers, kept only where the part's value exceeds 1/10000
    * of the total — the global-scalar-subquery-as-HAVING pattern. The
    * threshold compare is exact integer cents (value*10000 vs total),
    * no floating fraction. The scalar total re-aggregates the
    * |parts|-sized value table and broadcasts one row.
    */
  def q11ImportantStock(t: Tables): DataFrame = {
    val asiaValue = t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("value_cents"))
    val total = asiaValue.agg(sum(col("value_cents")).as("total_cents"))
    asiaValue
      .crossJoin(broadcast(total))
      .filter(col("value_cents") * lit(10000L) > col("total_cents"))
      .select(col("l_partkey").as("p_partkey"),
        (col("value_cents") / lit(100.0)).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    """WITH asia_value AS (
      |  SELECT l_partkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS p_partkey, CAST(value_cents AS BIGINT) / 100.0 AS part_value
      |FROM asia_value
      |WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM asia_value)
      |ORDER BY part_value DESC, p_partkey""".stripMargin

  /** TPC-H Q16 shape: parts/supplier relationship. Distinct supplier
    * count per (brand, type, size) over the derived supply relation,
    * excluding one brand, one type, off-list sizes, and — the NOT-IN
    * subquery, adapted from "customer complaints" — suppliers in
    * arrears (negative balance), planned as a broadcast anti-join.
    */
  def q16SupplierRelationship(t: Tables): DataFrame = {
    val sizes = Seq(1, 4, 9, 14, 23, 36, 45, 49)
    val badSuppliers = t.supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
    val parts = t.part
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    t.lineitem.select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSuppliers), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape: potential part promotion. AFRICA suppliers whose
    * 1996 shipments of 'red' parts exceed 1/7 of their all-time 'red'
    * volume (the availqty>half-of-year's-shipments analog): a nested
    * aggregation (per-supplier conditional sums) feeding a semi-join.
    * The share threshold is exact integer quantities (qty96*7 >
    * qty_all), no floating ratio; 1/7 sits just above the uniform
    * per-year share of the 7-year ship-date range, so it selects
    * year-concentrated suppliers at every SF. Quantities are
    * integer-valued doubles; summing before the BIGINT cast is exact
    * to 2^53.
    */
  def q20PotentialPromotion(t: Tables): DataFrame = {
    val redParts = t.part.filter(col("p_name").like("red %")).select("p_partkey")
    val redQty = t.lineitem
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        sum(when(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
          col("l_quantity")).otherwise(lit(0))).cast("long").as("qty96"),
        sum(col("l_quantity")).cast("long").as("qty_all"))
      .filter(col("qty96") * 7 > col("qty_all"))
      .select("l_suppkey")
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AFRICA")
      .join(redQty, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  val q20Sql: String =
    """WITH red_qty AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |                   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |             THEN l_quantity ELSE 0 END) AS BIGINT) AS qty96,
      |    CAST(sum(l_quantity) AS BIGINT) AS qty_all
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red %'
      |  GROUP BY l_suppkey)
      |SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'AFRICA'
      |  AND s_suppkey IN (SELECT l_suppkey FROM red_qty WHERE qty96 * 7 > qty_all)
      |ORDER BY s_name""".stripMargin
}
