package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational5
import graft.sources.Tables

/** Semantic properties of the round-11 adapted TPC-H five (the hash
  * gate covers value equality with DuckDB; these pin the SHAPES the
  * adaptations exist to preserve).
  */
class Relational5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  test("q2: every returned supplier is the min-cost supplier for its part (ties kept)") {
    val rows = Relational5.q2MinCostSupplier(t).collect()
    assert(rows.nonEmpty)
    // each (part, unit_cost) pair must be the part's minimum over the result
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    byPart.foreach { case (_, rs) =>
      val costs = rs.map(_.getAs[Double]("unit_cost")).distinct
      assert(costs.length == 1, s"non-minimal cost rows for part: ${costs.toList}")
    }
    // suppliers all sit in EUROPE
    val euroSupp = t.supplier
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("s_name").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => euroSupp(r.getAs[String]("s_name"))))
  }

  test("q9: profit equals the sum of its parts — one nation/year recomputed independently") {
    val rows = Relational5.q9ProductProfit(t).collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    val expect = t.lineitem
      .join(t.part.filter(col("p_name").like("red %")), col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("n_name") === r0.getAs[String]("nation") &&
        year(col("o_orderdate")) === r0.getAs[Long]("o_year"))
      .agg((sum(round((col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")) * 100).cast("long")) / lit(100.0)))
      .collect()(0).getDouble(0)
    assert(r0.getAs[Double]("profit") == expect)
  }

  test("q11: threshold is a strict global fraction — survivors' min value beats 1/10000 of total") {
    val all = t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("vc"))
    val total = all.agg(sum("vc")).collect()(0).getLong(0)
    val survivors = Relational5.q11ImportantStock(t).collect()
    assert(survivors.nonEmpty)
    val minKept = survivors.map(_.getAs[Double]("part_value")).min
    assert(minKept * 100 * 10000 > total)
    // and completeness: count matches the direct filter
    val direct = all.filter(col("vc") * 10000L > total).count()
    assert(survivors.length == direct)
  }

  test("q16: suppliers in arrears are excluded from every distinct count") {
    val bad = t.supplier.filter(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    // sf0.001 has only 10 suppliers and may carry no arrears; the
    // exclusion's load-bearing-ness is only assertable when it exists
    // (it does from sf0.01 up — the gate SF exercises it)
    if (bad.nonEmpty) {
      val viaBad = t.lineitem.select("l_partkey", "l_suppkey").distinct()
        .filter(col("l_suppkey").isin(bad.toSeq: _*))
        .join(t.part.filter(col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .count()
      assert(viaBad > 0, "excluded suppliers do supply qualifying parts — exclusion is load-bearing")
    }
    // recompute one group's distinct count without the excluded suppliers
    val rows = Relational5.q16SupplierRelationship(t).collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    val expect = t.lineitem.select("l_partkey", "l_suppkey").distinct()
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === r0.getAs[String]("p_brand") &&
        col("p_type") === r0.getAs[String]("p_type") &&
        col("p_size") === r0.getAs[Int]("p_size") &&
        (if (bad.isEmpty) lit(true) else !col("l_suppkey").isin(bad.toSeq: _*)))
      .select("l_suppkey").distinct().count()
    assert(r0.getAs[Long]("supplier_cnt") == expect)
  }

  test("q20: every selected supplier clears the 1/7 concentration bar, every rejected one fails it") {
    val redQty = t.lineitem
      .join(t.part.filter(col("p_name").like("red %")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        sum(when(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"), col("l_quantity"))
          .otherwise(lit(0))).cast("long").as("qty96"),
        sum(col("l_quantity")).cast("long").as("qty_all"))
    val passing = redQty.filter(col("qty96") * 7 > col("qty_all"))
      .select("l_suppkey").collect().map(_.getLong(0)).toSet
    val gotNames = Relational5.q20PotentialPromotion(t).collect()
      .map(_.getAs[String]("s_name")).toSet
    assert(gotNames.nonEmpty)
    val africaPassing = t.supplier
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AFRICA" && col("s_suppkey").isin(passing.toSeq: _*))
      .select("s_name").collect().map(_.getString(0)).toSet
    assert(gotNames == africaPassing)
  }

  test("plans: dims broadcast, no cartesian product in any of the five") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    // AQE wraps the tree in AdaptiveSparkPlanExec, hiding the join
    // nodes from collect until execution — the PlanAuditSpec policy is
    // to assert on the deterministic non-adaptive plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qs = Seq(
        Relational5.q2MinCostSupplier(t), Relational5.q9ProductProfit(t),
        Relational5.q11ImportantStock(t), Relational5.q16SupplierRelationship(t),
        Relational5.q20PotentialPromotion(t))
      qs.foreach { df =>
        val plan = df.queryExecution.executedPlan
        assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
          "cartesian product in a Relational5 plan")
        // q11's one-row scalar threshold is a broadcast nested loop by
        // design; every keyed dim join must be broadcast-hash
        assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
          "expected broadcast dim joins")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
