package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Extended relational coverage: grouping sets, set ops, statistical
  * aggregates, string/date kernels, scalar/correlated subquery shapes.
  * Same contract as Relational: totally-ordered, float-rounded,
  * DuckDB-twinned. Note the NULLS FIRST on rollup/cube sorts — Spark
  * defaults nulls-first, DuckDB nulls-last, so the oracle says it
  * explicitly.
  */
object Relational2 {

  /** ROLLUP over (returnflag, linestatus): super-aggregate rows carry
    * NULL keys — ordering pins them explicitly for both engines.
    */
  def qRollup(t: Tables): DataFrame =
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE over (orderstatus, orderpriority). */
  def qCube(t: Tables): DataFrame =
    t.orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Statistical aggregates per returnflag (sample stddev/variance
    * rounded to 4dp — both engines use numerically-stable streaming
    * moments).
    */
  def qStats(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"))
      .orderBy(col("l_returnflag"))

  val qStatsSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
      |  round(var_samp(l_quantity), 4) AS var_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Set semantics: orders that never shipped a line item (EXCEPT). */
  def qSetOps(t: Tables): DataFrame = {
    val o = t.orders.select(col("o_orderkey").as("orderkey"))
    val l = t.lineitem.select(col("l_orderkey").as("orderkey"))
    o.except(l).orderBy("orderkey")
  }

  val qSetOpsSql: String =
    """SELECT o_orderkey AS orderkey FROM orders
      |EXCEPT
      |SELECT l_orderkey AS orderkey FROM lineitem
      |ORDER BY orderkey""".stripMargin

  /** Deterministic content-keyed sampling: md5 of the row key mod 10.
    * Unlike `df.sample` (RNG + partition-order dependent), this is
    * reproducible across engines, runs and repartitioning — the
    * property training-data pipelines need for held-out splits.
    */
  def qSample(t: Tables): DataFrame = {
    val h = conv(substring(md5(concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"))), 1, 8), 16, 10).cast("long")
    t.lineitem
      .filter(pmod(h, lit(10)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qSampleSql: String =
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM lineitem
      |WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Fixed-width histogram of order totals (floor-bucketed — portable
    * across engines, unlike RNG-dependent approx histograms).
    */
  def qHistogram(t: Tables, width: Double = 50000.0): DataFrame =
    t.orders
      .groupBy(floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy("bucket")

  def qHistogramSql(width: Double = 50000.0): String =
    s"""SELECT CAST(floor(o_totalprice / $width) AS BIGINT) AS bucket, count(*) AS n,
       |  round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** INTERSECT set semantics: nations present on both sides. */
  def qIntersect(t: Tables): DataFrame = {
    val c = t.customer.select(col("c_nationkey").as("nationkey"))
    val s = t.supplier.select(col("s_nationkey").as("nationkey"))
    c.intersect(s).orderBy("nationkey")
  }

  val qIntersectSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** Window kernel coverage: lag/lead/first_value/ntile in one pass
    * (a single shuffle on user_id serves all four).
    */
  def qWindowFuncs(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("event_id"), col("user_id"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        first(col("event_id")).over(w).as("first_id"),
        ntile(4).over(w).cast("long").as("bucket"))
      .orderBy("event_id")
  }

  val qWindowFuncsSql: String =
    """SELECT event_id, user_id,
      |  lag(event_id, 1) OVER w AS prev_id,
      |  lead(event_id, 1) OVER w AS next_id,
      |  first_value(event_id) OVER w AS first_id,
      |  ntile(4) OVER w AS bucket
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** Array kernel coverage over the embedding column: length and
    * element min/max/mean without exploding.
    */
  def qEmbedStats(t: Tables): DataFrame =
    t.embeddings
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(array_min(col("embedding").cast("array<double>")), 6).as("vmin"),
        round(array_max(col("embedding").cast("array<double>")), 6).as("vmax"),
        round(aggregate(col("embedding").cast("array<double>"), lit(0.0), (a, x) => a + x) /
          size(col("embedding")), 6).as("vavg"))
      .orderBy("vec_id")

  val qEmbedStatsSql: String =
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      |  round(list_min(embedding::DOUBLE[]), 6) AS vmin,
      |  round(list_max(embedding::DOUBLE[]), 6) AS vmax,
      |  round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS vavg
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** CASE bucketing: order-value bands. */
  def qCaseBands(t: Tables): DataFrame =
    t.orders
      .withColumn("band",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "medium")
          .otherwise("large"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy("band")

  val qCaseBandsSql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
      |            WHEN o_totalprice < 200000 THEN 'medium'
      |            ELSE 'large' END AS band,
      |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin

  /** String kernel coverage: upper/substr/length/position/concat/replace. */
  def qStringFuncs(t: Tables): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        instr(col("p_type"), "BRASS").cast("bigint").as("brass_pos"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"))
      .orderBy("p_partkey")

  val qStringFuncsSql: String =
    """SELECT p_partkey, upper(p_name) AS uname, substr(p_name, 1, 5) AS prefix,
      |  length(p_name) AS name_len,
      |  CAST(strpos(p_type, 'BRASS') AS BIGINT) AS brass_pos,
      |  p_brand || '-' || p_type AS brand_type,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date kernel coverage: year/month/quarter extraction + per-year agg. */
  def qDateFuncs(t: Tables): DataFrame =
    t.orders
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("yr", "qtr")

  val qDateFuncsSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin

  /** Scalar-subquery shape: lineitems priced above the global average
    * (planned as a broadcast of the 1-row aggregate — no correlated
    * re-execution).
    */
  def qScalarSubquery(t: Tables): DataFrame = {
    val globalAvg = t.lineitem.agg(avg(col("l_extendedprice")).as("gavg"))
    t.lineitem
      .crossJoin(broadcast(globalAvg))
      .filter(col("l_extendedprice") > col("gavg") * 1.9)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val qScalarSubquerySql: String =
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM lineitem
      |WHERE l_extendedprice > (SELECT avg(l_extendedprice) FROM lineitem) * 1.9
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Pivot (crosstab): per-user event-type counts as columns. The
    * value list is explicit so the plan is a single pass (no distinct
    * pre-scan) — the portable-SQL form is FILTERed aggregates.
    */
  def qPivot(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val qPivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Exact interpolated percentiles per group (both engines implement
    * the standard rank = p·(n−1) linear interpolation).
    */
  def qPercentiles(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        // array form: ONE percentile buffer per column, not one per cut
        expr("percentile(l_quantity, array(0.5, 0.9))").as("q"),
        expr("percentile(l_extendedprice, array(0.25, 0.99))").as("p"))
      .select(col("l_returnflag"),
        round(col("q").getItem(0), 4).as("median_qty"),
        round(col("q").getItem(1), 4).as("p90_qty"),
        round(col("p").getItem(0), 4).as("p25_price"),
        round(col("p").getItem(1), 4).as("p99_price"))
      .orderBy("l_returnflag")

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The 100 TB percentile path: `percentile_approx` (Greenwald-Khanna
    * sketch — bounded memory per group, partials merge map-side)
    * against the same cuts as the exact [[qPercentiles]]. Exact
    * percentile buffers EVERY value of a group on one reducer — the
    * thing that dies first at scale; the sketch trades that for a
    * rank-error bound of 1/accuracy. Third sketch-family member next
    * to HLL distinct and CMS counts. Approximate and merge-order
    * dependent ⇒ rows-only gate; the error-vs-exact bound is
    * spec-pinned.
    */
  def qApproxPercentiles(t: Tables, accuracy: Int = 10000): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"percentile_approx(l_quantity, array(0.5, 0.9), $accuracy)").as("q"),
        expr(s"percentile_approx(l_extendedprice, array(0.25, 0.99), $accuracy)").as("p"))
      .select(col("l_returnflag"),
        round(col("q").getItem(0), 4).as("median_qty"),
        round(col("q").getItem(1), 4).as("p90_qty"),
        round(col("p").getItem(0), 4).as("p25_price"),
        round(col("p").getItem(1), 4).as("p99_price"))
      .orderBy("l_returnflag")

  /** Hash-gated rank-error bound for the GK sketch (r11 verdict #4) —
    * the spec-only error check promoted to a driver-gated query. The
    * sketch contract: `percentile_approx` returns an ACTUAL element
    * whose rank is within εn = n/accuracy of ⌈p·n⌉. This query joins
    * each sketch output back against the exact column (one broadcast
    * of a grid-sized sketch table, one pass over lineitem) to compute
    * the returned value's true rank interval [lo+1, hi] (duplicates
    * give a range) and emits the bound verdict per (group, column,
    * pct): constant-true under the contract — re-derived by the DuckDB
    * oracle as the expected grid — so a sketch gone wild flips a
    * verdict and fails the hash gate. The ±1 slack absorbs the
    * floor-vs-ceil ambiguity in the rank convention, nothing more.
    */
  def qApproxPctGate(t: Tables, accuracy: Int = 10000): DataFrame = {
    val sk = t.lineitem.groupBy(col("l_returnflag"))
      .agg(
        expr(s"percentile_approx(l_quantity, array(0.5, 0.9), $accuracy)").as("q"),
        expr(s"percentile_approx(l_extendedprice, array(0.25, 0.99), $accuracy)").as("p"))
      .select(col("l_returnflag"), explode(array(
        struct(lit("l_quantity").as("cname"), lit(0.5).as("pct"),
          col("q").getItem(0).cast("double").as("v")),
        struct(lit("l_quantity").as("cname"), lit(0.9).as("pct"),
          col("q").getItem(1).cast("double").as("v")),
        struct(lit("l_extendedprice").as("cname"), lit(0.25).as("pct"),
          col("p").getItem(0).cast("double").as("v")),
        struct(lit("l_extendedprice").as("cname"), lit(0.99).as("pct"),
          col("p").getItem(1).cast("double").as("v")))).as("e"))
      .select(col("l_returnflag"), col("e.cname").as("cname"),
        col("e.pct").as("pct"), col("e.v").as("v"))
    val x = t.lineitem.select(col("l_returnflag"),
      col("l_quantity").cast("double").as("l_quantity"),
      col("l_extendedprice").cast("double").as("l_extendedprice"))
    val epsN = col("n").cast("double") / lit(accuracy.toDouble) + lit(1.0)
    val target = ceil(col("pct") * col("n")).cast("double")
    x.join(broadcast(sk), Seq("l_returnflag"))
      .withColumn("xv", when(col("cname") === "l_quantity", col("l_quantity"))
        .otherwise(col("l_extendedprice")))
      .groupBy(col("l_returnflag"), col("cname"), col("pct"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("xv") < col("v"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("xv") <= col("v"), 1L).otherwise(0L)).as("hi"))
      .select(col("l_returnflag"), col("cname"), col("pct"),
        (target <= col("hi").cast("double") + epsN &&
          target >= col("lo").cast("double") + 1.0 - epsN).as("within_bound"))
      .orderBy("l_returnflag", "cname", "pct")
  }

  def qApproxPctGateSql: String =
    """SELECT l_returnflag, cname, CAST(pct AS DOUBLE) AS pct, true AS within_bound
      |FROM (SELECT DISTINCT l_returnflag FROM lineitem) f,
      |  (VALUES ('l_quantity', 0.5), ('l_quantity', 0.9),
      |          ('l_extendedprice', 0.25), ('l_extendedprice', 0.99)) v(cname, pct)
      |ORDER BY l_returnflag, cname, pct""".stripMargin

  /** Correlated-aggregate shape: orders above their customer's average
    * (decorrelated to a window — one shuffle, no per-row subquery).
    */
  def qCorrelatedAvg(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    t.orders
      .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
      .withColumn("cust_n", count(lit(1)).over(w))
      // cust_avg itself is NOT in the output: a window-avg's last ulp is
      // accumulation-order-dependent, so only order-robust comparisons
      // (the 1.5× threshold) survive a cross-engine hash check.
      .filter(col("cust_n") >= 2 && col("o_totalprice") > col("cust_avg") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("o_orderkey")
  }

  val qCorrelatedAvgSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
      |FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg,
      |    count(*) OVER (PARTITION BY o_custkey) AS cust_n
      |  FROM orders)
      |WHERE cust_n >= 2 AND o_totalprice > cust_avg * 1.5
      |ORDER BY o_orderkey""".stripMargin

  /** Gated form of [[graft.functions.TopKAggregate]]: per-flag top-k
    * prices via the bounded-heap aggregate, exploded to ranked rows.
    * The oracle ranks with a window sort — an independent algorithm;
    * equal values make row_number's tie choice invisible in the output.
    */
  def qAggTopK(t: Tables, k: Int = 5): DataFrame =
    t.lineitem.groupBy(col("l_returnflag"))
      .agg(graft.functions.TopKAggregate.topk(col("l_extendedprice"), k).as("vals"))
      .select(col("l_returnflag"), posexplode(col("vals")).as(Seq("rank", "price")))
      .select(col("l_returnflag"), (col("rank") + 1).cast("long").as("rank"),
        round(col("price"), 2).as("price"))
      .orderBy("l_returnflag", "rank")

  def qAggTopKSql(k: Int = 5): String =
    s"""SELECT l_returnflag, rank, round(price, 2) AS price FROM (
       |  SELECT l_returnflag,
       |    CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC) AS BIGINT) AS rank,
       |    l_extendedprice AS price
       |  FROM lineitem)
       |WHERE rank <= $k
       |ORDER BY l_returnflag, rank""".stripMargin

  /** Top-k users by total event value per event_type — "top-n per
    * group" as a real AGGREGATE ([[graft.functions.TopKPairsAggregate]]):
    * bounded k-pair heap state, map-side combine ships ≤ k 16-byte
    * pairs per partition per group, NO WindowExec and no per-group
    * sort anywhere in the plan (spec-asserted). The per-(type, user)
    * totals round to 2dp BEFORE ranking so tie-break order (score
    * desc, user asc) is engine-portable; the DuckDB twin is the window
    * form — the semantic spec this aggregate must match bit-for-bit.
    */
  def qTopKNative(t: Tables, k: Int = 5): DataFrame =
    t.events.groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")), 2).as("total"))
      .groupBy(col("event_type"))
      .agg(graft.functions.TopKPairsAggregate.topkPairs(col("total"), col("user_id"), k).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("event_type"), (col("i") + 1).cast("long").as("rank"),
        col("p.id").as("user_id"), col("p.score").as("total"))
      .orderBy("event_type", "rank")

  def qTopKNativeSql(k: Int = 5): String =
    s"""WITH totals AS (
       |  SELECT event_type, user_id, round(sum(value), 2) AS total
       |  FROM events GROUP BY 1, 2
       |), r AS (
       |  SELECT event_type, user_id, total,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY total DESC, user_id) AS BIGINT) AS rank
       |  FROM totals
       |)
       |SELECT event_type, rank, user_id, total FROM r
       |WHERE rank <= $k
       |ORDER BY event_type, rank""".stripMargin
}
