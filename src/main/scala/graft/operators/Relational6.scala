package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sixth relational tranche: exact distribution summaries in their
  * scale-correct forms — multi-quantile profiles and rank-statistic
  * tables derived from value histograms where the textbook per-row
  * window would sort the corpus on a handful of partition keys.
  */
object Relational6 {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact multi-quantile summary of order value per priority —
    * p25/p50/p75/p90/p99 via interpolating percentiles over integer
    * cents (`percentile` ≡ `quantile_cont`), one grouped aggregate.
    */
  def qQuantileSummary(t: Tables): DataFrame = qQuantileSummaryOf(t.orders)

  def qQuantileSummaryOf(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("c"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        expr("percentile(c, 0.25)").as("q25"),
        expr("percentile(c, 0.5)").as("q50"),
        expr("percentile(c, 0.75)").as("q75"),
        expr("percentile(c, 0.9)").as("q90"),
        expr("percentile(c, 0.99)").as("q99"))
      .select(col("o_orderpriority"), col("n"),
        round(col("q25") / 100.0, 6).as("p25"),
        round(col("q50") / 100.0, 6).as("p50"),
        round(col("q75") / 100.0, 6).as("p75"),
        round(col("q90") / 100.0, 6).as("p90"),
        round(col("q99") / 100.0, 6).as("p99"))
      .orderBy("o_orderpriority")

  val qQuantileSummarySql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) / 100.0, 6) AS p25,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)  / 100.0, 6) AS p50,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75) / 100.0, 6) AS p75,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)  / 100.0, 6) AS p90,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.99) / 100.0, 6) AS p99
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** Rank-distribution profile of order value per priority: for every
    * DISTINCT cents value, its row count, percent_rank (of its first
    * occurrence) and cume_dist. The textbook form is a per-row window
    * over the corpus partitioned 5 ways — a 5-task sort at 100 TB; the
    * scalable form here derives both statistics from the (priority,
    * value) HISTOGRAM's cumulative counts (percent_rank = cnt_below /
    * (n−1), cume_dist = cnt_at_or_below / n — exact window semantics,
    * value-constant by definition; the one window left runs over
    * histogram rows, bounded by the price domain). The ORACLE
    * deliberately runs DuckDB's real `percent_rank()`/`cume_dist()`
    * window functions over the raw rows and collapses per value —
    * cross-validating the histogram closed form against an engine's
    * builtin implementation of the same statistics.
    */
  def qRankProfile(t: Tables): DataFrame = qRankProfileOf(t.orders)

  def qRankProfileOf(orders: DataFrame): DataFrame = {
    val hist = orders
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("c"))
      .groupBy("o_orderpriority", "c").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("o_orderpriority")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("o_orderpriority"))))
      .select(col("o_orderpriority"),
        round(col("c") / 100.0, 2).as("value"), col("cnt").as("n_rows"),
        when(col("n") > 1,
          round((col("cum") - col("cnt")).cast("double") / (col("n") - 1), 6))
          .otherwise(lit(0.0)).as("pct_rank"),   // a 1-row partition ranks 0 (engine rule)
        round(col("cum").cast("double") / col("n"), 6).as("cume_dist"))
      .orderBy("o_orderpriority", "value")
  }

  val qRankProfileSql: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c,
      |    percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
      |)
      |SELECT o_orderpriority, round(c / 100.0, 2) AS value,
      |  count(*) AS n_rows,
      |  round(min(pr), 6) AS pct_rank,
      |  round(max(cd), 6) AS cume_dist
      |FROM ranked GROUP BY 1, 2 ORDER BY o_orderpriority, value""".stripMargin

  // ------------------------------------------------ FK join audit

  /** Referential-integrity / join-cardinality audit for a
    * fact→dimension key — the profile a pipeline runs BEFORE trusting
    * a join (and the input to the broadcast-vs-shuffle and
    * salt-or-not decisions `q_key_skew` refines): match rate and
    * orphan count on the fact side, unreferenced rows on the
    * dimension side, and the fan-out distribution (mean/p99/max facts
    * per matched dimension key). Everything derives from one fact-key
    * count table + one dimension key set: the orphan check is a LEFT
    * ANTI join on keys (never row payloads), fan-out stats live on
    * the key table, and every ratio divides exact LONGs.
    */
  def fkAuditOf(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String): DataFrame = {
    val factCounts = fact.groupBy(col(factKey).as("k")).agg(count(lit(1)).as("cnt"))
    val dimKeys = dim.select(col(dimKey).as("k")).distinct()
    val matched = factCounts.join(dimKeys, Seq("k"), "left_semi")
    val orphanFacts = factCounts.join(dimKeys, Seq("k"), "left_anti")
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_orphan_facts"))
    val unreferenced = dimKeys.join(factCounts, Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_unreferenced_dims"))
    val factTot = fact.agg(count(lit(1)).as("n_facts"))
    val dimTot = dimKeys.agg(count(lit(1)).as("n_dims"))
    val fanout = matched.agg(
      count(lit(1)).as("n_matched_keys"),
      sum(col("cnt")).as("n_matched_facts"),
      max(col("cnt")).as("max_fanout"),
      expr("percentile(cnt, 0.99)").as("p99_fanout"))
    factTot.crossJoin(dimTot).crossJoin(broadcast(fanout))
      .crossJoin(broadcast(orphanFacts)).crossJoin(broadcast(unreferenced))
      .select(col("n_facts"), col("n_dims"),
        col("n_matched_keys"), col("n_orphan_facts"), col("n_unreferenced_dims"),
        (col("n_matched_facts").cast("double") / col("n_facts").cast("double"))
          .as("match_rate"),
        (col("n_matched_facts").cast("double") / col("n_matched_keys").cast("double"))
          .as("mean_fanout"),
        col("p99_fanout"), col("max_fanout"))
  }

  /** Gated form: lineitem → orders on the order key (a true FK in
    * this schema — the audit should read match_rate 1, orphans 0).
    */
  def fkAudit(t: Tables): DataFrame =
    fkAuditOf(t.lineitem, "l_orderkey", t.orders, "o_orderkey")

  val fkAuditSql: String =
    """WITH fact_counts AS (
      |  SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1
      |), dim_keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
      |), matched AS (
      |  SELECT fc.k, fc.cnt FROM fact_counts fc
      |  WHERE fc.k IN (SELECT k FROM dim_keys)
      |), orphan AS (
      |  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_orphan_facts
      |  FROM fact_counts WHERE k NOT IN (SELECT k FROM dim_keys)
      |), unref AS (
      |  SELECT count(*) AS n_unreferenced_dims
      |  FROM dim_keys WHERE k NOT IN (SELECT k FROM fact_counts)
      |), fan AS (
      |  SELECT count(*) AS n_matched_keys,
      |    CAST(sum(cnt) AS BIGINT) AS n_matched_facts,
      |    max(cnt) AS max_fanout, quantile_cont(cnt, 0.99) AS p99_fanout
      |  FROM matched
      |)
      |SELECT (SELECT count(*) FROM lineitem) AS n_facts,
      |  (SELECT count(*) FROM dim_keys) AS n_dims,
      |  n_matched_keys, n_orphan_facts, n_unreferenced_dims,
      |  CAST(n_matched_facts AS DOUBLE)
      |    / CAST((SELECT count(*) FROM lineitem) AS DOUBLE) AS match_rate,
      |  CAST(n_matched_facts AS DOUBLE) / CAST(n_matched_keys AS DOUBLE) AS mean_fanout,
      |  p99_fanout, max_fanout
      |FROM fan CROSS JOIN orphan CROSS JOIN unref""".stripMargin
}
