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
}
