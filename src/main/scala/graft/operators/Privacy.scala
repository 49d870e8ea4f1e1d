package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Re-identification-risk audits — the privacy companions to
  * [[Curate.dpCounts]]'s noised release and `q_purge_user`'s
  * deletion: BEFORE releasing a derived table you measure how
  * identifying its quasi-identifier (QI) combinations are. Both
  * audits are one QI-keyed aggregate plus an enum-bounded rollup —
  * the QI tuple is the only thing that shuffles, never payload, so
  * the shape is identical at 100 TB (classes partition by QI hash;
  * the band/l rollup is a handful of rows).
  *
  * Reference scope: the reference pipelines move user-attributed rows
  * (watched-folder → DB loads, e.g. v2/core/loaders/mysql.py) with no
  * privacy gate at all; these queries are the audit a production
  * deployment would bolt in front of every outbound load.
  */
object Privacy {

  private def band(k: Column): (Column, Column) = {
    val lo = when(k === 1, 1L)
      .when(k < 5, 2L)
      .when(k < 10, 5L)
      .when(k < 50, 10L)
      .otherwise(50L)
    val label = when(k === 1, "1")
      .when(k < 5, "2-4")
      .when(k < 10, "5-9")
      .when(k < 50, "10-49")
      .otherwise("50+")
    (lo, label)
  }

  /** k-anonymity grid over the customer QI (nation, market segment,
    * account-balance thousand-band): equivalence-class sizes k,
    * rolled up into release-review bands with exact row mass and the
    * share of rows living in classes below `kMin` (the re-id risk
    * mass a release gate thresholds on). Counts stay LONG end to
    * end; the one division is the final share.
    */
  def kAnonymityOf(customer: DataFrame, kMin: Long = 5L,
                   balBand: Double = 1000.0): DataFrame = {
    val classes = customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / balBand).as("bal_band"))
      .agg(count(lit(1)).as("k"))
    val total = classes.agg(sum(col("k")).as("n_total"))
    val (lo, label) = band(col("k"))
    classes
      .select(lo.as("band_lo"), label.as("k_band"), col("k"))
      .groupBy(col("band_lo"), col("k_band"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("band_lo"), col("k_band"), col("n_classes"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total").cast("double"), 6)
          .as("row_share"),
        when(col("band_lo") < kMin, 1).otherwise(0).as("risky"))
      .orderBy("band_lo")
  }

  def kAnonymity(t: Tables): DataFrame = kAnonymityOf(t.customer)

  def kAnonymitySql(kMin: Long = 5L, balBand: Double = 1000.0): String =
    s"""WITH cls AS (
       |  SELECT c_nationkey, c_mktsegment, floor(c_acctbal / $balBand) AS bal_band,
       |    count(*) AS k
       |  FROM customer GROUP BY 1, 2, 3
       |), tot AS (SELECT CAST(sum(k) AS BIGINT) AS n_total FROM cls
       |), banded AS (
       |  SELECT
       |    CAST(CASE WHEN k = 1 THEN 1 WHEN k < 5 THEN 2 WHEN k < 10 THEN 5
       |         WHEN k < 50 THEN 10 ELSE 50 END AS BIGINT) AS band_lo,
       |    CASE WHEN k = 1 THEN '1' WHEN k < 5 THEN '2-4' WHEN k < 10 THEN '5-9'
       |         WHEN k < 50 THEN '10-49' ELSE '50+' END AS k_band,
       |    k
       |  FROM cls
       |)
       |SELECT band_lo, k_band, count(*) AS n_classes,
       |  CAST(sum(k) AS BIGINT) AS n_rows,
       |  round(CAST(sum(k) AS DOUBLE) / (SELECT n_total FROM tot), 6) AS row_share,
       |  CASE WHEN band_lo < $kMin THEN 1 ELSE 0 END AS risky
       |FROM banded GROUP BY band_lo, k_band ORDER BY band_lo""".stripMargin

  /** l-diversity of the sensitive attribute (market segment) within
    * each (nation, balance-band) QI class — k-anonymity's blind spot:
    * a class of 50 rows that all share one segment still leaks the
    * segment. Grid keyed by l (distinct sensitive values per class)
    * with exact class/row mass per level; release gates threshold on
    * the l = 1 row. Same QI-keyed single aggregate shape.
    */
  def lDiversityOf(customer: DataFrame, balBand: Double = 1000.0): DataFrame = {
    val classes = customer
      .groupBy(col("c_nationkey"), floor(col("c_acctbal") / balBand).as("bal_band"))
      .agg(countDistinct(col("c_mktsegment")).as("l"), count(lit(1)).as("k"))
    val total = classes.agg(sum(col("k")).as("n_total"))
    classes
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("l"), col("n_classes"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total").cast("double"), 6)
          .as("row_share"))
      .orderBy("l")
  }

  def lDiversity(t: Tables): DataFrame = lDiversityOf(t.customer)

  def lDiversitySql(balBand: Double = 1000.0): String =
    s"""WITH cls AS (
       |  SELECT c_nationkey, floor(c_acctbal / $balBand) AS bal_band,
       |    count(DISTINCT c_mktsegment) AS l, count(*) AS k
       |  FROM customer GROUP BY 1, 2
       |), tot AS (SELECT CAST(sum(k) AS BIGINT) AS n_total FROM cls)
       |SELECT l, count(*) AS n_classes, CAST(sum(k) AS BIGINT) AS n_rows,
       |  round(CAST(sum(k) AS DOUBLE) / (SELECT n_total FROM tot), 6) AS row_share
       |FROM cls GROUP BY l ORDER BY l""".stripMargin
}
