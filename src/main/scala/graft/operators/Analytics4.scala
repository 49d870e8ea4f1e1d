package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Fourth analytics tranche: TREND inference over the daily event
  * grid — OLS fit, Mann–Kendall monotonic-trend test, Theil–Sen
  * robust slope, Brown's double-exponential smoothing, and a
  * moving-average seasonal decomposition.
  *
  * All five run on the per-(event_type, day) count grid, so every
  * pairwise form below is GRID-sized (|types| × |days|², days in the
  * thousands for years of daily grain), never corpus-sized: the one
  * corpus-proportional pass is the map-side-combined daily rollup.
  * Exactness policy follows [[Analytics3.autocorrOf]]: sums of counts
  * and products of (index, count) ride exact integer/DECIMAL
  * arithmetic; doubles appear only at the final divisions, in the
  * same operand order as the DuckDB oracle, then round to 6dp.
  */
object Analytics4 {

  /** The shared daily grid: one count per (event_type, day). */
  private[operators] def dailyOf(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))

  private val dailyCte =
    """daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  private def dec(c: Column): Column = c.cast("decimal(18,0)")

  // ------------------------------------------------------- OLS trend

  /** Least-squares line of daily volume over the day index, per type:
    * slope/intercept in events-per-day, plus r². The five sufficient
    * sums (Σt, Σy, Σt², Σty, Σy²) accumulate exactly — t and y cast to
    * DECIMAL(18,0) so products are DECIMAL(37,0) and sums cap at the
    * 38-digit max (the [[Analytics3.giniOf]] policy; the oracle rides
    * HUGEINT to put the overflow point past Spark's). The normal-
    * equation numerators/denominators stay exact too; only the final
    * divisions (and r²'s square, which would need ~10⁴⁸) are doubles.
    * A vertical/degenerate fit (n < 2 or zero t-variance) reads NULL.
    */
  def trendOlsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val sums = dailyOf(events)
      .withColumn("t", (row_number().over(w) - 1).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("t")).as("st"), sum(col("n_events")).as("sy"),
        sum(dec(col("t")) * dec(col("t"))).as("stt"),
        sum(dec(col("t")) * dec(col("n_events"))).as("sty"),
        sum(dec(col("n_events")) * dec(col("n_events"))).as("syy"))
    // num = n·Σty − Σt·Σy ; denT = n·Σt² − (Σt)² ; denY = n·Σy² − (Σy)²
    val num  = dec(col("n_days")) * col("sty") - dec(col("st")) * dec(col("sy"))
    val denT = dec(col("n_days")) * col("stt") - dec(col("st")) * dec(col("st"))
    val denY = dec(col("n_days")) * col("syy") - dec(col("sy")) * dec(col("sy"))
    sums
      .withColumn("num", num).withColumn("den_t", denT).withColumn("den_y", denY)
      .select(col("event_type"), col("n_days"),
        when(col("den_t") =!= 0,
          round(col("num").cast("double") / col("den_t").cast("double"), 6) + lit(0.0))
          .as("slope"),
        when(col("den_t") =!= 0,
          round((col("sy").cast("double")
              - (col("num").cast("double") / col("den_t").cast("double")) * col("st"))
            / col("n_days"), 6) + lit(0.0)).as("intercept"),
        when(col("den_t") =!= 0 && col("den_y") =!= 0,
          round(pow(col("num").cast("double"), 2)
            / (col("den_t").cast("double") * col("den_y").cast("double")), 6) + lit(0.0))
          .as("r2"))
      .orderBy("event_type")
  }

  def trendOls(t: Tables): DataFrame = trendOlsOf(t.events)

  def trendOlsSql: String =
    s"""WITH $dailyCte, indexed AS (
       |  SELECT event_type, n_events,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS BIGINT) AS t
       |  FROM daily
       |), sums AS (
       |  SELECT event_type, count(*) AS n_days,
       |    sum(t) AS st, sum(n_events) AS sy,
       |    sum(CAST(t AS HUGEINT) * t) AS stt,
       |    sum(CAST(t AS HUGEINT) * n_events) AS sty,
       |    sum(CAST(n_events AS HUGEINT) * n_events) AS syy
       |  FROM indexed GROUP BY 1
       |), eq AS (
       |  SELECT event_type, n_days,
       |    st, sy,
       |    n_days * sty - CAST(st AS HUGEINT) * sy AS num,
       |    n_days * stt - CAST(st AS HUGEINT) * st AS den_t,
       |    n_days * syy - CAST(sy AS HUGEINT) * sy AS den_y
       |  FROM sums
       |)
       |SELECT event_type, n_days,
       |  CASE WHEN den_t <> 0 THEN
       |    round(CAST(num AS DOUBLE) / CAST(den_t AS DOUBLE), 6) + 0.0 END AS slope,
       |  CASE WHEN den_t <> 0 THEN
       |    round((CAST(sy AS DOUBLE)
       |        - (CAST(num AS DOUBLE) / CAST(den_t AS DOUBLE)) * st) / n_days, 6) + 0.0
       |  END AS intercept,
       |  CASE WHEN den_t <> 0 AND den_y <> 0 THEN
       |    round(pow(CAST(num AS DOUBLE), 2)
       |      / (CAST(den_t AS DOUBLE) * CAST(den_y AS DOUBLE)), 6) + 0.0 END AS r2
       |FROM eq ORDER BY event_type""".stripMargin

  // ---------------------------------------------------- Mann–Kendall

  /** Mann–Kendall monotonic-trend test per type: S = Σ_{i<j}
    * sign(yⱼ − yᵢ) over the day-ordered series, tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18 (g ranges
    * over groups of equal counts), and the continuity-corrected
    * z = (S∓1)/√Var(S). The pairwise form is one grid-sized self-join
    * (equi on type, range on day) — n ~ thousands of days means ≤
    * millions of pairs per type, map-side-combined to one row. Both
    * variance terms stay in LONG (n ≤ 10⁵ days keeps n(n−1)(2n+5)
    * under 2·10¹⁵); z is the only double.
    */
  def mannKendallOf(events: DataFrame, zCrit: Double = 1.96): DataFrame = {
    val daily = dailyOf(events)
    val s = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(signum(col("b.n_events") - col("a.n_events")).cast("long")).as("s_stat"))
    val ties = daily.groupBy(col("event_type"), col("n_events"))
      .agg(count(lit(1)).as("tg"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(col("tg")).as("n_days"),
        sum(col("tg") * (col("tg") - 1) * (lit(2) * col("tg") + 5)).as("tie_term"))
    ties.join(s, Seq("event_type"), "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var_s_18",
        col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5) - col("tie_term"))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        round(col("var_s_18").cast("double") / 18.0, 6).as("var_s"),
        when(col("var_s_18") === 0, lit(null).cast("double"))
          .when(col("s_stat") > 0,
            round((col("s_stat") - 1) / sqrt(col("var_s_18").cast("double") / 18.0), 6) + lit(0.0))
          .when(col("s_stat") < 0,
            round((col("s_stat") + 1) / sqrt(col("var_s_18").cast("double") / 18.0), 6) + lit(0.0))
          .otherwise(lit(0.0)).as("z"),
        when(col("var_s_18") === 0, lit("no trend"))
          .when((col("s_stat") - 1) / sqrt(col("var_s_18").cast("double") / 18.0) > zCrit
            && col("s_stat") > 0, lit("increasing"))
          .when((col("s_stat") + 1) / sqrt(col("var_s_18").cast("double") / 18.0) < -zCrit
            && col("s_stat") < 0, lit("decreasing"))
          .otherwise(lit("no trend")).as("trend"))
      .orderBy("event_type")
  }

  def mannKendall(t: Tables): DataFrame = mannKendallOf(t.events)

  def mannKendallSql(zCrit: Double = 1.96): String =
    s"""WITH $dailyCte, s AS (
       |  SELECT a.event_type,
       |    CAST(sum(sign(b.n_events - a.n_events)) AS BIGINT) AS s_stat
       |  FROM daily a JOIN daily b
       |    ON b.event_type = a.event_type AND a.day < b.day
       |  GROUP BY 1
       |), ties AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_distinct,
       |    CAST(sum(tg) AS BIGINT) AS n_days,
       |    CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_term
       |  FROM (SELECT event_type, n_events, count(*) AS tg FROM daily GROUP BY 1, 2)
       |  GROUP BY 1
       |), mk AS (
       |  SELECT t.event_type, t.n_days,
       |    coalesce(s.s_stat, 0) AS s_stat,
       |    t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS var_s_18
       |  FROM ties t LEFT JOIN s ON s.event_type = t.event_type
       |)
       |SELECT event_type, n_days, s_stat,
       |  round(CAST(var_s_18 AS DOUBLE) / 18.0, 6) AS var_s,
       |  CASE WHEN var_s_18 = 0 THEN NULL
       |       WHEN s_stat > 0 THEN
       |         round((s_stat - 1) / sqrt(CAST(var_s_18 AS DOUBLE) / 18.0), 6) + 0.0
       |       WHEN s_stat < 0 THEN
       |         round((s_stat + 1) / sqrt(CAST(var_s_18 AS DOUBLE) / 18.0), 6) + 0.0
       |       ELSE 0.0 END AS z,
       |  CASE WHEN var_s_18 = 0 THEN 'no trend'
       |       WHEN s_stat > 0 AND
       |         (s_stat - 1) / sqrt(CAST(var_s_18 AS DOUBLE) / 18.0) > $zCrit
       |         THEN 'increasing'
       |       WHEN s_stat < 0 AND
       |         (s_stat + 1) / sqrt(CAST(var_s_18 AS DOUBLE) / 18.0) < -$zCrit
       |         THEN 'decreasing'
       |       ELSE 'no trend' END AS trend
       |FROM mk ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- Theil–Sen

  /** Theil–Sen robust trend per type: slope = median over all i<j of
    * (yⱼ − yᵢ)/(dⱼ − dᵢ) (day-difference denominator, so calendar gaps
    * weigh correctly), intercept = median of (yᵢ − slope·dᵢ). Immune
    * to outlier days that drag OLS. Same grid-sized pairwise self-join
    * as Mann–Kendall; each slope is one integer−integer division, and
    * the two medians are exact interpolating percentiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont`). Day positions are
    * datediff from the per-type first day, identical in both engines.
    */
  def theilSenOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = dailyOf(events)
      .withColumn("x", datediff(col("day"), first(col("day")).over(w)).cast("long"))
    val slopes = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.x") < col("b.x"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.n_events") - col("a.n_events")).cast("double")
          / (col("b.x") - col("a.x")).cast("double")).as("pair_slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(pair_slope, 0.5)").as("slope_raw"))
    daily.join(slopes, "event_type")
      .groupBy(col("event_type"), col("n_pairs"), col("slope_raw"))
      .agg(expr("percentile(n_events - slope_raw * x, 0.5)").as("intercept_raw"))
      .select(col("event_type"), col("n_pairs"),
        round(col("slope_raw"), 6).as("slope"),
        round(col("intercept_raw"), 6).as("intercept"))
      .orderBy("event_type")
  }

  def theilSen(t: Tables): DataFrame = theilSenOf(t.events)

  def theilSenSql: String =
    s"""WITH $dailyCte, indexed AS (
       |  SELECT event_type, n_events,
       |    CAST(date_diff('day',
       |      first_value(day) OVER (PARTITION BY event_type ORDER BY day
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), day) AS BIGINT) AS x
       |  FROM daily
       |), slopes AS (
       |  SELECT a.event_type, count(*) AS n_pairs,
       |    quantile_cont(CAST(b.n_events - a.n_events AS DOUBLE)
       |      / CAST(b.x - a.x AS DOUBLE), 0.5) AS slope_raw
       |  FROM indexed a JOIN indexed b
       |    ON b.event_type = a.event_type AND a.x < b.x
       |  GROUP BY 1
       |)
       |SELECT i.event_type, s.n_pairs,
       |  round(s.slope_raw, 6) AS slope,
       |  round(quantile_cont(i.n_events - s.slope_raw * i.x, 0.5), 6) AS intercept
       |FROM indexed i JOIN slopes s ON s.event_type = i.event_type
       |GROUP BY 1, 2, s.slope_raw ORDER BY i.event_type""".stripMargin

  // --------------------------------------- Brown double smoothing

  /** Brown's double-exponential smoothing per type: S1 = EWMA(α) of
    * the daily counts, S2 = EWMA(α) of S1 (both seeded at x₀), then
    * level = 2·S1 − S2, trend = α/(1−α)·(S1 − S2), and the one-step
    * forecast level + trend — the minimal smoother that tracks a
    * drifting LINEAR trend where plain EWMA lags it. Both recurrences
    * ride the [[Analytics3.ewmaOf]] inverse-decay closed form (zᵢ =
    * vᵢ/qⁱ, one running-sum window each), so the whole operator is two
    * chained windows over the grid — no recursion, no driver loop, and
    * the same ≲300-point series bound as ewma (q⁻ᵗ precision fade;
    * unbounded horizons belong to the streaming gates).
    */
  def holtBrownOf(events: DataFrame, alpha: Double = 0.3): DataFrame = {
    val q = 1.0 - alpha
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s1 = dailyOf(events)
      .withColumn("t", (row_number().over(wOrd) - 1).cast("double"))
      .withColumn("s_1", sum(col("n_events") / pow(lit(q), col("t"))).over(wRun))
      .withColumn("x0", first(col("n_events")).over(wRun).cast("double"))
      .withColumn("s1",
        pow(lit(q), col("t")) * (lit(alpha) * (col("s_1") - col("x0")) + col("x0")))
    val s2 = s1
      .withColumn("s_2", sum(col("s1") / pow(lit(q), col("t"))).over(wRun))
      .withColumn("s2",
        pow(lit(q), col("t")) * (lit(alpha) * (col("s_2") - col("x0")) + col("x0")))
    s2.select(col("event_type"), col("day"), col("n_events"),
        round(col("s1"), 6).as("s1"),
        round(col("s2"), 6).as("s2"),
        round(lit(2.0) * col("s1") - col("s2"), 6).as("level"),
        round(lit(alpha / q) * (col("s1") - col("s2")), 6).as("trend"),
        round(lit(2.0) * col("s1") - col("s2")
          + lit(alpha / q) * (col("s1") - col("s2")), 6).as("forecast"))
      .orderBy("event_type", "day")
  }

  def holtBrown(t: Tables): DataFrame = holtBrownOf(t.events)

  def holtBrownSql(alpha: Double = 0.3): String = {
    val q = 1.0 - alpha
    s"""WITH $dailyCte, indexed AS (
       |  SELECT event_type, day, n_events,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS DOUBLE) AS t
       |  FROM daily
       |), pass1 AS (
       |  SELECT event_type, day, n_events, t,
       |    sum(n_events / pow($q, t)) OVER wr AS s_1,
       |    CAST(first_value(n_events) OVER wr AS DOUBLE) AS x0
       |  FROM indexed
       |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), sm1 AS (
       |  SELECT event_type, day, n_events, t, x0,
       |    pow($q, t) * ($alpha * (s_1 - x0) + x0) AS s1
       |  FROM pass1
       |), pass2 AS (
       |  SELECT event_type, day, n_events, t, x0, s1,
       |    sum(s1 / pow($q, t)) OVER wr AS s_2
       |  FROM sm1
       |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), sm2 AS (
       |  SELECT event_type, day, n_events, s1,
       |    pow($q, t) * ($alpha * (s_2 - x0) + x0) AS s2
       |  FROM pass2
       |)
       |SELECT event_type, day, n_events,
       |  round(s1, 6) AS s1, round(s2, 6) AS s2,
       |  round(2.0 * s1 - s2, 6) AS level,
       |  round(${alpha / q} * (s1 - s2), 6) AS trend,
       |  round(2.0 * s1 - s2 + ${alpha / q} * (s1 - s2), 6) AS forecast
       |FROM sm2 ORDER BY event_type, day""".stripMargin
  }

  // ------------------------------------------------- MAD outliers

  /** Robust outlier days per type via the modified z-score:
    * z = 0.6745·(y − median) / MAD with MAD = median(|y − median|) —
    * the screen that survives the very outliers a mean/stddev gate
    * absorbs. Both medians are exact interpolating percentiles
    * (`percentile` ≡ `quantile_cont`), computed per type on the
    * grid-sized daily table; a zero MAD (≥half the days identical)
    * reads NULL z and no flag rather than an ANSI /0. The 3.5 cut is
    * Iglewicz–Hoaglin's published convention.
    */
  def madOutliersOf(events: DataFrame, cut: Double = 3.5): DataFrame = {
    val daily = dailyOf(events)
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(n_events, 0.5)").as("med"))
    val mad = daily.join(med, "event_type")
      .groupBy(col("event_type"), col("med"))
      .agg(expr("percentile(abs(n_events - med), 0.5)").as("mad"))
    daily.join(mad, "event_type")
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        when(col("mad") =!= 0.0,
          round(lit(0.6745) * (col("n_events") - col("med")) / col("mad"), 6) + lit(0.0))
          .as("mod_z"),
        when(col("mad") =!= 0.0,
          abs(lit(0.6745) * (col("n_events") - col("med")) / col("mad")) > cut)
          .otherwise(lit(false)).as("is_outlier"))
      .orderBy("event_type", "day")
  }

  def madOutliers(t: Tables): DataFrame = madOutliersOf(t.events)

  def madOutliersSql(cut: Double = 3.5): String =
    s"""WITH $dailyCte, med AS (
       |  SELECT event_type, quantile_cont(n_events, 0.5) AS med
       |  FROM daily GROUP BY 1
       |), mad AS (
       |  SELECT d.event_type, m.med,
       |    quantile_cont(abs(d.n_events - m.med), 0.5) AS mad
       |  FROM daily d JOIN med m ON m.event_type = d.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT d.event_type, d.day, d.n_events,
       |  round(a.med, 6) AS med, round(a.mad, 6) AS mad,
       |  CASE WHEN a.mad <> 0.0 THEN
       |    round(0.6745 * (d.n_events - a.med) / a.mad, 6) + 0.0 END AS mod_z,
       |  CASE WHEN a.mad <> 0.0 THEN
       |    abs(0.6745 * (d.n_events - a.med) / a.mad) > $cut
       |  ELSE false END AS is_outlier
       |FROM daily d JOIN mad a ON a.event_type = d.event_type
       |ORDER BY d.event_type, d.day""".stripMargin

  // --------------------------------------------- winsorized mean

  /** Winsorized mean of order value per priority class — the robust
    * location estimate reports quote next to the raw mean. Bounds are
    * the EXACT-RANK ⌈p·n⌉-th smallest integer-cents values, selected
    * WITHOUT a corpus-sized sort: the corpus collapses to a
    * (priority, cents) HISTOGRAM first (map-side combinable; its size
    * is the price domain, not the row count), the rank walk is a
    * cumulative sum over that grid-sized table, and the clamp pass is
    * a second aggregate of the same histogram against the broadcast
    * ≤|priorities| bound rows. Interpolated quantiles are deliberately
    * NOT used: exact-rank bounds are table values, so every clamped
    * amount stays an integer, sums ride exact DECIMAL cents (no float
    * accumulation — the bootstrap-CI policy), and the one double
    * division per group is engine-identical.
    */
  def winsorizedMeanOf(orders: DataFrame, pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    val hist = orders
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_orderpriority", "cents").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("o_orderpriority")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wCum))
    val totals = hist.groupBy("o_orderpriority")
      .agg(sum(col("cnt")).as("n"),
        sum(dec(col("cents")) * dec(col("cnt"))).as("sum_raw"))
    val bounds = cum.join(totals, "o_orderpriority")
      .withColumn("k_lo", greatest(ceil(lit(pLo) * col("n")).cast("long"), lit(1L)))
      .withColumn("k_hi", ceil(lit(pHi) * col("n")).cast("long"))
      .groupBy(col("o_orderpriority"), col("n"), col("sum_raw"))
      .agg(min(when(col("cum") >= col("k_lo"), col("cents"))).as("lo_cents"),
        min(when(col("cum") >= col("k_hi"), col("cents"))).as("hi_cents"))
    hist.join(broadcast(bounds), "o_orderpriority")
      .groupBy(col("o_orderpriority"), col("n"), col("sum_raw"),
        col("lo_cents"), col("hi_cents"))
      .agg(sum(dec(least(greatest(col("cents"), col("lo_cents")), col("hi_cents")))
        * dec(col("cnt"))).as("sum_w"))
      .select(col("o_orderpriority"), col("n"),
        (col("lo_cents") / lit(100.0)).as("lo"),
        (col("hi_cents") / lit(100.0)).as("hi"),
        round(col("sum_raw").cast("double") / 100.0 / col("n"), 6).as("mean_raw"),
        round(col("sum_w").cast("double") / 100.0 / col("n"), 6).as("mean_winsorized"))
      .orderBy("o_orderpriority")
  }

  def winsorizedMean(t: Tables): DataFrame = winsorizedMeanOf(t.orders)

  def winsorizedMeanSql(pLo: Double = 0.05, pHi: Double = 0.95): String =
    s"""WITH hist AS (
       |  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |    count(*) AS cnt
       |  FROM orders GROUP BY 1, 2
       |), cum AS (
       |  SELECT o_orderpriority, cents, cnt,
       |    sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM hist
       |), totals AS (
       |  SELECT o_orderpriority, CAST(sum(cnt) AS BIGINT) AS n,
       |    sum(CAST(cents AS HUGEINT) * cnt) AS sum_raw
       |  FROM hist GROUP BY 1
       |), bounds AS (
       |  SELECT c.o_orderpriority, t.n, t.sum_raw,
       |    min(CASE WHEN c.cum >= greatest(CAST(ceil($pLo * t.n) AS BIGINT), 1)
       |      THEN c.cents END) AS lo_cents,
       |    min(CASE WHEN c.cum >= CAST(ceil($pHi * t.n) AS BIGINT)
       |      THEN c.cents END) AS hi_cents
       |  FROM cum c JOIN totals t ON t.o_orderpriority = c.o_orderpriority
       |  GROUP BY 1, 2, 3
       |)
       |SELECT h.o_orderpriority, b.n,
       |  b.lo_cents / 100.0 AS lo, b.hi_cents / 100.0 AS hi,
       |  round(CAST(b.sum_raw AS DOUBLE) / 100.0 / b.n, 6) AS mean_raw,
       |  round(CAST(sum(CAST(least(greatest(h.cents, b.lo_cents), b.hi_cents) AS HUGEINT)
       |      * h.cnt) AS DOUBLE) / 100.0 / b.n, 6) AS mean_winsorized
       |FROM hist h JOIN bounds b ON b.o_orderpriority = h.o_orderpriority
       |GROUP BY 1, 2, 3, 4, b.sum_raw
       |ORDER BY h.o_orderpriority""".stripMargin

  // ------------------------------------------- cross-correlation

  /** Lagged cross-correlation between event-type pairs over the daily
    * grid: for every unordered type pair (a < b) and lag −L..L,
    * Pearson r between a's count on day d and b's count on day d+lag,
    * computed over the days BOTH series cover at that shift (one
    * grid-sized equi-join per lag on (day+lag, pair)). The
    * lead/lag screen behind "does signups' spike predict purchases'".
    * Estimator sums follow [[Analytics3.autocorrOf]]: counts and
    * products exact DECIMAL (oracle on HUGEINT), per-shift means —
    * this is the windowed-overlap form, so each shift uses ITS
    * overlap's own moments; doubles only in the final r. Degenerate
    * shifts (either side constant over the overlap, or <2 pairs) read
    * NULL.
    */
  def crossCorrOf(events: DataFrame, maxLag: Int = 3): DataFrame = {
    val daily = dailyOf(events)
    val perLag = (-maxLag to maxLag).map { l =>
      daily.as("a")
        .join(daily.as("b"),
          col("a.event_type") < col("b.event_type") &&
            col("b.day") === date_add(col("a.day"), l))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.n_events")).as("sx"), sum(col("b.n_events")).as("sy"),
          sum(dec(col("a.n_events")) * dec(col("a.n_events"))).as("sxx"),
          sum(dec(col("b.n_events")) * dec(col("b.n_events"))).as("syy"),
          sum(dec(col("a.n_events")) * dec(col("b.n_events"))).as("sxy"))
        .withColumn("lag", lit(l.toLong))
    }.reduce(_ unionByName _)
    val num  = dec(col("n_pairs")) * col("sxy") - dec(col("sx")) * dec(col("sy"))
    val denX = dec(col("n_pairs")) * col("sxx") - dec(col("sx")) * dec(col("sx"))
    val denY = dec(col("n_pairs")) * col("syy") - dec(col("sy")) * dec(col("sy"))
    perLag
      .withColumn("num", num).withColumn("den_x", denX).withColumn("den_y", denY)
      .select(col("type_a"), col("type_b"), col("lag"), col("n_pairs"),
        when(col("n_pairs") >= 2 && col("den_x") =!= 0 && col("den_y") =!= 0,
          round(col("num").cast("double")
            / sqrt(col("den_x").cast("double") * col("den_y").cast("double")), 6) + lit(0.0))
          .as("r"))
      .orderBy("type_a", "type_b", "lag")
  }

  def crossCorr(t: Tables): DataFrame = crossCorrOf(t.events)

  def crossCorrSql(maxLag: Int = 3): String = {
    val lagSelects = (-maxLag to maxLag).map { l =>
      s"""  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    CAST($l AS BIGINT) AS lag, count(*) AS n_pairs,
         |    sum(a.n_events) AS sx, sum(b.n_events) AS sy,
         |    sum(CAST(a.n_events AS HUGEINT) * a.n_events) AS sxx,
         |    sum(CAST(b.n_events AS HUGEINT) * b.n_events) AS syy,
         |    sum(CAST(a.n_events AS HUGEINT) * b.n_events) AS sxy
         |  FROM daily a JOIN daily b
         |    ON a.event_type < b.event_type AND b.day = a.day + $l
         |  GROUP BY 1, 2""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $dailyCte, lags AS (
       |$lagSelects
       |), eq AS (
       |  SELECT type_a, type_b, lag, n_pairs,
       |    n_pairs * sxy - CAST(sx AS HUGEINT) * sy AS num,
       |    n_pairs * sxx - CAST(sx AS HUGEINT) * sx AS den_x,
       |    n_pairs * syy - CAST(sy AS HUGEINT) * sy AS den_y
       |  FROM lags
       |)
       |SELECT type_a, type_b, lag, n_pairs,
       |  CASE WHEN n_pairs >= 2 AND den_x <> 0 AND den_y <> 0 THEN
       |    round(CAST(num AS DOUBLE)
       |      / sqrt(CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)), 6) + 0.0
       |  END AS r
       |FROM eq ORDER BY type_a, type_b, lag""".stripMargin
  }

  // ------------------------------------------------ Welch t-test

  /** Welch's unequal-variance t-test between every pair of order
    * priorities on order value — the A/B-test readout (don't assume
    * equal variances across arms). Group moments come from ONE
    * map-side-combined aggregate of exact cents (n, Σx, Σx² on
    * DECIMAL/HUGEINT — the usual policy); the pair fanout is a
    * ≤\|groups\|² self-join of that tiny moment table, so the corpus
    * is scanned once however many arms exist. t and the
    * Welch–Satterthwaite dof are the only doubles; a degenerate arm
    * (n < 2 or zero variance on both sides) reads NULL. The
    * `significant` flag uses \|t\| > 1.96 — the z approximation,
    * documented as such (dof here is huge; an exact CDF is a client
    * concern, not an engine one).
    */
  def welchTTestOf(orders: DataFrame, tCrit: Double = 1.96): DataFrame = {
    val m = orders
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(dec(col("c")) * dec(col("c"))).as("sxx"))
    val a = m.select(col("grp").as("grp_a"), col("n").as("na"),
      col("sx").as("sxa"), col("sxx").as("sxxa"))
    val b = m.select(col("grp").as("grp_b"), col("n").as("nb"),
      col("sx").as("sxb"), col("sxx").as("sxxb"))
    // sample variance over cents: (n·Σx² − (Σx)²) / (n·(n−1)), exact
    // numerator; mean and the /100 rescale happen in doubles at the end
    def meanD(sx: Column, n: Column) = sx.cast("double") / n / 100.0
    def varD(n: Column, sx: Column, sxx: Column) =
      (dec(n) * sxx - dec(sx) * dec(sx)).cast("double") / (n.cast("double") * (n - 1)) / 10000.0
    val va = varD(col("na"), col("sxa"), col("sxxa"))
    val vb = varD(col("nb"), col("sxb"), col("sxxb"))
    val se2 = va / col("na") + vb / col("nb")
    val t = (meanD(col("sxa"), col("na")) - meanD(col("sxb"), col("nb"))) / sqrt(se2)
    val dof = (se2 * se2) /
      ((va / col("na")) * (va / col("na")) / (col("na") - 1)
        + (vb / col("nb")) * (vb / col("nb")) / (col("nb") - 1))
    a.join(b, col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("na"), col("nb"),
        round(meanD(col("sxa"), col("na")), 6).as("mean_a"),
        round(meanD(col("sxb"), col("nb")), 6).as("mean_b"),
        when(col("na") >= 2 && col("nb") >= 2 && se2 =!= 0.0,
          round(t, 6) + lit(0.0)).as("t_stat"),
        when(col("na") >= 2 && col("nb") >= 2 && se2 =!= 0.0,
          round(dof, 4) + lit(0.0)).as("welch_dof"),
        when(col("na") >= 2 && col("nb") >= 2 && se2 =!= 0.0,
          abs(t) > tCrit).otherwise(lit(false)).as("significant"))
      .orderBy("grp_a", "grp_b")
  }

  def welchTTest(t: Tables): DataFrame = welchTTestOf(t.orders)

  def welchTTestSql(tCrit: Double = 1.96): String =
    s"""WITH m AS (
       |  SELECT o_orderpriority AS grp, count(*) AS n,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sx,
       |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)
       |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx
       |  FROM orders GROUP BY 1
       |), p AS (
       |  SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS na, b.n AS nb,
       |    CAST(a.sx AS DOUBLE) / a.n / 100.0 AS mean_a,
       |    CAST(b.sx AS DOUBLE) / b.n / 100.0 AS mean_b,
       |    CAST(a.n * a.sxx - CAST(a.sx AS HUGEINT) * a.sx AS DOUBLE)
       |      / (CAST(a.n AS DOUBLE) * (a.n - 1)) / 10000.0 AS va,
       |    CAST(b.n * b.sxx - CAST(b.sx AS HUGEINT) * b.sx AS DOUBLE)
       |      / (CAST(b.n AS DOUBLE) * (b.n - 1)) / 10000.0 AS vb
       |  FROM m a JOIN m b ON a.grp < b.grp
       |)
       |SELECT grp_a, grp_b, na, nb,
       |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       |  CASE WHEN na >= 2 AND nb >= 2 AND (va / na + vb / nb) <> 0.0 THEN
       |    round((mean_a - mean_b) / sqrt(va / na + vb / nb), 6) + 0.0 END AS t_stat,
       |  CASE WHEN na >= 2 AND nb >= 2 AND (va / na + vb / nb) <> 0.0 THEN
       |    round((va / na + vb / nb) * (va / na + vb / nb)
       |      / ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)), 4) + 0.0
       |  END AS welch_dof,
       |  CASE WHEN na >= 2 AND nb >= 2 AND (va / na + vb / nb) <> 0.0 THEN
       |    abs((mean_a - mean_b) / sqrt(va / na + vb / nb)) > $tCrit
       |  ELSE false END AS significant
       |FROM p ORDER BY grp_a, grp_b""".stripMargin

  // ------------------------------------------------ one-way ANOVA

  /** One-way ANOVA across ALL order-priority arms at once — the
    * omnibus "do any arms differ" screen run before [[welchTTestOf]]'s
    * pairwise drill-down. Sums of squares derive entirely from the
    * per-group exact-cents moments (n, Σx, Σx²): SStot = Σx²−(Σx)²/N,
    * SSB = Σ_g (Σx_g)²/n_g − (Σx)²/N, SSW = SStot − SSB — one
    * map-side-combined corpus aggregate, then arithmetic on the
    * ≤\|groups\| moment rows. F, η² and the dofs are the only doubles.
    * The squared group sums ride DECIMAL/HUGEINT (they square ~1e11
    * cents); divisions happen at the end in identical operand order.
    */
  def anovaOf(orders: DataFrame): DataFrame = {
    val g = orders
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(dec(col("c")) * dec(col("c"))).as("sxx"))
    // the k per-group (Σx_g)²/n_g terms are doubles; summing them in
    // engine-dependent GROUP ORDER risks a last-ulp difference that the
    // 4dp round can amplify at SS magnitudes — fold them in sorted-grp
    // order on BOTH engines instead (the oracle uses list(... ORDER BY
    // grp) + list_reduce)
    val tot = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("sx")).as("gx"), sum(col("sxx")).as("gxx"),
      aggregate(
        transform(
          array_sort(collect_list(struct(col("grp"),
            ((dec(col("sx")) * dec(col("sx"))).cast("double") / col("n")).as("term")))),
          s => s.getField("term")),
        lit(0.0), (acc, x) => acc + x).as("sb_part"))
    tot.select(col("k"), col("nn").as("n_total"),
        (col("gxx").cast("double") / 10000.0
          - col("gx").cast("double") * col("gx") / col("nn") / 10000.0).as("ss_tot"),
        (col("sb_part") / 10000.0
          - col("gx").cast("double") * col("gx") / col("nn") / 10000.0).as("ss_between"))
      // SS columns ship UNROUNDED: at ~1e13 magnitudes the two engines'
      // round(x, 4) implementations disagree in the last ulp (the
      // multiply-by-10^4 leaves exact-double range); the raw doubles
      // are bit-identical by construction, so rounding only ADDS risk
      .select(col("k"), col("n_total"),
        col("ss_tot"),
        col("ss_between"),
        (col("ss_tot") - col("ss_between")).as("ss_within"),
        when(col("k") > 1 && col("n_total") > col("k")
            && col("ss_tot") - col("ss_between") =!= 0.0,
          round((col("ss_between") / (col("k") - 1))
            / ((col("ss_tot") - col("ss_between")) / (col("n_total") - col("k"))), 6)
            + lit(0.0)).as("f_stat"),
        when(col("ss_tot") =!= 0.0,
          round(col("ss_between") / col("ss_tot"), 6) + lit(0.0)).as("eta_sq"))
  }

  def anova(t: Tables): DataFrame = anovaOf(t.orders)

  val anovaSql: String =
    """WITH g AS (
      |  SELECT o_orderpriority AS grp, count(*) AS n,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sx,
      |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)
      |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx
      |  FROM orders GROUP BY 1
      |), tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |    sum(sx) AS gx, sum(sxx) AS gxx,
      |    list_reduce(
      |      list_prepend(0.0,
      |        list(CAST(CAST(sx AS HUGEINT) * sx AS DOUBLE) / n ORDER BY grp)),
      |      (a, b) -> a + b) AS sb_part
      |  FROM g
      |), ss AS (
      |  SELECT k, nn AS n_total,
      |    CAST(gxx AS DOUBLE) / 10000.0
      |      - CAST(gx AS DOUBLE) * gx / nn / 10000.0 AS ss_tot,
      |    sb_part / 10000.0
      |      - CAST(gx AS DOUBLE) * gx / nn / 10000.0 AS ss_between
      |  FROM tot
      |)
      |SELECT k, n_total,
      |  ss_tot,
      |  ss_between,
      |  ss_tot - ss_between AS ss_within,
      |  CASE WHEN k > 1 AND n_total > k AND ss_tot - ss_between <> 0.0 THEN
      |    round((ss_between / (k - 1))
      |      / ((ss_tot - ss_between) / (n_total - k)), 6) + 0.0 END AS f_stat,
      |  CASE WHEN ss_tot <> 0.0 THEN
      |    round(ss_between / ss_tot, 6) + 0.0 END AS eta_sq
      |FROM ss""".stripMargin

  // ---------------------------------------------- isotonic (PAV)

  /** Isotonic (monotone non-decreasing) least-squares fit of daily
    * volume per type — the calibration/trend-flooring primitive. The
    * Spark side runs pool-adjacent-violators (LINEAR in the series)
    * inside one `mapGroups` per type: the series is grid-sized by
    * construction (the corpus collapsed to the daily rollup first), so
    * per-group sequential PAV is the scale-correct shape — no
    * quadratic joins, no driver loop, one shuffle of grid rows. Pool
    * means stay (Σy: LONG, n: LONG) until the final division. The
    * ORACLE is the textbook MINIMAX characterization — fitted(i) =
    * max_{j≤i} min_{k≥i} mean(y_j..y_k) — computed by triangular
    * joins on the same exact cumulative sums: two INDEPENDENT
    * derivations of the same fit that must agree to the last bit
    * (identical integer ratios), the strongest oracle form in the
    * repo next to the window-builtin cross-check of `q_rank_profile`.
    */
  def isotonicOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = dailyOf(events)
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n_events"))
      .as[(String, String, Long)]
    daily.groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        // PAV with (sum, count) pools; merge while the previous pool
        // mean exceeds the next (compare as cross-multiplied LONGs —
        // no float in the merge decision)
        final case class Pool(var sum: Long, var n: Long, var upto: Int)
        val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
        rows.indices.foreach { i =>
          pools += Pool(rows(i)._3, 1L, i)
          while (pools.length > 1 &&
            pools(pools.length - 2).sum * pools.last.n >
              pools.last.sum * pools(pools.length - 2).n) {
            val top = pools.remove(pools.length - 1)
            pools.last.sum += top.sum; pools.last.n += top.n
            pools.last.upto = top.upto
          }
        }
        val fitted = new Array[Double](rows.length)
        var lo = 0
        pools.foreach { p =>
          val m = p.sum.toDouble / p.n
          (lo to p.upto).foreach(i => fitted(i) = m)
          lo = p.upto + 1
        }
        rows.indices.iterator.map { i =>
          // HALF_UP like both engines' round() — math.rint is
          // half-even and would diverge on exact .5 boundaries
          // (reachable once pools span 2^k≥128 days)
          (key, rows(i)._2, rows(i)._3, math.floor(fitted(i) * 1e6 + 0.5) / 1e6)
        }
      }
      .toDF("event_type", "day", "n_events", "fitted")
      .select(col("event_type"), col("day").cast("date").as("day"),
        col("n_events"), col("fitted"))
      .orderBy("event_type", "day")
  }

  def isotonic(t: Tables): DataFrame = isotonicOf(t.events)

  def isotonicSql: String =
    s"""WITH $dailyCte, idx AS (
       |  SELECT event_type, day, n_events,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
       |    CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM daily
       |), means AS (
       |  SELECT j.event_type, j.t AS j, k.t AS k,
       |    CAST(k.cum - j.cum + j.n_events AS DOUBLE) / (k.t - j.t + 1) AS m
       |  FROM idx j JOIN idx k
       |    ON k.event_type = j.event_type AND k.t >= j.t
       |), inner_min AS (
       |  SELECT i.event_type, i.t, m.j, min(m.m) AS mn
       |  FROM idx i JOIN means m
       |    ON m.event_type = i.event_type AND m.j <= i.t AND m.k >= i.t
       |  GROUP BY 1, 2, 3
       |)
       |SELECT i.event_type, i.day, i.n_events,
       |  round(max(x.mn), 6) AS fitted
       |FROM idx i JOIN inner_min x
       |  ON x.event_type = i.event_type AND x.t = i.t
       |GROUP BY 1, 2, 3
       |ORDER BY i.event_type, i.day""".stripMargin

  // -------------------------------------- seasonal decomposition

  /** Classic moving-average decomposition of the daily grid per type:
    * trend = centered 7-day moving average (defined only on full
    * windows), seasonal = per-day-of-week mean of the detrended
    * series, residual = observed − trend − seasonal. Every component
    * is derived from EXACT integer sums — trend is w7/7 with w7 the
    * 7-day count sum, and the day-of-week mean is
    * (7·Σy − Σw7)/(7·n) over that dow's full-window rows — so both
    * engines divide identical integers and the doubles agree
    * bit-for-bit before the 6dp round. Rows whose window is truncated
    * (first/last 3 days of a type) carry NULL trend/seasonal/residual
    * but stay in the output: downstream gap analysis needs to see the
    * edge, not lose it.
    */
  def seasonalDecomposeOf(events: DataFrame, halfWidth: Int = 3): DataFrame = {
    val width = 2 * halfWidth + 1
    val wC = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-halfWidth, halfWidth)
    val based = dailyOf(events)
      .withColumn("w7",
        when(count(lit(1)).over(wC) === width, sum(col("n_events")).over(wC)))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val seasonal = based.filter(col("w7").isNotNull)
      .groupBy(col("event_type"), col("dow"))
      .agg(((lit(width.toLong) * sum(col("n_events")) - sum(col("w7"))).cast("double")
        / (lit(width.toDouble) * count(lit(1)))).as("seasonal_raw"))
    based.join(seasonal, Seq("event_type", "dow"), "left")
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("w7").cast("double") / width, 6).as("trend"),
        when(col("w7").isNotNull, round(col("seasonal_raw"), 6)).as("seasonal"),
        when(col("w7").isNotNull,
          round(col("n_events") - col("w7").cast("double") / width - col("seasonal_raw"), 6))
          .as("residual"))
      .orderBy("event_type", "day")
  }

  def seasonalDecompose(t: Tables): DataFrame = seasonalDecomposeOf(t.events)

  def seasonalDecomposeSql(halfWidth: Int = 3): String = {
    val width = 2 * halfWidth + 1
    s"""WITH $dailyCte, based AS (
       |  SELECT event_type, day, n_events,
       |    CASE WHEN count(*) OVER wc = $width THEN sum(n_events) OVER wc END AS w7,
       |    CAST(dayofweek(day) + 1 AS BIGINT) AS dow
       |  FROM daily
       |  WINDOW wc AS (PARTITION BY event_type ORDER BY day
       |                ROWS BETWEEN $halfWidth PRECEDING AND $halfWidth FOLLOWING)
       |), seasonal AS (
       |  SELECT event_type, dow,
       |    CAST($width * sum(n_events) - sum(w7) AS DOUBLE)
       |      / (${width.toDouble} * count(*)) AS seasonal_raw
       |  FROM based WHERE w7 IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT b.event_type, b.day, b.n_events,
       |  round(CAST(w7 AS DOUBLE) / $width, 6) AS trend,
       |  CASE WHEN w7 IS NOT NULL THEN round(seasonal_raw, 6) END AS seasonal,
       |  CASE WHEN w7 IS NOT NULL THEN
       |    round(n_events - CAST(w7 AS DOUBLE) / $width - seasonal_raw, 6) END AS residual
       |FROM based b LEFT JOIN seasonal s
       |  ON s.event_type = b.event_type AND s.dow = b.dow
       |ORDER BY b.event_type, b.day""".stripMargin
  }
}
