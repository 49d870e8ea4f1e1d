package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Experimentation-statistics operators — the readouts an A/B
  * platform runs beside [[Analytics2.abTestOf]]'s z-test: small-sample
  * ranking with Wilson score intervals, CUPED variance reduction
  * (Deng et al. 2013, "Improving the Sensitivity of Online Controlled
  * Experiments"), and Benjamini–Hochberg FDR control over a family of
  * per-segment tests (Benjamini & Hochberg 1995). The reference
  * engine has no experimentation surface at all
  * (`/root/reference/v2/main.py` ends at word statistics); these are
  * the extension-surface analytics a 100 TB event store needs.
  *
  * Scale discipline shared by all three: the corpus-sized input
  * collapses in ONE map-side-combined keyed aggregate (user, part, or
  * brand); everything after — interval arithmetic, θ estimation, the
  * step-up walk — runs on the enum- or key-bounded aggregate, so the
  * shapes are unchanged at 1000 executors. No window appears
  * anywhere in the file: the BH rank is a triangular broadcast
  * self-count over the ≤|brands| rollup (the pack_shards discipline —
  * the repo bans unpartitioned windows with zero exemptions) and the
  * top-k is a TakeOrdered, not a rank column.
  */
object Experiment {

  private def dec(c: Column): Column = c.cast("decimal(18,0)")
  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  // ---------------------------------------------------- Wilson ranking

  /** Rank parts by RETURN RATE with a Wilson score lower bound
    * (Wilson 1927) — the "sort by rating" fix for sparse counts: a
    * part returned 1-of-1 times has p̂ = 1.0 but a wide interval, so
    * the naive rate ranking surfaces noise while the lower bound
    * demotes it below a 40-of-60 part. Per part: n lineitems, r with
    * `l_returnflag = 'R'`,
    *
    *   lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)
    *
    * computed from exact LONG counts so both engines evaluate the
    * identical double; ties on the 6dp-rounded bound break by partkey.
    * One partkey aggregate + TakeOrdered(k) — no join, no window, no
    * full sort; at 100 TB the candidate set is |parts|, never
    * |lineitems|, and the top-k heap never materializes the ranking.
    */
  def wilsonRankOf(lineitem: DataFrame, z: Double = 1.96,
      topK: Int = 100): DataFrame = {
    val agg = lineitem
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
    val nD = col("n").cast("double")
    val p = col("n_returned").cast("double") / nD
    val z2 = lit(z * z)
    val lb = (p + z2 / (lit(2.0) * nD) -
      lit(z) * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD)) /
      (lit(1.0) + z2 / nD)
    agg.select(col("l_partkey"), col("n"), col("n_returned"),
        round(p, 6).as("rate"), round(lb, 6).as("wilson_lb"))
      .orderBy(col("wilson_lb").desc, col("l_partkey"))
      .limit(topK)
  }

  def wilsonRank(t: Tables): DataFrame = wilsonRankOf(t.lineitem)

  def wilsonRankSql(z: Double = 1.96, topK: Int = 100): String =
    s"""WITH agg AS (
       |  SELECT l_partkey, count(*) AS n,
       |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_returned
       |  FROM lineitem GROUP BY 1
       |), w AS (
       |  SELECT l_partkey, n, n_returned,
       |    CAST(n_returned AS DOUBLE) / CAST(n AS DOUBLE) AS p,
       |    CAST(n AS DOUBLE) AS nd
       |  FROM agg
       |)
       |SELECT l_partkey, n, n_returned, round(p, 6) AS rate,
       |  round((p + ${z * z} / (2.0 * nd)
       |      - $z * sqrt((p * (1.0 - p) + ${z * z} / (4.0 * nd)) / nd))
       |    / (1.0 + ${z * z} / nd), 6) AS wilson_lb
       |FROM w
       |ORDER BY wilson_lb DESC, l_partkey LIMIT $topK""".stripMargin

  // ------------------------------------------------------------- CUPED

  /** CUPED-adjusted experiment readout (Deng et al. 2013): use each
    * user's PRE-period spend as the covariate that soaks up
    * between-user variance the treatment can't explain. The event
    * corpus spans one month; days [0, `preDays`) after the corpus min
    * day are the pre-period, the rest is the experiment window;
    * variant is the deterministic `user_id % 2` assignment shared
    * with [[Analytics2.abTestOf]]. Per user: x = pre-period cents,
    * y = experiment cents (0 when absent — CUPED keeps every user,
    * no selection on pre-activity). Then
    *
    *   θ = cov(x,y)/var(x),  y_adj = y − θ·(x − x̄),
    *   var(y_adj) = var(y) − 2θ·cov + θ²·var(x)
    *
    * with θ estimated POOLED (the standard choice — a per-variant θ
    * would bias the delta) and the variant means adjusted around the
    * global x̄. Every covariance/variance numerator is an exact
    * DECIMAL product of LONG cent sums (n·Σxy − Σx·Σy ~ 1e21 at
    * sf0.1-scale cents — past Long, inside DECIMAL(38)/HUGEINT), cast
    * to double once, divided in identical operand order in both
    * engines. Shape: one user-keyed aggregate over events, then a
    * 2-row variant rollup joined to a 1-row broadcast of the pooled
    * moments — nothing after the first aggregate scales with corpus.
    */
  def cupedOf(events: DataFrame, preDays: Int = 15): DataFrame = {
    val minDay = events.agg(min(to_date(col("ts"))).as("min_day"))
    val perUser = events
      .crossJoin(broadcast(minDay))
      .select(col("user_id"),
        when(datediff(to_date(col("ts")), col("min_day")) < preDays,
          round(col("value") * 100).cast("long")).otherwise(0L).as("xc"),
        when(datediff(to_date(col("ts")), col("min_day")) >= preDays,
          round(col("value") * 100).cast("long")).otherwise(0L).as("yc"))
      .groupBy(col("user_id"))
      .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
      .select((col("user_id") % 2).as("variant"), col("x"), col("y"))
    val pooled = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"))
    val byVariant = perUser.groupBy(col("variant")).agg(
      count(lit(1)).as("nv"), sum(col("x")).as("sxv"), sum(col("y")).as("syv"),
      sum(dec(col("x")) * dec(col("y"))).as("sxyv"),
      sum(dec(col("x")) * dec(col("x"))).as("sxxv"),
      sum(dec(col("y")) * dec(col("y"))).as("syyv"))
    // θ from pooled exact moments: numerator and denominator stay
    // DECIMAL until one double division
    val thNum = (d38(col("n")) * col("sxy") - d38(col("sx")) * d38(col("sy")))
      .cast("double")
    val thDen = (d38(col("n")) * col("sxx") - d38(col("sx")) * d38(col("sx")))
      .cast("double")
    val joined = byVariant.crossJoin(broadcast(pooled
      .select(col("n"), col("sx"),
        when(thDen =!= 0.0, thNum / thDen).as("theta"))))
    val nvD = col("nv").cast("double")
    def meanDollars(s: Column, n: Column) = s.cast("double") / n.cast("double") / 100.0
    // per-variant sample (co)variances from exact numerators; the
    // /10000 rescales cents² → dollars²
    def mom(sab: Column, sa: Column, sb: Column) =
      (d38(col("nv")) * sab - d38(sa) * d38(sb)).cast("double") /
        (nvD * (nvD - 1.0)) / 10000.0
    val varY = mom(col("syyv"), col("syv"), col("syv"))
    val varX = mom(col("sxxv"), col("sxv"), col("sxv"))
    val covV = mom(col("sxyv"), col("sxv"), col("syv"))
    val th = coalesce(col("theta"), lit(0.0))
    val meanAdj = meanDollars(col("syv"), col("nv")) -
      th * (meanDollars(col("sxv"), col("nv")) - meanDollars(col("sx"), col("n")))
    val varAdj = varY - lit(2.0) * th * covV + th * th * varX
    joined.select(col("variant"), col("nv").as("n_users"),
        round(meanDollars(col("syv"), col("nv")), 6).as("mean_y"),
        round(col("theta"), 6).as("theta"),
        round(meanAdj, 6).as("mean_y_adj"),
        when(col("nv") >= 2, round(varY, 6)).as("var_y"),
        when(col("nv") >= 2, round(varAdj, 6)).as("var_y_adj"),
        when(col("nv") >= 2 && varY =!= 0.0,
          round(lit(1.0) - varAdj / varY, 6)).as("var_reduction"))
      .orderBy("variant")
  }

  def cuped(t: Tables): DataFrame = cupedOf(t.events)

  def cupedSql(preDays: Int = 15): String =
    s"""WITH md AS (
       |  SELECT min(CAST(ts AS DATE)) AS min_day FROM events
       |), pu AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN date_diff('day', md.min_day, CAST(ts AS DATE)) < $preDays
       |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN date_diff('day', md.min_day, CAST(ts AS DATE)) >= $preDays
       |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
       |  FROM events CROSS JOIN md GROUP BY 1
       |), pv AS (
       |  SELECT user_id % 2 AS variant, x, y FROM pu
       |), pooled AS (
       |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx
       |  FROM pv
       |), th AS (
       |  SELECT n, sx,
       |    CASE WHEN CAST(CAST(n AS HUGEINT) * sxx
       |        - CAST(sx AS HUGEINT) * sx AS DOUBLE) <> 0.0 THEN
       |      CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
       |        / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |    END AS theta
       |  FROM pooled
       |), bv AS (
       |  SELECT variant, count(*) AS nv, CAST(sum(x) AS BIGINT) AS sxv,
       |    CAST(sum(y) AS BIGINT) AS syv,
       |    sum(CAST(x AS HUGEINT) * y) AS sxyv,
       |    sum(CAST(x AS HUGEINT) * x) AS sxxv,
       |    sum(CAST(y AS HUGEINT) * y) AS syyv
       |  FROM pv GROUP BY 1
       |), m AS (
       |  SELECT variant, nv, syv, theta,
       |    CAST(syv AS DOUBLE) / CAST(nv AS DOUBLE) / 100.0 AS mean_y,
       |    CAST(syv AS DOUBLE) / CAST(nv AS DOUBLE) / 100.0
       |      - coalesce(theta, 0.0)
       |        * (CAST(sxv AS DOUBLE) / CAST(nv AS DOUBLE) / 100.0
       |           - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0) AS mean_adj,
       |    CAST(CAST(nv AS HUGEINT) * syyv - CAST(syv AS HUGEINT) * syv AS DOUBLE)
       |      / (CAST(nv AS DOUBLE) * (CAST(nv AS DOUBLE) - 1.0)) / 10000.0 AS var_y,
       |    CAST(CAST(nv AS HUGEINT) * sxxv - CAST(sxv AS HUGEINT) * sxv AS DOUBLE)
       |      / (CAST(nv AS DOUBLE) * (CAST(nv AS DOUBLE) - 1.0)) / 10000.0 AS var_x,
       |    CAST(CAST(nv AS HUGEINT) * sxyv - CAST(sxv AS HUGEINT) * syv AS DOUBLE)
       |      / (CAST(nv AS DOUBLE) * (CAST(nv AS DOUBLE) - 1.0)) / 10000.0 AS cov_v
       |  FROM bv CROSS JOIN th
       |)
       |SELECT variant, nv AS n_users, round(mean_y, 6) AS mean_y,
       |  round(theta, 6) AS theta, round(mean_adj, 6) AS mean_y_adj,
       |  CASE WHEN nv >= 2 THEN round(var_y, 6) END AS var_y,
       |  CASE WHEN nv >= 2 THEN round(var_y
       |    - 2.0 * coalesce(theta, 0.0) * cov_v
       |    + coalesce(theta, 0.0) * coalesce(theta, 0.0) * var_x, 6)
       |  END AS var_y_adj,
       |  CASE WHEN nv >= 2 AND var_y <> 0.0 THEN round(1.0
       |    - (var_y - 2.0 * coalesce(theta, 0.0) * cov_v
       |       + coalesce(theta, 0.0) * coalesce(theta, 0.0) * var_x) / var_y, 6)
       |  END AS var_reduction
       |FROM m ORDER BY variant""".stripMargin

  // --------------------------------------------- Benjamini–Hochberg FDR

  /** Benjamini–Hochberg step-up over a FAMILY of per-brand return-rate
    * tests — the multiple-comparisons control an experimentation
    * platform applies when one readout fans into 25 segment tests and
    * "p < 0.05 somewhere" is guaranteed by chance. Per brand: the
    * two-proportion z of the brand's return rate against all OTHER
    * brands pooled, its two-sided p-value via the Abramowitz–Stegun
    * 26.2.17 normal-CDF polynomial (exp + Horner form written
    * identically in both engines; the repo's log/sqrt cross-engine
    * precedent), rounded to 8dp BEFORE any decision so a last-ulp
    * libm difference cannot flip a rejection. Then the step-up: rank
    * p ascending, crit_i = q·i/m, reject ranks ≤ max{i : p_i ≤
    * crit_i}. Shape: lineitem collapses in one brand-keyed aggregate
    * (the part join is planner-broadcast); the rank is a triangular
    * broadcast self-count over the ≤|brands| rollup — the repo bans
    * unpartitioned windows with ZERO exemptions (pack_shards set the
    * reformulation precedent), and with p_brand as the unique
    * tie-break the count of preceding-or-equal keys IS row_number;
    * the |brands|² pair space stays ≤ 625, size-invariant at 100 TB.
    */
  def bhFdrOf(lineitem: DataFrame, part: DataFrame, q: Double = 0.10): DataFrame = {
    val agg = lineitem
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
    val tot = agg.agg(sum(col("n")).as("nt"), sum(col("r")).as("rt"),
      count(lit(1)).as("m"))
    val withTot = agg.crossJoin(broadcast(tot))
    val nD = col("n").cast("double")
    val restN = (col("nt") - col("n")).cast("double")
    val p1 = col("r").cast("double") / nD
    val p2 = (col("rt") - col("r")).cast("double") / restN
    val pp = col("rt").cast("double") / col("nt").cast("double")
    val zc = (p1 - p2) /
      sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / nD + lit(1.0) / restN))
    // two-sided p via A&S 26.2.17: Φ(a) = 1 − φ(a)·poly(k), k = 1/(1+0.2316419a)
    val az = abs(zc)
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val pdf = exp(az * az * lit(-0.5)) / sqrt(lit(2.0 * math.Pi))
    val poly = k * (lit(0.319381530) + k * (lit(-0.356563782) +
      k * (lit(1.781477937) + k * (lit(-1.821255978) + k * lit(1.330274429)))))
    val pval = round(lit(2.0) * pdf * poly, 8)
    val tested = withTot.select(col("p_brand"), col("n"), col("r").as("n_returned"),
      round(p1, 6).as("rate"),
      when(col("n") > 0 && restN > 0.0 && pp > 0.0 && pp < 1.0, round(zc, 6))
        .as("z_score"),
      when(col("n") > 0 && restN > 0.0 && pp > 0.0 && pp < 1.0, pval)
        .as("p_value"),
      col("m"))
    // p_rank WITHOUT a window: count of keys preceding-or-equal in
    // (p_value ASC NULLS LAST, p_brand) order, via a triangular
    // BroadcastNestedLoopJoin of the ≤|brands| rollup against itself
    // — p_brand is unique, so the count is exactly row_number
    val other = tested.select(col("p_value").as("o_p"), col("p_brand").as("o_b"))
    val precedesOrEq =
      (col("o_p").isNotNull && (col("p_value").isNull ||
        col("o_p") < col("p_value") ||
        (col("o_p") === col("p_value") && col("o_b") <= col("p_brand")))) ||
      (col("o_p").isNull && col("p_value").isNull && col("o_b") <= col("p_brand"))
    val ranked = tested.join(broadcast(other), precedesOrEq)
      .groupBy(col("p_brand"), col("n"), col("n_returned"), col("rate"),
        col("z_score"), col("p_value"), col("m"))
      .agg(count(lit(1)).as("p_rank"))
      .withColumn("bh_crit",
        round(lit(q) * col("p_rank").cast("double") / col("m").cast("double"), 8))
    val cutoff = ranked
      .agg(max(when(col("p_value") <= col("bh_crit"), col("p_rank"))).as("i_star"))
    ranked.crossJoin(broadcast(cutoff))
      .select(col("p_brand"), col("n"), col("n_returned"), col("rate"),
        col("z_score"), col("p_value"), col("p_rank"), col("bh_crit"),
        (col("p_rank") <= coalesce(col("i_star"), lit(0))).as("rejected"))
      .orderBy("p_rank")
  }

  def bhFdr(t: Tables): DataFrame = bhFdrOf(t.lineitem, t.part)

  def bhFdrSql(q: Double = 0.10): String =
    s"""WITH agg AS (
       |  SELECT p.p_brand, count(*) AS n,
       |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
       |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |  GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(r) AS BIGINT) AS rt,
       |    count(*) AS m
       |  FROM agg
       |), z AS (
       |  SELECT p_brand, n, r, m,
       |    CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS p1,
       |    (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
       |      - CAST(rt - r AS DOUBLE) / CAST(nt - n AS DOUBLE))
       |      / sqrt((CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE))
       |        * (1.0 - CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE))
       |        * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nt - n AS DOUBLE))) AS zc,
       |    CAST(nt - n AS DOUBLE) AS rest_n,
       |    CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE) AS pp
       |  FROM agg CROSS JOIN tot
       |), pv AS (
       |  SELECT p_brand, n, r, m, p1, zc, rest_n, pp,
       |    round(2.0 * (exp(abs(zc) * abs(zc) * -0.5) / sqrt(2.0 * pi()))
       |      * ((1.0 / (1.0 + 0.2316419 * abs(zc)))
       |        * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(zc)))
       |          * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(zc)))
       |            * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(zc)))
       |              * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(zc)))
       |                * 1.330274429))))), 8) AS pval
       |  FROM z
       |), tested AS (
       |  SELECT p_brand, n, r AS n_returned, round(p1, 6) AS rate,
       |    CASE WHEN n > 0 AND rest_n > 0.0 AND pp > 0.0 AND pp < 1.0
       |      THEN round(zc, 6) END AS z_score,
       |    CASE WHEN n > 0 AND rest_n > 0.0 AND pp > 0.0 AND pp < 1.0
       |      THEN pval END AS p_value,
       |    m
       |  FROM pv
       |), ranked AS (
       |  SELECT p_brand, n, n_returned, rate, z_score, p_value,
       |    row_number() OVER (ORDER BY p_value ASC NULLS LAST, p_brand) AS p_rank,
       |    round($q * CAST(row_number() OVER (ORDER BY p_value ASC NULLS LAST,
       |      p_brand) AS DOUBLE) / CAST(m AS DOUBLE), 8) AS bh_crit
       |  FROM tested
       |), cutoff AS (
       |  SELECT max(CASE WHEN p_value <= bh_crit THEN p_rank END) AS i_star
       |  FROM ranked
       |)
       |SELECT p_brand, n, n_returned, rate, z_score, p_value, p_rank, bh_crit,
       |  p_rank <= coalesce(i_star, 0) AS rejected
       |FROM ranked CROSS JOIN cutoff ORDER BY p_rank""".stripMargin
}
