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
  // ------------------------------------------------------ SRM check

  /** Sample-ratio-mismatch gate (Fabijan et al. 2019's "most useful
    * A/B diagnostic"): before reading ANY experiment metric, test the
    * observed variant split of exposed users against the designed
    * 50/50 with a 1-df chi-square. With two equal-expected cells the
    * statistic collapses to chi2 = (n0 - n1)^2 / n (exact LONG
    * difference squared in DECIMAL, one double division) and its
    * p-value is the two-sided normal tail of z = sqrt(chi2) - the
    * shared Abramowitz-Stegun 26.2.17 polynomial, identical Horner
    * form both engines, rounded to 8dp BEFORE the p < alpha alarm
    * decision (the [[bhFdrOf]] discipline - a last-ulp libm split
    * cannot flip the flag). Exposure = any `view`, assignment =
    * `user_id % 2`, both shared with [[Analytics2.abTestOf]] so the
    * gate audits exactly the population the readout uses. Shape: one
    * user-keyed aggregate collapses the corpus; everything after is a
    * 1-row fold - size-invariant at 100 TB.
    */
  def srmCheckOf(events: DataFrame, alpha: Double = 0.001): DataFrame = {
    val exposed = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(lit(1).as("one"))
    val s = exposed.agg(
      sum(when(pmod(col("user_id"), lit(2)) === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L)).as("n1"))
    val n = col("n0") + col("n1")
    val chi2 = (dec(col("n0") - col("n1")) * dec(col("n0") - col("n1")))
      .cast("double") / n.cast("double")
    val az = sqrt(chi2)
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val pdf = exp(az * az * lit(-0.5)) / sqrt(lit(2.0 * math.Pi))
    val poly = k * (lit(0.319381530) + k * (lit(-0.356563782) +
      k * (lit(1.781477937) + k * (lit(-1.821255978) + k * lit(1.330274429)))))
    val pval = round(lit(2.0) * pdf * poly, 8)
    s.select(col("n0"), col("n1"), n.as("n"),
      when(n > 0, round(chi2, 6)).as("chi2"),
      when(n > 0, pval).as("p_value"),
      when(n > 0, pval < alpha).as("srm_detected"))
  }

  def srmCheck(t: Tables): DataFrame = srmCheckOf(t.events)

  def srmCheckSql(alpha: Double = 0.001): String =
    s"""WITH eu AS (
       |  SELECT user_id FROM events WHERE event_type = 'view' GROUP BY 1
       |), s AS (
       |  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
       |  FROM eu
       |), c AS (
       |  SELECT n0, n1, n0 + n1 AS n,
       |    CAST(CAST(n0 - n1 AS HUGEINT) * (n0 - n1) AS DOUBLE)
       |      / CAST(n0 + n1 AS DOUBLE) AS chi2
       |  FROM s
       |), z AS (
       |  SELECT n0, n1, n, chi2, sqrt(chi2) AS az FROM c
       |), p AS (
       |  SELECT n0, n1, n, chi2,
       |    round(2.0 * (exp(az * az * -0.5) / sqrt(2.0 * pi()))
       |      * ((1.0 / (1.0 + 0.2316419 * az))
       |        * (0.319381530 + (1.0 / (1.0 + 0.2316419 * az))
       |          * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * az))
       |            * (1.781477937 + (1.0 / (1.0 + 0.2316419 * az))
       |              * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * az))
       |                * 1.330274429))))), 8) AS pval
       |  FROM z
       |)
       |SELECT n0, n1, n,
       |  CASE WHEN n > 0 THEN round(chi2, 6) END AS chi2,
       |  CASE WHEN n > 0 THEN pval END AS p_value,
       |  CASE WHEN n > 0 THEN pval < $alpha END AS srm_detected
       |FROM p""".stripMargin

  // --------------------------------------------- difference-in-differences

  /** Difference-in-differences readout (Card & Krueger 1994's
    * two-period panel form): each user is their own control - the
    * per-user delta d = post-period cents - pre-period cents absorbs
    * all time-invariant user heterogeneity, and the estimate is the
    * two-sample contrast mean(d | treated) - mean(d | control) with
    * its Welch standard error. Periods split at `preDays` after the
    * corpus min day and variant is `user_id % 2`, both shared with
    * [[cupedOf]] (DiD is the estimator you reach for when the
    * parallel-trends assumption holds but the pre-period metric is
    * the outcome itself, where CUPED needs a correlated covariate).
    * d folds in ONE signed sum per user (post +, pre -); variances
    * ride exact DECIMAL/HUGEINT n*sum(d^2) - (sum d)^2 numerators cast to
    * double once ([[cupedOf]]'s moment discipline). Shape: one
    * user-keyed aggregate, then a 1-row conditional-sum fold - no
    * second shuffle, size-invariant at 100 TB.
    */
  def diffInDiffOf(events: DataFrame, preDays: Int = 15): DataFrame = {
    val minDay = events.agg(min(to_date(col("ts"))).as("min_day"))
    val cents = round(col("value") * 100).cast("long")
    val perUser = events
      .crossJoin(broadcast(minDay))
      .select(col("user_id"),
        when(datediff(to_date(col("ts")), col("min_day")) >= preDays, cents)
          .otherwise(-cents).as("dc"))
      .groupBy(col("user_id")).agg(sum(col("dc")).as("d"))
      .select(pmod(col("user_id"), lit(2)).as("variant"), col("d"))
    val s = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 0, col("d")).otherwise(0L)).as("sd0"),
      sum(when(col("variant") === 0, dec(col("d")) * dec(col("d")))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("sdd0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 1, col("d")).otherwise(0L)).as("sd1"),
      sum(when(col("variant") === 1, dec(col("d")) * dec(col("d")))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("sdd1"))
    def mean(sd: Column, nc: Column) = sd.cast("double") / nc.cast("double") / 100.0
    def variance(nc: Column, sd: Column, sdd: Column) =
      (d38(nc) * sdd - d38(sd) * d38(sd)).cast("double") /
        (nc.cast("double") * (nc.cast("double") - 1.0)) / 10000.0
    val m0 = mean(col("sd0"), col("n0"))
    val m1 = mean(col("sd1"), col("n1"))
    val v0 = variance(col("n0"), col("sd0"), col("sdd0"))
    val v1 = variance(col("n1"), col("sd1"), col("sdd1"))
    val seSq = v0 / col("n0").cast("double") + v1 / col("n1").cast("double")
    s.select(col("n0"), col("n1"),
      when(col("n0") > 0, round(m0, 6)).as("mean_delta0"),
      when(col("n1") > 0, round(m1, 6)).as("mean_delta1"),
      when(col("n0") > 0 && col("n1") > 0, round(m1 - m0, 6)).as("did"),
      when(col("n0") >= 2 && col("n1") >= 2, round(sqrt(seSq), 6)).as("se"),
      when(col("n0") >= 2 && col("n1") >= 2 && seSq > 0.0,
        round((m1 - m0) / sqrt(seSq), 4)).as("t_stat"))
  }

  def diffInDiff(t: Tables): DataFrame = diffInDiffOf(t.events)

  def diffInDiffSql(preDays: Int = 15): String =
    s"""WITH md AS (
       |  SELECT min(CAST(ts AS DATE)) AS min_day FROM events
       |), pu AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN date_diff('day', md.min_day, CAST(ts AS DATE)) >= $preDays
       |      THEN CAST(round(value * 100) AS BIGINT)
       |      ELSE -CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS d
       |  FROM events CROSS JOIN md GROUP BY 1
       |), s AS (
       |  SELECT
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN d ELSE 0 END) AS BIGINT) AS sd0,
       |    sum(CASE WHEN user_id % 2 = 0 THEN CAST(d AS HUGEINT) * d ELSE 0 END) AS sdd0,
       |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN d ELSE 0 END) AS BIGINT) AS sd1,
       |    sum(CASE WHEN user_id % 2 = 1 THEN CAST(d AS HUGEINT) * d ELSE 0 END) AS sdd1
       |  FROM pu
       |), m AS (
       |  SELECT n0, n1,
       |    CAST(sd0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0 AS m0,
       |    CAST(sd1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS m1,
       |    CAST(CAST(n0 AS HUGEINT) * sdd0 - CAST(sd0 AS HUGEINT) * sd0 AS DOUBLE)
       |      / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)) / 10000.0 AS v0,
       |    CAST(CAST(n1 AS HUGEINT) * sdd1 - CAST(sd1 AS HUGEINT) * sd1 AS DOUBLE)
       |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) / 10000.0 AS v1
       |  FROM s
       |)
       |SELECT n0, n1,
       |  CASE WHEN n0 > 0 THEN round(m0, 6) END AS mean_delta0,
       |  CASE WHEN n1 > 0 THEN round(m1, 6) END AS mean_delta1,
       |  CASE WHEN n0 > 0 AND n1 > 0 THEN round(m1 - m0, 6) END AS did,
       |  CASE WHEN n0 >= 2 AND n1 >= 2
       |    THEN round(sqrt(v0 / n0 + v1 / n1), 6) END AS se,
       |  CASE WHEN n0 >= 2 AND n1 >= 2 AND v0 / n0 + v1 / n1 > 0.0
       |    THEN round((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 4) END AS t_stat
       |FROM m""".stripMargin

  // ------------------------------------------------------- power / MDE

  /** Per-segment minimum-detectable-effect audit - the power table an
    * experimentation platform publishes so a reader knows WHICH
    * segment readouts are trustworthy: a 2,000-row brand can only
    * detect a ~6pp rate move at the standard alpha = 0.05 two-sided /
    * 80%-power design, so a "no effect in Brand#31" cell is
    * uninformative for smaller effects. Per brand (the [[bhFdrOf]]
    * family axis): baseline rate p from exact LONG counts, and the
    * two-arm MDE
    *
    *   mde = (z_alpha/2 + z_beta) * sqrt(2 p (1-p) / (n/2))
    *
    * with z constants inlined to 9dp as shared literals
    * (1.959963985 + 0.841621234 = the canonical 2.801585219
    * multiplier) - the planning assumption is the segment's n split
    * across two equal arms. `powered_5pp` decides on the 6dp-ROUNDED
    * mde (the boundary-decision discipline). Degenerate segments
    * (n < 2, rate 0 or 1) read NULL - no power statement exists.
    * Shape: lineitem collapses in one brand-keyed aggregate with the
    * planner-broadcast part join; the MDE arithmetic rides the
    * <=|brands| rollup - size-invariant at 100 TB.
    */
  def powerMdeOf(lineitem: DataFrame, part: DataFrame,
      threshold: Double = 0.05): DataFrame = {
    val agg = lineitem
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
    val nD = col("n").cast("double")
    val p = col("r").cast("double") / nD
    val mde = lit(2.801585219) * sqrt(lit(2.0) * p * (lit(1.0) - p) / (nD / 2.0))
    val ok = col("n") >= 2 && col("r") > 0 && col("r") < col("n")
    agg.select(col("p_brand"), col("n"), col("r").as("n_returned"),
        round(p, 6).as("rate"),
        when(ok, round(mde, 6)).as("mde_abs"),
        when(ok && p > 0.0, round(mde / p, 6)).as("mde_rel"),
        when(ok, round(mde, 6) <= threshold).as("powered_5pp"))
      .orderBy("p_brand")
  }

  def powerMde(t: Tables): DataFrame = powerMdeOf(t.lineitem, t.part)

  def powerMdeSql(threshold: Double = 0.05): String =
    s"""WITH agg AS (
       |  SELECT p.p_brand, count(*) AS n,
       |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
       |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |  GROUP BY 1
       |), g AS (
       |  SELECT p_brand, CAST(n AS BIGINT) AS n, r,
       |    CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       |    CASE WHEN n >= 2 AND r > 0 AND r < n THEN
       |      2.801585219 * sqrt(2.0 * (CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
       |        * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
       |        / (CAST(n AS DOUBLE) / 2.0))
       |    END AS mde
       |  FROM agg
       |)
       |SELECT p_brand, n, r AS n_returned, round(rate, 6) AS rate,
       |  round(mde, 6) AS mde_abs,
       |  CASE WHEN mde IS NOT NULL AND rate > 0.0
       |    THEN round(mde / rate, 6) END AS mde_rel,
       |  CASE WHEN mde IS NOT NULL THEN round(mde, 6) <= $threshold END AS powered_5pp
       |FROM g ORDER BY p_brand""".stripMargin
}
