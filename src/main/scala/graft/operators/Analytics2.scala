package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Second tranche of warehouse-analytics shapes: closed-form trend
  * regression, deterministic A/B evaluation, churn cohorts, weighted
  * sampling without RNG state, and a Zipf-law fit over the corpus
  * vocabulary. Same scale discipline as [[Analytics]]: facts collapse
  * to small grids before any window, cut points and calendars ride
  * 1-row broadcasts, selection is TakeOrdered — never a global sort or
  * an unpartitioned window.
  */
object Analytics2 {

  // ----------------------------------------------------------- trend

  /** Yearly revenue trend per order priority as a closed-form OLS fit,
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²). The fact table collapses
    * to a (priority × year) grid of exact integer cents first, so every
    * regression sum is computed over LONGs (n·x·cents < 2⁶³) — the
    * float enters once, in the final division, making the fit
    * bit-identical across engines and partitionings. The reference's
    * closest shape is its per-corpus aggregate report
    * (v2/main.py:200-226); this is the dashboard "is revenue growing"
    * twin of [[Analytics.yoyGrowthOf]].
    */
  def trendOf(orders: DataFrame): DataFrame = {
    val yearly = orders
      .groupBy(col("o_orderpriority").as("priority"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    yearly
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_years"),
        sum(col("yr")).as("sx"),
        sum(col("cents")).as("sy"),
        sum(col("yr") * col("cents")).as("sxy"),
        sum(col("yr") * col("yr")).as("sxx"))
      .select(col("priority"), col("n_years"),
        // + 0.0 canonicalizes IEEE −0.0 (a flat series fits slope 0 and
        // the engines disagree on zero's sign); the when-guard makes a
        // single-year group read NULL instead of throwing under ANSI
        when(col("n_years") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("n_years") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n_years") * col("sxx") - col("sx") * col("sx")).cast("double") / 100, 4)
            + lit(0.0)).as("slope_per_year"),
        round(col("sy").cast("double") / col("n_years") / 100, 2).as("avg_revenue"))
      .orderBy("priority")
  }

  def trend(t: Tables): DataFrame = trendOf(t.orders)

  val trendSql: String =
    """WITH yearly AS (
      |  SELECT o_orderpriority AS priority, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2
      |), s AS (
      |  SELECT priority, count(*) AS n_years, sum(yr) AS sx, sum(cents) AS sy,
      |    sum(yr * cents) AS sxy, sum(yr * yr) AS sxx
      |  FROM yearly GROUP BY 1
      |)
      |SELECT priority, n_years,
      |  CASE WHEN n_years * sxx - sx * sx <> 0 THEN
      |    round(CAST(n_years * sxy - sx * sy AS DOUBLE)
      |      / CAST(n_years * sxx - sx * sx AS DOUBLE) / 100, 4) + 0.0 END AS slope_per_year,
      |  round(CAST(sy AS DOUBLE) / n_years / 100, 2) AS avg_revenue
      |FROM s ORDER BY priority""".stripMargin

  // --------------------------------------------------------- A/B test

  /** Two-proportion A/B evaluation with a deterministic assignment
    * (`user_id % 2` — the hash-bucket split every experimentation
    * system uses, minus the hash since user ids are already synthetic
    * uniforms). Exposure = any `view`; conversion = exposed AND any
    * high-value `purchase` (value > `minValue` — plain any-purchase
    * saturates at 100% on this corpus and zeroes the z denominator).
    * One user-keyed aggregate builds per-user flags; the variant
    * rollup is 2 rows; the z statistic
    * z = (p1−p0) / √(p̂(1−p̂)(1/n0+1/n1)) folds both rows into one via
    * conditional sums — no self-join, no window. All counts are exact
    * longs; doubles appear only in the final ratio arithmetic.
    */
  def abTestOf(events: DataFrame, minValue: Double = 90.0): DataFrame = {
    val perUser = events
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "view", 1).otherwise(0)).as("exposed"),
        max(when(col("event_type") === "purchase" && col("value") > minValue, 1)
          .otherwise(0)).as("purchased"))
      .filter(col("exposed") === 1)
      .select(pmod(col("user_id"), lit(2)).as("variant"), col("purchased"))
    perUser
      .groupBy()
      .agg(sum(when(col("variant") === 0, 1).otherwise(0)).as("n0"),
        sum(when(col("variant") === 0, col("purchased")).otherwise(0)).as("c0"),
        sum(when(col("variant") === 1, 1).otherwise(0)).as("n1"),
        sum(when(col("variant") === 1, col("purchased")).otherwise(0)).as("c1"))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        when(col("n0") > 0, round(col("c0").cast("double") / col("n0"), 6)).as("rate0"),
        when(col("n1") > 0, round(col("c1").cast("double") / col("n1"), 6)).as("rate1"),
        // guard: an empty variant or a saturated pooled rate (p̂ ∈
        // {0,1}) zeroes the denominator — NULL, not an ANSI /0 error
        when(col("n0") > 0 && col("n1") > 0 &&
            col("c0") + col("c1") > 0 && col("c0") + col("c1") < col("n0") + col("n1"),
          round(
            (col("c1").cast("double") / col("n1") - col("c0").cast("double") / col("n0")) /
              sqrt(((col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))) *
                (lit(1.0) - (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))) *
                (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4)).as("z_score"))
  }

  def abTest(t: Tables): DataFrame = abTestOf(t.events)

  def abTestSql(minValue: Double = 90.0): String =
    s"""WITH per_user AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
      |    max(CASE WHEN event_type = 'purchase' AND value > $minValue
      |      THEN 1 ELSE 0 END) AS purchased
      |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
      |), flags AS (
      |  SELECT user_id % 2 AS variant, purchased FROM per_user WHERE exposed = 1
      |), s AS (
      |  SELECT
      |    sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
      |    sum(CASE WHEN variant = 0 THEN purchased ELSE 0 END) AS c0,
      |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1,
      |    sum(CASE WHEN variant = 1 THEN purchased ELSE 0 END) AS c1
      |  FROM flags
      |)
      |SELECT CAST(n0 AS BIGINT) AS n0, CAST(c0 AS BIGINT) AS c0,
      |  CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
      |  CASE WHEN n0 > 0 THEN round(CAST(c0 AS DOUBLE) / n0, 6) END AS rate0,
      |  CASE WHEN n1 > 0 THEN round(CAST(c1 AS DOUBLE) / n1, 6) END AS rate1,
      |  CASE WHEN n0 > 0 AND n1 > 0 AND c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
      |    round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
      |      / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
      |           * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
      |           * (1.0 / n0 + 1.0 / n1)), 4) END AS z_score
      |FROM s""".stripMargin

  // ----------------------------------------------------------- churn

  /** Churn by engagement cohort: a user is churned when their last
    * event predates the corpus horizon by more than `graceDays`; the
    * cohort axis is activity level (distinct active days) — the "do
    * light users churn more" dashboard cut (the corpus spans one
    * month, so calendar cohorts would collapse to a single row). One
    * user-keyed aggregate produces (active_days, last_day); the
    * horizon is a 1-row broadcast; the rollup is ≤ |distinct activity
    * level| rows. The retention-dashboard companion to
    * [[Events.retention]]'s day-offset matrix.
    */
  def churnOf(events: DataFrame, graceDays: Int = 14): DataFrame = {
    val horizon = events.agg(max(to_date(col("ts"))).as("max_day"))
    events
      .groupBy(col("user_id"))
      .agg(countDistinct(to_date(col("ts"))).as("active_days"),
        max(to_date(col("ts"))).as("last_day"))
      .crossJoin(broadcast(horizon))
      .select(col("active_days"),
        when(datediff(col("max_day"), col("last_day")) > graceDays, 1).otherwise(0)
          .as("churned"))
      .groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("churned")).cast("long").as("n_churned"),
        round(sum(col("churned")).cast("double") / count(lit(1)), 6).as("churn_rate"))
      .orderBy("active_days")
  }

  def churn(t: Tables): DataFrame = churnOf(t.events)

  def churnSql(graceDays: Int = 14): String =
    s"""WITH u AS (
       |  SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS active_days,
       |    max(CAST(ts AS DATE)) AS last_day
       |  FROM events GROUP BY 1
       |), h AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events)
       |SELECT active_days, count(*) AS n_users,
       |  CAST(sum(CASE WHEN date_diff('day', last_day, max_day) > $graceDays
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       |  round(CAST(sum(CASE WHEN date_diff('day', last_day, max_day) > $graceDays
       |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS churn_rate
       |FROM u CROSS JOIN h GROUP BY 1 ORDER BY active_days""".stripMargin

  // ------------------------------------------------ weighted sampling

  /** Deterministic weight-proportional sampling (sequential Poisson /
    * Ohlsson): key = u / w with u a per-doc uniform derived from the
    * first 8 md5 hex digits of the doc id — P(key < t) = min(1, t·w),
    * so the k smallest keys are a weight-biased sample, and the whole
    * thing is one scan + TakeOrdered with zero RNG state to
    * coordinate across executors or engines. u is an exact 32-bit
    * integer over 2³², w an integer — one IEEE division each side, so
    * selection and output are bit-identical. The production use is
    * quality-weighted corpus subsampling; weight here is doc length.
    */
  /** The sequential-Poisson sample key u(id)/w — exposed so the
    * streaming running-sample gate scores rows with the exact same
    * expression (stream ≡ batch selection by construction).
    */
  def sampleKey(id: org.apache.spark.sql.Column, weight: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
    (h.cast("double") + 0.5) / 4294967296.0 / weight
  }

  def weightedSampleOf(documents: DataFrame, k: Int = 50): DataFrame = {
    documents
      // weight ≤ 0 means "never sample" — and guards the ANSI /0
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").as("weight"),
        sampleKey(col("doc_id"), col("n_chars")).as("key"))
      .orderBy(col("key"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("weight"), round(col("key") * 1e6, 6).as("key_ppm"))
      .orderBy("doc_id")
  }

  def weightedSample(t: Tables): DataFrame = weightedSampleOf(t.documents)

  def weightedSampleSql(k: Int = 50): String =
    s"""WITH keyed AS (
       |  SELECT doc_id, n_chars AS weight,
       |    ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |      + 0.5) / 4294967296.0) / n_chars AS key
       |  FROM documents WHERE n_chars > 0
       |), top AS (
       |  SELECT * FROM keyed ORDER BY key, doc_id LIMIT $k
       |)
       |SELECT doc_id, weight, round(key * 1e6, 6) AS key_ppm
       |FROM top ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- correlation matrix

  /** Pairwise Pearson correlations of lineitem's numeric measures in
    * ONE aggregate pass (all kernels are declarative aggregates, so
    * every pair's moments combine map-side in the same partial agg),
    * `stack`-pivoted to long form. 4dp rounding absorbs the
    * accumulation-order float noise, same as [[Relational2.qStats]].
    */
  def corrMatrixOf(lineitem: DataFrame): DataFrame = {
    val vars = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
      "l_discount" -> "discount", "l_tax" -> "tax")
    val pairs = for {
      (a, i) <- vars.zipWithIndex; (b, j) <- vars.zipWithIndex if i < j
    } yield (a, b)
    val aggs = pairs.map { case ((ac, an), (bc, bn)) =>
      round(corr(col(ac), col(bc)), 4).as(s"${an}_$bn")
    }
    val stackArgs = pairs
      .map { case ((_, an), (_, bn)) => s"'$an', '$bn', ${an}_$bn" }
      .mkString(", ")
    lineitem
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${pairs.size}, $stackArgs) as (var_a, var_b, r)"))
      .orderBy("var_a", "var_b")
  }

  def corrMatrix(t: Tables): DataFrame = corrMatrixOf(t.lineitem)

  val corrMatrixSql: String =
    """WITH m AS (
      |  SELECT
      |    round(corr(l_quantity, l_extendedprice), 4) AS qty_price,
      |    round(corr(l_quantity, l_discount), 4) AS qty_discount,
      |    round(corr(l_quantity, l_tax), 4) AS qty_tax,
      |    round(corr(l_extendedprice, l_discount), 4) AS price_discount,
      |    round(corr(l_extendedprice, l_tax), 4) AS price_tax,
      |    round(corr(l_discount, l_tax), 4) AS discount_tax
      |  FROM lineitem
      |)
      |SELECT var_a, var_b, r FROM (
      |  SELECT 'qty' AS var_a, 'price' AS var_b, qty_price AS r FROM m
      |  UNION ALL SELECT 'qty', 'discount', qty_discount FROM m
      |  UNION ALL SELECT 'qty', 'tax', qty_tax FROM m
      |  UNION ALL SELECT 'price', 'discount', price_discount FROM m
      |  UNION ALL SELECT 'price', 'tax', price_tax FROM m
      |  UNION ALL SELECT 'discount', 'tax', discount_tax FROM m
      |) ORDER BY var_a, var_b""".stripMargin

  // ------------------------------------------------- MAD outliers

  /** Robust outlier report per event type: median, MAD (median
    * absolute deviation), and the count beyond `k`·1.4826·MAD — the
    * outlier rule that, unlike 3σ, a few extreme values cannot drag.
    * Two grouped exact-percentile passes (groups are the bounded
    * event-type set — the unbounded-group path is the GK sketch,
    * gated at [[Relational2.qApproxPercentiles]]); the per-type
    * medians ride a broadcast join back over the fact scan.
    */
  def madOutliersOf(events: DataFrame, k: Double = 3.0): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withDev = events.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = withDev.groupBy(col("event_type"))
      .agg(first(col("med")).as("med"), expr("percentile(dev, 0.5)").as("mad"))
    withDev.drop("med")
      .join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 4).as("median_value"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(col("dev") > lit(k) * lit(1.4826) * col("mad"), 1).otherwise(0))
          .cast("long").as("n_outliers"))
      .orderBy("event_type")
  }

  def madOutliers(t: Tables): DataFrame = madOutliersOf(t.events)

  def madOutliersSql(k: Double = 3.0): String =
    s"""WITH med AS (
       |  SELECT event_type, quantile_cont(value, 0.5) AS med
       |  FROM events GROUP BY 1
       |), dev AS (
       |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
       |  FROM events e JOIN med m USING (event_type)
       |), mad AS (
       |  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
       |)
       |SELECT d.event_type, count(*) AS n,
       |  round(min(d.med), 4) AS median_value,
       |  round(min(a.mad), 4) AS mad,
       |  CAST(sum(CASE WHEN d.dev > $k * 1.4826 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_outliers
       |FROM dev d JOIN mad a USING (event_type)
       |GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------- per-group sampling

  /** Stratified weighted sampling as ONE aggregate: per source, the k
    * smallest sequential-Poisson keys held by the bounded-heap
    * [[graft.functions.TopKPairsAggregate]] (score = −key) — the
    * per-group form of [[weightedSampleOf]] with NO window and NO
    * per-group sort: state is ≤k pairs per group, partials merge
    * map-side, so a 10⁶-stratum corpus samples in a single
    * shuffle-by-source of heap buffers. The window form
    * (row_number over key) sorts every group member; this doesn't —
    * that is the 100 TB difference, same as [[Relational2.qTopKNative]].
    */
  def groupSampleOf(documents: DataFrame, k: Int = 5): DataFrame =
    documents
      .filter(col("n_chars") > 0)
      .select(col("source"), col("doc_id"),
        (-sampleKey(col("doc_id"), col("n_chars"))).as("negkey"))
      .groupBy(col("source"))
      .agg(graft.functions.TopKPairsAggregate
        .topkPairs(col("negkey"), col("doc_id"), k).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("source"), (col("i") + 1).cast("long").as("rank"),
        col("p.id").as("doc_id"), round(-col("p.score") * 1e6, 6).as("key_ppm"))
      .orderBy("source", "rank")

  def groupSample(t: Tables): DataFrame = groupSampleOf(t.documents)

  def groupSampleSql(k: Int = 5): String =
    s"""WITH keyed AS (
       |  SELECT source, doc_id,
       |    ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |      + 0.5) / 4294967296.0) / n_chars AS key
       |  FROM documents WHERE n_chars > 0
       |), ranked AS (
       |  SELECT source, doc_id, key,
       |    row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rank
       |  FROM keyed
       |)
       |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id,
       |  round(key * 1e6, 6) AS key_ppm
       |FROM ranked WHERE rank <= $k
       |ORDER BY source, rank""".stripMargin

  // ------------------------------------------- HLL cumulative rollup

  /** Cumulative distinct users by day via REAGGREGABLE HLL sketches
    * (Datasketches `hll_sketch_agg`/`hll_union_agg`): one sketch per
    * day, the expanding union folded over the ≤|days| daily sketches.
    * This is the production incremental-rollup shape that
    * [[Analytics.runningDistinctOf]]'s exact form cannot give you: a
    * day's sketch is built ONCE from that day's partition and every
    * later cumulative point reuses it — backfilling a new day never
    * re-reads history, and the same sketches roll up to week/month for
    * free. No DuckDB twin (sketch bytes are engine-specific) →
    * rows-only; the spec pins the estimate against the exact curve and
    * the union against the one-shot whole-corpus sketch.
    */
  def hllCumulativeOf(events: DataFrame, lgK: Int = 12): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
    daily
      .join(daily.select(col("day").as("d2"), col("sk").as("sk2")), col("d2") <= col("day"))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk2"), lit(false)))
        .cast("long").as("est_cum_users"))
      .orderBy("day")
  }

  def hllCumulative(t: Tables): DataFrame = hllCumulativeOf(t.events)

  /** The Datasketches-HLL cumulative estimate as a HASH-GATED verdict
    * grid (r12 sketch-family gate): per day, |est − exact| ≤ 5%·exact,
    * where the estimate is [[hllCumulativeOf]]'s own union-merged
    * sketch chain and the exact cumulative distinct comes from the
    * FIRST-SEEN histogram — per-user min day (one user-keyed
    * aggregate), day-grid histogram of first appearances, grid-sized
    * triangular prefix join — never a day×events blowup. lgK=12 reads
    * ~1.6% relative error, so the 5% gate has 3× headroom while still
    * catching a broken union (which reads ~n_days× high) or a
    * mis-merged sketch. Oracle re-derives the expected day grid.
    */
  def hllGate(t: Tables, lgK: Int = 12, tol: Double = 0.05): DataFrame = {
    val est = hllCumulativeOf(t.events, lgK)
    val daily = t.events.select(to_date(col("ts")).as("day"), col("user_id"))
    val firstSeen = daily.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      .groupBy(col("first_day")).agg(count(lit(1)).as("n_new"))
    val exact = daily.select(col("day")).distinct()
      .join(firstSeen, col("first_day") <= col("day"))
      .groupBy(col("day")).agg(sum(col("n_new")).as("exact_cum"))
    est.join(exact, "day")
      .select(col("day"),
        (abs(col("est_cum_users") - col("exact_cum")).cast("double") <=
          lit(tol) * col("exact_cum").cast("double")).as("within_tol"))
      .orderBy("day")
  }

  val hllGateSql: String =
    """SELECT DISTINCT CAST(ts AS DATE) AS day, true AS within_tol
      |FROM events ORDER BY day""".stripMargin

  // ------------------------------------------------------- Zipf fit

  /** Zipf-law fit over the corpus vocabulary: OLS slope of ln(freq) on
    * ln(rank) for the top `topN` words — the classic corpus-health
    * check (natural text ≈ −1; generated/boilerplate corpora drift).
    * Top-N selection is TakeOrdered on (freq desc, word); rank is then
    * a triangular self-join over those ≤topN rows (the repo bans
    * unpartitioned windows even on small frames — the join states the
    * bound explicitly). ln enters only per-retained-row, and the 4dp
    * rounding absorbs last-ulp libm differences across engines.
    */
  def zipfFitOf(tokens: DataFrame, topN: Int = 200): DataFrame = {
    val top = tokens
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(topN)
    val ranked = top.as("a")
      .join(top.select(col("freq").as("f2"), col("word").as("w2")).as("b"),
        col("f2") > col("freq") || (col("f2") === col("freq") && col("w2") < col("word")),
        "left")
      .groupBy(col("word"), col("freq"))
      .agg((count(col("w2")) + 1).cast("double").as("rank"))
      .select(log(col("rank")).as("x"), log(col("freq").cast("double")).as("y"))
    ranked
      .groupBy()
      .agg(count(lit(1)).as("n_words"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n_words"),
        // when-guard: a 1-word vocabulary has a degenerate fit → NULL,
        // not an ANSI /0 error; + 0.0 canonicalizes −0.0
        when(col("n_words") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("n_words") * col("sxy") - col("sx") * col("sy")) /
            (col("n_words") * col("sxx") - col("sx") * col("sx")), 4) + lit(0.0))
          .as("zipf_slope"),
        when(col("n_words") * col("sxx") - col("sx") * col("sx") =!= 0,
          round((col("sy") - (col("n_words") * col("sxy") - col("sx") * col("sy")) /
            (col("n_words") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
            col("n_words"), 4)).as("intercept"))
  }

  def zipfFit(t: Tables): DataFrame = zipfFitOf(WordPipeline.tokens(t))

  def zipfFitSql(topN: Int = 200): String =
    s"""${WordPipeline.tokensCte}, freqs AS (
       |  SELECT word, count(*) AS freq FROM toks WHERE word <> '' GROUP BY 1
       |  ORDER BY freq DESC, word LIMIT $topN
       |), pts AS (
       |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, word) AS DOUBLE)) AS x,
       |    ln(CAST(freq AS DOUBLE)) AS y
       |  FROM freqs
       |), s AS (
       |  SELECT count(*) AS n_words, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM pts
       |)
       |SELECT n_words,
       |  CASE WHEN n_words * sxx - sx * sx <> 0 THEN
       |    round((n_words * sxy - sx * sy) / (n_words * sxx - sx * sx), 4) + 0.0 END AS zipf_slope,
       |  CASE WHEN n_words * sxx - sx * sx <> 0 THEN
       |    round((sy - (n_words * sxy - sx * sy) / (n_words * sxx - sx * sx) * sx)
       |      / n_words, 4) END AS intercept
       |FROM s""".stripMargin

  // ------------------------------------------------- survival curve

  /** Kaplan–Meier survival curve of time-to-conversion — the
    * right-censoring-aware upgrade of [[churnOf]]'s point rates:
    * "survival time" = days from a user's first activity to their
    * first HIGH-VALUE purchase (value > `minValue`); users who never
    * convert are CENSORED at the observation horizon — they feed the
    * at-risk denominators for as long as they were observed but never
    * the event counts, which is the entire reason K-M beats a naive
    * converted/total ratio (that ratio is biased low while the study
    * is still running).
    *
    *   S(tᵢ) = Π_{j ≤ i} (1 − dⱼ/nⱼ),  nⱼ = #{observed time ≥ tⱼ}
    *
    * Scale shape: per-user collapse (one groupBy over the fact
    * table), then everything runs on the ≤|distinct durations| table
    * (bounded by observation days, not corpus size): at-risk counts
    * and the product-limit both ride TRIANGULAR self-joins of that
    * tiny table (the giniOf/pack_shards policy — a global window here
    * would be Exchange SinglePartition, banned repo-wide by
    * PlanAuditSpec even when today's input is small), with the
    * product as exp∘Σlog plus an any-zero min guard instead of ln 0.
    * No window, no single-partition exchange, nothing fact-sized past
    * the first groupBy.
    */
  def survivalOf(events: DataFrame, minValue: Double = 90.0): DataFrame = {
    val horizon = events.agg(max(to_date(col("ts"))).as("max_day"))
    val users = events
      .groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("first_day"),
        to_date(min(when(col("event_type") === "purchase" && col("value") > minValue,
          col("ts")))).as("conv_day"))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("conv_day").isNotNull, datediff(col("conv_day"), col("first_day")))
          .otherwise(datediff(col("max_day"), col("first_day")))
          .cast("long").as("dur"),
        col("conv_day").isNotNull.cast("long").as("ev"))
    val byDur = users.groupBy(col("dur"))
      .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d"))
    // n_risk(t) = Σ_{dur ≥ t} n_at — triangular join on the tiny table
    val risk = byDur.as("a")
      .join(broadcast(byDur.select(col("dur").as("bd"), col("n_at").as("bn"))),
        col("bd") >= col("a.dur"))
      .groupBy(col("a.dur").as("dur"), col("a.d").as("d"))
      .agg(sum(col("bn")).as("n_risk"))
      .filter(col("d") > 0)
      .withColumn("frac", lit(1.0) - col("d").cast("double") / col("n_risk"))
    // S(t) = Π_{t' ≤ t} frac — second triangular join, exp∘Σlog form
    risk.as("x")
      .join(broadcast(risk.select(col("dur").as("pd"), col("frac").as("pf"))),
        col("pd") <= col("x.dur"))
      .groupBy(col("x.dur").as("lifetime_days"), col("x.n_risk").as("n_risk"),
        col("x.d").as("d_churned"))
      .agg(min(col("pf")).as("minf"), sum(log(col("pf"))).as("slog"))
      .select(col("lifetime_days"), col("n_risk"), col("d_churned"),
        round(when(col("minf") === 0.0, lit(0.0)).otherwise(exp(col("slog"))), 6)
          .as("survival"))
      .orderBy("lifetime_days")
  }

  def survival(t: Tables): DataFrame = survivalOf(t.events)

  def survivalSql(minValue: Double = 90.0): String =
    s"""WITH u AS (
       |  SELECT user_id, CAST(min(ts) AS DATE) AS first_day,
       |    CAST(min(CASE WHEN event_type = 'purchase' AND value > $minValue THEN ts END) AS DATE) AS conv_day
       |  FROM events GROUP BY 1
       |), h AS (SELECT CAST(max(ts) AS DATE) AS max_day FROM events),
       |d AS (
       |  SELECT CASE WHEN conv_day IS NOT NULL THEN date_diff('day', first_day, conv_day)
       |              ELSE date_diff('day', first_day, max_day) END AS dur,
       |    CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END AS ev
       |  FROM u CROSS JOIN h
       |), bydur AS (
       |  SELECT dur, count(*) AS n_at, CAST(sum(ev) AS BIGINT) AS d FROM d GROUP BY 1
       |), risk AS (
       |  SELECT a.dur, a.d, CAST(sum(b.n_at) AS BIGINT) AS n_risk
       |  FROM bydur a JOIN bydur b ON b.dur >= a.dur
       |  GROUP BY a.dur, a.d
       |), ev AS (
       |  SELECT dur, n_risk, d, 1.0 - CAST(d AS DOUBLE) / n_risk AS frac
       |  FROM risk WHERE d > 0
       |)
       |SELECT x.dur AS lifetime_days, x.n_risk, x.d AS d_churned,
       |  round(CASE WHEN min(y.frac) = 0.0 THEN 0.0 ELSE exp(sum(ln(y.frac))) END, 6) AS survival
       |FROM ev x JOIN ev y ON y.dur <= x.dur
       |GROUP BY x.dur, x.n_risk, x.d
       |ORDER BY lifetime_days""".stripMargin
}
