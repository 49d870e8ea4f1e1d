package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Third tranche of warehouse-statistics shapes: Benford first-digit
  * conformance, a chi-square independence test, dense-series
  * autocorrelation, population-stability (PSI) drift per source, and a
  * Gini concentration coefficient. The reference's closest surface is
  * its per-corpus aggregate report (v2/main.py:200-226); these are the
  * data-quality / drift screens a training-data pipeline runs over the
  * same aggregates. Scale discipline as [[Analytics2]]: every operator
  * collapses the fact table to an enum- or grid-sized aggregate before
  * any join; sums that feed a statistic stay exact (LONG or
  * DECIMAL(38,0)) until the final division; non-equi joins only ever
  * touch value tables bounded by distinct small-int counts.
  */
object Analytics3 {

  // --------------------------------------------------------- Benford

  /** First-significant-digit distribution of order totals vs Benford's
    * law — the classic synthetic-data / fraud screen. The digit is
    * extracted EXACTLY: price → integer cents (`round(p*100)` as LONG)
    * → first character of its decimal representation, so no
    * `floor(log10(x))` float boundary can disagree across engines.
    * One map-side-combined ≤9-group aggregate; the 1-row total joins
    * back by broadcast; digits with zero support still appear (dense
    * 1-9 grid via `sequence`). Expected rate log10(1+1/d) and the
    * per-digit chi-square contribution (n − Np)²/(Np) are doubles only
    * in the final expression, rounded well above ulp jitter.
    */
  def benfordOf(orders: DataFrame): DataFrame = {
    // abs BEFORE the string split: a negative amount (refund) would
    // otherwise put "-" in position 1 and the cast back to long throws
    // under ANSI before the 1-9 filter can drop the row. Benford runs
    // on magnitudes; zero amounts yield digit 0 and fall to the filter.
    val counts = orders
      .select(substring(abs(round(col("o_totalprice") * 100).cast("long")).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit").agg(count(lit(1)).as("n_orders"))
    val total = counts.agg(sum(col("n_orders")).as("n_total"))
    val grid = counts.sparkSession.range(1, 10).select(col("id").as("digit"))
    grid.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n_orders"),
        round(col("n_orders").cast("double") / col("n_total"), 6).as("obs_rate"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford_rate"),
        round(pow(col("n_orders").cast("double") -
            col("n_total") * log10(lit(1.0) + lit(1.0) / col("digit")), 2) /
          (col("n_total") * log10(lit(1.0) + lit(1.0) / col("digit"))), 4).as("chi2_part"))
      .orderBy("digit")
  }

  def benford(t: Tables): DataFrame = benfordOf(t.orders)

  val benfordSql: String =
    """WITH counts AS (
      |  SELECT CAST(substr(CAST(abs(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |    count(*) AS n_orders
      |  FROM orders
      |  WHERE CAST(substr(CAST(abs(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) BETWEEN 1 AND 9
      |  GROUP BY 1
      |), total AS (SELECT sum(n_orders) AS n_total FROM counts),
      |grid AS (SELECT unnest(generate_series(1, 9)) AS digit)
      |SELECT g.digit, coalesce(c.n_orders, 0) AS n_orders,
      |  round(CAST(coalesce(c.n_orders, 0) AS DOUBLE) / n_total, 6) AS obs_rate,
      |  round(log10(1.0 + 1.0 / g.digit), 6) AS benford_rate,
      |  round(pow(CAST(coalesce(c.n_orders, 0) AS DOUBLE)
      |      - n_total * log10(1.0 + 1.0 / g.digit), 2)
      |    / (n_total * log10(1.0 + 1.0 / g.digit)), 4) AS chi2_part
      |FROM grid g LEFT JOIN counts c ON c.digit = g.digit CROSS JOIN total
      |ORDER BY 1""".stripMargin

  // ------------------------------------------- chi-square independence

  /** Chi-square test of independence between event type and day of
    * week — "does behavior depend on the weekday". Uses the identity
    * χ² = N·Σ_cells O²/(R·C) − N, which needs only OBSERVED cells (a
    * zero cell contributes nothing to the sum), so the dense expected
    * grid never materializes. The contingency table collapses at the
    * scan (one ≤|types|×7-group map-side-combined aggregate); margins
    * and N are re-aggregates of that tiny grid, joined back by
    * broadcast. Counts stay LONG; doubles enter in the per-cell ratio
    * O²/(R·C) whose ~35-term sum is ulp-safe at the 4-decimal round.
    */
  def chiSquareOf(events: DataFrame): DataFrame = {
    val cells = events
      .groupBy(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
    val colTot = cells.groupBy("dow").agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("event_type")).as("n_types"),
      countDistinct(col("dow")).as("n_dows"))
    // the double cast happens BEFORE the products: o*o and r*c as LONG
    // overflow (ANSI throw) once a cell passes ~3e9 events — exactly
    // the 100 TB shape this doc targets — while DuckDB's HUGEINT
    // margins would survive and the engines would diverge
    cells
      .join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "dow")
      .agg(sum(col("o").cast("double") * col("o") /
        (col("r").cast("double") * col("c"))).as("s"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("n_types"), col("n_dows"),
        // empty input has countDistinct 0 on both axes; (-1)*(-1) would
        // read dof = 1 for a test that never ran — degrade to NULL
        when(col("n_types") > 0 && col("n_dows") > 0,
          (col("n_types") - 1) * (col("n_dows") - 1)).as("dof"),
        round(col("n") * col("s") - col("n"), 4).as("chi2"))
  }

  def chiSquare(t: Tables): DataFrame = chiSquareOf(t.events)

  val chiSquareSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, count(*) AS o
      |  FROM events GROUP BY 1, 2
      |), rt AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT dow, sum(o) AS c FROM cells GROUP BY 1),
      |n AS (SELECT sum(o) AS n, count(DISTINCT event_type) AS n_types,
      |        count(DISTINCT dow) AS n_dows FROM cells),
      |s AS (
      |  SELECT sum(CAST(cells.o AS DOUBLE) * cells.o / (CAST(rt.r AS DOUBLE) * ct.c)) AS s
      |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
      |)
      |SELECT CAST(n.n AS BIGINT) AS n, n.n_types, n.n_dows,
      |  CASE WHEN n.n_types > 0 AND n.n_dows > 0
      |    THEN CAST((n.n_types - 1) * (n.n_dows - 1) AS BIGINT) END AS dof,
      |  round(n.n * s.s - n.n, 4) AS chi2
      |FROM s CROSS JOIN n""".stripMargin

  // --------------------------------------------------- autocorrelation

  /** Lag-k autocorrelation of the dense hourly event series, per event
    * type — the "is traffic periodic / self-similar" screen behind
    * capacity planning and anomaly thresholds. Runs on the SAME
    * gap-filled grid as `q_events_gapfill` ([[Events.denseHourlyOf]]):
    * an hour with no events is a 0 in the series, not a missing row —
    * skipping gaps inflates r. The grid is span×|types| rows however
    * big the corpus is, so the lag self-join (on hour+k within type)
    * and the stats aggregate are grid-sized. Estimator:
    * r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², expanded so every sum is
    * exact — LONG for plain counts (Σx, head/tail sums), DECIMAL for
    * the products Σx_t·x_{t+k} and Σx²: operands cast to
    * DECIMAL(18,0), so each product is DECIMAL(37,0) and the sums
    * accumulate at DECIMAL(38,0) max width (the [[giniOf]] policy:
    * LONG products overflow at sustained ~4e9 events/hour); μ and the
    * division are the only doubles. The oracle mirrors the same
    * overflow point by riding its product sums on HUGEINT — a plain
    * BIGINT product there would overflow BEFORE Spark's decimal path,
    * the exact engine divergence the [[chiSquare]] comment warns
    * about. A constant series (zero variance) reads NULL, not an ANSI
    * /0 error.
    */
  def autocorrOf(events: DataFrame, maxLag: Int = 3): DataFrame = {
    // products of hourly counts ride DECIMAL (the giniOf policy): at
    // sustained ~4e9 events/hour a LONG n·n or a year-long sum of
    // products overflows (ANSI throw) where the oracle's HUGEINT doesn't
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val dense = Events.denseHourlyOf(events)
    val stats = dense.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("n_events")).as("sx"),
        sum(dec(col("n_events")) * dec(col("n_events"))).as("sxx"))
    val perLag = (1 to maxLag).map { k =>
      dense.as("a")
        .join(dense.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.hour") === col("a.hour") + expr(s"INTERVAL $k HOUR"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.n_events").cast("decimal(18,0)") *
            col("b.n_events").cast("decimal(18,0)")).as("p"),
          sum(col("a.n_events")).as("sh"),
          sum(col("b.n_events")).as("st"))
        .withColumn("lag", lit(k.toLong))
    }.reduce(_ unionByName _)
    perLag.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("lag"), col("n_pairs"),
        when(col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n") =!= 0.0,
          round(
            (col("p").cast("double")
              - (col("sx").cast("double") / col("n")) * (col("sh") + col("st"))
              + col("n_pairs") * pow(col("sx").cast("double") / col("n"), 2)) /
            (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n")),
            4) + lit(0.0)).as("r"))
      .orderBy("event_type", "lag")
  }

  def autocorr(t: Tables): DataFrame = autocorrOf(t.events)

  def autocorrSql(maxLag: Int = 3): String = {
    val lagSelects = (1 to maxLag).map { k =>
      s"""  SELECT a.event_type, CAST($k AS BIGINT) AS lag, count(*) AS n_pairs,
         |    sum(CAST(a.n_events AS HUGEINT) * b.n_events) AS p,
         |    sum(a.n_events) AS sh, sum(b.n_events) AS st
         |  FROM dense a JOIN dense b
         |    ON b.event_type = a.event_type AND b.hour = a.hour + INTERVAL $k HOUR
         |  GROUP BY 1""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${Events.denseCte},
       |stats AS (
       |  SELECT event_type, count(*) AS n, sum(n_events) AS sx,
       |    sum(CAST(n_events AS HUGEINT) * n_events) AS sxx
       |  FROM dense GROUP BY 1
       |), lags AS (
       |$lagSelects
       |)
       |SELECT l.event_type, l.lag, l.n_pairs,
       |  CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n <> 0.0 THEN
       |    round((CAST(p AS DOUBLE) - (CAST(sx AS DOUBLE) / n) * (sh + st)
       |        + n_pairs * pow(CAST(sx AS DOUBLE) / n, 2))
       |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n), 4) + 0.0
       |  END AS r
       |FROM lags l JOIN stats USING (event_type)
       |ORDER BY event_type, lag""".stripMargin
  }

  // ------------------------------------------------------- PSI drift

  /** Population Stability Index of the document-length distribution,
    * per source vs the whole corpus — the standard "has this feed
    * drifted from the mix" monitor. Lengths bucket into fixed edges at
    * the scan (a CASE chain over `n_chars`, no quantile pass), so the
    * whole operator is one ≤|sources|×|bins| map-side-combined
    * aggregate plus re-aggregates of that grid. Empty (source, bin)
    * cells are materialized (source list × literal bin list) and every
    * cell gets add-one smoothing — PSI's log is undefined on zero
    * support, and the +1 is the documented convention, applied
    * identically to both engines. Counts stay LONG; the ≤|bins|-term
    * PSI sum is the only double arithmetic.
    */
  /** THE drift-monitor bin edges: every signature that bins doc
    * lengths (batch PSI, KS, the baseline, the streaming gate, both
    * SQL oracles) defaults to this ONE value — retuning the bins is a
    * one-line change that moves all seven surfaces together, which is
    * what makes the "PSI and KS can never disagree on geometry" claim
    * true by construction rather than by copy-paste discipline.
    */
  val psiDefaultEdges: Seq[Int] = Seq(150, 250, 350, 450)

  /** The oracle-side twin of [[psiBinCol]] (one CASE-chain builder,
    * not one per SQL string). */
  private def psiBinCaseSql(edges: Seq[Int]): String =
    "CAST(CASE " + edges.zipWithIndex
      .map { case (e, i) => s"WHEN n_chars < $e THEN $i" }
      .mkString(" ") + s" ELSE ${edges.size} END AS BIGINT)"

  /** Shared length-to-bin CASE chain — the SAME expression bins the
    * batch PSI, the baseline, and the streaming gate's scan, so the
    * three can never disagree on bucket geometry.
    */
  private[graft] def psiBinCol(edges: Seq[Int]): org.apache.spark.sql.Column =
    edges.zipWithIndex.foldRight(lit(edges.size.toLong): org.apache.spark.sql.Column) {
      case ((edge, i), acc) => when(col("n_chars") < edge, i.toLong).otherwise(acc)
    }

  /** Dense smoothed (source, bin, n) grid — empty cells materialized,
    * add-one applied — the common substrate of [[psiDriftOf]] and
    * [[psiBaselineRates]].
    */
  private def psiDenseSmoothed(docs: DataFrame, edges: Seq[Int]): DataFrame = {
    val counts = docs.select(col("source"), psiBinCol(edges).as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("n"))
    val grid = counts.select(col("source")).distinct()
      .crossJoin(counts.sparkSession.range(0, edges.size + 1).select(col("id").as("bin")))
    grid.join(counts, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"), (coalesce(col("n"), lit(0L)) + 1).as("n"))
  }

  /** Pooled smoothed per-bin rates of a REFERENCE corpus, collected to
    * a plain array (≤|bins| rows — the inlined-hyperplanes policy: an
    * enum-sized model parameter, not data). This is what a deployed
    * drift monitor broadcasts; the streaming gate scores live traffic
    * against it with zero joins.
    */
  def psiBaselineRates(docs: DataFrame, edges: Seq[Int] = psiDefaultEdges): Array[Double] = {
    val byBin = psiDenseSmoothed(docs, edges)
      .groupBy("bin").agg(sum(col("n")).as("b_all"))
      .orderBy("bin")
      .collect().map(r => r.getLong(1))
    val nAll = byBin.sum.toDouble
    byBin.map(_ / nAll)
  }

  def psiDriftOf(docs: DataFrame, edges: Seq[Int] = psiDefaultEdges): DataFrame = {
    val nBins = edges.size + 1
    val dense = psiDenseSmoothed(docs, edges)
    val srcTot = dense.groupBy("source").agg(sum(col("n")).as("s_tot"))
    val allTot = dense.groupBy("bin").agg(sum(col("n")).as("b_all"))
    val corpusTot = dense.agg(sum(col("n")).as("n_all"))
    dense
      .join(broadcast(srcTot), "source")
      .join(broadcast(allTot), "bin")
      .crossJoin(broadcast(corpusTot))
      .groupBy(col("source"), (col("s_tot") - nBins).as("n_docs"))
      .agg(round(sum(
        (col("n").cast("double") / col("s_tot") - col("b_all").cast("double") / col("n_all")) *
          (log(col("n").cast("double") / col("s_tot")) -
            log(col("b_all").cast("double") / col("n_all")))).as("psi"), 6).as("psi"))
      .orderBy("source")
  }

  def psiDrift(t: Tables): DataFrame = psiDriftOf(t.documents)

  def psiDriftSql(edges: Seq[Int] = psiDefaultEdges): String = {
    val nBins = edges.size + 1
    s"""WITH binned AS (
       |  SELECT source, ${psiBinCaseSql(edges)} AS bin
       |  FROM documents
       |), counts AS (
       |  SELECT source, bin, count(*) AS n FROM binned GROUP BY 1, 2
       |), grid AS (
       |  SELECT s.source, b.bin
       |  FROM (SELECT DISTINCT source FROM counts) s
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${nBins - 1})) AS bin) b
       |), dense AS (
       |  SELECT g.source, g.bin, coalesce(c.n, 0) + 1 AS n
       |  FROM grid g LEFT JOIN counts c ON c.source = g.source AND c.bin = g.bin
       |), st AS (SELECT source, sum(n) AS s_tot FROM dense GROUP BY 1),
       |bt AS (SELECT bin, sum(n) AS b_all FROM dense GROUP BY 1),
       |ct AS (SELECT sum(n) AS n_all FROM dense)
       |SELECT d.source, CAST(st.s_tot - $nBins AS BIGINT) AS n_docs,
       |  round(sum(
       |    (CAST(d.n AS DOUBLE) / st.s_tot - CAST(bt.b_all AS DOUBLE) / ct.n_all)
       |    * (ln(CAST(d.n AS DOUBLE) / st.s_tot) - ln(CAST(bt.b_all AS DOUBLE) / ct.n_all))
       |  ), 6) AS psi
       |FROM dense d JOIN st USING (source) JOIN bt USING (bin) CROSS JOIN ct
       |GROUP BY 1, 2 ORDER BY source""".stripMargin
  }

  // -------------------------------------------------------- KS drift

  /** Kolmogorov–Smirnov-style drift per source: the sup-distance
    * max_b |CDF_src(b) − CDF_corpus(b)| over the shared bin edges —
    * PSI's companion (sup of CDF gaps vs sum of density ratios; KS
    * sees a shifted mode PSI's log-sum can understate, and needs no
    * smoothing since it never divides by a bin). Exact KS on raw
    * values needs the global order statistic; on the binned
    * distribution it is exact for the binned data and grid-sized —
    * the 100 TB trade, same bins as [[psiDriftOf]] so the two
    * monitors can never disagree on geometry. Cumulatives are
    * triangular joins on the ≤|sources|×|bins| dense grid; counts
    * stay LONG to the final division.
    */
  def ksDriftOf(docs: DataFrame, edges: Seq[Int] = psiDefaultEdges): DataFrame = {
    val counts = docs.select(col("source"), psiBinCol(edges).as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("n"))
    val srcTot = counts.groupBy("source").agg(sum(col("n")).as("s_tot"))
    val allByBin = counts.groupBy("bin").agg(sum(col("n")).as("n_all"))
    val allTot = allByBin.agg(sum(col("n_all")).as("tot"))
    // dense grid so a source's missing bin still contributes its CDF row
    val grid = counts.select(col("source")).distinct()
      .crossJoin(counts.sparkSession.range(0, edges.size + 1).select(col("id").as("bin")))
    val dense = grid.join(counts, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"), coalesce(col("n"), lit(0L)).as("n"))
    val srcCum = dense.as("a")
      .join(dense.select(col("source").as("s2"), col("bin").as("b2"), col("n").as("n2")).as("b"),
        col("s2") === col("a.source") && col("b2") <= col("a.bin"))
      .groupBy(col("a.source").as("source"), col("a.bin").as("bin"))
      .agg(sum(col("n2")).as("cum_n"))
    val allCum = allByBin.as("a")
      .join(allByBin.select(col("bin").as("b2"), col("n_all").as("n2")).as("b"),
        col("b2") <= col("a.bin"))
      .groupBy(col("a.bin").as("bin"))
      .agg(sum(col("n2")).as("cum_all"))
    srcCum
      .join(broadcast(srcTot), "source")
      .join(broadcast(allCum), "bin")
      .crossJoin(broadcast(allTot))
      .groupBy(col("source"), col("s_tot").as("n_docs"))
      .agg(round(max(abs(col("cum_n").cast("double") / col("s_tot") -
        col("cum_all").cast("double") / col("tot"))), 6).as("ks"))
      .orderBy("source")
  }

  def ksDrift(t: Tables): DataFrame = ksDriftOf(t.documents)

  def ksDriftSql(edges: Seq[Int] = psiDefaultEdges): String = {
    val nBins = edges.size + 1
    s"""WITH binned AS (
       |  SELECT source, ${psiBinCaseSql(edges)} AS bin
       |  FROM documents
       |), counts AS (
       |  SELECT source, bin, count(*) AS n FROM binned GROUP BY 1, 2
       |), st AS (SELECT source, sum(n) AS s_tot FROM counts GROUP BY 1),
       |ab AS (SELECT bin, sum(n) AS n_all FROM counts GROUP BY 1),
       |at AS (SELECT sum(n_all) AS tot FROM ab),
       |grid AS (
       |  SELECT s.source, b.bin
       |  FROM (SELECT DISTINCT source FROM counts) s
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${nBins - 1})) AS bin) b
       |), dense AS (
       |  SELECT g.source, g.bin, coalesce(c.n, 0) AS n
       |  FROM grid g LEFT JOIN counts c ON c.source = g.source AND c.bin = g.bin
       |), src_cum AS (
       |  SELECT a.source, a.bin, sum(b.n) AS cum_n
       |  FROM dense a JOIN dense b ON b.source = a.source AND b.bin <= a.bin
       |  GROUP BY 1, 2
       |), all_cum AS (
       |  SELECT a.bin, sum(b.n_all) AS cum_all
       |  FROM ab a JOIN ab b ON b.bin <= a.bin
       |  GROUP BY 1
       |)
       |SELECT sc.source, CAST(st.s_tot AS BIGINT) AS n_docs,
       |  round(max(abs(CAST(sc.cum_n AS DOUBLE) / st.s_tot
       |    - CAST(ac.cum_all AS DOUBLE) / at.tot)), 6) AS ks
       |FROM src_cum sc
       |JOIN st USING (source) JOIN all_cum ac USING (bin) CROSS JOIN at
       |GROUP BY 1, 2 ORDER BY source""".stripMargin
  }

  // ------------------------------------------------------------ Gini

  /** Gini coefficient of per-user event counts — "how concentrated is
    * activity" (0 = everyone equal, →1 = one user owns the corpus).
    * Uses the grouped-data rank identity: with distinct activity
    * levels v ascending, frequency f and C = users strictly below,
    * 2·Σᵢ i·xᵢ = Σ_v v·(2·f·C + f·(f+1)), so the corpus collapses to a
    * user aggregate, then a VALUE table keyed by distinct count — its
    * size is bounded by distinct small-int activity levels, not users.
    * The strictly-below cumulative is a triangular self-join on that
    * tiny table (same policy as the Zipf/Heaps fits: no global
    * window). Products ride DECIMAL(12,0)→DECIMAL(38,0), exact to
    * ~1e38 (DuckDB's HUGEINT sums match), so the statistic is
    * bit-stable under any partitioning; the only double is the final
    * G = 2ΣIX/(n·S) − (n+1)/n.
    */
  def giniOf(events: DataFrame): DataFrame = {
    val perUser = events.groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val vt = perUser.groupBy(col("cnt").as("v")).agg(count(lit(1)).as("f"))
    val cum = vt.as("a")
      .join(vt.as("b"), col("b.v") < col("a.v"), "left")
      .groupBy(col("a.v").as("v"), col("a.f").as("f"))
      .agg(coalesce(sum(col("b.f")), lit(0L)).as("cb"))
    cum
      .agg(
        sum(col("f")).as("n_users"),
        sum(col("v").cast("decimal(12,0)") * col("f").cast("decimal(12,0)")).as("total_events"),
        sum(col("v").cast("decimal(12,0)") *
          (lit(2).cast("decimal(12,0)") * col("f").cast("decimal(12,0)") * col("cb").cast("decimal(12,0)") +
            col("f").cast("decimal(12,0)") * (col("f") + 1).cast("decimal(12,0)"))).as("twoix"))
      .select(col("n_users"),
        col("total_events").cast("long").as("total_events"),
        when(col("n_users") > 0 && col("total_events") > 0,
          round(col("twoix").cast("double") /
              (col("n_users").cast("double") * col("total_events").cast("double")) -
            (col("n_users") + 1).cast("double") / col("n_users"), 6) + lit(0.0)).as("gini"))
  }

  def gini(t: Tables): DataFrame = giniOf(t.events)

  val giniSql: String =
    """WITH per_user AS (
      |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
      |), vt AS (
      |  SELECT cnt AS v, count(*) AS f FROM per_user GROUP BY 1
      |), cum AS (
      |  SELECT a.v, a.f, coalesce(sum(b.f), 0) AS cb
      |  FROM vt a LEFT JOIN vt b ON b.v < a.v
      |  GROUP BY 1, 2
      |)
      |SELECT CAST(sum(f) AS BIGINT) AS n_users,
      |  CAST(sum(v * f) AS BIGINT) AS total_events,
      |  CASE WHEN sum(f) > 0 AND sum(v * f) > 0 THEN
      |    round(CAST(sum(v * (2 * f * cb + f * (f + 1))) AS DOUBLE)
      |        / (CAST(sum(f) AS DOUBLE) * CAST(sum(v * f) AS DOUBLE))
      |      - CAST(sum(f) + 1 AS DOUBLE) / sum(f), 6) + 0.0
      |  END AS gini
      |FROM cum""".stripMargin

  // ----------------------------------------------------------- ewma

  /** Exponentially-weighted moving average of daily event volume per
    * type, with a spike flag against the PRIOR day's smoothed level —
    * the classic ops-monitoring smoother (e₀ = x₀; eₜ = αxₜ +
    * (1−α)eₜ₋₁). The recurrence is made windowable by the inverse-decay
    * closed form: with q = 1−α and zᵢ = xᵢ/qⁱ,
    *   eₜ = qᵗ·(α·(Sₜ − x₀) + x₀),  Sₜ = Σ_{i≤t} zᵢ
    * — one running-sum window per type, no recursion, no driver loop.
    *
    * The q⁻ⁱ rescaling bounds this form to series of ≲300 points at
    * α = 0.3 (q⁻ᵗ approaches double range; precision fades far
    * earlier than it overflows) — daily/weekly grains for a few
    * years, exactly the report shape. Unbounded horizons belong to
    * the streaming form ([[graft.streaming.Streams]]' stateful gates),
    * where the recurrence runs natively one update at a time.
    */
  def ewma(t: Tables, alpha: Double = 0.3, spikeRatio: Double = 1.3): DataFrame =
    ewmaOf(t.events, alpha, spikeRatio)

  def ewmaOf(events: DataFrame, alpha: Double = 0.3, spikeRatio: Double = 1.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = 1.0 - alpha
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val indexed = daily
      .withColumn("t", (row_number().over(wOrd) - 1).cast("double"))
      .withColumn("z", col("n_events") / pow(lit(q), col("t")))
      .withColumn("s", sum(col("z")).over(wRun))
      .withColumn("x0", first(col("n_events")).over(wRun).cast("double"))
      .withColumn("ewma",
        pow(lit(q), col("t")) * (lit(alpha) * (col("s") - col("x0")) + col("x0")))
    indexed
      .withColumn("prev_ewma", lag(col("ewma"), 1).over(wOrd))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("ewma"), 6).as("ewma"),
        round(col("n_events") / col("prev_ewma"), 6).as("dev_ratio"),
        (col("n_events") > col("prev_ewma") * spikeRatio).as("is_spike"))
      .orderBy("event_type", "day")
  }

  def ewmaSql(alpha: Double = 0.3, spikeRatio: Double = 1.3): String = {
    val q = 1.0 - alpha
    s"""WITH daily AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_events
       |  FROM events GROUP BY 1, 2
       |), indexed AS (
       |  SELECT event_type, day, n_events,
       |    CAST(row_number() OVER w - 1 AS DOUBLE) AS t
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
       |), summed AS (
       |  SELECT event_type, day, n_events, t,
       |    sum(n_events / pow($q, t)) OVER wr AS s,
       |    CAST(first_value(n_events) OVER wr AS DOUBLE) AS x0
       |  FROM indexed
       |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), sm AS (
       |  SELECT event_type, day, n_events,
       |    pow($q, t) * ($alpha * (s - x0) + x0) AS ewma
       |  FROM summed
       |)
       |SELECT event_type, day, n_events, round(ewma, 6) AS ewma,
       |  round(n_events / lag(ewma, 1) OVER w2, 6) AS dev_ratio,
       |  n_events > lag(ewma, 1) OVER w2 * $spikeRatio AS is_spike
       |FROM sm
       |WINDOW w2 AS (PARTITION BY event_type ORDER BY day)
       |ORDER BY event_type, day""".stripMargin
  }

  // ------------------------------------------------------ bootstrap

  /** Poisson(1) inverse-CDF cumulative thresholds, 10dp — ONE constant
    * list feeds both engines' CASE chains so they cannot drift. Mass
    * beyond w=7 (≈8e-6) truncates to 7; identical on both sides.
    */
  private val poissonCum: Seq[Double] = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058151, 0.9999167589)

  /** Bootstrap confidence interval for the mean order value per
    * priority class — the Poisson bootstrap (Chamandy et al.'s
    * streaming formulation: resample weights w ~ Poisson(1) drawn
    * independently per (row, replicate), no global resample pass), the
    * form that DISTRIBUTES: each row expands to B=`reps` weighted
    * copies map-side, replicate means are one map-side-combined
    * aggregate per (group, b), and the CI is a rank pick over the B
    * replicate means per group — B rows, driver-free.
    *
    * Engine-exactness: weights come from the repo's deterministic md5
    * fraction (same bits both engines), replicate sums ride EXACT
    * integer cents × integer weights (no float accumulation), and the
    * single double division per replicate has identical operands — so
    * the replicate-mean ORDERING, and hence the rank-picked CI bounds,
    * are hash-stable. The 5%/95% bounds at B=64 are ranks 4 and 61
    * (ceil(0.05·64), B+1−4), tie-broken by replicate id.
    */
  def bootstrapCi(t: Tables, reps: Int = 64): DataFrame =
    bootstrapCiOf(t.orders, reps)

  /** [[bootstrapCi]] over any (o_orderpriority, o_orderkey,
    * o_totalprice) frame — the library entry; the gated form binds the
    * orders table.
    */
  def bootstrapCiOf(orders: DataFrame, reps: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val loRank = math.max(1, math.ceil(0.05 * reps).toInt)
    val hiRank = reps + 1 - loRank
    val u = conv(substring(md5(concat(lit("bs:"), col("o_orderkey").cast("string"),
      lit(":"), col("b").cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60, the domainMix constant
    val w = poissonCum.zipWithIndex.foldLeft(when(lit(false), 0)) {
      case (acc, (c, i)) => acc.when(col("u") < c, i)
    }.otherwise(poissonCum.length)
    // A compact orders file arrives as one split, and explode preserves
    // partitioning — without this the B× expansion and its per-row md5
    // run on one core (measured 11.4 s at sf0.1; 32-way it's ~1 s). An
    // explicit count: AQE would coalesce a plain column repartition of
    // the small pre-explode input right back down, blind to the ×B work
    // downstream (the embeddingDupPairs precedent). Replicate sums are
    // integer, so partitioning cannot move the result.
    val slices = orders.sparkSession.sparkContext.defaultParallelism
    val expanded = orders
      .repartition(slices, col("o_orderkey"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("u", u)
      .withColumn("w", w.cast("long"))
    val repMeans = expanded
      .groupBy(col("o_orderpriority"), col("b"))
      .agg(sum(col("w") * col("cents")).as("wc"), sum(col("w")).as("ws"))
      .filter(col("ws") > 0)
      .select(col("o_orderpriority"), col("b"),
        (col("wc").cast("double") / col("ws")).as("m"))
    val win = Window.partitionBy(col("o_orderpriority")).orderBy(col("m"), col("b"))
    val bounds = repMeans
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === loRank || col("rn") === hiRank)
      .groupBy(col("o_orderpriority"))
      .agg((min(col("m")) / 100.0).as("ci_lo"), (max(col("m")) / 100.0).as("ci_hi"))
    val point = orders.groupBy(col("o_orderpriority"))
      .agg((sum(round(col("o_totalprice") * 100).cast("long")).cast("double") /
        count(lit(1)) / 100.0).as("mean_price"))
    point.join(bounds, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), round(col("mean_price"), 6).as("mean_price"),
        round(col("ci_lo"), 6).as("ci_lo"), round(col("ci_hi"), 6).as("ci_hi"))
      .orderBy("o_orderpriority")
  }

  def bootstrapCiSql(reps: Int = 64): String = {
    val loRank = math.max(1, math.ceil(0.05 * reps).toInt)
    val hiRank = reps + 1 - loRank
    val caseChain = poissonCum.zipWithIndex
      .map { case (c, i) => s"WHEN u < $c THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${poissonCum.length} END")
    s"""WITH expanded AS (
       |  SELECT o_orderpriority, o_orderkey,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, b,
       |    ('0x' || substr(md5('bs:' || o_orderkey || ':' || b), 1, 15))::BIGINT
       |      / 1152921504606846976.0 AS u
       |  FROM orders, unnest(range(0, $reps)) AS r(b)
       |), weighted AS (
       |  SELECT o_orderpriority, b, cents, CAST($caseChain AS BIGINT) AS w FROM expanded
       |), rep_means AS (
       |  SELECT o_orderpriority, b,
       |    CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS BIGINT) AS m
       |  FROM weighted GROUP BY 1, 2 HAVING sum(w) > 0
       |), ranked AS (
       |  SELECT o_orderpriority, m,
       |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY m, b) AS rn
       |  FROM rep_means
       |), bounds AS (
       |  SELECT o_orderpriority, min(m) / 100.0 AS ci_lo, max(m) / 100.0 AS ci_hi
       |  FROM ranked WHERE rn = $loRank OR rn = $hiRank GROUP BY 1
       |), pt AS (
       |  SELECT o_orderpriority,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS mean_price
       |  FROM orders GROUP BY 1
       |)
       |SELECT p.o_orderpriority, round(p.mean_price, 6) AS mean_price,
       |  round(b.ci_lo, 6) AS ci_lo, round(b.ci_hi, 6) AS ci_hi
       |FROM pt p JOIN bounds b USING (o_orderpriority)
       |ORDER BY o_orderpriority""".stripMargin
  }

  // ------------------------------------------------------ Lorenz curve

  /** Lorenz curve of per-user activity — the distribution readout
    * behind `q_gini`'s single number ("the bottom 80% of users hold
    * what share of events?"): one point per DISTINCT activity level v
    * (ascending), carrying the cumulative user share and activity
    * share at-or-below v. The corpus collapses to per-user counts,
    * those to the ≤|distinct levels| value table (`q_gini`'s vt), and
    * both cumulatives are ONE triangular join over that tiny table —
    * no window at all. Counts and masses are exact LONG/DECIMAL; the
    * two shares are single unrounded divisions of exact integers
    * (bit-identical across engines). The curve plus (0,0) is what a
    * plotting client interpolates; Gini = 1 − 2·AUC re-derives the
    * `q_gini` number as a cross-check.
    */
  def lorenzCurveOf(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val vt = perUser.groupBy(col("cnt").as("v")).agg(count(lit(1)).as("f"))
      .withColumn("mass", col("v").cast("decimal(18,0)") * col("f"))
    val tot = vt.agg(sum(col("f")).as("users_tot"), sum(col("mass")).as("mass_tot"))
    val cum = vt.as("a")
      .join(vt.select(col("v").as("v2"), col("f").as("f2"), col("mass").as("m2")).as("b"),
        col("v2") <= col("a.v"))
      .groupBy(col("a.v").as("v"))
      .agg(sum(col("f2")).as("cum_users"), sum(col("m2")).as("cum_mass"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"), col("cum_users").cast("long").as("cum_users"),
        (col("cum_users").cast("double") / col("users_tot").cast("double"))
          .as("pct_users"),
        (col("cum_mass").cast("double") / col("mass_tot").cast("double"))
          .as("pct_mass"))
      .orderBy("v")
  }

  def lorenzCurve(t: Tables): DataFrame = lorenzCurveOf(t.events)

  val lorenzCurveSql: String =
    """WITH per_user AS (
      |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
      |), vt AS (
      |  SELECT cnt AS v, count(*) AS f, CAST(cnt AS HUGEINT) * count(*) AS mass
      |  FROM per_user GROUP BY 1
      |), tot AS (
      |  SELECT sum(f) AS users_tot, sum(mass) AS mass_tot FROM vt
      |), cum AS (
      |  SELECT a.v, sum(b.f) AS cum_users, sum(b.mass) AS cum_mass
      |  FROM vt a JOIN vt b ON b.v <= a.v
      |  GROUP BY a.v
      |)
      |SELECT v, CAST(cum_users AS BIGINT) AS cum_users,
      |  CAST(cum_users AS DOUBLE) / CAST(users_tot AS DOUBLE) AS pct_users,
      |  CAST(cum_mass AS DOUBLE) / CAST(mass_tot AS DOUBLE) AS pct_mass
      |FROM cum CROSS JOIN tot
      |ORDER BY v""".stripMargin
}
