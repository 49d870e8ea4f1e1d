package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dependence measures beyond Pearson: Spearman rank correlation over
  * the lineitem numeric grid, mutual information / Cramér's V over
  * categorical pairs, and Kendall τ-b over the daily event grid.
  * Extends the statistics tranche ([[Analytics4]]) with the
  * association families a feature-selection pass over training data
  * actually runs: "is the relationship monotone" (Spearman — Pearson
  * on ranks, immune to the price tail; Kendall — the concordance
  * count, robust where even ranks wobble) and "how much does one
  * label tell you about another" (MI — the information-theoretic
  * complement of `q_chi_square`'s independence test). Reference has
  * no statistics surface; §2.6 extension work.
  */
object Analytics5 {

  private def dec(c: Column): Column = c.cast("decimal(18,0)")

  // ------------------------------------------------------- Spearman

  /** Average-rank map for one exact-integer column: value → R2 where
    * R2 = 2·rank_avg(value) = 2·cnt_below + cnt + 1 (an exact LONG —
    * average ranks are half-integers, so doubling keeps every moment
    * integral all the way to the final division). The cumulative
    * cnt_below over the value histogram is the [[Layout.packShardsOf]]
    * two-phase prefix sum — contiguous value-range buckets from a
    * 1-row bounds broadcast, per-bucket totals, exclusive bucket
    * offsets via a ≤buckets² triangular self-join, and a BUCKET-LOCAL
    * window for the within-bucket prefix — because the histogram of a
    * continuous column (l_extendedprice: ~1 distinct per row) is
    * corpus-proportional, and an unpartitioned window over it is the
    * exact shape PlanAuditSpec bans with no exemptions.
    */
  private def avgRankMap(rows: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    val hist = rows.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cnt"))
    val bounds = hist.agg(min("v").as("lo"), max("v").as("hi"))
    val bucketed = hist.crossJoin(broadcast(bounds))
      .withColumn("_b", least(lit(buckets - 1),
        floor((col("v") - col("lo")) * buckets / (col("hi") - col("lo") + 1)).cast("int")))
      .drop("lo", "hi")
    val totals = bucketed.groupBy(col("_b")).agg(sum(col("cnt")).as("_bsum"))
    val offsets = totals
      .join(totals.select(col("_b").as("_b2"), col("_bsum").as("_bsum2")),
        col("_b2") < col("_b"), "left")
      .groupBy(col("_b"))
      .agg(coalesce(sum(col("_bsum2")), lit(0L)).as("_off"))
    val wLocal = Window.partitionBy(col("_b")).orderBy(col("v"))
    bucketed.join(broadcast(offsets), Seq("_b"))
      .withColumn("_below",
        col("_off") + coalesce(sum(col("cnt")).over(
          wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("v").as(valueCol),
        (lit(2L) * col("_below") + col("cnt") + 1L).as(s"r_$valueCol"))
  }

  /** Spearman rank correlation between every pair of exact-integer
    * columns. Each column's rank map joins back to the corpus on its
    * value (AQE broadcasts the enum-domain maps — quantity 50 rows,
    * discount 11, tax 9; a continuous column's map shuffles once,
    * which IS the cost of ranking a continuous variable), then ONE
    * map-side-combined aggregate collects all 2·rank moments: Σr,
    * Σr², and the C(k,2) cross products, every one an exact
    * DECIMAL(38) integer (oracle rides HUGEINT — identical values, so
    * the final doubles agree bit-for-bit). ρ = (nΣxy − ΣxΣy) /
    * (√(nΣxx−Σx²)·√(nΣyy−Σy²)) with the two square roots taken
    * SEPARATELY — their product at ~1e23 each would overflow 38
    * digits, and both engines evaluate the identical
    * int→double→sqrt→multiply chain. Exactness headroom: moments are
    * O(n³), n·moment O(n⁴) < 1e38 → exact to n ≈ 10⁹ rows; past that
    * the decimal lane overflows LOUDLY (ANSI) rather than drifting.
    */
  def spearmanOf(rows0: DataFrame, cols: Seq[String], buckets: Int = 32): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val rows = rows0.select(cols.map(col): _*)
    val ranked = cols.foldLeft(rows) { (df, c) => df.join(avgRankMap(rows, c, buckets), c) }
    val pairs = for (i <- cols.indices; j <- cols.indices if i < j) yield (cols(i), cols(j))
    val r = (c: String) => dec(col(s"r_$c"))
    // rank products multiply in LONG per row (r ≤ 2n+1, so the product
    // is exact — and ANSI-loud — to n ≈ 1.5e9 rows) and cast once into
    // the exact DECIMAL(38) sums: same values as the old dec×dec, no
    // per-row BigDecimal multiply in the 14-moment aggregate
    val rl = (a: String, b: String) =>
      (col(s"r_$a") * col(s"r_$b")).cast("decimal(38,0)")
    val moments = ranked.agg(
      count(lit(1)).as("n"),
      (cols.flatMap(c => Seq(sum(r(c)).as(s"s_$c"), sum(rl(c, c)).as(s"ss_$c"))) ++
        pairs.map { case (a, b) => sum(rl(a, b)).as(s"sp_${a}_$b") }): _*)
    val nD = col("n").cast("decimal(20,0)")
    def den(c: String): Column = nD * col(s"ss_$c") - col(s"s_$c") * col(s"s_$c")
    // one-row explode, NOT a 6-way union of selects over `moments` —
    // a union would re-derive the whole corpus aggregate once per pair
    val pairStructs = pairs.map { case (a, b) =>
      val num = (nD * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")).cast("double")
      struct(lit(a).as("col_x"), lit(b).as("col_y"), col("n").as("n"),
        when(den(a) =!= 0 && den(b) =!= 0,
          round(num / (sqrt(den(a).cast("double")) * sqrt(den(b).cast("double"))), 6)
            + lit(0.0)).as("rho"))
    }
    moments.select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.n"), col("p.rho"))
      .orderBy("col_x", "col_y")
  }

  /** Gated form: lineitem quantity / extendedprice / discount / tax in
    * exact cents (ranks only depend on order, so the scaling is for
    * integer exactness, not semantics).
    */
  def spearman(t: Tables): DataFrame =
    spearmanOf(
      t.lineitem.select(
        round(col("l_quantity") * 100).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("e"),
        round(col("l_discount") * 100).cast("long").as("d"),
        round(col("l_tax") * 100).cast("long").as("t")),
      Seq("q", "e", "d", "t"))

  /** Oracle: DuckDB's REAL rank window builtins (min-rank + tie count
    * → the same doubled average rank), an independent derivation of
    * the rank map — the cross-engine cross-check style of
    * `q_rank_profile`.
    */
  val spearmanSql: String = {
    val colsSql = Seq(
      "q" -> "l_quantity", "e" -> "l_extendedprice",
      "d" -> "l_discount", "t" -> "l_tax")
    val rankCols = colsSql.map { case (a, _) =>
      s"2*rank() OVER (ORDER BY $a) + count(*) OVER (PARTITION BY $a) - 1 AS r$a" }
      .mkString(",\n    ")
    val baseCols = colsSql.map { case (a, src) =>
      s"CAST(round($src * 100) AS BIGINT) AS $a" }.mkString(", ")
    val names = colsSql.map(_._1)
    val sums = (names.flatMap(a => Seq(
      s"sum(CAST(r$a AS HUGEINT)) AS s_$a",
      s"sum(CAST(r$a AS HUGEINT)*r$a) AS ss_$a")) ++
      (for (i <- names.indices; j <- names.indices if i < j)
        yield s"sum(CAST(r${names(i)} AS HUGEINT)*r${names(j)}) AS sp_${names(i)}_${names(j)}"))
      .mkString(",\n    ")
    val rows = for (i <- names.indices; j <- names.indices if i < j) yield {
      val (a, b) = (names(i), names(j))
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n,
         |  CASE WHEN (n*ss_$a - s_$a*s_$a) <> 0 AND (n*ss_$b - s_$b*s_$b) <> 0 THEN
         |    round(CAST(n*sp_${a}_$b - s_$a*s_$b AS DOUBLE)
         |      / (sqrt(CAST(n*ss_$a - s_$a*s_$a AS DOUBLE))
         |         * sqrt(CAST(n*ss_$b - s_$b*s_$b AS DOUBLE))), 6) + 0.0 END AS rho
         |FROM s""".stripMargin
    }
    s"""WITH base AS (
       |  SELECT $baseCols FROM lineitem
       |), r AS (
       |  SELECT
       |    $rankCols
       |  FROM base
       |), s AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |    $sums
       |  FROM r
       |)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY col_x, col_y""".stripMargin
  }

  // ------------------------------------------- mutual information

  /** Mutual information, entropies, NMI and Cramér's V for one
    * categorical column pair, as ONE summary row. The corpus
    * collapses to the (a, b) contingency cells in one
    * map-side-combined aggregate; everything downstream is arithmetic
    * on ≤|A|·|B| bounded-enum rows (marginals re-aggregate the cells —
    * no second corpus scan). The per-cell log terms are doubles, so
    * both their VALUE chain (exact-long → double casts in identical
    * operand order) and their SUMMATION ORDER are pinned: terms fold
    * in sorted (a, b) cell order on both engines — the `q_anova`
    * sorted-fold discipline, because engine-dependent group order
    * costs a last-ulp difference the 6dp round can amplify.
    */
  def mutualInfoOf(df: DataFrame, colA: String, colB: String,
      pairLabel: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("nij"))
    val ma = cells.groupBy("a").agg(sum("nij").as("ni"))
    val mb = cells.groupBy("b").agg(sum("nij").as("nj"))
    val tot = cells.agg(sum("nij").as("nn"),
      countDistinct("a").as("r_card"), countDistinct("b").as("c_card"))
    val nnD = col("nn").cast("double")
    // χ² rides the identity Σ(nij−e)²/e = Σ nij²/e − N: the groupBy
    // cells are OBSERVED cells only, and a zero cell still owes its
    // (0−e)²/e = e to the textbook sum — but contributes nothing to
    // Σ nij²/e, so folding THAT and subtracting N is exact without
    // ever materializing the zero cells (a structural-zero grid would
    // need a domain cross join). MI's zero cells genuinely contribute
    // 0 (lim p→0 p·ln p), so the MI fold needs no such correction.
    val withE = cells.join(broadcast(ma), "a").join(broadcast(mb), "b")
      .crossJoin(broadcast(tot))
      .withColumn("e_ij", col("ni").cast("double") * col("nj").cast("double") / nnD)
    val joined = withE
      .select(col("a"), col("b"),
        ((col("nij").cast("double") / nnD)
          * log((nnD * col("nij").cast("double"))
            / (col("ni").cast("double") * col("nj").cast("double")))).as("term_mi"),
        (col("nij").cast("double") * col("nij").cast("double") / col("e_ij"))
          .as("term_chi"))
    def fold(src: DataFrame, keys: Seq[Column], term: Column, as: String): DataFrame =
      src.agg(aggregate(
        transform(array_sort(collect_list(struct(keys :+ term.as("t"): _*))),
          s => s.getField("t")),
        lit(0.0), (acc, x) => acc + x).as(as))
    val folds = fold(joined, Seq(col("a"), col("b")), col("term_mi"), "mi_raw")
      .crossJoin(fold(joined, Seq(col("a"), col("b")), col("term_chi"), "chi_raw"))
    val entA = fold(ma.crossJoin(broadcast(tot)), Seq(col("a")),
      (col("ni").cast("double") / nnD) * log(col("ni").cast("double") / nnD), "ea")
    val entB = fold(mb.crossJoin(broadcast(tot)), Seq(col("b")),
      (col("nj").cast("double") / nnD) * log(col("nj").cast("double") / nnD), "eb")
    folds.crossJoin(entA).crossJoin(entB).crossJoin(broadcast(tot))
      .withColumn("chi_raw", col("chi_raw") - nnD)
      .select(lit(pairLabel).as("pair"), col("nn").as("n"),
        col("r_card"), col("c_card"),
        (round(col("mi_raw"), 6) + lit(0.0)).as("mi"),
        (round(-col("ea"), 6) + lit(0.0)).as("h_a"),
        (round(-col("eb"), 6) + lit(0.0)).as("h_b"),
        when(least(-col("ea"), -col("eb")) =!= 0.0,
          round(col("mi_raw") / least(-col("ea"), -col("eb")), 6) + lit(0.0)).as("nmi"),
        (round(col("chi_raw"), 6) + lit(0.0)).as("chi2"),
        when(least(col("r_card"), col("c_card")) > 1,
          round(sqrt(col("chi_raw") / (col("nn").cast("double")
            * (least(col("r_card"), col("c_card")) - 1).cast("double"))), 6)
            + lit(0.0)).as("cramers_v"))
  }

  /** Gated form: two label pairs a curation pass would screen —
    * order priority × status, lineitem return flag × line status.
    */
  def mutualInfo(t: Tables): DataFrame =
    mutualInfoOf(t.orders, "o_orderpriority", "o_orderstatus", "orders:priority_x_status")
      .unionAll(mutualInfoOf(t.lineitem, "l_returnflag", "l_linestatus",
        "lineitem:returnflag_x_linestatus"))
      .orderBy("pair")

  private def mutualInfoPairSql(table: String, colA: String, colB: String,
      pairLabel: String): String =
    s"""SELECT '$pairLabel' AS pair, n, r_card, c_card, mi, h_a, h_b, nmi, chi2, cramers_v
       |FROM (
       |  WITH cells AS (
       |    SELECT $colA AS a, $colB AS b, count(*) AS nij FROM $table GROUP BY 1, 2
       |  ), ma AS (SELECT a, sum(nij) AS ni FROM cells GROUP BY 1),
       |  mb AS (SELECT b, sum(nij) AS nj FROM cells GROUP BY 1),
       |  tot AS (SELECT CAST(sum(nij) AS BIGINT) AS nn,
       |    CAST(count(DISTINCT a) AS BIGINT) AS r_card,
       |    CAST(count(DISTINCT b) AS BIGINT) AS c_card FROM cells),
       |  je AS (
       |    SELECT a, b, nij, ni, nj, nn,
       |      CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE) / CAST(nn AS DOUBLE) AS e_ij
       |    FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
       |  ), j AS (
       |    SELECT a, b,
       |      (CAST(nij AS DOUBLE) / CAST(nn AS DOUBLE))
       |        * ln((CAST(nn AS DOUBLE) * CAST(nij AS DOUBLE))
       |          / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE))) AS term_mi,
       |      CAST(nij AS DOUBLE) * CAST(nij AS DOUBLE) / e_ij AS term_chi
       |    FROM je
       |  ), f AS (
       |    SELECT
       |      list_reduce(list_prepend(0.0, list(term_mi ORDER BY a, b)), (x, y) -> x + y) AS mi_raw,
       |      list_reduce(list_prepend(0.0, list(term_chi ORDER BY a, b)), (x, y) -> x + y)
       |        - CAST((SELECT nn FROM tot) AS DOUBLE) AS chi_raw
       |    FROM j
       |  ), ea AS (
       |    SELECT list_reduce(list_prepend(0.0,
       |      list((CAST(ni AS DOUBLE) / CAST(nn AS DOUBLE))
       |        * ln(CAST(ni AS DOUBLE) / CAST(nn AS DOUBLE)) ORDER BY a)),
       |      (x, y) -> x + y) AS ea
       |    FROM ma CROSS JOIN tot
       |  ), eb AS (
       |    SELECT list_reduce(list_prepend(0.0,
       |      list((CAST(nj AS DOUBLE) / CAST(nn AS DOUBLE))
       |        * ln(CAST(nj AS DOUBLE) / CAST(nn AS DOUBLE)) ORDER BY b)),
       |      (x, y) -> x + y) AS eb
       |    FROM mb CROSS JOIN tot
       |  )
       |  SELECT nn AS n, r_card, c_card,
       |    round(mi_raw, 6) + 0.0 AS mi,
       |    round(-ea, 6) + 0.0 AS h_a,
       |    round(-eb, 6) + 0.0 AS h_b,
       |    CASE WHEN least(-ea, -eb) <> 0.0 THEN
       |      round(mi_raw / least(-ea, -eb), 6) + 0.0 END AS nmi,
       |    round(chi_raw, 6) + 0.0 AS chi2,
       |    CASE WHEN least(r_card, c_card) > 1 THEN
       |      round(sqrt(chi_raw / (CAST(nn AS DOUBLE)
       |        * CAST(least(r_card, c_card) - 1 AS DOUBLE))), 6) + 0.0 END AS cramers_v
       |  FROM f CROSS JOIN ea CROSS JOIN eb CROSS JOIN tot
       |)""".stripMargin

  val mutualInfoSql: String =
    s"""${mutualInfoPairSql("orders", "o_orderpriority", "o_orderstatus", "orders:priority_x_status")}
       |UNION ALL
       |${mutualInfoPairSql("lineitem", "l_returnflag", "l_linestatus", "lineitem:returnflag_x_linestatus")}
       |ORDER BY pair""".stripMargin

  // --------------------------------------------------- Kendall τ-b

  /** Kendall τ-b between every pair of event types' daily volumes —
    * the rank-based complement of `q_cross_corr`'s Pearson (a few
    * outlier days cannot move a concordance count). Over the days
    * where BOTH types fired (inner join on the shared daily grid),
    * ALL C(n,2) day pairs of all type pairs come from ONE
    * range-augmented self-join of the grid-sized paired table
    * (fanout days²·type-pairs — grid-bounded, never
    * corpus-proportional, because the corpus collapsed to the daily
    * rollup first); concordant/discordant/tie counts are exact LONGs
    * from integer sign products, τ-b = S/(√(n0−n1)·√(n0−n2)) the only
    * double (identical int→double→sqrt chain both engines), NULL when
    * either factor is all-ties.
    */
  def kendallOf(events: DataFrame): DataFrame = {
    val daily = Analytics4.dailyOf(events)
    val paired = daily.as("a").join(daily.as("b"),
        col("a.day") === col("b.day") && col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        col("a.day").as("day"), col("a.n_events").as("x"), col("b.n_events").as("y"))
    val agg = paired.as("p").join(paired.as("q"),
        col("p.ta") === col("q.ta") && col("p.tb") === col("q.tb")
          && col("p.day") < col("q.day"))
      .select(col("p.ta"), col("p.tb"),
        ((col("p.x") - col("q.x")) * (col("p.y") - col("q.y"))).as("prod"),
        (col("p.x") === col("q.x")).as("tie_x"),
        (col("p.y") === col("q.y")).as("tie_y"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n0"),
        sum(when(col("prod") > 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("prod") < 0, 1L).otherwise(0L)).as("nd"),
        sum(when(col("tie_x"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("tie_y"), 1L).otherwise(0L)).as("n2"))
    agg.select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n0"), col("nc"), col("nd"),
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          round((col("nc") - col("nd")).cast("double")
            / (sqrt((col("n0") - col("n1")).cast("double"))
               * sqrt((col("n0") - col("n2")).cast("double"))), 6) + lit(0.0))
          .as("tau_b"))
      .orderBy("type_a", "type_b")
  }

  def kendall(t: Tables): DataFrame = kendallOf(t.events)

  val kendallSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), paired AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
      |    a.n_events AS x, b.n_events AS y
      |  FROM daily a JOIN daily b
      |    ON b.day = a.day AND a.event_type < b.event_type
      |), agg AS (
      |  SELECT p.ta, p.tb, count(*) AS n0,
      |    sum(CASE WHEN (p.x - q.x) * (p.y - q.y) > 0 THEN 1 ELSE 0 END) AS nc,
      |    sum(CASE WHEN (p.x - q.x) * (p.y - q.y) < 0 THEN 1 ELSE 0 END) AS nd,
      |    sum(CASE WHEN p.x = q.x THEN 1 ELSE 0 END) AS n1,
      |    sum(CASE WHEN p.y = q.y THEN 1 ELSE 0 END) AS n2
      |  FROM paired p JOIN q_alias q
      |    ON q.ta = p.ta AND q.tb = p.tb AND p.day < q.day
      |  GROUP BY p.ta, p.tb
      |)
      |SELECT ta AS type_a, tb AS type_b,
      |  CAST(n0 AS BIGINT) AS n0, CAST(nc AS BIGINT) AS nc, CAST(nd AS BIGINT) AS nd,
      |  CASE WHEN n0 > n1 AND n0 > n2 THEN
      |    round(CAST(nc - nd AS DOUBLE)
      |      / (sqrt(CAST(n0 - n1 AS DOUBLE)) * sqrt(CAST(n0 - n2 AS DOUBLE))), 6) + 0.0
      |  END AS tau_b
      |FROM agg ORDER BY type_a, type_b""".stripMargin
      .replace("q_alias", "paired")

  // ------------------------------------------- multivariate OLS

  /** Two-predictor least squares (extendedprice ~ quantity +
    * discount) solved in CLOSED FORM: the 3×3 normal-equation system
    * by Cramer's rule over the ten sufficient moments (n, Σx₁, Σx₂,
    * Σx₁², Σx₂², Σx₁x₂, Σy, Σx₁y, Σx₂y, Σy²) — `q_trend_ols`
    * generalized to two regressors, and the same scale shape: ONE
    * map-side-combined corpus aggregate, then arithmetic on a single
    * row. All four determinants are EXACT integers (cents moments in
    * DECIMAL(38); the oracle rides HUGEINT — both engines divide
    * identical integers, so the coefficient doubles agree
    * bit-for-bit). Largest term ~n·Σx₁²·Σy ≈ n³·(domain magnitudes):
    * exact headroom to ~1e9 rows at these domains, overflowing
    * LOUDLY (ANSI) past it. R² reuses the moments: SSR = Σy² − b₀Σy
    * − b₁Σx₁y − b₂Σx₂y in identical operand order. Singular design
    * (collinear regressors → det 0) reads NULL.
    */
  def olsMultiOf(rows: DataFrame, x1: String, x2: String, y: String): DataFrame = {
    val m = rows.agg(
      count(lit(1)).as("n"),
      sum(dec(col(x1))).as("s1"), sum(dec(col(x2))).as("s2"),
      sum(dec(col(x1)) * dec(col(x1))).as("s11"),
      sum(dec(col(x2)) * dec(col(x2))).as("s22"),
      sum(dec(col(x1)) * dec(col(x2))).as("s12"),
      sum(dec(col(y))).as("sy"),
      sum(dec(col(x1)) * dec(col(y))).as("s1y"),
      sum(dec(col(x2)) * dec(col(y))).as("s2y"),
      sum(dec(col(y)) * dec(col(y))).as("syy"))
    val nD = col("n").cast("decimal(20,0)")
    // det of [[n s1 s2][s1 s11 s12][s2 s12 s22]] and the three
    // column-replaced determinants, all exact integers
    val det = nD * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 = nD * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 = nD * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val b0 = det0.cast("double") / det.cast("double")
    val b1 = det1.cast("double") / det.cast("double")
    val b2 = det2.cast("double") / det.cast("double")
    val ssr = col("syy").cast("double") - b0 * col("sy").cast("double") -
      b1 * col("s1y").cast("double") - b2 * col("s2y").cast("double")
    val sst = col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / col("n").cast("double")
    m.select(col("n"),
      when(det =!= 0, round(b0, 6) + lit(0.0)).as("b0"),
      when(det =!= 0, round(b1, 6) + lit(0.0)).as("b1"),
      when(det =!= 0, round(b2, 6) + lit(0.0)).as("b2"),
      when(det =!= 0 && sst =!= 0.0,
        round(lit(1.0) - ssr / sst, 6) + lit(0.0)).as("r2"))
  }

  /** Gated form in exact cents: extendedprice ~ quantity + discount. */
  def olsMulti(t: Tables): DataFrame =
    olsMultiOf(
      t.lineitem.select(
        round(col("l_quantity") * 100).cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_extendedprice") * 100).cast("long").as("y")),
      "x1", "x2", "y")

  val olsMultiSql: String =
    """WITH base AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x1,
      |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem
      |), m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
      |    sum(CAST(x1 AS HUGEINT) * x1) AS s11,
      |    sum(CAST(x2 AS HUGEINT) * x2) AS s22,
      |    sum(CAST(x1 AS HUGEINT) * x2) AS s12,
      |    sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x1 AS HUGEINT) * y) AS s1y,
      |    sum(CAST(x2 AS HUGEINT) * y) AS s2y,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM base
      |), d AS (
      |  SELECT n, sy, s1y, s2y, syy,
      |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      |      + s2 * (s1 * s12 - s11 * s2) AS det,
      |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      |      + s2 * (s1y * s12 - s11 * s2y) AS det0,
      |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      |      + s2 * (s1 * s2y - s1y * s2) AS det1,
      |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      |      + sy * (s1 * s12 - s11 * s2) AS det2
      |  FROM m
      |), b AS (
      |  SELECT n, sy, s1y, s2y, syy, det,
      |    CAST(det0 AS DOUBLE) / nullif(CAST(det AS DOUBLE), 0.0) AS b0,
      |    CAST(det1 AS DOUBLE) / nullif(CAST(det AS DOUBLE), 0.0) AS b1,
      |    CAST(det2 AS DOUBLE) / nullif(CAST(det AS DOUBLE), 0.0) AS b2
      |  FROM d
      |)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CASE WHEN det <> 0 THEN round(b0, 6) + 0.0 END AS b0,
      |  CASE WHEN det <> 0 THEN round(b1, 6) + 0.0 END AS b1,
      |  CASE WHEN det <> 0 THEN round(b2, 6) + 0.0 END AS b2,
      |  CASE WHEN det <> 0 AND CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) <> 0.0 THEN
      |    round(1.0 - (CAST(syy AS DOUBLE) - b0 * CAST(sy AS DOUBLE)
      |        - b1 * CAST(s1y AS DOUBLE) - b2 * CAST(s2y AS DOUBLE))
      |      / (CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0.0
      |  END AS r2
      |FROM b""".stripMargin

  // ------------------------------------------------------ CUSUM

  /** Tabular CUSUM change-point screen over each type's daily volume
    * (Page): upper/lower cumulative sums with slack k·σ, alarm at
    * h·σ. The textbook form is a clamped RECURSION — S_i = max(0,
    * S_{i−1} + (x_i − μ − kσ)) — which no window expresses directly;
    * it has the classic closed form S_i = P_i − min(0, min_{j≤i}
    * P_j) over the UNclamped prefix P, so both sides become running
    * sum + running min/max windows, each partitioned by event_type
    * over the grid (never corpus-sized, never unpartitioned). Window
    * running aggregates fold left-to-right in frame order on BOTH
    * engines, so the double chains match without sorted-fold
    * machinery. μ, σ derive from exact per-type integer moments
    * (σ² = (nΣx²−(Σx)²)/(n(n−1))); alarms compare UNROUNDED sums.
    */
  def cusumOf(events: DataFrame, k: Double = 0.5, h: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Analytics4.dailyOf(events)
    val moments = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(dec(col("n_events"))).as("sx"),
        sum(dec(col("n_events")) * dec(col("n_events"))).as("sxx"))
      .filter(col("nd") > 1)
      .select(col("event_type"),
        (col("sx").cast("double") / col("nd").cast("double")).as("mu"),
        sqrt((col("nd").cast("decimal(20,0)") * col("sxx") - col("sx") * col("sx"))
          .cast("double")
          / (col("nd").cast("double") * (col("nd") - 1).cast("double"))).as("sigma"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withP = daily.join(broadcast(moments), "event_type")
      .withColumn("d_up", col("n_events").cast("double") - col("mu") - lit(k) * col("sigma"))
      .withColumn("d_dn", col("mu") - lit(k) * col("sigma") - col("n_events").cast("double"))
      .withColumn("p_up", sum(col("d_up")).over(w))
      .withColumn("p_dn", sum(col("d_dn")).over(w))
      .withColumn("s_up", col("p_up") - least(lit(0.0), min(col("p_up")).over(w)))
      .withColumn("s_dn", col("p_dn") - least(lit(0.0), min(col("p_dn")).over(w)))
    withP.select(col("event_type"), col("day"), col("n_events"),
        (round(col("s_up"), 6) + lit(0.0)).as("cusum_up"),
        (round(col("s_dn"), 6) + lit(0.0)).as("cusum_dn"),
        (col("s_up") > lit(h) * col("sigma")).as("alarm_up"),
        (col("s_dn") > lit(h) * col("sigma")).as("alarm_dn"))
      .orderBy("event_type", "day")
  }

  def cusum(t: Tables): DataFrame = cusumOf(t.events)

  def cusumSql(k: Double = 0.5, h: Double = 4.0): String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |    count(*) AS n_events
       |  FROM events GROUP BY 1, 2
       |), m AS (
       |  SELECT event_type, count(*) AS nd,
       |    sum(CAST(n_events AS HUGEINT)) AS sx,
       |    sum(CAST(n_events AS HUGEINT) * n_events) AS sxx
       |  FROM daily GROUP BY 1 HAVING count(*) > 1
       |), ms AS (
       |  SELECT event_type,
       |    CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
       |    sqrt(CAST(nd * sxx - sx * sx AS DOUBLE)
       |      / (CAST(nd AS DOUBLE) * CAST(nd - 1 AS DOUBLE))) AS sigma
       |  FROM m
       |), p AS (
       |  SELECT d.event_type, d.day, d.n_events, ms.sigma,
       |    sum(CAST(d.n_events AS DOUBLE) - ms.mu - $k * ms.sigma)
       |      OVER (PARTITION BY d.event_type ORDER BY d.day
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_up,
       |    sum(ms.mu - $k * ms.sigma - CAST(d.n_events AS DOUBLE))
       |      OVER (PARTITION BY d.event_type ORDER BY d.day
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_dn
       |  FROM daily d JOIN ms ON ms.event_type = d.event_type
       |), s AS (
       |  SELECT event_type, day, n_events, sigma,
       |    p_up - least(0.0, min(p_up) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_up,
       |    p_dn - least(0.0, min(p_dn) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_dn
       |  FROM p
       |)
       |SELECT event_type, day, n_events,
       |  round(s_up, 6) + 0.0 AS cusum_up,
       |  round(s_dn, 6) + 0.0 AS cusum_dn,
       |  s_up > $h * sigma AS alarm_up,
       |  s_dn > $h * sigma AS alarm_dn
       |FROM s ORDER BY event_type, day""".stripMargin

  // ------------------------------------------------------ ridge path

  /** Closed-form ridge regression along a REGULARIZATION PATH —
    * [[olsMultiOf]]'s 3×3 Cramer solve with λ added to the slope
    * diagonals (the intercept is unpenalized, the standard form:
    * minimize Σ(y−b0−b1x1−b2x2)² + λ(b1²+b2²) ⇒ normal-equation
    * matrix [[n s1 s2][s1 s11+λ s12][s2 s12 s22+λ]]). The path is
    * where the shape earns its keep at scale: ONE map-side-combined
    * moments pass over the corpus, then every λ is a constant-time
    * solve on the broadcast 1-row moment table (explode over the λ
    * literals) — a hyperparameter sweep costs zero extra scans. All
    * determinants stay EXACT DECIMAL(38)/HUGEINT integers because λ
    * is an exact integer in cents² units; coefficients and R² ship
    * UNROUNDED (both engines divide identical integers → bit-identical
    * doubles). Ridge R² cannot use the OLS orthogonality shortcut
    * (syy − Σbᵢsᵢy holds only at the unpenalized optimum), so SSR is
    * the full quadratic form over the same moments, folded in pinned
    * operand order. λ=0 reproduces `q_ols_multi` exactly — the path's
    * first row cross-validates the OLS op. Singular design reads NULL.
    */
  def ridgePathOf(rows: DataFrame, x1: String, x2: String, y: String,
      lambdas: Seq[Long] = Seq(0L, 1000000L, 1000000000L, 1000000000000L)): DataFrame = {
    val m = rows.agg(
      count(lit(1)).as("n"),
      sum(dec(col(x1))).as("s1"), sum(dec(col(x2))).as("s2"),
      sum(dec(col(x1)) * dec(col(x1))).as("s11"),
      sum(dec(col(x2)) * dec(col(x2))).as("s22"),
      sum(dec(col(x1)) * dec(col(x2))).as("s12"),
      sum(dec(col(y))).as("sy"),
      sum(dec(col(x1)) * dec(col(y))).as("s1y"),
      sum(dec(col(x2)) * dec(col(y))).as("s2y"),
      sum(dec(col(y)) * dec(col(y))).as("syy"))
    val nD = col("n").cast("decimal(20,0)")
    val lam = col("lambda").cast("decimal(20,0)")
    val a11 = col("s11") + lam
    val a22 = col("s22") + lam
    val det = nD * (a11 * a22 - col("s12") * col("s12")) -
      col("s1") * (col("s1") * a22 - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - a11 * col("s2"))
    val det0 = col("sy") * (a11 * a22 - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * a22 - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - a11 * col("s2y"))
    val det1 = nD * (col("s1y") * a22 - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * a22 - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 = nD * (a11 * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - a11 * col("s2"))
    val b0 = det0.cast("double") / det.cast("double")
    val b1 = det1.cast("double") / det.cast("double")
    val b2 = det2.cast("double") / det.cast("double")
    // SSR = syy − 2(b0·sy + b1·s1y + b2·s2y) + bᵀ(XᵀX)b, pinned order;
    // the penalty term λ(b1²+b2²) is NOT part of the fit residual
    val quad = b0 * b0 * col("n").cast("double") +
      b1 * b1 * col("s11").cast("double") +
      b2 * b2 * col("s22").cast("double") +
      lit(2.0) * b0 * b1 * col("s1").cast("double") +
      lit(2.0) * b0 * b2 * col("s2").cast("double") +
      lit(2.0) * b1 * b2 * col("s12").cast("double")
    val ssr = col("syy").cast("double") - lit(2.0) * (b0 * col("sy").cast("double") +
      b1 * col("s1y").cast("double") + b2 * col("s2y").cast("double")) + quad
    val sst = col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / col("n").cast("double")
    m.select(col("*"), explode(array(lambdas.map(lit): _*)).as("lambda"))
      .select(col("lambda"), col("n"),
        when(det =!= 0, b0).as("b0"),
        when(det =!= 0, b1).as("b1"),
        when(det =!= 0, b2).as("b2"),
        when(det =!= 0 && sst =!= 0.0, lit(1.0) - ssr / sst).as("r2"))
      .orderBy("lambda")
  }

  /** Gated form: the `q_ols_multi` design (extendedprice ~ quantity +
    * discount, exact cents) swept over λ ∈ {0, 10⁶, 10⁹, 10¹²} cents².
    */
  def ridgePath(t: Tables): DataFrame =
    ridgePathOf(
      t.lineitem.select(
        round(col("l_quantity") * 100).cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_extendedprice") * 100).cast("long").as("y")),
      "x1", "x2", "y")

  val ridgePathSql: String =
    """WITH base AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x1,
      |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem
      |), m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
      |    sum(CAST(x1 AS HUGEINT) * x1) AS s11,
      |    sum(CAST(x2 AS HUGEINT) * x2) AS s22,
      |    sum(CAST(x1 AS HUGEINT) * x2) AS s12,
      |    sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x1 AS HUGEINT) * y) AS s1y,
      |    sum(CAST(x2 AS HUGEINT) * y) AS s2y,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM base
      |), lam AS (
      |  SELECT CAST(l AS HUGEINT) AS lambda
      |  FROM (VALUES (0), (1000000), (1000000000), (1000000000000)) t(l)
      |), d AS (
      |  SELECT lambda, n, sy, s1y, s2y, syy, s1, s2, s11, s22, s12,
      |    n * ((s11+lambda) * (s22+lambda) - s12 * s12)
      |      - s1 * (s1 * (s22+lambda) - s12 * s2)
      |      + s2 * (s1 * s12 - (s11+lambda) * s2) AS det,
      |    sy * ((s11+lambda) * (s22+lambda) - s12 * s12)
      |      - s1 * (s1y * (s22+lambda) - s12 * s2y)
      |      + s2 * (s1y * s12 - (s11+lambda) * s2y) AS det0,
      |    n * (s1y * (s22+lambda) - s12 * s2y)
      |      - sy * (s1 * (s22+lambda) - s12 * s2)
      |      + s2 * (s1 * s2y - s1y * s2) AS det1,
      |    n * ((s11+lambda) * s2y - s1y * s12)
      |      - s1 * (s1 * s2y - s1y * s2)
      |      + sy * (s1 * s12 - (s11+lambda) * s2) AS det2
      |  FROM m CROSS JOIN lam
      |), b AS (
      |  SELECT lambda, n, sy, s1y, s2y, syy, s1, s2, s11, s22, s12, det,
      |    CAST(det0 AS DOUBLE) / nullif(CAST(det AS DOUBLE), 0.0) AS b0,
      |    CAST(det1 AS DOUBLE) / nullif(CAST(det AS DOUBLE), 0.0) AS b1,
      |    CAST(det2 AS DOUBLE) / nullif(CAST(det AS DOUBLE), 0.0) AS b2
      |  FROM d
      |), r AS (
      |  SELECT lambda, n, det, b0, b1, b2,
      |    CAST(syy AS DOUBLE) - 2.0 * (b0 * CAST(sy AS DOUBLE)
      |        + b1 * CAST(s1y AS DOUBLE) + b2 * CAST(s2y AS DOUBLE))
      |      + (b0 * b0 * CAST(n AS DOUBLE) + b1 * b1 * CAST(s11 AS DOUBLE)
      |        + b2 * b2 * CAST(s22 AS DOUBLE)
      |        + 2.0 * b0 * b1 * CAST(s1 AS DOUBLE)
      |        + 2.0 * b0 * b2 * CAST(s2 AS DOUBLE)
      |        + 2.0 * b1 * b2 * CAST(s12 AS DOUBLE)) AS ssr,
      |    CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS sst
      |  FROM b
      |)
      |SELECT CAST(lambda AS BIGINT) AS lambda, CAST(n AS BIGINT) AS n,
      |  CASE WHEN det <> 0 THEN b0 END AS b0,
      |  CASE WHEN det <> 0 THEN b1 END AS b1,
      |  CASE WHEN det <> 0 THEN b2 END AS b2,
      |  CASE WHEN det <> 0 AND sst <> 0.0 THEN 1.0 - ssr / sst END AS r2
      |FROM r ORDER BY lambda""".stripMargin
}
