package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Tabular feature preparation for model training — the encode/scale
  * pass a training-data pipeline runs between curation and the
  * trainer: leave-one-out target encoding of a categorical column
  * (the category's mean target EXCLUDING the row itself, the standard
  * leakage-safe mean encoding) and per-column standardization
  * (z-score + min-max) from one global moments pass. Reference has no
  * feature surface; §2.7 extension work. Both operators are a single
  * corpus scan plus a broadcast of enum/1-row statistics — the shape
  * that survives 100 TB: no per-row window, no shuffle wider than the
  * tiny stats table, the scan stays whole-stage codegen.
  */
object FeaturePrep {

  private def dec(c: Column): Column = c.cast("decimal(18,0)")

  // ---------------------------------------------- target encoding

  /** Leave-one-out target-mean encoding of `catCol` against integer
    * target `yCol` (exact cents): enc_loo = (Σ_c y − y_i)/(n_c − 1) —
    * the row's own target never leaks into its encoding — plus the
    * smoothed form enc_smooth = (Σ_c y − y_i + m·μ)/(n_c − 1 + m)
    * that shrinks rare categories toward the global mean μ (m
    * pseudo-observations; the Micci-Barreca scheme). Category sums
    * are exact DECIMAL integers from ONE map-side-combined aggregate
    * broadcast back over the scan, and BOTH encodings are a single
    * division of two exact integers — the smoothed form multiplies
    * through by n_g so μ never appears as a pre-division double:
    * (n_g·(Σ_c y − y_i) + m·Σ_g y) / (n_g·(n_c − 1 + m)). The
    * quotients ship UNROUNDED: both engines divide identical
    * integers, so the doubles are bit-identical, while a round(·, 6)
    * at ~1e7 magnitudes is exactly the engine seam `q_anova`
    * documented (Spark rounds the shortest decimal repr, DuckDB the
    * binary value — they disagree on .5-straddling quotients).
    * Singleton categories read NULL for the raw LOO (0/0) and the
    * prior-dominated smoothed value otherwise.
    */
  def targetEncodeOf(rows: DataFrame, catCol: String, yCol: String,
      keyCols: Seq[String], m: Int = 20): DataFrame = {
    val perCat = rows.groupBy(col(catCol))
      .agg(count(lit(1)).as("n_c"), sum(dec(col(yCol))).as("s_c"))
    val global = rows.agg(count(lit(1)).as("n_g"), sum(dec(col(yCol))).as("s_g"))
    val nG = col("n_g").cast("decimal(20,0)")
    val looNum = col("s_c") - dec(col(yCol))
    val smoothNum = nG * looNum + lit(m) * col("s_g")
    val smoothDen = nG * (col("n_c") - 1 + m).cast("decimal(20,0)")
    rows
      .join(broadcast(perCat), catCol)
      .crossJoin(broadcast(global))
      .select(keyCols.map(col) ++ Seq(
        col(catCol),
        when(col("n_c") > 1,
          looNum.cast("double") / (col("n_c") - 1).cast("double")).as("enc_loo"),
        (smoothNum.cast("double") / smoothDen.cast("double")).as("enc_smooth")): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Gated form: customer market segment encoding order total price
    * (cents-exact target), keyed by order.
    */
  def targetEncode(t: Tables): DataFrame =
    targetEncodeOf(
      t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
          round(col("o_totalprice") * 100).cast("long").as("y")),
      "seg", "y", Seq("o_orderkey"))

  val targetEncodeSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, c_mktsegment AS seg,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), per_cat AS (
      |  SELECT seg, count(*) AS n_c, sum(CAST(y AS HUGEINT)) AS s_c
      |  FROM base GROUP BY seg
      |), global AS (
      |  SELECT count(*) AS n_g, sum(CAST(y AS HUGEINT)) AS s_g FROM base
      |)
      |SELECT o_orderkey, seg,
      |  CASE WHEN n_c > 1 THEN
      |    CAST(s_c - y AS DOUBLE) / CAST(n_c - 1 AS DOUBLE) END AS enc_loo,
      |  CAST(CAST(n_g AS HUGEINT) * (s_c - y) + 20 * s_g AS DOUBLE)
      |    / CAST(CAST(n_g AS HUGEINT) * (n_c - 1 + 20) AS DOUBLE) AS enc_smooth
      |FROM base JOIN per_cat USING (seg) CROSS JOIN global
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------ feature scaling

  /** Per-row z-score + min-max standardization of every listed
    * integer column in ONE pass: a single map-side-combined aggregate
    * collects n, Σx, Σx², min, max for all columns (sums exact
    * DECIMAL — the `q_ols_multi` lane), the 1-row stats broadcast
    * back over the scan, and each row computes
    * z = (x − μ)/σ (sample σ² = (nΣx² − (Σx)²)/(n(n−1)), numerator
    * exact) and mm = (x − min)/(max − min) (both differences exact
    * LONGs). μ and σ are the only doubles before the division and
    * both engines derive them from identical integers in identical
    * operand order. A constant column (σ = 0 or max = min) reads NULL
    * rather than ±Inf.
    */
  def featureScaleOf(rows: DataFrame, cols: Seq[String],
      keyCols: Seq[String]): DataFrame = {
    // Σx² computes the square in LONG per row (ANSI-checked: loud at
    // |x| > ~3e9, a per-ROW magnitude bound that does not grow with
    // corpus size) and casts the product once for the exact DECIMAL
    // sum — same values as the old dec(x)*dec(x), but the hot path is
    // a long multiply instead of a per-row BigDecimal multiply
    // (guide §1.2 step 2: per-task work; measured on q_feature_scale).
    // Corpus-scaled headroom is unchanged: the SUMS stay DECIMAL(38).
    val moments = rows.agg(count(lit(1)).as("n"),
      cols.flatMap(c => Seq(
        sum(dec(col(c))).as(s"s_$c"),
        sum((col(c) * col(c)).cast("decimal(38,0)")).as(s"ss_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))): _*)
    val nD = col("n").cast("decimal(20,0)")
    // μ/σ finalize ON THE 1-ROW STATS TABLE — leaving them as column
    // expressions would re-run the DECIMAL(38) variance arithmetic and
    // the sqrt once per corpus row after the broadcast (measured 6.8 s
    // at sf0.1, ~1 s with the scalars pre-divided); per-row work must
    // be plain double subtract/divide only
    val stats = moments.select(col("*") +: cols.flatMap { c =>
      val varNum = (nD * col(s"ss_$c") - col(s"s_$c") * col(s"s_$c")).cast("double")
      Seq(
        (col(s"s_$c").cast("double") / col("n").cast("double")).as(s"mu_$c"),
        sqrt(varNum / (col("n").cast("double") * (col("n") - 1).cast("double")))
          .as(s"sigma_$c"),
        (col("n") > 1 && varNum > 0).as(s"zok_$c"))
    }: _*)
    // UNROUNDED on purpose: every operand is exact-integer-derived, so
    // the engines' doubles are bit-identical — and round(,6) is a
    // per-row BigDecimal allocation ×6 columns (visible at sf0.1)
    val scaled = cols.flatMap { c =>
      Seq(
        when(col(s"zok_$c"),
          (col(c).cast("double") - col(s"mu_$c")) / col(s"sigma_$c")).as(s"z_$c"),
        when(col(s"mx_$c") > col(s"mn_$c"),
          (col(c) - col(s"mn_$c")).cast("double")
            / (col(s"mx_$c") - col(s"mn_$c")).cast("double"))
          .as(s"mm_$c"))
    }
    // Order via repartitionByRange + sortWithinPartitions (same total
    // order as orderBy: unique keys, range partitions, local sort), so
    // the range-sampling pass re-executes only the NARROW raw scan and
    // the z/mm arithmetic runs once, AFTER the exchange, in parallel —
    // orderBy-last re-ran the whole scaled projection for the sampler
    // and serialized the math in the pre-exchange scan stage (guide
    // §2.4: establish the partitioning first, then compute).
    rows.repartitionByRange(keyCols.map(col): _*)
      .crossJoin(broadcast(stats))
      .select(keyCols.map(col) ++ scaled: _*)
      .sortWithinPartitions(keyCols.map(col): _*)
  }

  /** Gated form: lineitem quantity / extendedprice / discount in exact
    * cents, keyed by (orderkey, linenumber).
    */
  def featureScale(t: Tables): DataFrame =
    featureScaleOf(
      t.lineitem.select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") * 100).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price"),
        round(col("l_discount") * 100).cast("long").as("disc")),
      Seq("qty", "price", "disc"), Seq("l_orderkey", "l_linenumber"))

  val featureScaleSql: String = {
    val cols = Seq("qty", "price", "disc")
    val sums = cols.flatMap(c => Seq(
      s"sum(CAST($c AS HUGEINT)) AS s_$c",
      s"sum(CAST($c AS HUGEINT) * $c) AS ss_$c",
      s"min($c) AS mn_$c", s"max($c) AS mx_$c")).mkString(",\n    ")
    val outs = cols.flatMap(c => Seq(
      s"""CASE WHEN n > 1 AND CAST(n AS HUGEINT) * ss_$c - s_$c * s_$c > 0 THEN
         |    (CAST($c AS DOUBLE) - CAST(s_$c AS DOUBLE) / CAST(n AS DOUBLE))
         |      / sqrt(CAST(CAST(n AS HUGEINT) * ss_$c - s_$c * s_$c AS DOUBLE)
         |        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) END AS z_$c""".stripMargin,
      s"""CASE WHEN mx_$c > mn_$c THEN
         |    CAST($c - mn_$c AS DOUBLE) / CAST(mx_$c - mn_$c AS DOUBLE)
         |  END AS mm_$c""".stripMargin)).mkString(",\n  ")
    s"""WITH base AS (
       |  SELECT l_orderkey, l_linenumber,
       |    CAST(round(l_quantity * 100) AS BIGINT) AS qty,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
       |    CAST(round(l_discount * 100) AS BIGINT) AS disc
       |  FROM lineitem
       |), stats AS (
       |  SELECT count(*) AS n,
       |    $sums
       |  FROM base
       |)
       |SELECT l_orderkey, l_linenumber,
       |  $outs
       |FROM base CROSS JOIN stats
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }
}
