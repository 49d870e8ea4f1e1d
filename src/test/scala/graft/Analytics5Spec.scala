package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics5

/** Unit semantics for the dependence tranche (Spearman, mutual
  * information) — the hash gate proves engine parity; these pin the
  * SEMANTICS on planted tables with closed-form expected values.
  */
class Analytics5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------- Spearman

  test("spearman: a nonlinear monotone map reads rho = 1 (THE Spearman property)") {
    // y = x² is monotone but not linear: Pearson < 1, Spearman = 1
    val df = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(x => (x, x * x)).toDF("x", "y")
    val rho = Analytics5.spearmanOf(df, Seq("x", "y")).select("rho")
      .collect().head.getDouble(0)
    assert(rho == 1.0)
  }

  test("spearman: a strictly decreasing map reads rho = -1") {
    val df = Seq(1L, 2L, 3L, 4L, 5L).map(x => (x, 100L - x * x)).toDF("x", "y")
    val rho = Analytics5.spearmanOf(df, Seq("x", "y")).select("rho")
      .collect().head.getDouble(0)
    assert(rho == -1.0)
  }

  test("spearman: a constant column has zero rank variance and reads NULL") {
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    val row = Analytics5.spearmanOf(df, Seq("x", "y")).select("rho").collect().head
    assert(row.isNullAt(0))
  }

  test("spearman: tied values take AVERAGE ranks (hand-computed rho)") {
    // x: 1,2,2,4  → avg ranks 1, 2.5, 2.5, 4
    // y: 10,20,30,30 → avg ranks 1, 2, 3.5, 3.5
    // rho = cov(rx,ry)/(σx σy) on those ranks:
    //   rx−r̄: −1.5, 0, 0, 1.5 ; ry−r̄: −1.5, −0.5, 1, 1
    //   Σxy = 2.25 + 0 + 0 + 1.5 = 3.75; Σxx = 4.5; Σyy = 2.25+0.25+1+1 = 4.5
    //   rho = 3.75/4.5 = 0.833333...
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (4L, 30L)).toDF("x", "y")
    val rho = Analytics5.spearmanOf(df, Seq("x", "y")).select("rho")
      .collect().head.getDouble(0)
    assert(math.abs(rho - 3.75 / 4.5) < 1e-6)
  }

  test("spearman: pair order and labels cover all C(k,2) pairs once") {
    val df = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L)).toDF("a", "b", "c")
    val rows = Analytics5.spearmanOf(df, Seq("a", "b", "c"))
      .select("col_x", "col_y").as[(String, String)].collect().toSeq
    assert(rows == Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  // ------------------------------------------- mutual information

  test("mutualInfo: an exactly independent grid reads mi = 0, chi2 = 0, V = 0") {
    // every (a, b) cell has the same count → nij = ni·nj/N exactly
    val df = (for (a <- Seq("x", "y"); b <- Seq("p", "q", "r"); _ <- 1 to 4)
      yield (a, b)).toDF("a", "b")
    val row = Analytics5.mutualInfoOf(df, "a", "b", "t")
      .select("mi", "chi2", "cramers_v").collect().head
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1) == 0.0)
    assert(row.getDouble(2) == 0.0)
  }

  test("mutualInfo: a bijective dependency reads mi = h_a = h_b, nmi = 1") {
    // b is a relabeling of a → knowing a determines b: MI = H(A) = H(B)
    val df = Seq.fill(2)(Seq(("a1", "b1"), ("a2", "b2"), ("a3", "b3"))).flatten
      .toDF("a", "b")
    val row = Analytics5.mutualInfoOf(df, "a", "b", "t")
      .select("mi", "h_a", "h_b", "nmi", "cramers_v").collect().head
    assert(math.abs(row.getDouble(0) - math.log(3)) < 1e-6)
    assert(row.getDouble(0) == row.getDouble(1))
    assert(row.getDouble(1) == row.getDouble(2))
    assert(row.getDouble(3) == 1.0)
    assert(row.getDouble(4) == 1.0) // perfect association
  }

  test("mutualInfo: a single-category column reads h = 0 and NULL nmi / V") {
    val df = Seq(("only", "b1"), ("only", "b2"), ("only", "b2")).toDF("a", "b")
    val row = Analytics5.mutualInfoOf(df, "a", "b", "t")
      .select("h_a", "nmi", "cramers_v", "r_card").collect().head
    assert(row.getDouble(0) == 0.0)
    assert(row.isNullAt(1))  // min entropy 0 → undefined
    assert(row.isNullAt(2))  // min(r−1, c−1) = 0 → undefined
    assert(row.getLong(3) == 1L)
  }

  test("mutualInfo: hand-computed 2x2 with skewed margins") {
    // cells: (a1,b1)=3 (a1,b2)=1 (a2,b1)=1 (a2,b2)=3, N=8
    // ni = nj = 4 each; MI = Σ (nij/8)·ln(8·nij/16)
    //    = 2·(3/8)ln(3/2) + 2·(1/8)ln(1/2)
    val df = (Seq.fill(3)(("a1", "b1")) ++ Seq(("a1", "b2")) ++
      Seq(("a2", "b1")) ++ Seq.fill(3)(("a2", "b2"))).toDF("a", "b")
    val expected = 2 * (3.0 / 8) * math.log(1.5) + 2 * (1.0 / 8) * math.log(0.5)
    val row = Analytics5.mutualInfoOf(df, "a", "b", "t")
      .select("mi", "chi2").collect().head
    assert(math.abs(row.getDouble(0) - expected) < 1e-6)
    // chi2 for 2x2 with e=2 everywhere: 4·(1)²/2 = 2
    assert(row.getDouble(1) == 2.0)
  }

  // --------------------------------------------------- Kendall τ-b

  /** Two event-type day series as raw events: one row per unit of
    * count at noon of day d (counts must be ≥1 — a zero-count day has
    * no rows and drops from the shared grid by declared semantics).
    */
  private def twoSeries(xs: Seq[Long], ys: Seq[Long]) =
    (xs.zipWithIndex.flatMap { case (y, d) => Seq.fill(y.toInt)((f"2024-01-${d + 1}%02d 12:00:00", "a")) } ++
     ys.zipWithIndex.flatMap { case (y, d) => Seq.fill(y.toInt)((f"2024-01-${d + 1}%02d 12:00:00", "b")) })
      .toDF("ts_s", "event_type")
      .select(org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts_s")).as("ts"),
        org.apache.spark.sql.functions.col("event_type"))

  test("kendall: a strictly concordant pair reads tau_b = 1") {
    val row = Analytics5.kendallOf(twoSeries(Seq(1, 2, 3, 4), Seq(2, 5, 7, 9)))
      .select("tau_b").collect().head
    assert(row.getDouble(0) == 1.0)
  }

  test("kendall: a strictly discordant pair reads tau_b = -1") {
    val row = Analytics5.kendallOf(twoSeries(Seq(1, 2, 3, 4), Seq(9, 7, 5, 2)))
      .select("tau_b").collect().head
    assert(row.getDouble(0) == -1.0)
  }

  test("kendall: hand-computed tau-b with one tie in each factor") {
    // x=(1,2,2,3), y=(1,3,2,2): nc=3, nd=1, n1=n2=1, n0=6
    // tau_b = (3-1)/(sqrt(5)*sqrt(5)) = 0.4
    val row = Analytics5.kendallOf(twoSeries(Seq(1, 2, 2, 3), Seq(1, 3, 2, 2)))
      .select("n0", "nc", "nd", "tau_b").collect().head
    assert(row.getLong(0) == 6L && row.getLong(1) == 3L && row.getLong(2) == 1L)
    assert(row.getDouble(3) == 0.4)
  }

  test("kendall: an all-tied factor reads NULL (zero denominator)") {
    val row = Analytics5.kendallOf(twoSeries(Seq(1, 2, 3), Seq(5, 5, 5)))
      .select("tau_b").collect().head
    assert(row.isNullAt(0))
  }

  // ------------------------------------------- multivariate OLS

  test("olsMulti: a perfect plane reads its coefficients exactly, r2 = 1") {
    // y = 3 + 2*x1 + 5*x2 over a non-degenerate grid
    val df = (for (a <- 1L to 4L; b <- 1L to 3L) yield (a, b, 3 + 2 * a + 5 * b))
      .toDF("x1", "x2", "y")
    val row = Analytics5.olsMultiOf(df, "x1", "x2", "y")
      .select("b0", "b1", "b2", "r2").collect().head
    assert(row.getDouble(0) == 3.0 && row.getDouble(1) == 2.0 && row.getDouble(2) == 5.0)
    assert(row.getDouble(3) == 1.0)
  }

  test("olsMulti: collinear regressors read NULL (singular normal equations)") {
    val df = Seq((1L, 2L, 10L), (2L, 4L, 20L), (3L, 6L, 31L)).toDF("x1", "x2", "y")
    val row = Analytics5.olsMultiOf(df, "x1", "x2", "y")
      .select("b0", "b1", "b2", "r2").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("olsMulti: a constant response reads slope 0 and NULL r2") {
    val df = (for (a <- 1L to 3L; b <- 1L to 3L) yield (a, b, 7L)).toDF("x1", "x2", "y")
    val row = Analytics5.olsMultiOf(df, "x1", "x2", "y")
      .select("b0", "b1", "b2", "r2").collect().head
    assert(row.getDouble(0) == 7.0 && row.getDouble(1) == 0.0 && row.getDouble(2) == 0.0)
    assert(row.isNullAt(3))
  }

  // ------------------------------------------------------ CUSUM

  private def oneSeries(xs: Seq[Long]) =
    xs.zipWithIndex.flatMap { case (y, d) =>
      Seq.fill(y.toInt)((f"2024-01-${d + 1}%02d 12:00:00", "t"))
    }.toDF("ts_s", "event_type")
      .select(org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts_s")).as("ts"),
        org.apache.spark.sql.functions.col("event_type"))

  test("cusum: closed form equals the direct clamped recursion") {
    val xs = Seq(5L, 6L, 4L, 5L, 9L, 10L, 11L, 9L, 10L, 12L)
    val rows = Analytics5.cusumOf(oneSeries(xs))
      .select("cusum_up", "cusum_dn").collect()
    // recompute the textbook recursion in Scala from the same moments
    val n = xs.size
    val mu = xs.sum.toDouble / n
    val sigma = math.sqrt((n.toDouble * xs.map(x => x * x).sum - xs.sum.toDouble * xs.sum)
      / (n.toDouble * (n - 1)))
    var (su, sd) = (0.0, 0.0)
    for ((x, i) <- xs.zipWithIndex) {
      su = math.max(0.0, su + (x - mu - 0.5 * sigma))
      sd = math.max(0.0, sd + (mu - 0.5 * sigma - x))
      assert(math.abs(rows(i).getDouble(0) - su) < 1e-6, s"up at day $i")
      assert(math.abs(rows(i).getDouble(1) - sd) < 1e-6, s"dn at day $i")
    }
  }

  test("cusum: a planted level shift fires alarm_up after the shift only") {
    // 12 quiet days at 5, then 6 days at 25: the upper sum must cross
    // 4 sigma somewhere in the shifted tail and nowhere before it
    val xs = Seq.fill(12)(5L) ++ Seq.fill(6)(25L)
    val rows = Analytics5.cusumOf(oneSeries(xs))
      .select("alarm_up", "alarm_dn").collect()
    val ups = rows.map(_.getBoolean(0)).toSeq
    assert(!ups.take(12).exists(identity), "no alarm during the quiet span")
    assert(ups.drop(12).exists(identity), "the shift must trip the upper alarm")
    assert(!rows.map(_.getBoolean(1)).exists(identity), "no lower alarm on an upward shift")
  }

  test("cusum: a constant series reads zero sums and no alarms") {
    val rows = Analytics5.cusumOf(oneSeries(Seq.fill(5)(7L)))
      .select("cusum_up", "cusum_dn", "alarm_up", "alarm_dn").collect()
    for (r <- rows) {
      assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
      assert(!r.getBoolean(2) && !r.getBoolean(3))
    }
  }

  // ------------------------------------------------------ ridge path

  test("ridgePath: lambda = 0 reproduces the OLS fit exactly") {
    val df = Seq((1L, 2L, 10L), (2L, 1L, 14L), (3L, 5L, 20L), (4L, 3L, 26L), (5L, 4L, 31L))
      .toDF("x1", "x2", "y")
    val ols = Analytics5.olsMultiOf(df, "x1", "x2", "y").collect().head
    val r0 = Analytics5.ridgePathOf(df, "x1", "x2", "y", Seq(0L)).collect().head
    assert(math.abs(r0.getDouble(r0.fieldIndex("b1")) - ols.getDouble(ols.fieldIndex("b1"))) < 1e-6)
    assert(math.abs(r0.getDouble(r0.fieldIndex("b2")) - ols.getDouble(ols.fieldIndex("b2"))) < 1e-6)
  }

  test("ridgePath: slopes shrink monotonically toward zero as lambda grows") {
    val df = Seq((1L, 9L, 12L), (2L, 7L, 18L), (3L, 4L, 27L), (4L, 3L, 38L), (5L, 1L, 52L))
      .toDF("x1", "x2", "y")
    val rows = Analytics5.ridgePathOf(df, "x1", "x2", "y", Seq(0L, 10L, 1000L, 100000L))
      .orderBy("lambda").collect()
    val mags = rows.map(r => math.abs(r.getDouble(r.fieldIndex("b1"))))
    assert(mags.sliding(2).forall { case Array(a, b) => b <= a + 1e-12 })
    assert(mags.last < 0.01 * mags.head) // huge lambda kills the slope
    val r2s = rows.map(r => r.getDouble(r.fieldIndex("r2")))
    assert(r2s.sliding(2).forall { case Array(a, b) => b <= a + 1e-12 }) // fit only degrades
  }

  test("ridgePath: a collinear design is singular at lambda = 0 but solvable for lambda > 0 (THE ridge property)") {
    val df = Seq((1L, 1L, 3L), (2L, 2L, 5L), (3L, 3L, 7L), (4L, 4L, 9L))
      .toDF("x1", "x2", "y") // x2 == x1 exactly
    val rows = Analytics5.ridgePathOf(df, "x1", "x2", "y", Seq(0L, 100L))
      .orderBy("lambda").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("b1")))
    assert(!rows(1).isNullAt(rows(1).fieldIndex("b1")))
    // symmetric penalty on identical columns splits the weight evenly
    assert(math.abs(rows(1).getDouble(rows(1).fieldIndex("b1"))
      - rows(1).getDouble(rows(1).fieldIndex("b2"))) < 1e-9)
  }
}
