package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics3

/** Unit semantics for the third analytics tranche (Benford, chi-square,
  * autocorrelation, PSI drift, Gini) — the hash gate proves engine
  * parity; these pin the SEMANTICS on hand-built cases with closed-form
  * expected statistics.
  */
class Analytics3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(String, String)]) =
    rows.toDF("ts_s", "event_type")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"),
        lit(1L).as("user_id"), lit(0.0).as("value"))

  test("benford: exact digit extraction from cents, dense 1-9 grid, rates sum to 1") {
    // 1013.70 → cents 101370 → digit 1; 20.50 → 2050 → 2; 999.99 → 99999 → 9
    val orders = Seq(1013.70, 20.50, 999.99, 150.00, 12.34).toDF("o_totalprice")
    val got = Analytics3.benfordOf(orders)
      .select("digit", "n_orders", "obs_rate", "benford_rate")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 9L))           // dense grid, zero digits included
    val byDigit = got.map(g => g._1 -> g._2).toMap
    assert(byDigit(1L) == 3L && byDigit(2L) == 1L && byDigit(9L) == 1L)
    assert(got.map(_._2).sum == 5L)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6)
    // Benford expectation is the published log10(1+1/d) table
    assert(math.abs(byDigit.size.toDouble - 9.0) < 1e-9)
    assert(math.abs(got.find(_._1 == 1L).get._4 - 0.30103) < 1e-5)
  }

  test("chi-square: 2x2 contingency matches the closed form") {
    // 2024-01-01 = Monday, 2024-01-02 = Tuesday.
    // X: 30 Mon / 10 Tue; Y: 10 Mon / 30 Tue
    // χ² = n(ad-bc)² / ((a+b)(c+d)(a+c)(b+d)) = 80·800²/40⁴ = 20.0
    val rows =
      Seq.fill(30)(("2024-01-01 10:00:00", "X")) ++ Seq.fill(10)(("2024-01-02 10:00:00", "X")) ++
      Seq.fill(10)(("2024-01-01 11:00:00", "Y")) ++ Seq.fill(30)(("2024-01-02 11:00:00", "Y"))
    val r = Analytics3.chiSquareOf(ev(rows))
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(r._1 == 80L)       // n
    assert(r._2 == 2L && r._3 == 2L && r._4 == 1L) // types, dows, dof
    assert(math.abs(r._5 - 20.0) < 1e-9)
  }

  test("autocorr: alternating series gives the exact rank-k estimator values") {
    // one type, hours 0..9, counts 3,1,3,1,... → μ=2, Σ(x-μ)²=10
    // r1 = -9/10, r2 = +8/10, r3 = -7/10 exactly
    val rows = (0 until 10).flatMap { h =>
      val n = if (h % 2 == 0) 3 else 1
      Seq.fill(n)((f"2024-01-01 $h%02d:30:00", "alt"))
    }
    val got = Analytics3.autocorrOf(ev(rows), maxLag = 3)
      .select("lag", "n_pairs", "r").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 9L), (2L, 8L), (3L, 7L)))
    assert(got.map(_._3).toSeq == Seq(-0.9, 0.8, -0.7))
  }

  test("autocorr: silent hours are zeros in the series, not skipped rows") {
    // events at hours 0 and 2 only → dense series [2,0,2], μ=4/3
    // r1 = -16/9 / (24/9) = -2/3; the sparse series would read +1
    val rows = Seq.fill(2)(("2024-01-01 00:15:00", "gap")) ++
      Seq.fill(2)(("2024-01-01 02:45:00", "gap"))
    val got = Analytics3.autocorrOf(ev(rows), maxLag = 1)
      .select("n_pairs", "r").as[(Long, Double)].collect().head
    assert(got._1 == 2L)                       // dense pairs over 3 hours
    assert(got._2 == math.rint(-2.0 / 3 * 1e4) / 1e4)
  }

  test("autocorr: constant series reads NULL, not a division error") {
    val rows = (0 until 5).flatMap(h => Seq.fill(2)((f"2024-01-01 $h%02d:00:00", "const")))
    val got = Analytics3.autocorrOf(ev(rows), maxLag = 1).select("r").collect()
    assert(got.length == 1 && got.head.isNullAt(0))
  }

  test("psi: identical distributions read exactly 0, shifted source reads > 0") {
    // srcA and srcB identical → per-source rates equal the pooled rates
    // bin-for-bin even after +1 smoothing → PSI 0.0. srcC sits in a
    // different bin entirely → strictly positive.
    val same = (1 to 10).flatMap(i => Seq(("srcA", 100 + i), ("srcB", 100 + i)))
    val far = (1 to 10).map(i => ("srcC", 500 + i))
    val docs = (same ++ far).toDF("source", "n_chars")
    val got = Analytics3.psiDriftOf(docs).as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set("srcA", "srcB", "srcC"))
    assert(got("srcA")._1 == 10L && got("srcC")._1 == 10L)
    assert(got("srcA")._2 == got("srcB")._2)
    assert(got("srcC")._2 > got("srcA")._2 && got("srcC")._2 > 0.0)
  }

  test("gini: equal activity is 0, counts 1..4 hit the closed-form 0.25") {
    def events(counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, u) => Seq.fill(c)((u.toLong, "e")) }
        .toDF("user_id", "event_type")
    val eq = Analytics3.giniOf(events(Seq(5, 5, 5, 5)))
      .as[(Long, Long, Double)].collect().head
    assert(eq == ((4L, 20L, 0.0)))
    // sorted x = 1,2,3,4: G = 2·30/(4·10) − 5/4 = 0.25
    val sk = Analytics3.giniOf(events(Seq(1, 2, 3, 4)))
      .as[(Long, Long, Double)].collect().head
    assert(sk == ((4L, 10L, 0.25)))
  }

  test("ks drift: pool-matching source reads 0, extreme sources read the CDF gap") {
    // A all in bin0, B all in bin4, C split — pooled is 50/50 across
    // bins 0 and 4, so CDF gaps are exactly 0.5, 0.5, 0.0
    val docs = ((1 to 10).map(_ => ("A", 100)) ++ (1 to 10).map(_ => ("B", 500)) ++
      ((1 to 5).map(_ => ("C", 100)) ++ (1 to 5).map(_ => ("C", 500))))
      .toDF("source", "n_chars")
    val got = graft.operators.Analytics3.ksDriftOf(docs)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("A" -> ((10L, 0.5)), "B" -> ((10L, 0.5)), "C" -> ((10L, 0.0))))
  }

  test("cohort matrix: hand-built cohorts hit exact cells and rates") {
    // 2024-01-01/08/15 are Mondays. u1 signs up w0 and stays active;
    // u2 signs up w0 then churns; u3 signs up w1 and stays.
    val ev = Seq(
      (1L, "2024-01-02"), (1L, "2024-01-09"), (1L, "2024-01-16"),
      (2L, "2024-01-03"),
      (3L, "2024-01-10"), (3L, "2024-01-17"))
      .toDF("user_id", "d")
      .select(col("user_id"), to_timestamp(col("d")).as("ts"))
    val got = graft.operators.Events.cohortMatrixOf(ev)
      .select("weeks_since", "cohort_users", "active_users", "rate", "cohort")
      .as[(Long, Long, Long, Double, java.sql.Timestamp)].collect()
      .map(r => (r._5.toString.take(10), r._1) -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 1.0)),
      ("2024-01-01", 1L) -> ((2L, 1L, 0.5)),
      ("2024-01-01", 2L) -> ((2L, 1L, 0.5)),
      ("2024-01-08", 0L) -> ((1L, 1L, 1.0)),
      ("2024-01-08", 1L) -> ((1L, 1L, 1.0))), s"got $got")
  }

  test("gini: tied counts collapse in the value table but rank like the flat form") {
    // x = 1,1,4: Σi·x = 1+2+12 = 15 → G = 30/(3·6) − 4/3 = 0.3333
    val e = Seq.fill(1)((0L, "e")) ++ Seq.fill(1)((1L, "e")) ++ Seq.fill(4)((2L, "e"))
    val r = Analytics3.giniOf(e.toDF("user_id", "event_type"))
      .as[(Long, Long, Double)].collect().head
    assert(r._1 == 3L && r._2 == 6L)
    assert(r._3 == math.rint((30.0 / 18 - 4.0 / 3) * 1e6) / 1e6)
  }

  test("kaplan-meier: hand-computed curve with censoring — censored users feed n_risk, never d") {
    // durations: u1 converts at 1, u2 converts at 1, u3 censored at 2,
    // u4 converts at 3, u5 censored at 4 (and sets the horizon 01-10)
    // KM: t=1: n=5, d=2 -> S=0.6 ; t=3: n=|{3,4}|=2, d=1 -> S=0.3
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "view", 0.0),
      (1L, "2024-01-02 10:00:00", "purchase", 100.0), // dur 1, event
      (2L, "2024-01-03 10:00:00", "view", 0.0),
      (2L, "2024-01-04 10:00:00", "purchase", 95.0),  // dur 1, event
      (3L, "2024-01-08 10:00:00", "view", 0.0),       // dur 2, censored
      (4L, "2024-01-01 10:00:00", "view", 0.0),
      (4L, "2024-01-04 10:00:00", "purchase", 120.0), // dur 3, event
      (4L, "2024-01-05 10:00:00", "purchase", 50.0),  // later low-value: ignored
      (5L, "2024-01-06 10:00:00", "view", 0.0),
      (5L, "2024-01-10 10:00:00", "view", 0.0))       // dur 4, censored; horizon
      .toDF("user_id", "ts_s", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val got = graft.operators.Analytics2.survivalOf(rows)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == List((1L, 5L, 2L, 0.6), (3L, 2L, 1L, 0.3)), s"got $got")
  }

  test("ewma: windowed closed form equals the recurrence; planted spike flags exactly once") {
    // 10,10,10,40,10 daily counts: spike on day 4 (40 > 1.3×10), and
    // day 5's 10 is BELOW the post-spike smoothed level — not a spike
    val rows = Seq(10, 10, 10, 40, 10).zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n)((f"2024-01-0${d + 1}%s 12:00:00", "e"))
    }
    val got = Analytics3.ewmaOf(ev(rows))
      .select("day", "n_events", "ewma", "is_spike")
      .collect().map(r => (String.valueOf(r.getDate(0)), r.getLong(1),
        r.getDouble(2), if (r.isNullAt(3)) null else r.getBoolean(3)))
    // direct recurrence, same rounding
    val xs = Seq(10.0, 10.0, 10.0, 40.0, 10.0)
    val e = xs.tail.scanLeft(xs.head)((prev, x) => 0.3 * x + 0.7 * prev)
      .map(v => math.rint(v * 1e6) / 1e6)
    assert(got.map(_._3).toSeq == e, s"got ${got.map(_._3).toSeq} want $e")
    assert(got.map(_._4).toSeq == Seq(null, false, false, true, false))
  }

  test("bootstrap ci: brackets the point estimate, deterministic, collapses on a constant") {
    val t0 = graft.sources.Tables(spark, TestSpark.sf)
    val got = Analytics3.bootstrapCi(t0).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (g, m, lo, hi) =>
      assert(lo <= hi, s"$g: lo $lo > hi $hi")
      // Poisson-bootstrap CI of a mean brackets the point estimate on
      // any non-degenerate sample of this size
      assert(lo <= m && m <= hi, s"$g: point $m outside [$lo, $hi]")
      assert(hi - lo > 0, s"$g: zero-width interval on real data")
    }
    val again = Analytics3.bootstrapCi(t0).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toList == again.toList, "bootstrap must be deterministic")
    // constant column: every resample mean equals the constant
    val const = (1L to 200L).map(i => ("P", i, 42.0))
      .toDF("o_orderpriority", "o_orderkey", "o_totalprice")
    val c = Analytics3.bootstrapCiOf(const).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
    assert(c == ((42.0, 42.0, 42.0)), s"constant sample should collapse: $c")
  }

  // ------------------------------------------------------ Lorenz curve

  test("lorenzCurve: hand-computed points; last point is (1, 1)") {
    import spark.implicits._
    // users a,b: 1 event; user c: 2 events → vt {1:2 users/2 mass, 2:1/2}
    val ev = Seq((1L, 101L), (2L, 102L), (3L, 103L), (4L, 103L))
      .toDF("event_id", "user_id")
    val rows = graft.operators.Analytics3.lorenzCurveOf(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((1L, 2L, 2.0 / 3, 0.5), (2L, 3L, 1.0, 1.0)))
  }

  test("lorenzCurve: the curve never rises above the diagonal (pct_mass <= pct_users)") {
    import spark.implicits._
    val ev = (1L to 100L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i))
      .zipWithIndex.map { case (u, e) => (e.toLong, u) }.toDF("event_id", "user_id")
    val rows = graft.operators.Analytics3.lorenzCurveOf(ev).collect()
    rows.foreach(r => assert(r.getDouble(3) <= r.getDouble(2) + 1e-12))
  }
}
