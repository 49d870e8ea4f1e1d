package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics4

/** Unit semantics for the trend tranche (OLS, Mann–Kendall,
  * Theil–Sen, Brown smoothing, seasonal decomposition) — the hash gate
  * proves engine parity; these pin the SEMANTICS on hand-built series
  * with closed-form expected statistics.
  */
class Analytics4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One event row per unit of count: day index d (over 2024-01-01+d)
    * with count y becomes y rows at noon of that day.
    */
  private def series(counts: Seq[Long], eventType: String = "t") =
    counts.zipWithIndex.flatMap { case (y, d) =>
      Seq.fill(y.toInt)((f"2024-01-${d + 1}%02d 12:00:00", eventType))
    }.toDF("ts_s", "event_type")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"))

  test("trendOls: a perfect line reads slope/intercept exactly, r2 = 1") {
    // y = 2t + 3 for t = 0..4
    val got = Analytics4.trendOlsOf(series(Seq(3, 5, 7, 9, 11)))
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(got._2 == 5L)
    assert(math.abs(got._3 - 2.0) < 1e-9)
    assert(math.abs(got._4 - 3.0) < 1e-9)
    assert(math.abs(got._5 - 1.0) < 1e-9)
  }

  test("trendOls: a constant series has slope 0 and NULL r2 (zero y-variance)") {
    val row = Analytics4.trendOlsOf(series(Seq(4, 4, 4, 4)))
      .select("slope", "r2").collect().head
    assert(row.getDouble(0) == 0.0)
    assert(row.isNullAt(1))
  }

  test("mannKendall: strictly increasing n=5 gives S=10, varS=300/18, z≈2.2045") {
    val got = Analytics4.mannKendallOf(series(Seq(1, 2, 3, 4, 5)))
      .as[(String, Long, Long, Double, Double, String)].collect().head
    assert(got._3 == 10L)                             // all C(5,2) pairs concordant
    assert(math.abs(got._4 - 300.0 / 18.0) < 1e-6)    // no ties
    assert(math.abs(got._5 - (10 - 1) / math.sqrt(300.0 / 18.0)) < 1e-4)
    assert(got._6 == "increasing")
  }

  test("mannKendall: constant series is all ties — varS=0, NULL z, no trend") {
    val row = Analytics4.mannKendallOf(series(Seq(7, 7, 7, 7)))
      .select("s_stat", "var_s", "z", "trend").collect().head
    assert(row.getLong(0) == 0L)
    assert(row.getDouble(1) == 0.0)
    assert(row.isNullAt(2))
    assert(row.getString(3) == "no trend")
  }

  test("mannKendall: strictly decreasing reads decreasing") {
    val got = Analytics4.mannKendallOf(series(Seq(9, 7, 5, 3, 1)))
      .select("s_stat", "trend").as[(Long, String)].collect().head
    assert(got._1 == -10L && got._2 == "decreasing")
  }

  test("theilSen: exact line recovers slope and intercept; one outlier day cannot move them") {
    val clean = Analytics4.theilSenOf(series(Seq(3, 5, 7, 9, 11)))
      .as[(String, Long, Double, Double)].collect().head
    assert(clean._2 == 10L)                           // C(5,2) pairs
    assert(math.abs(clean._3 - 2.0) < 1e-9 && math.abs(clean._4 - 3.0) < 1e-9)
    // y = 2x+3 except day 2 spikes to 100: 6 of 10 pair slopes stay 2,
    // so the interpolated median is still 2; the residual median is still 3.
    val robust = Analytics4.theilSenOf(series(Seq(3, 5, 100, 9, 11)))
      .as[(String, Long, Double, Double)].collect().head
    assert(math.abs(robust._3 - 2.0) < 1e-9 && math.abs(robust._4 - 3.0) < 1e-9)
  }

  test("holtBrown: matches the direct recurrence on a hand series") {
    // x = 10,20,30 at α=0.3: S1 = 10, 13, 18.1; S2 = 10, 10.9, 13.06
    val rows = Analytics4.holtBrownOf(series(Seq(10, 20, 30)), alpha = 0.3)
      .select("s1", "s2", "level", "trend", "forecast")
      .as[(Double, Double, Double, Double, Double)].collect()
    assert(rows.length == 3)
    val last = rows.last
    assert(math.abs(last._1 - 18.1) < 1e-6)
    assert(math.abs(last._2 - 13.06) < 1e-6)
    assert(math.abs(last._3 - (2 * 18.1 - 13.06)) < 1e-6)
    assert(math.abs(last._4 - (0.3 / 0.7) * (18.1 - 13.06)) < 1e-6)
    assert(math.abs(last._5 - (last._3 + last._4)) < 1e-6)
    // day 0 is the seed: S1 = S2 = x0, so trend is 0 and forecast = x0
    assert(rows.head._1 == 10.0 && rows.head._2 == 10.0 && rows.head._4 == 0.0)
  }

  test("seasonalDecompose: a linear ramp decomposes to exact trend, zero seasonal/residual") {
    // width 3 (halfWidth 1): trend at interior day d is the 3-day mean = y_d
    val rows = Analytics4.seasonalDecomposeOf(series(Seq(1, 2, 3, 4, 5)), halfWidth = 1)
      .orderBy("day")
      .select("n_events", "trend", "seasonal", "residual").collect()
    assert(rows.length == 5)
    assert(rows.head.isNullAt(1) && rows.last.isNullAt(1))     // truncated edges stay visible
    for (i <- 1 to 3) {
      assert(math.abs(rows(i).getDouble(1) - rows(i).getLong(0).toDouble) < 1e-9)
      assert(math.abs(rows(i).getDouble(2)) < 1e-9)
      assert(math.abs(rows(i).getDouble(3)) < 1e-9)
    }
  }

  test("madOutliers: modified z flags the planted spike, not the normal spread") {
    // counts 8,9,10,11,100 → med 10, MAD = median(2,1,0,1,90) = 1
    // z(100) = 0.6745·90 = 60.705 (outlier); z(8) = -1.349 (not)
    val rows = Analytics4.madOutliersOf(series(Seq(8, 9, 10, 11, 100)))
      .orderBy("day")
      .select("n_events", "med", "mad", "mod_z", "is_outlier").collect()
    assert(rows.forall(r => r.getDouble(1) == 10.0 && r.getDouble(2) == 1.0))
    assert(math.abs(rows.last.getDouble(3) - 60.705) < 1e-9 && rows.last.getBoolean(4))
    assert(math.abs(rows.head.getDouble(3) + 1.349) < 1e-9 && !rows.head.getBoolean(4))
  }

  test("madOutliers: zero MAD reads NULL z and no flags, not a /0") {
    val rows = Analytics4.madOutliersOf(series(Seq(5, 5, 5, 5, 5)))
      .select("mod_z", "is_outlier").collect()
    assert(rows.forall(r => r.isNullAt(0) && !r.getBoolean(1)))
  }

  test("winsorizedMean: exact-rank bounds clamp the spike; raw mean keeps it") {
    // one group, values 1..19 and 1000: k_lo=⌈.05·20⌉=1 → lo=1,
    // k_hi=⌈.95·20⌉=19 → hi=19; winsorized mean (Σ1..19 + 19)/20 = 10.45
    val orders = ((1 to 19).map(_.toDouble) :+ 1000.0)
      .map(v => ("1-URGENT", v)).toDF("o_orderpriority", "o_totalprice")
    val r = Analytics4.winsorizedMeanOf(orders)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    assert(r._2 == 20L)
    assert(r._3 == 1.0 && r._4 == 19.0)
    assert(math.abs(r._5 - 59.5) < 1e-9)    // raw mean carries the spike
    assert(math.abs(r._6 - 10.45) < 1e-9)   // winsorized mean doesn't
  }

  test("crossCorr: a one-day-shifted copy correlates perfectly at exactly that lag") {
    val a = series(Seq(1, 2, 3, 4, 5), "a")
    // b is a shifted one day later: b's day d+1 count = a's day d count
    val b = Seq(9L, 1, 2, 3, 4).zipWithIndex.flatMap { case (y, d) =>
      Seq.fill(y.toInt)((f"2024-01-${d + 1}%02d 12:00:00", "b"))
    }.toDF("ts_s", "event_type")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"))
    val got = Analytics4.crossCorrOf(a.unionByName(b), maxLag = 1)
      .as[(String, String, Long, Long, Option[Double])].collect()
    val byLag = got.map(r => r._3 -> r._5).toMap
    assert(byLag(1L).contains(1.0))          // aligned shift: perfect correlation
    assert(byLag(-1L).exists(_ < 1.0))       // anti-aligned shift is not perfect
    assert(got.forall { r => r._1 == "a" && r._2 == "b" })
  }

  test("textrank: the hub word wins; stopwords and rare pairs never enter the graph") {
    import graft.operators.CorpusScience
    // "engine" co-occurs with everything; "noise"/"blip" appear once
    // (below minPairs); "the" is a stopword glued to every window
    val docs = Seq(
      (1L, "the engine shuffles the engine sorts the engine joins"),
      (2L, "engine shuffles engine sorts engine joins"),
      (3L, "shuffles sorts joins engine shuffles sorts"),
      (4L, "noise blip")).toDF("doc_id", "text")
    val got = CorpusScience.textrankOf(docs, topK = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val words = got.map(_._1).toSet
    assert(!words.contains("the") && !words.contains("noise") && !words.contains("blip"))
    assert(got.head._1 == "engine", s"hub did not win: ${got.toSeq}")
    // ranks are a probability-like vector: positive, hub strictly above the rest
    assert(got.forall(_._2 > 0))
    assert(got.head._2 > got(1)._2)
  }

  test("anova: textbook two-group F and eta-squared") {
    import graft.operators.Analytics4
    // A: 1,2,3; B: 4,5,6 → SSB = 13.5, SSW = 4, F = 13.5/(4/4) = 13.5
    val orders = (Seq(1.0, 2.0, 3.0).map(("A", _)) ++ Seq(4.0, 5.0, 6.0).map(("B", _)))
      .toDF("o_orderpriority", "o_totalprice")
    val r = Analytics4.anovaOf(orders).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(math.abs(r.getDouble(2) - 17.5) < 1e-9)   // SStot
    assert(math.abs(r.getDouble(3) - 13.5) < 1e-9)   // SSB
    assert(math.abs(r.getDouble(4) - 4.0) < 1e-9)    // SSW
    assert(math.abs(r.getDouble(5) - 13.5) < 1e-6)   // F
    assert(math.abs(r.getDouble(6) - 13.5 / 17.5) < 1e-6)
    // all-identical values: zero SS everywhere, NULL F and eta
    val flat = Seq.fill(4)(("A", 5.0)).toDF("o_orderpriority", "o_totalprice")
    val f = Analytics4.anovaOf(flat).collect().head
    assert(f.getDouble(2) == 0.0 && f.isNullAt(5) && f.isNullAt(6))
  }

  test("welch t-test: hand-computed statistic and dof; degenerate arms read NULL") {
    import graft.operators.Analytics4
    // A: 10,20,30 (mean 20, var 100); B: 40,40,40,40 (mean 40, var 0)
    // se² = 100/3; t = (20−40)/√(100/3) = −3.4641; dof = nA−1 = 2
    val orders = (Seq(10.0, 20.0, 30.0).map(("A", _)) ++ Seq.fill(4)(("B", 40.0)))
      .toDF("o_orderpriority", "o_totalprice")
    val r = Analytics4.welchTTestOf(orders).collect().head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 3L && r.getLong(3) == 4L)
    assert(math.abs(r.getDouble(4) - 20.0) < 1e-9 && math.abs(r.getDouble(5) - 40.0) < 1e-9)
    assert(math.abs(r.getDouble(6) - (-20.0 / math.sqrt(100.0 / 3))) < 1e-5)
    assert(math.abs(r.getDouble(7) - 2.0) < 1e-4)
    assert(r.getBoolean(8))                         // |t| = 3.46 > 1.96
    // both arms constant → zero se² → NULL stats, not significant
    val flat = (Seq.fill(3)(("A", 5.0)) ++ Seq.fill(3)(("B", 5.0)))
      .toDF("o_orderpriority", "o_totalprice")
    val f = Analytics4.welchTTestOf(flat).collect().head
    assert(f.isNullAt(6) && f.isNullAt(7) && !f.getBoolean(8))
  }

  test("isotonic: PAV pools violators to the textbook fits") {
    // 5,3,4 → [5,3] violates → pool mean 4; next 4 ≥ 4 stands: 4,4,4
    val g1 = Analytics4.isotonicOf(series(Seq(5, 3, 4))).orderBy("day")
      .select("fitted").as[Double].collect().toSeq
    assert(g1 == Seq(4.0, 4.0, 4.0))
    // strictly decreasing collapses to one pool at the global mean
    val g2 = Analytics4.isotonicOf(series(Seq(3, 2, 1))).orderBy("day")
      .select("fitted").as[Double].collect().toSeq
    assert(g2 == Seq(2.0, 2.0, 2.0))
    // already monotone is a fixpoint
    val g3 = Analytics4.isotonicOf(series(Seq(1, 2, 2, 5))).orderBy("day")
      .select("fitted").as[Double].collect().toSeq
    assert(g3 == Seq(1.0, 2.0, 2.0, 5.0))
    // invariants on a messier series: monotone fit, sum preserved
    val ys = Seq(7L, 1, 6, 2, 9, 3, 3, 8)
    val fit = Analytics4.isotonicOf(series(ys)).orderBy("day")
      .select("fitted").as[Double].collect().toSeq
    assert(fit.zip(fit.tail).forall { case (a, b) => a <= b })
    assert(math.abs(fit.sum - ys.sum) < 1e-4)  // pool means conserve mass
  }

  test("intervalOverlap: bucket candidates + exact predicate — touching, crossing, disjoint") {
    import graft.operators.Events
    // u1 session 10:00–11:30 (crosses an hour bucket); u2 session
    // 10:50–11:10 overlaps it; u3 session 11:30–11:40 TOUCHES u1's end
    // (counts, overlap 0 with u1; overlaps u2? no — u2 ends 11:10);
    // u4 at 15:00 is disjoint from everyone.
    val rows = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 11:30:00"),
      (3L, 2L, "2024-01-01 10:50:00"), (4L, 2L, "2024-01-01 11:10:00"),
      (5L, 3L, "2024-01-01 11:30:00"), (6L, 3L, "2024-01-01 11:40:00"),
      (7L, 4L, "2024-01-01 15:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .select(col("event_id"), col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    // gap 120 min so each user's events form ONE session
    val got = Events.intervalOverlapOf(rows, gapMinutes = 120)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == Set(
      (1L, 2L, 1200L),   // 10:50–11:10 inside u1's session
      (1L, 3L, 0L)),     // endpoint touch counts with overlap 0
      s"got $got")
  }

  test("seasonalDecompose: components re-add to the observation wherever defined") {
    val noisy = Seq(5L, 9, 4, 8, 12, 3, 7, 6, 10, 5, 9, 13, 4, 8)
    val rows = Analytics4.seasonalDecomposeOf(series(noisy))
      .filter(col("trend").isNotNull)
      .select("n_events", "trend", "seasonal", "residual").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sum = r.getDouble(1) + r.getDouble(2) + r.getDouble(3)
      assert(math.abs(sum - r.getLong(0)) < 2e-6)  // 6dp rounds stack ×3
    }
  }
}
