package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Classify, Experiment, QualityRules}
import graft.sources.Tables

/** q_wilson_rank / q_cuped / q_bh_fdr: the experimentation-stats
  * trio — hand-walked interval, variance-reduction, and step-up math.
  */
class ExperimentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("wilson: a 1-of-1 part ranks below a 40-of-60 part") {
    import spark.implicits._
    val li = (Seq((1L, "R")) ++                       // 1/1 returned
      (1 to 40).map(_ => (2L, "R")) ++ (1 to 20).map(_ => (2L, "N")))
      .toDF("l_partkey", "l_returnflag")
    val got = Experiment.wilsonRankOf(li)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // closed forms at z=1.96: p̂=1, n=1 → lb = 1/(1+z²);
    // p̂=2/3, n=60 → the formula evaluated here with identical ops
    val z = 1.96; val z2 = z * z
    def lb(r: Double, n: Double): Double = {
      val p = r / n
      BigDecimal((p + z2 / (2.0 * n) - z * math.sqrt((p * (1 - p) + z2 / (4.0 * n)) / n)) /
        (1.0 + z2 / n)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.toSeq == Seq(
      (2L, 60L, 40L, 0.666667, lb(40, 60)),
      (1L, 1L, 1L, 1.0, lb(1, 1))))
    assert(lb(40, 60) > lb(1, 1)) // the ranking inversion Wilson exists for
  }

  test("cuped: a perfectly covariate-explained metric reduces variance to ~1") {
    import spark.implicits._
    // user u spends v in the pre window and exactly 2v in the
    // experiment window → θ = 2, var(y_adj) = 0, reduction = 1
    def ev(u: Long, day: Int, v: Double) =
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), u, v)
    val rows = (1L to 8L).flatMap { u =>
      val v = 10.0 + u // distinct pre spends per user, both variants
      Seq(ev(u, 3, v), ev(u, 20, 2 * v))
    }
    val events = rows.toDF("ts", "user_id", "value")
    val got = Experiment.cupedOf(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getDouble(6), r.getDouble(7)))
    // (variant, n_users, theta, var_y_adj, var_reduction)
    assert(got.toSeq == Seq((0L, 4L, 2.0, 0.0, 1.0), (1L, 4L, 2.0, 0.0, 1.0)))
  }

  test("bh-fdr: one planted extreme brand is rejected, neutral brands are not") {
    import spark.implicits._
    // four neutral brands at 50/200; one SMALL extreme brand at 18/20
    // (small so it barely moves the pooled rest the neutrals test
    // against — their z stays ≈ −0.58, p ≈ 0.56, above every crit)
    val li = (1 to 5).flatMap { b =>
      val (n, r) = if (b == 5) (20, 18) else (200, 50)
      (1 to n).map(i => (b.toLong * 1000 + i, if (i <= r) "R" else "N"))
    }.toDF("l_partkey", "l_returnflag")
    val part = (1 to 5).flatMap { b =>
      val n = if (b == 5) 20 else 200
      (1 to n).map(i => (b.toLong * 1000 + i, s"BRAND#$b"))
    }.toDF("p_partkey", "p_brand")
    val got = Experiment.bhFdrOf(li, part)
      .collect().map(r => (r.getString(0), r.getLong(6), r.getDouble(7),
        r.getBoolean(8)))
    // the extreme brand carries the smallest p (rank 1) and is
    // rejected; crit_i = 0.1·i/5 exactly
    assert(got.head._1 == "BRAND#5" && got.head._4)
    assert(got.map(_._3).toSeq == Seq(0.02, 0.04, 0.06, 0.08, 0.1))
    // neutral brands all share one rate; none clears its threshold
    assert(got.tail.forall(!_._4))
  }
}

/** q_classifier_report: per-class P/R/F1 + the chance-corrected
  * overall row on a perfectly separable corpus.
  */
class ClassifierReportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("disjoint vocabularies: accuracy 1, kappa 1, per-class f1 1") {
    import spark.implicits._
    // two classes with disjoint words; even ids train, odd score
    val docs = (0L to 19L).map { i =>
      if (i % 4 < 2) (i, "foo foo baz", "aa", "s", 11L)
      else (i, "bar qux", "bb", "s", 7L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Classify.classifierReportOf(docs).collect()
    val overall = got.last
    assert(overall.getString(0) == "~overall")
    assert(overall.getDouble(7) == 1.0)            // accuracy
    assert(overall.getDouble(8) == 1.0)            // kappa (pe = 1/2 here)
    val classRows = got.dropRight(1)
    assert(classRows.map(_.getString(0)).toSeq == Seq("aa", "bb"))
    classRows.foreach { r =>
      assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
      assert(r.isNullAt(7) && r.isNullAt(8))
    }
  }

  test("marginals reconcile: class n_actual sums to the overall row") {
    val t = Tables(spark, TestSpark.sf)
    val got = Classify.classifierReportOf(t.documents).collect()
    val overall = got.last
    val classRows = got.dropRight(1)
    assert(classRows.map(_.getLong(1)).sum == overall.getLong(1))
    assert(classRows.map(_.getLong(2)).sum == overall.getLong(2))
    assert(classRows.map(_.getLong(3)).sum == overall.getLong(3))
  }
}

/** q_code_detect: hand-counted signals on a code-shaped and a
  * prose-shaped document.
  */
class CodeDetectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("code doc fires the gate; prose does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "def foo(x): return x;", "en", "s", 21L),
      (2L, "the cat sat on the mat", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = QualityRules.codeDetectOf(docs).collect()
    val code = got(0)
    // "def foo(x): return x;" — 21 chars; symbols ( ) ; = 3;
    // keywords def, return = 2; whitespace tokens = 4
    assert((code.getLong(1), code.getLong(2), code.getLong(3), code.getLong(4))
      == ((21L, 3L, 2L, 4L)))
    assert(code.getDouble(5) == BigDecimal(3.0 / 21.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(code.getDouble(6) == 50.0)              // 100·2/4
    assert(code.getBoolean(8))                     // 10·(3/21) + 5 ≥ 0.5
    val prose = got(1)
    assert(prose.getLong(2) == 0L && prose.getLong(3) == 0L)
    assert(!prose.getBoolean(8))
  }

  test("empty doc reports zeros and stays prose") {
    import spark.implicits._
    val docs = Seq((1L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = QualityRules.codeDetectOf(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((0L, 0L, 0L, 0L)))
    assert(r.getDouble(7) == 0.0 && !r.getBoolean(8))
  }
}

/** q_srm_check / q_diff_in_diff / q_power_mde: the experiment-health
  * companions — planted imbalance, a planted treatment effect, and
  * closed-form power arithmetic.
  */
class ExperimentHealthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def asP(z: Double): Double = {
    // the shared A&S 26.2.17 evaluation, Scala-side, for expected values
    val k = 1.0 / (1.0 + 0.2316419 * z)
    val pdf = math.exp(z * z * -0.5) / math.sqrt(2.0 * math.Pi)
    val poly = k * (0.319381530 + k * (-0.356563782 +
      k * (1.781477937 + k * (-1.821255978 + k * 1.330274429))))
    BigDecimal(2.0 * pdf * poly).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  test("srm: a planted 80/20 split alarms; a 50/50 split does not") {
    import spark.implicits._
    def ev(u: Long) = (u, "view", 1.0, java.sql.Timestamp.valueOf("2024-01-03 12:00:00"))
    // 80 even-id exposed users vs 20 odd-id ones → chi2 = 60²/100 = 36
    val skewed = ((1 to 80).map(i => ev(2L * i)) ++ (1 to 20).map(i => ev(2L * i + 1)))
      .toDF("user_id", "event_type", "value", "ts")
    val r = Experiment.srmCheckOf(skewed).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((80L, 20L, 100L)))
    assert(r.getDouble(3) == 36.0)
    assert(r.getDouble(4) == asP(6.0) && r.getBoolean(5))
    val balanced = ((1 to 50).map(i => ev(2L * i)) ++ (1 to 50).map(i => ev(2L * i + 1)))
      .toDF("user_id", "event_type", "value", "ts")
    val b = Experiment.srmCheckOf(balanced).collect().head
    assert(b.getDouble(3) == 0.0 && b.getDouble(4) == 1.0 && !b.getBoolean(5))
  }

  test("srm: non-view events do not count as exposure") {
    import spark.implicits._
    val events = Seq(
      (2L, "view", 1.0, java.sql.Timestamp.valueOf("2024-01-03 12:00:00")),
      (3L, "purchase", 9.0, java.sql.Timestamp.valueOf("2024-01-03 12:00:00")))
      .toDF("user_id", "event_type", "value", "ts")
    val r = Experiment.srmCheckOf(events).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 0L))) // purchase-only user excluded
  }

  test("diff-in-diff: a planted uniform treatment effect is recovered exactly") {
    import spark.implicits._
    def ev(u: Long, day: Int, v: Double) =
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), u, v)
    // control (even ids): v pre, v post → delta 0
    // treated (odd ids): v pre, v + 3 ± 1 post → deltas {2, 4}, mean 3
    val rows = (1L to 4L).flatMap { i =>
      val v = 10.0 + i
      Seq(ev(2 * i, 3, v), ev(2 * i, 20, v)) ++
        Seq(ev(2 * i + 1, 3, v), ev(2 * i + 1, 20, v + 3.0 + (if (i % 2 == 0) 1.0 else -1.0)))
    }
    val events = rows.toDF("ts", "user_id", "value")
    val r = Experiment.diffInDiffOf(events).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 4L)))
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 3.0 && r.getDouble(4) == 3.0)
    // treated deltas {2,4,2,4} → var = (4·60000 − 240000... in cents:
    // d ∈ {200,400}; n·Σd² − S² = 4·(2·200²+2·400²) − 1200² = 4·400000 − 1440000
    // = 160000; /(4·3)/10000 = 4/3 dollars²; control var 0
    val se = math.sqrt(4.0 / 3.0 / 4.0)
    assert(r.getDouble(5) ==
      BigDecimal(se).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(6) ==
      BigDecimal(3.0 / se).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("diff-in-diff: zero-variance arms read se=0 and a NULL t") {
    import spark.implicits._
    def ev(u: Long, day: Int, v: Double) =
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), u, v)
    val rows = (1L to 4L).flatMap { i =>
      Seq(ev(2 * i, 3, 10.0), ev(2 * i, 20, 10.0),
        ev(2 * i + 1, 3, 10.0), ev(2 * i + 1, 20, 15.0))
    }
    val r = Experiment.diffInDiffOf(rows.toDF("ts", "user_id", "value")).collect().head
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 0.0 && r.isNullAt(6))
  }

  test("power-mde: closed form at n=200/r=50; degenerate brands read NULL") {
    import spark.implicits._
    // brand A: 200 items, 50 returned; brand B: all returned (rate 1 → NULL);
    // brand C: 1 item (n < 2 → NULL)
    val li = ((1 to 200).map(i => (i.toLong, if (i <= 50) "R" else "N")) ++
      (201 to 210).map(i => (i.toLong, "R")) ++ Seq((211L, "N")))
      .toDF("l_partkey", "l_returnflag")
    val part = ((1 to 200).map(i => (i.toLong, "A")) ++
      (201 to 210).map(i => (i.toLong, "B")) ++ Seq((211L, "C")))
      .toDF("p_partkey", "p_brand")
    val got = Experiment.powerMdeOf(li, part).collect()
    val a = got(0)
    val mde = 2.801585219 * math.sqrt(2.0 * 0.25 * 0.75 / 100.0)
    assert(a.getDouble(4) ==
      BigDecimal(mde).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(a.getDouble(5) ==
      BigDecimal(mde / 0.25).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!a.getBoolean(6)) // 17pp MDE is nowhere near powered for 5pp
    assert(a.getDouble(4) > 0.05)
    Seq(got(1), got(2)).foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
  }
}
