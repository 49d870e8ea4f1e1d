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
