package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classify

/** Naive Bayes semantics on a planted corpus with hand-computable
  * likelihoods (the synthetic gate corpus has label-independent text,
  * so the hash gate proves parity there but accuracy is chance; here
  * the classes are separable and the math must recover them).
  */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // even doc_ids train, odd score
  private val docs = Seq(
    (0L, "alpha beta alpha", "aa"),
    (2L, "alpha", "aa"),
    (4L, "gamma delta", "bb"),
    (6L, "delta", "bb"),
    (1L, "alpha alpha beta", "aa"),     // clearly class aa
    (3L, "delta gamma delta", "bb"),    // clearly class bb
    (5L, "alpha nuclear", "aa")         // one unseen word must not break scoring
  ).toDF("doc_id", "text", "lang")

  test("nbTrain: Laplace-smoothed log-likelihoods match the closed form") {
    // train: aa tokens {alpha:3, beta:1} n_aa=4; bb {gamma:1, delta:2} n_bb=3; V=4
    val model = Classify.nbTrainOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(model.size == 4)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(model(("aa", "alpha")) == ((3L, r6(math.log(4.0 / 8)))))
    assert(model(("aa", "beta")) == ((1L, r6(math.log(2.0 / 8)))))
    assert(model(("bb", "gamma")) == ((1L, r6(math.log(2.0 / 7)))))
    assert(model(("bb", "delta")) == ((2L, r6(math.log(3.0 / 7)))))
  }

  test("nbScore: separable classes recovered; unseen words take the smoothed floor") {
    val got = Classify.nbScoreOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    assert(got.keySet == Set(1L, 3L, 5L))
    assert(got(1L)._2 == "aa" && got(1L)._4)
    assert(got(3L)._2 == "bb" && got(3L)._4)
    assert(got(5L)._2 == "aa" && got(5L)._4)   // "nuclear" unseen in both classes
    // doc 1 "alpha alpha beta" vs class aa, closed form:
    // prior ln(2/4) + 2·ln(3+1) + ln(1+1) − 3·ln(4+4)
    val want = math.log(0.5) + 2 * math.log(4.0) + math.log(2.0) - 3 * math.log(8.0)
    assert(math.abs(got(1L)._3 - want) < 1e-6)
  }

  test("nbConfusion: the separable corpus is all-diagonal with recall 1") {
    val got = Classify.nbConfusionOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == Set(("aa", "aa", 2L, 1.0), ("bb", "bb", 1L, 1.0)))
  }

  test("nbScore: an all-unseen doc falls back to priors and per-class floors") {
    val extra = docs.unionByName(Seq((7L, "zz qq", "aa")).toDF("doc_id", "text", "lang"))
    val got = Classify.nbScoreOf(extra).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // score(c) = prior_c + 2·ln(1/(n_c+V)): aa → ln(.5)+2·ln(1/8),
    // bb → ln(.5)+2·ln(1/7): bb's smaller denominator wins
    assert(got(7L) == "bb")
  }

  test("nbCalibration: bins partition the held-out docs and agree with the prediction query") {
    val cal = Classify.nbCalibrationOf(docs, binWidth = 0.5).collect()
    val preds = Classify.nbScoreOf(docs).collect()
    assert(cal.map(_.getLong(1)).sum == preds.length)
    assert(cal.map(_.getLong(2)).sum ==
      preds.count(r => r.getBoolean(r.fieldIndex("is_correct"))))
  }

  test("nbCalibration: margins land in their bins (min/max inside bin bounds, last bin open)") {
    val w = 0.5
    val maxBin = 7
    val cal = Classify.nbCalibrationOf(docs, binWidth = w, maxBin = maxBin).collect()
    cal.foreach { r =>
      val bin = r.getInt(0)
      val lo = r.getDouble(r.fieldIndex("margin_min"))
      val hi = r.getDouble(r.fieldIndex("margin_max"))
      assert(lo <= hi)
      assert(lo >= bin * w - 1e-9)
      if (bin < maxBin) assert(hi < (bin + 1) * w + 1e-9)
    }
  }

  test("nbCalibration: accuracy divides exact counts") {
    val cal = Classify.nbCalibrationOf(docs, binWidth = 0.5).collect()
    cal.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }
}
