package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curate, Decontaminate}
import graft.sources.Tables

/** Data-selection operators: DSIR importance weighting/resampling and
  * the per-source contamination rollup. The oracle gates pin the
  * VALUES; these pin the semantics that make the numbers mean what
  * they claim — the target side actually scores higher, the sampler
  * actually tilts toward it, the rollup conserves the pair set.
  */
class DataSelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val t = Tables(spark, TestSpark.sf)

  test("dsir weights separate the target: English docs score higher on average") {
    val w = Curate.dsirWeights(t)
      .join(t.documents.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_logratio")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false),
      s"target-side mean ${w(true)} must exceed source-side ${w(false)} — " +
        "the hashed-ngram LMs are not separating the distributions")
  }

  test("dsir weights cover every doc exactly once with positive token counts") {
    val w = Curate.dsirWeights(t)
    assert(w.count() == t.documents.count())
    assert(w.filter(col("n_tokens") <= 0).isEmpty)
    assert(w.select("doc_id").distinct().count() == w.count())
  }

  test("dsir sampling tilts toward the target but keeps source diversity") {
    val all = Curate.dsirWeights(t).select(col("doc_id"), col("dsir_logratio"))
    val sampled = Curate.dsirSample(t, k = 100)
    assert(sampled.count() == 100)
    // subset of the scored set, same scores
    assert(sampled.join(all, Seq("doc_id", "dsir_logratio"), "left_anti").isEmpty)
    val mAll = all.agg(avg("dsir_logratio")).head().getDouble(0)
    val mSel = sampled.agg(avg("dsir_logratio")).head().getDouble(0)
    assert(mSel > mAll, s"sampled mean $mSel must exceed corpus mean $mAll")
    // sampling, not truncation: the sample must NOT be the top-k cut
    val topK = all.orderBy(col("dsir_logratio").desc, col("doc_id")).limit(100)
    val diff = sampled.join(topK, "doc_id", "left_anti").count()
    assert(diff > 0, "sample equals the top-k cut — that's truncation, not importance sampling")
  }

  test("contamination rates conserve the exact pair set and the training manifest") {
    val rates = Decontaminate.contaminationRates(t).collect()
    val nTrain = t.documents.filter(col("doc_id") % 19 =!= 0).count()
    assert(rates.map(_.getLong(1)).sum == nTrain, "per-source doc counts must sum to the manifest")
    val exactBad = Decontaminate.contaminationQuery(t)
      .select("train_id").distinct().count()
    assert(rates.map(_.getLong(2)).sum == exactBad,
      "per-source contaminated counts must sum to the exact contaminated set")
    rates.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }
}
