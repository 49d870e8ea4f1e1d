package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FeaturePrep

/** Unit semantics for the feature-prep tranche — the hash gate proves
  * engine parity; these pin the SEMANTICS on planted tables.
  */
class FeaturePrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------ target encoding

  test("targetEncode: LOO excludes the row's own target (hand-computed)") {
    // cat a: y = 10, 20, 30 → LOO for the 10-row is (20+30)/2 = 25
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 100L))
      .toDF("k", "cat", "y")
    val rows = FeaturePrep.targetEncodeOf(df, "cat", "y", Seq("k"))
      .select("k", "enc_loo").collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getDouble(1) == 25.0)
    assert(rows(2L).getDouble(1) == 20.0) // (10+30)/2
    assert(rows(3L).getDouble(1) == 15.0) // (10+20)/2
  }

  test("targetEncode: a singleton category reads NULL LOO and a prior-dominated smoothed value") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "solo", 999L))
      .toDF("k", "cat", "y")
    val solo = FeaturePrep.targetEncodeOf(df, "cat", "y", Seq("k"), m = 20)
      .filter($"k" === 3L).collect().head
    assert(solo.isNullAt(solo.fieldIndex("enc_loo")))
    // smoothed: (n_g·0 + 20·s_g)/(n_g·20) = s_g/n_g = global mean 343
    assert(math.abs(solo.getDouble(solo.fieldIndex("enc_smooth")) - 1029.0 / 3) < 1e-9)
  }

  test("targetEncode: smoothing shrinks toward the global mean between LOO and prior") {
    val df = (1L to 9L).map(k => (k, "big", 100L)) :+ ((10L, "small", 0L)) :+ ((11L, "small", 0L))
    val rows = FeaturePrep.targetEncodeOf(df.toDF("k", "cat", "y"), "cat", "y", Seq("k"), m = 2)
      .filter($"k" === 10L).collect().head
    val smooth = rows.getDouble(rows.fieldIndex("enc_smooth"))
    val loo = rows.getDouble(rows.fieldIndex("enc_loo"))
    val globalMean = 900.0 / 11
    assert(loo == 0.0)
    assert(smooth > loo && smooth < globalMean)
  }

  // ------------------------------------------------ feature scaling

  test("featureScale: 1,2,3 reads sample z-scores -1, 0, 1 and min-max 0, 0.5, 1") {
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("k", "x")
    val rows = FeaturePrep.featureScaleOf(df, Seq("x"), Seq("k"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getDouble(1) == -1.0 && rows(1L).getDouble(2) == 0.0)
    assert(rows(2L).getDouble(1) == 0.0 && rows(2L).getDouble(2) == 0.5)
    assert(rows(3L).getDouble(1) == 1.0 && rows(3L).getDouble(2) == 1.0)
  }

  test("featureScale: a constant column reads NULL for both scalings, not ±Inf") {
    val df = Seq((1L, 7L), (2L, 7L)).toDF("k", "x")
    val r = FeaturePrep.featureScaleOf(df, Seq("x"), Seq("k")).collect().head
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("featureScale: multiple columns scale independently in one pass") {
    val df = Seq((1L, 1L, 30L), (2L, 2L, 20L), (3L, 3L, 10L)).toDF("k", "a", "b")
    val r3 = FeaturePrep.featureScaleOf(df, Seq("a", "b"), Seq("k"))
      .filter($"k" === 3L).collect().head
    assert(r3.getDouble(r3.fieldIndex("z_a")) == 1.0)
    assert(r3.getDouble(r3.fieldIndex("z_b")) == -1.0)
    assert(r3.getDouble(r3.fieldIndex("mm_b")) == 0.0)
  }
}
