package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed}
import graft.operators.{Analytics3, Events}

/** Property-based invariants for the statistics tranche. The DuckDB
  * hash gate proves engine parity on ONE corpus; these throw hundreds
  * of random small inputs at the operators and pin the mathematical
  * invariants that must hold on ALL of them. Spark jobs per trial are
  * tiny, so trial counts stay modest (the generators shrink toward the
  * degenerate inputs that historically break statistics code: empty
  * groups, single users, all-ties).
  */
class StatPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(30)
  private def holds(p: Prop, tag: String): Unit = {
    val r = check(params, p)
    assert(r.status == Passed, s"$tag: $r")
  }

  test("gini: always in [0, 1); 0 iff all counts equal; scale-free in the count unit") {
    val counts = Gen.nonEmptyListOf(Gen.choose(1, 12))
    holds(forAll(counts) { cs =>
      val df = cs.zipWithIndex
        .flatMap { case (c, u) => Seq.fill(c)((u.toLong, "e")) }
        .toDF("user_id", "event_type")
      val g = Analytics3.giniOf(df).select("gini").as[Double].collect().head
      val allEqual = cs.distinct.size == 1
      g >= 0.0 && g < 1.0 && (!allEqual || g == 0.0)
    }, "gini-range")
    // doubling every user's activity must not move the concentration
    holds(forAll(Gen.nonEmptyListOf(Gen.choose(1, 8))) { cs =>
      def gini(mult: Int) = Analytics3.giniOf(
        cs.zipWithIndex.flatMap { case (c, u) => Seq.fill(c * mult)((u.toLong, "e")) }
          .toDF("user_id", "event_type")).select("gini").as[Double].collect().head
      math.abs(gini(1) - gini(2)) <= 2e-6 // two independent 6-dp rounds
    }, "gini-scale-free")
  }

  test("psi: non-negative; invariant under relabeling which source is which") {
    val lens = Gen.nonEmptyListOf(Gen.choose(50, 550))
    holds(forAll(lens, lens) { (a, b) =>
      val docs = (a.map(("A", _)) ++ b.map(("B", _))).toDF("source", "n_chars")
      val psi = Analytics3.psiDriftOf(docs)
        .select("source", "psi").as[(String, Double)].collect().toMap
      val swapped = (a.map(("B", _)) ++ b.map(("A", _))).toDF("source", "n_chars")
      val psi2 = Analytics3.psiDriftOf(swapped)
        .select("source", "psi").as[(String, Double)].collect().toMap
      psi.values.forall(_ >= 0.0) && psi("A") == psi2("B") && psi("B") == psi2("A")
    }, "psi-nonneg-symmetric")
  }

  test("ks: in [0, 1]; a source identical to the pool reads 0") {
    val lens = Gen.nonEmptyListOf(Gen.choose(50, 550))
    holds(forAll(lens) { a =>
      // two identical sources → pooled CDF equals each source's CDF
      val docs = (a.map(("A", _)) ++ a.map(("B", _))).toDF("source", "n_chars")
      val ks = Analytics3.ksDriftOf(docs).select("ks").as[Double].collect()
      ks.forall(v => v == 0.0)
    }, "ks-identical-zero")
    holds(forAll(lens, lens) { (a, b) =>
      val docs = (a.map(("A", _)) ++ b.map(("B", _))).toDF("source", "n_chars")
      val ks = Analytics3.ksDriftOf(docs).select("ks").as[Double].collect()
      ks.forall(v => v >= 0.0 && v <= 1.0)
    }, "ks-range")
  }

  test("chi-square: non-negative; exactly 0 on a rank-1 (independent) table") {
    // counts c(type, dow) = r_t * c_d is exactly independent → χ² = 0
    val margins = Gen.zip(Gen.nonEmptyListOf(Gen.choose(1, 4)), Gen.nonEmptyListOf(Gen.choose(1, 4)))
    holds(forAll(margins) { case (rs, csx) =>
      val base = java.time.LocalDate.of(2024, 1, 1) // a Monday
      val rows = for {
        (r, ti) <- rs.take(3).zipWithIndex
        (c, di) <- csx.take(3).zipWithIndex
        _ <- 0 until (r * c)
      } yield (s"t$ti", java.sql.Timestamp.valueOf(base.plusDays(di).atTime(12, 0)))
      val df = rows.toDF("event_type", "ts")
      val chi2 = Analytics3.chiSquareOf(df).select("chi2").as[Double].collect().head
      chi2 >= -1e-9 && chi2 <= 1e-9
    }, "chi2-independent-zero")
  }

  test("cohort matrix: week-0 rate is always 1.0 and rates never exceed 1") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0, 27)))
    holds(forAll(gen) { pairs =>
      val base = java.time.LocalDate.of(2024, 1, 1)
      val df = pairs.map { case (u, d) =>
        (u, java.sql.Timestamp.valueOf(base.plusDays(d.toLong).atTime(10, 0)))
      }.toDF("user_id", "ts")
      val rows = Events.cohortMatrixOf(df)
        .select("weeks_since", "rate").as[(Long, Double)].collect()
      rows.forall { case (k, r) => r <= 1.0 && (k != 0L || r == 1.0) }
    }, "cohort-rates")
  }
}
