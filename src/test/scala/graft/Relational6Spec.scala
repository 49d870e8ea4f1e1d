package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational6

/** Semantics of the distribution-summary tranche on hand data (the
  * hash gate proves engine parity; these pin the closed forms).
  */
class Relational6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ordersOf(rows: (String, Double)*) =
    rows.toDF("o_orderpriority", "o_totalprice")

  test("quantile summary: interpolating percentiles on a known ladder") {
    // values 10..100 step 10 → p25 = 32.5, p50 = 55, p75 = 77.5 (n−1 ranks)
    val t = ordersOf((1 to 10).map(i => ("P", i * 10.0)): _*)
    val row = Relational6.qQuantileSummaryOf(t).collect().head
    assert(row.getLong(1) == 10L)
    assert(row.getDouble(2) == 32.5 && row.getDouble(3) == 55.0 && row.getDouble(4) == 77.5)
  }

  test("rank profile: histogram closed form equals window semantics, incl. ties and 1-row group") {
    // P: values 10,10,20,30 → pct_rank 0, 2/3, 3/3; cume_dist .5, .75, 1
    // Q: single row → pct_rank 0, cume_dist 1
    val t = ordersOf(("P", 10.0), ("P", 10.0), ("P", 20.0), ("P", 30.0), ("Q", 7.0))
    val got = Relational6.qRankProfileOf(t)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(got == List(
      ("P", 10.0, 2L, 0.0, 0.5),
      ("P", 20.0, 1L, math.rint(2.0 / 3 * 1e6) / 1e6, 0.75),
      ("P", 30.0, 1L, 1.0, 1.0),
      ("Q", 7.0, 1L, 0.0, 1.0)))
  }

  // ------------------------------------------------ FK join audit

  test("fkAudit: orphans, unreferenced dims and fan-out from a planted mismatch") {
    import spark.implicits._
    // facts: keys 1(×3), 2(×1), 9(×2 — orphan); dims: 1, 2, 3 (3 unreferenced... only key 3)
    val fact = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 9L), (6L, 9L))
      .toDF("row_id", "fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.operators.Relational6.fkAuditOf(fact, "fk", dim, "pk").collect().head
    assert(r.getLong(r.fieldIndex("n_facts")) == 6L)
    assert(r.getLong(r.fieldIndex("n_dims")) == 3L)
    assert(r.getLong(r.fieldIndex("n_matched_keys")) == 2L)
    assert(r.getLong(r.fieldIndex("n_orphan_facts")) == 2L)
    assert(r.getLong(r.fieldIndex("n_unreferenced_dims")) == 1L)
    assert(r.getDouble(r.fieldIndex("match_rate")) == 4.0 / 6.0)
    assert(r.getDouble(r.fieldIndex("mean_fanout")) == 2.0) // (3+1)/2
    assert(r.getLong(r.fieldIndex("max_fanout")) == 3L)
  }

  test("fkAudit: a clean FK reads match_rate 1 and zero orphans") {
    import spark.implicits._
    val fact = Seq((1L, 1L), (2L, 2L), (3L, 2L)).toDF("row_id", "fk")
    val dim = Seq(1L, 2L).toDF("pk")
    val r = graft.operators.Relational6.fkAuditOf(fact, "fk", dim, "pk").collect().head
    assert(r.getDouble(r.fieldIndex("match_rate")) == 1.0)
    assert(r.getLong(r.fieldIndex("n_orphan_facts")) == 0L)
    assert(r.getLong(r.fieldIndex("n_unreferenced_dims")) == 0L)
  }
}
