package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational2, Relational3}
import graft.sources.Tables

/** Semantic checks for the round-4 TPC-H batch — the shapes where a
  * subtly wrong join type or predicate placement still returns rows.
  */
class Relational3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  test("q4: semi join counts each order once despite multiple late lines") {
    val total = Relational3.q4OrderPriority(t)
      .agg(sum("order_count")).collect()(0).getLong(0)
    val distinctOrders = t.orders
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(total == distinctOrders)
  }

  test("q13: customers with zero qualifying orders appear in the c_count=0 bucket") {
    val dist = Relational3.q13OrderDistribution(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allCustomers = t.customer.count()
    assert(dist.values.sum == allCustomers) // every customer lands in exactly one bucket
    val withQualifying = t.customer.join(
      t.orders.filter(col("o_orderpriority") =!= "5-LOW"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(dist.getOrElse(0L, 0L) == allCustomers - withQualifying)
  }

  test("q22: no surviving customer has a recent urgent order") {
    val survivors = Relational3.q22IdleBalance(t)
    assert(survivors.count() > 0)
    val ids = t.customer
      .crossJoin(broadcast(t.customer.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_semi")
    // anti join and semi join partition the filtered set
    val antiCount = Relational3.q22IdleBalance(t).agg(sum("numcust")).collect()(0).getLong(0)
    val filteredCount = t.customer
      .crossJoin(broadcast(t.customer.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))))
      .filter(col("c_acctbal") > col("avg_bal")).count()
    assert(antiCount + ids.count() == filteredCount)
  }

  test("q6/q14/q19 single-row aggregates are non-null") {
    assert(!Relational3.q6ForecastRevenue(t).collect()(0).isNullAt(0))
    assert(!Relational3.q14PromoRevenue(t).collect()(0).isNullAt(0))
    assert(!Relational3.q19Disjunctive(t).collect()(0).isNullAt(0))
  }

  test("approx distinct users stays within 5% of exact per event type") {
    // the RAW estimate (the gated query emits exact + the 10% verdict
    // since r13; this pins the tighter 5% error on the estimate itself)
    import org.apache.spark.sql.functions._
    t.events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect().foreach { r =>
        val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
        assert(math.abs(approx - exact) / exact < 0.05,
          s"${r.getString(0)}: approx $approx vs exact $exact")
      }
    // and the gated verdict grid itself is all-true at this sf too
    Relational3.qApproxDistinct(t).collect().foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: within_tol false")
    }
  }

  test("approx percentiles track the exact cuts within the sketch's rank-error bound") {
    val exact = Relational2.qPercentiles(t).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    Relational2.qApproxPercentiles(t).collect().foreach { r =>
      val e = exact(r.getString(0))
      val a = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // 1/accuracy rank error on these distributions stays well inside
      // 5% relative value error; exactness is the other query's job
      a.zip(e).foreach { case (approx, ex) =>
        assert(math.abs(approx - ex) / math.max(math.abs(ex), 1e-9) < 0.05,
          s"${r.getString(0)}: approx $approx vs exact $ex")
      }
    }
  }

  test("approx-percentile rank-error gate: every verdict true over the full (group, column, pct) grid") {
    val rows = Relational2.qApproxPctGate(t).collect()
    // 3 flags × 4 (column, pct) probes — the grid the oracle re-derives
    assert(rows.length == t.lineitem.select("l_returnflag").distinct.count() * 4)
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"GK bound violated for ${r.getString(0)}/${r.getString(1)}@${r.getDouble(2)}")
    }
  }

  test("bm25: absent query terms contribute nothing; scores are positive and ranked") {
    import graft.operators.InvertedIndex
    val base = InvertedIndex.bm25Search(t, Seq("spark", "scan")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a term with zero postings must not shift any score (tf inner join
    // drops it) — same result set, same scores
    val withGhost = InvertedIndex.bm25Search(t, Seq("spark", "scan", "zzzyqx")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withGhost == base && base.nonEmpty)
    assert(base.values.forall(_ > 0), "the +1 idf variant keeps scores positive")
  }

  test("pq codes: codebook members quantize to themselves") {
    val codes = graft.operators.Similarity.pqCodes(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (v <- 0L until 16L; s <- 0L until 4L)
      assert(codes((v, s)) == v, s"codebook vector $v subspace $s got ${codes((v, s))}")
    // every vector gets exactly m codes, each a valid codebook id
    assert(codes.size == t.embeddings.count() * 4)
    assert(codes.values.forall(c => c >= 0 && c < 16))
  }

  test("q8 market share is a ratio in [0,1] per year") {
    Relational3.q8MarketShare(t).collect().foreach { r =>
      val s = r.getDouble(1)
      assert(s >= 0.0 && s <= 1.0)
    }
  }
}
