package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the fifth-pass operators: empty
  * corpora/streams/graphs must return gracefully (0 rows, or a
  * NULL-guarded summary row) — never throw. Pinned because the
  * production failure mode for summary queries is an empty upstream
  * partition, and an ANSI /0 or an unguarded max() there takes the
  * whole job down.
  */
class EdgeCase5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val emptyEvents =
    Seq.empty[(Long, Long, java.sql.Timestamp, String, Double)]
      .toDF("event_id", "user_id", "ts", "event_type", "value")
  private lazy val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")

  test("empty corpus: text ops return 0 rows, summaries return guarded rows") {
    assert(graft.operators.CorpusScience.rakeOf(emptyDocs).count() == 0)
    assert(graft.operators.CorpusScience.dunningLlrOf(emptyDocs).count() == 0)
    assert(graft.operators.InvertedIndex.rocchioExpandOf(emptyDocs, Seq("x")).count() == 0)
    assert(graft.operators.Curate.splitLeakageOf(emptyDocs).count() == 0)
    val lshEval = graft.operators.Dedup.lshEvalOf(emptyDocs).collect().head
    assert(lshEval.getLong(0) == 0L && lshEval.isNullAt(lshEval.fieldIndex("recall")))
  }

  test("empty events: behavior ops return 0 rows") {
    assert(graft.operators.Behavior.streaksOf(emptyEvents).count() == 0)
    assert(graft.operators.Behavior.interArrivalOf(emptyEvents).count() == 0)
    assert(graft.operators.Behavior.seqPatternsOf(emptyEvents).count() == 0)
    assert(graft.operators.Behavior.peakConcurrencyOf(emptyEvents).count() == 0)
    assert(graft.operators.Behavior.abandonmentOf(emptyEvents).count() == 0)
    assert(graft.operators.Analytics3.lorenzCurveOf(emptyEvents).count() == 0)
    assert(graft.operators.Events.cohortRevenueOf(emptyEvents).count() == 0)
  }

  test("empty graph: summary rows come back NULL-guarded, not thrown") {
    val a = graft.operators.Graph2.assortativityOf(emptyEdges).collect().head
    assert(a.getLong(0) == 0L && a.isNullAt(1))
    val m = graft.operators.Graph2.modularityOf(emptyEdges, Seq.empty[Long].toDF("node"))
      .collect()
    assert(m.length == 1 && m.head.getLong(0) == -1L) // just the total row
  }

  test("rocchio with terms matching nothing returns an empty ranking, not a throw") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(graft.operators.InvertedIndex.rocchioExpandOf(docs, Seq("zzz")).count() == 0)
  }
}
