package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.plans.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def t = Tables(spark, TestSpark.sf)

  /** Run `body` with the auto-rewrite off, so nested-loop baselines
    * stay independent of the operator under test.
    */
  private def withoutRewrite[A](body: => A): A = {
    spark.conf.set("spark.graft.rangeJoin.rewrite", "false")
    try body finally spark.conf.set("spark.graft.rangeJoin.rewrite", "true")
  }

  // points: all events; intervals: each user's sessions (from the batch
  // sessionizer) padded to [first,last] event-time
  private def fixtures = {
    val ev = t.events.select(col("event_id"), col("user_id").as("key"),
      unix_micros(col("ts")).as("t"))
    val sessions = Events.sessionize(t)
    val bounds = t.events.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tm"))
    val iv = sessions
      .join(bounds.withColumnRenamed("event_id", "first_event")
        .withColumnRenamed("tm", "lo"), Seq("user_id", "first_event"))
      .join(bounds.withColumnRenamed("event_id", "last_event")
        .withColumnRenamed("tm", "hi"), Seq("user_id", "last_event"))
      .select(col("user_id").as("key_r"), col("session_id"), col("lo"), col("hi"))
    (ev, iv)
  }

  test("custom range join matches the nested-loop equivalent") {
    val (ev, iv) = fixtures
    val got = RangeJoin.rangeJoin(ev, iv, "key", "t", "lo", "hi")
      .select(col("event_id"), col("session_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = withoutRewrite {
      ev.join(iv, col("key") === col("key_r") &&
          col("t") >= col("lo") && col("t") <= col("hi"))
        .select(col("event_id"), col("session_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == want)
    assert(got.nonEmpty)
    // every event lands in exactly one session interval
    assert(got.size == t.events.count())
  }

  test("range join supports string keys and int times") {
    import spark.implicits._
    val pts = Seq(("a", 1, 101L), ("a", 5, 102L), ("b", 3, 103L), ("c", 9, 104L))
      .toDF("key", "t", "event_id")
    val ivs = Seq(("a", 0, 2, 11L), ("a", 4, 6, 12L), ("b", 0, 9, 13L), ("d", 0, 9, 14L))
      .toDF("key_r", "lo", "hi", "session_id")
    // fallback=false: a Janino failure on the UTF8String/int codegen
    // path must fail the test, not silently revert to interpreted
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val got = try {
      RangeJoin.rangeJoin(pts, ivs, "key", "t", "lo", "hi")
        .select(col("event_id"), col("session_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.unset("spark.sql.codegen.fallback")
    val want = withoutRewrite {
      pts.join(ivs, col("key") === col("key_r") &&
          col("t") >= col("lo") && col("t") <= col("hi"))
        .select(col("event_id"), col("session_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == want)
    assert(got == Set((101L, 11L), (102L, 12L), (103L, 13L)))
  }

  test("optimizer rule: a plain inner join with interval bounds auto-plans as RangeJoinExec") {
    val (ev, iv) = fixtures
    val plain = ev.join(iv, col("key") === col("key_r") &&
      col("t") >= col("lo") && col("t") <= col("hi"))
    assert(plain.queryExecution.executedPlan.toString.contains("RangeJoin "),
      "rewrite rule should have re-planned the join")
    val got = plain.select(col("event_id"), col("session_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = withoutRewrite {
      val p = ev.join(iv, col("key") === col("key_r") &&
        col("t") >= col("lo") && col("t") <= col("hi"))
      assert(!p.queryExecution.executedPlan.toString.contains("RangeJoin "),
        "escape hatch must restore the stock plan")
      p.select(col("event_id"), col("session_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == want && got.nonEmpty)
  }

  test("optimizer rule: swapped sides (points on the right) keep column order and results") {
    val (ev, iv) = fixtures
    // intervals LEFT, points RIGHT — rule must swap and re-project
    val plain = iv.join(ev, col("key") === col("key_r") &&
      col("t") >= col("lo") && col("t") <= col("hi"))
    assert(plain.queryExecution.executedPlan.toString.contains("RangeJoin "))
    assert(plain.columns.toSeq ==
      Seq("key_r", "session_id", "lo", "hi", "event_id", "key", "t"))
    val got = plain.select(col("event_id"), col("session_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = withoutRewrite {
      iv.join(ev, col("key") === col("key_r") &&
          col("t") >= col("lo") && col("t") <= col("hi"))
        .select(col("event_id"), col("session_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == want && got.nonEmpty)
  }

  test("optimizer rule: extra conjuncts survive as a filter, strict bounds are left alone") {
    val (ev, iv) = fixtures
    val extra = ev.join(iv, col("key") === col("key_r") &&
      col("t") >= col("lo") && col("t") <= col("hi") && col("session_id") =!= 1)
    assert(extra.queryExecution.executedPlan.toString.contains("RangeJoin "))
    val gotExtra = extra.select("event_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantExtra = withoutRewrite {
      ev.join(iv, col("key") === col("key_r") &&
          col("t") >= col("lo") && col("t") <= col("hi") && col("session_id") =!= 1)
        .select("event_id", "session_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(gotExtra == wantExtra)
    // strict bound ⇒ different semantics than the exec ⇒ no rewrite
    val strict = ev.join(iv, col("key") === col("key_r") &&
      col("t") > col("lo") && col("t") <= col("hi"))
    assert(!strict.queryExecution.executedPlan.toString.contains("RangeJoin "))
  }

  test("range join refuses mismatched key types at plan time") {
    import spark.implicits._
    val pts = Seq((1, 1L, 1L)).toDF("key", "t", "event_id")          // int key
    val ivs = Seq((1L, 0L, 9L, 1L)).toDF("key_r", "lo", "hi", "sid") // long key
    val e = intercept[Exception] {
      RangeJoin.rangeJoin(pts, ivs, "key", "t", "lo", "hi").collect()
    }
    assert(e.getMessage.contains("key types differ"), e.getMessage)
  }

  test("merge loop runs inside whole-stage codegen; interpreted fallback agrees") {
    val (ev, iv) = fixtures
    // fallback=false turns a Janino compile error into a hard failure —
    // a silently-falling-back stage would otherwise still pass on results
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = RangeJoin.rangeJoin(ev, iv, "key", "t", "lo", "hi")
        .select(col("event_id"), col("session_id"))
      val cg = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the POST-EXECUTION plan (AQE final) must show the join INSIDE a
      // codegen stage (the `*(n)` star prefix), not under an InputAdapter
      val p = df.queryExecution.executedPlan.toString
      val starLine = p.linesIterator.find(_.contains("RangeJoin ")).getOrElse("")
      assert(starLine.contains("*("), s"RangeJoin not codegen'd:\n${p.take(1500)}")

      spark.conf.set("spark.graft.rangejoin.codegen", "false")
      val interp = RangeJoin.rangeJoin(ev, iv, "key", "t", "lo", "hi")
      val pi = interp.queryExecution.executedPlan.toString
      val interpLine = pi.linesIterator.find(_.contains("RangeJoin ")).getOrElse("")
      assert(!interpLine.contains("*("), "escape hatch must fall back to interpreted")
      val got = interp.select(col("event_id"), col("session_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == cg && cg.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.graft.rangejoin.codegen")
    }
  }

  test("early termination and empty sides through the codegen path") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // limit above the join: the generated loop must honor shouldStop/
      // limitNotReached mid-emission and resume state correctly
      val (ev, iv) = fixtures
      val limited = RangeJoin.rangeJoin(ev, iv, "key", "t", "lo", "hi").limit(5)
      assert(limited.count() == 5)
      // empty interval side → zero rows, no crash in the merge state
      val pts = Seq(("a", 1, 1L)).toDF("key", "t", "event_id")
      val noIv = Seq.empty[(String, Int, Int, Long)].toDF("key_r", "lo", "hi", "session_id")
      assert(RangeJoin.rangeJoin(pts, noIv, "key", "t", "lo", "hi").count() == 0)
      // empty point side
      val noPts = Seq.empty[(String, Int, Long)].toDF("key", "t", "event_id")
      val ivs = Seq(("a", 0, 9, 1L)).toDF("key_r", "lo", "hi", "session_id")
      assert(RangeJoin.rangeJoin(noPts, ivs, "key", "t", "lo", "hi").count() == 0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("produce loop honors the limitNotReachedCond contract (leaf-only helper)") {
    // CodegenSupport.limitNotReachedCond logs '[BUG] Only leaf nodes and
    // blocking nodes need to call...' when invoked from a non-leaf node —
    // and THROWS instead when Utils.isTesting. Flipping spark.testing on
    // makes this test fail hard if the produce loop ever calls the
    // leaf-only helper again (it must rely on shouldStop(), like
    // SortMergeJoinExec does).
    System.setProperty("spark.testing", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val (ev, iv) = fixtures
      val limited = RangeJoin.rangeJoin(ev, iv, "key", "t", "lo", "hi").limit(5)
      assert(limited.count() == 5)
    } finally {
      System.clearProperty("spark.testing")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("null keys and bounds drop rows in BOTH execution paths (inner-join semantics)") {
    import spark.implicits._
    val pts = Seq((Some("a"), 1, 101L), (None, 2, 102L), (Some("b"), 3, 103L))
      .toDF("key", "t", "event_id")
    val ivs = Seq((Some("a"), Some(0), 2, 11L), (Some("b"), None, 9, 12L),
        (None, Some(0), 9, 13L), (Some("b"), Some(1), 9, 14L))
      .toDF("key_r", "lo", "hi", "session_id")
    def run() = RangeJoin.rangeJoin(pts, ivs, "key", "t", "lo", "hi")
      .select(col("event_id"), col("session_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cg = run()
    spark.conf.set("spark.graft.rangejoin.codegen", "false")
    val interp = try run() finally spark.conf.unset("spark.graft.rangejoin.codegen")
    assert(cg == Set((101L, 11L), (103L, 14L)))
    assert(interp == cg)
  }

  test("range join plans as RangeJoinExec with sorts, not a nested loop") {
    val (ev, iv) = fixtures
    val p = RangeJoin.rangeJoin(ev, iv, "key", "t", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(p.contains("RangeJoin "))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Sort ["), "engine must insert required sorts")
  }
}
