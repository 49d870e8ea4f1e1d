package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAggregate
import graft.sources.Tables

class TopKAggregateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def t = Tables(spark, TestSpark.sf)

  test("agg_topk matches window row_number top-k per group") {
    val got = t.lineitem
      .groupBy("l_returnflag")
      .agg(TopKAggregate.topk(col("l_extendedprice"), 5).as("top5"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap

    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc)
    val want = t.lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("l_returnflag", "l_extendedprice")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted(Ordering[Double].reverse).toList).toMap

    assert(got == want)
  }

  test("agg_topk survives partial aggregation across many partitions") {
    val got = t.lineitem.repartition(13)
      .agg(TopKAggregate.topk(col("l_quantity"), 3).as("top3"))
      .head().getSeq[Double](0).toList
    assert(got == List(50.0, 50.0, 50.0))
  }

  test("agg_topk_pairs: q_topk_native equals the window form bit-for-bit, no WindowExec") {
    import graft.operators.Relational2
    val native = Relational2.qTopKNative(t)
    val got = native.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    val w = Window.partitionBy(col("event_type")).orderBy(col("total").desc, col("user_id"))
    val want = t.events.groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")), 2).as("total"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("event_type", "rank", "user_id", "total")
      .orderBy("event_type", "rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(got == want)
    assert(got.nonEmpty)
    // the point of the aggregate: no window, no per-group sort
    import org.apache.spark.sql.execution.window.WindowExec
    val wins = native.queryExecution.executedPlan.collect { case x: WindowExec => x }
    assert(wins.isEmpty, "q_topk_native must not plan a WindowExec")
  }

  test("agg_topk_pairs: deterministic tie-break (score desc, id asc) across partitions") {
    val spark2 = spark
    import spark2.implicits._
    // 6 ids share the top score; k=4 must keep the LOWEST ids, whatever
    // partition order the partial merges arrive in
    val df = (1L to 6L).map(i => (9.5, i)).toList
      .++(Seq((1.0, 100L), (8.0, 50L)))
      .toDF("s", "i").repartition(7)
    val got = df.agg(graft.functions.TopKPairsAggregate.topkPairs(col("s"), col("i"), 4).as("t"))
      .select(explode(col("t")).as("p")).select("p.score", "p.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toList
    assert(got == List((9.5, 1L), (9.5, 2L), (9.5, 3L), (9.5, 4L)), got.toString)
  }
}
