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
}
