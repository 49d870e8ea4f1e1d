package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ReduceAggregator, Skew}
import graft.sources.Tables

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("vec_dot and vec_cosine are SQL-registered via GraftExtensions") {
    import spark.implicits._
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_dot(a, b) AS d, vec_cosine(a, a) AS c FROM vecs").head()
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("vec_dot participates in whole-stage codegen on a real scan") {
    // parquet-backed input: constant folding can't pre-evaluate, so the
    // expression must run inside the codegen stage
    val df = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(expr("vec_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>))").as("d"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("vec_dot"))
    assert(df.head().getDouble(0) > 0.0)
  }
}

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def t = Tables(spark, TestSpark.sf)

  test("salted count equals plain count") {
    val plain = t.lineitem.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(0 max 1)).toMap
    val salted = Skew.saltedCount(t.lineitem, "l_returnflag", 8,
        Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val dim   = t.nation.select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    val plain = t.customer.join(dim, "c_nationkey")
      .select("c_custkey", "n_name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(t.customer, dim, "c_nationkey", 4, Seq("c_custkey"))
      .select("c_custkey", "n_name").collect().map(_.toSeq).toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("window-to-join share rewrite matches the window form on a hot-key shard") {
    // 1 hot key with 50× the rows of each cold key — the shape where the
    // window form serializes on one task at scale
    val skewed = spark.range(0, 60000).selectExpr(
      "id AS event_id",
      "CASE WHEN id % 60 < 50 THEN 'hot' ELSE concat('cold_', id % 60) END AS event_type",
      "CAST((id % 997) AS DOUBLE) / 10 AS value")
    val got  = Skew.shareOfKeyTotal(skewed).collect().map(_.toSeq).toSeq
    val want = Skew.shareWindowForm(skewed).collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("two-phase salted aggregate shape survives AQE re-planning") {
    // AQE coalesces partitions but must NOT collapse the two exchanges
    // (salted partial → per-key final) into a single per-key shuffle —
    // that would resurrect the hot reducer the salt exists to spread.
    val df = Skew.saltedEventStats(t.events)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // compare only each exchange's key list (the split segment would
    // otherwise include the subtree printed below it)
    val keyLists = p.split("hashpartitioning\\(").drop(1).map(_.takeWhile(_ != ')')).toSeq
    assert(keyLists.length >= 2, s"expected 2+ hash exchanges in:\n${p.take(2000)}")
    assert(keyLists.exists(s => s.startsWith("event_type") && s.contains("_salt")),
      s"salted-phase exchange must partition on (event_type, _salt): $keyLists")
    assert(keyLists.exists(s => s.startsWith("event_type") && !s.contains("_salt")),
      s"final-phase exchange must partition on event_type alone: $keyLists")
  }
}

class ReduceAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed reduce mirrors ReduceItemTransformer fold semantics") {
    import spark.implicits._
    val ds = spark.range(1, 101).as[Long]
    val sumSq = ReduceAggregator[Long, Long](0L)((acc, x) => acc + x * x)(_ + _)
    val got = ds.select(sumSq.toColumn).head()
    assert(got == (1L to 100L).map(x => x * x).sum)
  }

  test("count aggregator matches groupBy count per key") {
    import spark.implicits._
    val t    = Tables(spark, TestSpark.sf)
    val toks = graft.operators.WordPipeline.tokens(t).as[(Long, String)]
    val got = toks.groupByKey(_._1).agg(ReduceAggregator.count[(Long, String)].toColumn)
      .collect().toMap
    val want = graft.operators.WordPipeline.wordsCount(t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}

class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def t = Tables(spark, TestSpark.sf)

  test("HLL++ approx distinct is within its rsd bound of exact") {
    val rsd = 0.05
    val row = t.lineitem.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 4 * rsd,
      s"approx $approx vs exact $exact")
  }
}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(rmrf)
    p.delete(): Unit
  }

  test("bucketed tables join without a shuffle exchange") {
    val t = Tables(spark, TestSpark.sf)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // a previous JVM's managed-table dirs survive the in-memory catalog
    Seq("li_bucketed", "o_bucketed")
      .foreach(n => rmrf(new java.io.File(s"spark-warehouse/$n")))
    t.lineitem.select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    t.orders.select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${p.take(1500)}")
    assert(joined.count() > 0)
  }

  test("q3 over the bucketed fact tables plans with zero shuffle exchanges") {
    val t = Tables(spark, TestSpark.sf)
    val df = graft.operators.Relational.q3Bucketed(t)
    val p = df.queryExecution.executedPlan.toString
    // broadcast exchanges (customer dim) are fine; hash-partition
    // shuffles are what bucketing exists to eliminate — including the
    // groupBy, whose l_orderkey clustering the bucket layout satisfies
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed q3 must not shuffle:\n${p.take(2000)}")
    val got = df.collect().map(_.toSeq)
    val want = graft.operators.Relational.q3ShippingPriority(t).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq, "bucketed q3 must return the unbucketed answer")
  }

  // ------------------------------------------------- key-skew report

  test("keySkew: a planted hot key reads its true share and skew ratio") {
    import spark.implicits._
    // key 7: 8 rows; keys 1..4: 1 row each → total 12, n_keys 5,
    // mean 2.4, max 8 → skew_ratio = 8/2.4
    val rows = (Seq.fill(8)(7L) ++ Seq(1L, 2L, 3L, 4L)).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("row_id", "k")
    val top = graft.operators.Skew.keySkewOf(rows, "k", topK = 2).collect()
    assert(top.head.getLong(0) == 7L)
    assert(top.head.getLong(1) == 8L)
    assert(top.head.getDouble(top.head.fieldIndex("share")) == 8.0 / 12.0)
    assert(math.abs(top.head.getDouble(top.head.fieldIndex("skew_ratio")) - 8.0 / 2.4) < 1e-12)
  }

  test("keySkew: a uniform key distribution reads skew ratio 1") {
    import spark.implicits._
    val rows = (1L to 20L).map(i => (i, i % 5)).toDF("row_id", "k")
    val top = graft.operators.Skew.keySkewOf(rows, "k", topK = 1).collect().head
    assert(top.getDouble(top.fieldIndex("skew_ratio")) == 1.0)
  }
}
