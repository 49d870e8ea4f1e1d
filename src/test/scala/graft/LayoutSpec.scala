package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout
import graft.sources.Tables

/** Z-order layout: the point is multi-dimensional pruning — after
  * clustering, per-partition min/max ranges must be narrow on BOTH
  * dimensions, where a single-key sort leaves the second dimension's
  * range at full width in every partition.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  test("zvalue interleaves bits (known values)") {
    import spark.implicits._
    // x=0b101=5, y=0b011=3 → z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zvalue(col("x"), col("y"), 3).as("z")).collect()(0).getLong(0)
    assert(z == 27L)
    // zero maps to zero, max 10-bit pair stays within 20 bits
    val z0 = Seq((0L, 0L)).toDF("x", "y")
      .select(Layout.zvalue(col("x"), col("y")).as("z")).collect()(0).getLong(0)
    assert(z0 == 0L)
    val zm = Seq((1023L, 1023L)).toDF("x", "y")
      .select(Layout.zvalue(col("x"), col("y")).as("z")).collect()(0).getLong(0)
    assert(zm == (1L << 20) - 1)
  }

  /** mean per-partition extent of `c`, normalized by its global extent */
  private def meanExtent(df: DataFrame, c: String): Double = {
    val per = df.withColumn("_p", spark_partition_id())
      .groupBy("_p").agg((max(col(c)) - min(col(c))).as("ext"))
      .agg(avg(col("ext"))).collect()(0).getDouble(0)
    val glob = df.agg((max(col(c)) - min(col(c))).cast("double")).collect()(0).getDouble(0)
    per / glob
  }

  test("z-order layout narrows BOTH dimensions; single-key sort only one") {
    // moduli sized so both dims FILL their bit width (sf0.001 has only
    // 15 users): a dim whose high bits are constant cannot steer the
    // curve and the layout degenerates to a single-key sort
    val pts = t.events.select(
      pmod(col("user_id"), lit(16L)).as("ux"),
      pmod(floor(col("value")).cast("long"), lit(16L)).as("vy"))
    val zordered = Layout.zorderLayout(pts, "ux", "vy", bits = 4, partitions = 16).cache()
    val linear = pts.repartitionByRange(16, col("ux")).sortWithinPartitions(col("ux")).cache()
    try {
      val (zx, zy) = (meanExtent(zordered, "ux"), meanExtent(zordered, "vy"))
      val (lx, ly) = (meanExtent(linear, "ux"), meanExtent(linear, "vy"))
      assert(lx < 0.2, s"sanity: linear sort must cluster its own key ($lx)")
      assert(ly > 0.5, s"sanity: linear sort leaves dim-2 unclustered ($ly)")
      // z-order: both dims clustered well below the linear sort's dim-2
      assert(zx < 0.6 && zy < 0.6, s"z-order extents too wide: x=$zx y=$zy")
      assert(zy < ly / 2, s"z-order dim-2 ($zy) should beat linear's ($ly) by 2x+")
    } finally { zordered.unpersist(); linear.unpersist() }
  }
}

/** pack_shards: the two-phase distributed prefix sum must agree with
  * the naive single-window form bit-for-bit, independent of how many
  * buckets the corpus is cut into (boundary correctness), and the
  * manifest must account for every token exactly once.
  */
class PackShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  private def naive(budget: Long) = {
    import org.apache.spark.sql.expressions.Window
    val toks = t.documents.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    toks.withColumn("_prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard_id",
        floor(col("_prev").cast("double") / lit(budget.toDouble)).cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("shard_id")
  }

  test("two-phase prefix sum equals the naive global window, any bucket count") {
    val want = naive(2000L).collect().map(_.toSeq).toSeq
    for (buckets <- Seq(1, 3, 32)) {
      val got = Layout.packShards(t, 2000L, buckets).collect().map(_.toSeq).toSeq
      assert(got == want, s"buckets=$buckets")
    }
    assert(want.nonEmpty)
  }

  test("shard manifest conserves tokens and shard ids are contiguous from 0") {
    val rows = Layout.packShards(t, 2000L).collect()
    val totalDocs = rows.map(_.getLong(1)).sum
    val totalToks = rows.map(_.getLong(2)).sum
    assert(totalDocs == t.documents.count())
    val direct = t.documents
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long"))).head.getLong(0)
    assert(totalToks == direct)
    assert(rows.map(_.getLong(0)).toSeq == rows.indices.map(_.toLong))
  }

  test("degenerate corpora: one doc, sparse ids, more buckets than docs") {
    import spark.implicits._
    val one = Seq((7L, "a b c")).toDF("doc_id", "text")
    val got1 = Layout.packShardsOf(one, 2L, 32).collect()
    assert(got1.map(_.toSeq).toSeq == Seq(Seq(0L, 1L, 3L, 7L, 7L)))
    // sparse non-contiguous ids, buckets >> docs: value-range bucketing
    // leaves most buckets empty, result must still equal the naive form
    val sparse = Seq((1L, "a b"), (1000L, "c d e"), (1000000L, "f")).toDF("doc_id", "text")
    val got = Layout.packShardsOf(sparse, 4L, 32).collect().map(_.toSeq).toSeq
    // prefix sums: 0, 2, 5 → shards 0,0,1
    assert(got == Seq(
      Seq(0L, 2L, 5L, 1L, 1000L),
      Seq(1L, 1L, 1L, 1000000L, 1000000L)))
  }

  test("no unpartitioned window at all: corpus window bucket-partitioned, offsets join-based") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Layout.packShards(t, 2000L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the corpus-sized window must be partitioned by the bucket column
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val corpusWin = windows.filter(_.contains("sum(n_tokens"))
    assert(corpusWin.nonEmpty && corpusWin.forall(_.contains("windowspecdefinition(_b#")),
      s"corpus window not bucket-partitioned:\n${windows.mkString("\n")}")
    // the bucket-offset prefix sum is a triangular self-join since r8 —
    // NO window in the whole plan may have an empty partition spec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val empty = Layout.packShards(t, 2000L).queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(empty.isEmpty, s"unpartitioned window survived: $empty")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}

/** q_global_shuffle: the hash-shuffle write order must be reproducible
  * (same seed → bit-identical manifest), seed-sensitive, conserving
  * (every doc and token lands in exactly one shard), and ORDER-
  * sensitive (the checksum moves when the within-shard order does).
  */
class GlobalShuffleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  test("same seed is bit-identical; different seed moves every checksum") {
    val a = Layout.globalShuffle(t, seed = 42L).collect().map(_.toSeq).toSeq
    val b = Layout.globalShuffle(t, seed = 42L).collect().map(_.toSeq).toSeq
    assert(a == b, "same-seed shuffle must be reproducible")
    val c = Layout.globalShuffle(t, seed = 43L).collect().map(_.toSeq).toSeq
    assert(a.map(_.last).toSet.intersect(c.map(_.last).toSet).isEmpty,
      "a different seed must move every shard's order checksum")
  }

  test("manifest conserves docs and tokens across shards") {
    val rows = Layout.globalShuffle(t, nShards = 8).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(rows.map(_.getLong(1)).sum == t.documents.count())
    val direct = t.documents
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long"))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == direct)
  }

  test("checksum is order-sensitive: permuting within-shard order moves it") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // tiny corpus, one shard: recompute the checksum with the order
    // REVERSED — same membership, same h32 values, different positions
    val docs = (0L until 40L).map(i => (i, s"w$i x y")).toDF("doc_id", "text")
    val fwd = Layout.globalShuffleOf(docs, seed = 7L, nShards = 1)
      .collect()(0).getLong(3)
    val h = md5(concat(lit("shuf7:"), col("doc_id").cast("string")))
    val keyed = docs.select(col("doc_id"), h.as("h"),
      conv(substring(h, 9, 8), 16, 10).cast("long").as("h32"))
    val wRev = Window.partitionBy(lit(0)).orderBy(col("h").desc, col("doc_id").desc)
    val rev = keyed.withColumn("pos", row_number().over(wRev).cast("long"))
      .agg(sum(pmod(col("pos") * col("h32"), lit(1000000007L)))).head.getLong(0)
    assert(fwd != rev, "reversed order must change the order checksum")
  }

  test("order_fp term is exact past 2^31 docs/shard (r14, VERDICT r13 #4)") {
    import spark.implicits._
    // synthetic (pos, h32) — no test corpus can plant 3e9 rows, but the
    // TERM is the same shared column expression the production
    // aggregate sums, so exercising it at pos > 2^31 is the real claim
    val rows = Seq(
      (3000000000L, 4000000000L), // the wrap case: pos·h32 ≈ 1.2e19 > 2^63
      (2147483648L, 4294967295L), // exactly 2^31 × (2^32 − 1)
      (5L, 123456789L))           // gate-scale sanity
    val got = rows.toDF("pos", "h32")
      .select(Layout.orderFpTerm(col("pos"), col("h32")).as("term"))
      .collect().map(_.getLong(0)).toSeq
    val p = BigInt(Layout.OrderFpP)
    val want = rows.map { case (pos, h) => ((BigInt(pos) * BigInt(h)) mod p).toLong }
    assert(got == want, "mod-reduced term must equal exact big-int arithmetic")
    // and the pre-r14 un-reduced Long product really does wrap here
    assert(3000000000L * 4000000000L < 0L)
  }
}

/** q_length_buckets: bucket assignment is the smallest power-of-two
  * holding the doc (floor 16, cap 512); padding and truncation are
  * accounted exactly.
  */
class LengthBucketsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  test("hand-walked buckets, padding and truncation") {
    import spark.implicits._
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (0L, mk(1)),    // bucket 16, pad 15
      (1L, mk(16)),   // bucket 16, pad 0
      (2L, mk(17)),   // bucket 32, pad 15
      (3L, mk(100)),  // bucket 128, pad 28
      (4L, mk(600))   // bucket 512 (cap), pad 0, trunc 88
    ).toDF("doc_id", "text")
    val out = Layout.lengthBucketsOf(docs, cap = 512).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(16L) == ((2L, 17L, 15L, 0L)))
    assert(out(32L) == ((1L, 17L, 15L, 0L)))
    assert(out(128L) == ((1L, 100L, 28L, 0L)))
    assert(out(512L) == ((1L, 600L, 0L, 88L)))
  }

  test("every doc lands in exactly one bucket; pad_frac bounded") {
    val rows = Layout.lengthBuckets(t).collect()
    assert(rows.map(_.getLong(1)).sum == t.documents.count())
    rows.foreach { r =>
      val frac = r.getDouble(5)
      assert(frac >= 0.0 && frac < 1.0, s"pad_frac out of range: $frac")
    }
  }
}
