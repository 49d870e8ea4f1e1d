package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Bpe, TextAnalysis}

/** Unit semantics for the round-10 analytics operators — the hash gate
  * proves engine parity; these pin the SEMANTICS on hand-built cases.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parts(rows: (Long, Double, Int)*) =
    rows.toDF("p_partkey", "p_retailprice", "p_size")

  test("skyline: dominated points drop, equal points co-survive, matches NOT EXISTS") {
    val df = parts(
      (1L, 1.0, 5), (2L, 2.0, 9), (3L, 2.0, 9), // 2 and 3 are equal points — both stay
      (4L, 1.5, 5),                             // dominated by 1 (price strict)
      (5L, 3.0, 10),
      (6L, 2.5, 9),                             // dominated by 2 (price strict)
      (7L, 1.0, 4))                             // dominated by 1 (size strict)
    val got = Analytics.skylineOf(df).select("p_partkey").as[Long].collect().toList
    assert(got == List(1L, 2L, 3L, 5L))
    // cross-check vs the quadratic dominance definition
    val a = df.select(col("p_partkey").as("k"), col("p_retailprice").as("pr"),
      col("p_size").cast("long").as("sz"))
    val dominated = a.as("p").join(a.as("q"),
      col("q.pr") <= col("p.pr") && col("q.sz") >= col("p.sz") &&
        (col("q.pr") < col("p.pr") || col("q.sz") > col("p.sz")), "left_semi")
    val brute = a.select("k").except(dominated.select("k"))
      .as[Long].collect().toList.sorted
    assert(got == brute)
  }

  test("skyline: survives bucket-boundary placement (1 bucket == 32 buckets)") {
    // price and size grow together: no point is both cheaper and
    // bigger than another, so every point is on the frontier
    val df = parts((1L to 100L).map(i => (i, i.toDouble, i.toInt)): _*)
    val g32 = Analytics.skylineOf(df, buckets = 32).count()
    val g1  = Analytics.skylineOf(df, buckets = 1).count()
    assert(g32 == 100 && g1 == 100)
  }

  test("triangles: hand-built co-purchase graph counts its two triangles") {
    // orders o1,o2: {1,2,3}; o3,o4: {1,2,4}; o5: {3,4} (support 1 — no edge)
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L), (4L, 1L), (4L, 2L), (4L, 4L),
      (5L, 3L), (5L, 4L))
      .toDF("l_orderkey", "l_partkey")
    // edges (support>=2): 1-2, 1-3, 2-3, 1-4, 2-4 → triangles {1,2,3}, {1,2,4}
    val got = Analytics.trianglesOf(li, minSupport = 2)
      .as[(Long, Long)].collect().toList
    assert(got == List((1L, 2L), (2L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("running distinct users: cumulative curve equals the naive expanding distinct") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 09:00:00"), (3L, "2024-01-02 10:00:00"), // 1 returns — not new
      (2L, "2024-01-04 10:00:00"), (4L, "2024-01-04 11:00:00"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Analytics.runningDistinctOf(ev)
      .as[(java.sql.Date, Long, Long)].collect().toList
      .map { case (d, n, c) => (d.toString, n, c) }
    assert(got == List(
      ("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 3L), ("2024-01-04", 1L, 4L)))
  }

  test("rfm: five separated customers land in five distinct quintiles") {
    // customer i places i orders of 100·i each, last one i·10 days before max
    val rows = for {
      c <- 1 to 5; o <- 1 to c
    } yield (c.toLong * 1000 + o, c.toLong, 100.0 * c,
      java.sql.Timestamp.valueOf(s"2024-0$c-01 00:00:00"))
    val orders = rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val got = Analytics.rfmOf(orders).collect()
    // scores stay in [1,5]; populations sum to the customer count
    assert(got.map(_.getLong(3)).sum == 5)
    val all = got.flatMap(r => Seq(r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(all.forall(s => s >= 1 && s <= 5), all.toList.toString)
    // monotone: freq and monetary both grow with custkey, so the top
    // (f,m) cell must hold exactly one customer with scores (5,5)
    assert(got.exists(r => r.getInt(1) == 5 && r.getInt(2) == 5 && r.getLong(3) == 1))
    assert(got.exists(r => r.getInt(1) == 1 && r.getInt(2) == 1 && r.getLong(3) == 1))
  }

  test("bpe encode: zero merges = letter counts; trained merges reach the hand-derived counts") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val plain = Bpe.bpeEncodeOf(docs, Nil).head()
    assert(plain.getLong(1) == 13L)              // 5 + 2 + 6 words
    assert(plain.getLong(2) == 5 * 3 + 2 * 5 + 6 * 6L) // chars: low=3, lower=5, newest=6
    // the 4 merges bpeTrain learns on this corpus: (w,e),(l,o),(e,we),(ewe,s)
    // low → [lo w]; lower → [lo we r]; newest → [n ewes t]
    val trained = Seq(("w", "e"), ("l", "o"), ("e", "we"), ("ewe", "s"))
    val enc = Bpe.bpeEncodeOf(docs, trained).head()
    assert(enc.getLong(2) == 5 * 2 + 2 * 3 + 6 * 3L, enc.toString)
    // each successive merge can only shrink the total token count
    val counts = (0 to trained.size).map(k =>
      Bpe.bpeEncodeOf(docs, trained.take(k)).head().getLong(2))
    assert(counts == counts.sorted.reverse, counts.toString)
  }

  test("source entropy: constant corpus → 0 nats; uniform two-word corpus → ln 2") {
    val docs = Seq(
      (1L, "aa aa aa aa", "mono"),
      (2L, "aa bb aa bb", "duo"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceEntropyOf(docs)
      .select("source", "entropy_nats", "type_token_ratio", "hapax_fraction")
      .as[(String, Double, Double, Double)].collect().toMap2
    assert(got("mono") == ((0.0, 0.25, 0.0)))
    assert(got("duo")._1 == math.floor(math.log(2) * 1e6) / 1e6 ||
      got("duo")._1 == math.round(math.log(2) * 1e6) / 1e6)
    assert(got("duo")._2 == 0.5 && got("duo")._3 == 0.0)
  }

  test("time to convert: pre-signup purchases excluded, delay is signup→first purchase") {
    val ev = Seq(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),  // +2h — the first conversion
      (1L, "purchase", "2024-01-02 00:00:00"),  // later purchase ignored
      (2L, "purchase", "2023-12-31 00:00:00"),  // before signup — excluded
      (2L, "signup", "2024-01-01 00:00:00"),    // never converts after
      (3L, "signup", "2024-01-01 00:00:00"),
      (3L, "purchase", "2024-01-01 00:30:00"))  // +0.5h, same dow as user 1
      .toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"), col("s").cast("timestamp").as("ts"))
    val got = Analytics.timeToConvertOf(ev)
      .as[(Long, Long, Double, Double, Double)].collect().toList
    // 2024-01-01 is a Monday: dayofweek = 2
    assert(got == List((2L, 2L, 1.25, 1.25, 1.85)))
  }

  test("yoy growth: first year NULL, +100% doubling year") {
    val orders = Seq(
      (1L, "1-URGENT", 100.0, "1995-03-01 00:00:00"),
      (2L, "1-URGENT", 100.0, "1995-06-01 00:00:00"),
      (3L, "1-URGENT", 400.0, "1996-03-01 00:00:00"))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "s")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        col("s").cast("timestamp").as("o_orderdate"))
    val got = Analytics.yoyGrowthOf(orders).collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(3) && got(0).isNullAt(4))
    assert(got(1).getDouble(4) == 100.0)
  }

  private implicit class MapOps[A, B, C, D](xs: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = xs.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }
}
