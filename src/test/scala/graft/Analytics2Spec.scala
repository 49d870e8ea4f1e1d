package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics2, QualityRules, Similarity}
import graft.sources.Tables

/** Unit semantics for the second analytics tranche — the hash gate
  * proves engine parity; these pin the SEMANTICS on hand-built cases.
  */
class Analytics2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trend: exact linear revenue fits slope exactly") {
    // priority A: $1, $2, $3 across 2020-2022 → slope exactly 1.0/yr
    // priority B: constant $5 → slope 0
    val orders = Seq(
      ("A", "2020-03-01", 100.00), ("A", "2021-07-15", 200.00), ("A", "2022-01-02", 300.00),
      ("B", "2020-05-05", 500.00), ("B", "2021-06-06", 500.00), ("B", "2022-07-07", 500.00))
      .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
    val got = Analytics2.trendOf(orders)
      .select("priority", "slope_per_year", "avg_revenue")
      .as[(String, Double, Double)].collect()
      .map { case (p, s, a) => p -> ((s, a)) }.toMap
    assert(got("A") == ((100.0, 200.0)))
    assert(got("B") == ((0.0, 500.0)))
  }

  test("ab test: counts split by user parity and z matches the closed form") {
    // variant 0 = users {0,2}: both exposed, one converts
    // variant 1 = users {1,3}: both exposed, both convert
    // user 5: purchases but never exposed → excluded entirely
    val ev = Seq(
      (0L, "view", 0.0), (0L, "purchase", 100.0),
      (2L, "view", 0.0), (2L, "purchase", 10.0), // below minValue → not converted
      (1L, "view", 0.0), (1L, "purchase", 95.0),
      (3L, "view", 0.0), (3L, "purchase", 99.0),
      (5L, "purchase", 500.0))
      .toDF("user_id", "event_type", "value")
    val r = Analytics2.abTestOf(ev, minValue = 90.0)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    val (n0, c0, n1, c1, r0, r1, z) = r
    assert((n0, c0, n1, c1) == (2L, 1L, 2L, 2L))
    assert(r0 == 0.5 && r1 == 1.0)
    val p = 3.0 / 4.0
    val zExp = (1.0 - 0.5) / math.sqrt(p * (1 - p) * (1.0 / 2 + 1.0 / 2))
    assert(math.abs(z - (math.rint(zExp * 1e4) / 1e4)) < 1e-9)
  }

  test("churn: activity cohorts and the grace window are honored") {
    // horizon = 2024-01-30. u1: 1 active day, last seen day 1 → churned.
    // u2: 2 active days, last seen day 29 → retained.
    // u3: 1 active day, last seen day 28 → retained (within 14-day grace).
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"),
      (2L, "2024-01-02 10:00:00"), (2L, "2024-01-29 10:00:00"),
      (3L, "2024-01-28 09:00:00"), (4L, "2024-01-30 23:00:00"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Analytics2.churnOf(ev, graceDays = 14)
      .select("active_days", "n_users", "n_churned")
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((1L, 3L, 1L), (2L, 1L, 0L)))
  }

  test("weighted sample: selection is exactly the k smallest u/w keys, rerun-stable") {
    val docs = (1L to 200L).map(i => (i, s"doc $i", 10 + (i % 7).toInt * 5))
      .toDF("doc_id", "text", "n_chars")
    val got = Analytics2.weightedSampleOf(docs, k = 20).select("doc_id")
      .as[Long].collect().toSet
    // brute force the same deterministic key
    val brute = docs.select(col("doc_id"),
        ((conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").cast("double") + 0.5) / 4294967296.0 / col("n_chars")).as("key"))
      .orderBy(col("key"), col("doc_id")).limit(20)
      .select("doc_id").as[Long].collect().toSet
    assert(got == brute)
    val again = Analytics2.weightedSampleOf(docs, k = 20).select("doc_id")
      .as[Long].collect().toSet
    assert(got == again)
  }

  test("weighted sample: heavier docs are sampled more often") {
    // 500 docs, half weight 1, half weight 100 — the heavy half must
    // dominate any fixed-size sample under P(key<t) = min(1, t*w)
    val docs = (1L to 500L).map(i => (i, "x", if (i <= 250) 1 else 100))
      .toDF("doc_id", "text", "n_chars")
    val picked = Analytics2.weightedSampleOf(docs, k = 50)
      .select("doc_id").as[Long].collect()
    val heavy = picked.count(_ > 250)
    assert(heavy > 40, s"expected heavy docs to dominate, got $heavy/50")
  }

  test("group sample: per-stratum selection equals the window form, heap-ordered") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}", "x", 10 + (i % 11).toInt))
      .toDF("doc_id", "source", "text", "n_chars")
    val got = graft.operators.Analytics2.groupSampleOf(docs, k = 4)
      .select("source", "rank", "doc_id")
      .as[(String, Long, Long)].collect().toList
    // brute: per source, 4 smallest (key, doc_id)
    val keyed = docs.select(col("source"), col("doc_id"),
        graft.operators.Analytics2.sampleKey(col("doc_id"), col("n_chars")).as("key"))
      .as[(String, Long, Double)].collect()
    val want = keyed.groupBy(_._1).toList.flatMap { case (src, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(4).zipWithIndex
        .map { case (r, i) => (src, i + 1L, r._2) }
    }.sorted
    assert(got == want)
    assert(got.count(_._1 == "src0") == 4 && got.map(_._1).distinct.size == 3)
  }

  test("zipf fit: an exact power-law corpus fits slope -1") {
    // freq(rank) = 720/rank for ranks 1..6 — ln-ln exactly linear
    val words = (1 to 6).flatMap { r => Seq.fill(720 / r)((1L, s"w$r")) }
    val toks = words.toDF("doc_id", "word")
    val (n, slope, _) = Analytics2.zipfFitOf(toks, topN = 6)
      .as[(Long, Double, Double)].collect().head
    assert(n == 6L && math.abs(slope - (-1.0)) < 1e-9)
  }

  test("gopher rules: each rule gates independently") {
    val mk = (id: Long, text: String) => (id, text)
    val good = (1 to 30).map(i => s"the quick brown fox${i}").mkString(" ") // 120 words, stopwords, alpha
    val docs = Seq(
      mk(1, good + " " + good),
      mk(2, "short text only"),                       // too few words
      mk(3, (1 to 60).map(_ => "####### #####").mkString(" ")), // symbol soup, no alpha
      mk(4, (1 to 60).map(i => s"zz$i").mkString(" ")))         // no stopword hits
      .toDF("doc_id", "text")
    val got = QualityRules.gopherRulesOf(docs, minWords = 50)
      .select("doc_id", "gopher_pass").as[(Long, Int)].collect().toMap
    assert(got(1) == 1 && got(2) == 0 && got(3) == 0 && got(4) == 0)
  }

  test("c4 rules: sentence minimum and blacklist markers") {
    val longSent = "this sentence has at least five words"
    val docs = Seq(
      (1L, s"$longSent. $longSent. $longSent."),      // 3 kept sentences → keep
      (2L, s"$longSent. $longSent."),                 // only 2 → drop
      (3L, s"$longSent. $longSent. $longSent. var x = {a}."), // brace → drop
      (4L, s"$longSent. $longSent. enable JavaScript to view. $longSent.")) // js → drop
      .toDF("doc_id", "text")
    val got = QualityRules.c4RulesOf(docs)
      .select("doc_id", "c4_keep").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0))
  }

  test("threshold sweep: full grid, monotone non-increasing, anchored to dup pairs") {
    val t = Tables(spark, TestSpark.sf)
    val ths = Seq(0.3, 0.4, 0.5, 0.7, 0.9)
    val got = Similarity.thresholdSweep(t, ths).as[(Double, Long)].collect().toList
    assert(got.map(_._1) == ths) // every requested cut present, sorted
    assert(got.sliding(2).forall { case List(a, b) => a._2 >= b._2; case _ => true })
    // the 0.4 rung counts exactly the gated dup-pairs query's rows
    val dupPairs = Similarity.embeddingDupPairsLsh(t, threshold = 0.4).count()
    assert(got.toMap.apply(0.4) == dupPairs)
  }

  test("corr matrix: exact linear and anti-linear columns hit ±1") {
    val li = (1 to 50).map { i =>
      (i.toDouble, 2.0 * i, 100.0 - i, (i % 7).toDouble)
    }.toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = graft.operators.Analytics2.corrMatrixOf(li)
      .as[(String, String, Double)].collect()
      .map { case (a, b, r) => (a, b) -> r }.toMap
    assert(got(("qty", "price")) == 1.0)     // y = 2x
    assert(got(("qty", "discount")) == -1.0) // y = 100 - x
    assert(math.abs(got(("qty", "tax"))) < 0.3) // near-independent
  }

  test("mad outliers: robust to the planted extreme value") {
    // 9 values around 10 (median 10, MAD 1) + one wild 1000:
    // |1000-10| = 990 > 3*1.4826*1 → exactly one outlier; the mean-based
    // 3σ rule would move the center; the median doesn't budge.
    val vals = Seq(8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0)
    val ev = vals.map(v => ("click", v)).toDF("event_type", "value")
    val (n, med, mad, out) = graft.operators.Analytics2.madOutliersOf(ev)
      .select("n", "median_value", "mad", "n_outliers")
      .as[(Long, Double, Double, Long)].collect().head
    assert(n == 10L && med == 10.0 && mad == 1.0 && out == 1L)
  }

  test("lag features: prev/delta/rolling frames follow the (ts, event_id) order") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 10.0),
      (2L, 1L, "2024-01-01 10:00:30", "click", 20.0),
      (3L, 1L, "2024-01-01 10:02:00", "purchase", 60.0),
      (4L, 2L, "2024-01-01 11:00:00", "view", 5.0))
      .toDF("event_id", "user_id", "s", "event_type", "value")
      .select(col("event_id"), col("user_id"), col("s").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
    val got = graft.operators.Features.lagFeaturesOf(ev)
      .as[(Long, Long, String, Option[String], Option[Long], Double)].collect().toList
    assert(got == List(
      (1L, 1L, "view", None, None, 10.0),
      (2L, 1L, "click", Some("view"), Some(30L), 15.0),
      (3L, 1L, "purchase", Some("click"), Some(90L), 30.0),
      (4L, 2L, "view", None, None, 5.0)))
  }

  test("markov transitions: rows normalize and count only within-user steps") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"), (2L, 1L, "2024-01-01 10:01:00", "b"),
      (3L, 1L, "2024-01-01 10:02:00", "a"), (4L, 1L, "2024-01-01 10:03:00", "a"),
      (5L, 2L, "2024-01-01 10:00:00", "b")) // user 2: single event, no transition
      .toDF("event_id", "user_id", "s", "event_type")
      .select(col("event_id"), col("user_id"), col("s").cast("timestamp").as("ts"),
        col("event_type"))
    val got = graft.operators.Features.markovTransitionsOf(ev)
      .as[(String, String, Long, Double)].collect().toList
    // a→b (1), b→a (1), a→a (1); row a: 2 transitions
    assert(got == List(("a", "a", 1L, 0.5), ("a", "b", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("session stats: converted sessions profiled separately, durations exact") {
    // user 1: one session of 3 events over 90s with a purchase;
    // user 2: one 2-event 60s session, no purchase; user 3: single-event session
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"), (2L, 1L, "2024-01-01 10:00:30", "click"),
      (3L, 1L, "2024-01-01 10:01:30", "purchase"),
      (4L, 2L, "2024-01-01 11:00:00", "view"), (5L, 2L, "2024-01-01 11:01:00", "click"),
      (6L, 3L, "2024-01-01 12:00:00", "view"))
      .toDF("event_id", "user_id", "s", "event_type")
      .select(col("event_id"), col("user_id"), col("s").cast("timestamp").as("ts"),
        col("event_type"))
    val got = graft.operators.Events.sessionStatsOf(ev)
      .as[(Int, Long, Double, Double, Double)].collect().toList
    assert(got == List(
      (0, 2L, 1.5, 30.0, 30.0),   // two non-converting sessions: 2ev/60s, 1ev/0s
      (1, 1L, 3.0, 90.0, 90.0)))  // the purchase session
  }

  test("hll cumulative: monotone, matches the exact curve, union ≡ one-shot sketch") {
    val t  = Tables(spark, TestSpark.sf)
    val got = graft.operators.Analytics2.hllCumulativeOf(t.events)
      .as[(java.sql.Date, Long)].collect().toList
    assert(got.sliding(2).forall { case List(a, b) => a._2 <= b._2; case _ => true })
    // exact cumulative distinct at each ACTIVE day (runningDistinct
    // only emits days with new users — not the same row set)
    val firstDays = t.events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"))
      .as[(Long, java.sql.Date)].collect().map(_._2)
    got.foreach { case (d, est) =>
      val ex = firstDays.count(!_.after(d)).toLong
      assert(math.abs(est - ex) <= math.max(1L, (ex * 0.02).toLong),
        s"day $d: est $est vs exact $ex")
    }
    // reaggregation loses nothing: the final union equals one sketch
    // built over the whole corpus in a single pass
    val oneShot = t.events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).cast("long"))
      .as[Long].collect().head
    assert(got.last._2 == oneShot)
  }

  test("hll verdict gate: full day grid, every within_tol true (r12)") {
    val t = Tables(spark, TestSpark.sf)
    val rows = graft.operators.Analytics2.hllGate(t).collect()
    val nDays = t.events.select(to_date(col("ts"))).distinct().count()
    assert(rows.length == nDays)
    rows.foreach(r => assert(r.getBoolean(1), s"hll gate broke on ${r.getDate(0)}"))
  }

  test("vocab coverage: hand-built freqs cover exactly their share") {
    // freqs: a=50, b=30, c=15, d=5 (total 100)
    val toks = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(15)("c") ++
      Seq.fill(5)("d")).zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "word")
    val got = graft.operators.CorpusScience.vocabCoverageOf(toks, ks = Seq(1, 2, 4))
      .select("k", "vocab_size", "coverage")
      .as[(Long, Long, Double)].collect().toList
    assert(got == List((1L, 4L, 0.5), (2L, 4L, 0.8), (4L, 4L, 1.0)))
  }

  test("heaps law: sublinear vocabulary growth fits beta < 1; repeated corpus flattens") {
    // V(d) ≈ √d: a new word appears only at perfect-square doc ids,
    // every doc also repeats 9 known words — tokens linear, vocab √
    val rnd = new scala.util.Random(7)
    val toks = (0 until 400).flatMap { d =>
      val sq = math.sqrt(d).toInt
      val newWord = if (sq * sq == d) Seq(s"w$d") else Seq.empty
      val oldWords = (1 to 9).map { _ => val r = rnd.nextInt(sq + 1); s"w${r * r}" }
      (newWord ++ oldWords).map(w => (d.toLong, w))
    }.toDF("doc_id", "word")
    val (n, beta, _) = graft.operators.CorpusScience.heapsLawOf(toks, buckets = 10)
      .as[(Long, Double, Double)].collect().head
    assert(n == 10L && beta > 0.2 && beta < 0.8, s"beta $beta")
    // a corpus that stops inventing words: beta near 0
    val flat = (0 until 400).flatMap(d => Seq(("a"), ("b"), ("c")).map(w => (d.toLong, w)))
      .toDF("doc_id", "word")
    val betaFlat = graft.operators.CorpusScience.heapsLawOf(flat, buckets = 10)
      .select("heaps_beta").as[Double].collect().head
    assert(betaFlat >= 0.0 && betaFlat < 0.05)
  }

  test("centroids: duplicated vector concentrates, antipodal pair cancels") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f), 0), (2L, Array(3.0f, 4.0f), 0),   // identical
      (3L, Array(1.0f, 0.0f), 1), (4L, Array(-1.0f, 0.0f), 1))  // antipodal
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidsOf(emb)
      .select("label", "n_vecs", "centroid_norm", "avg_vec_norm", "concentration")
      .as[(Long, Long, Double, Double, Double)].collect().toList
    assert(got == List((0L, 2L, 5.0, 5.0, 1.0), (1L, 2L, 0.0, 1.0, 0.0)))
  }

  test("skipgrams: window geometry exact, empties re-ranked, both directions emitted") {
    // "a  b c" (double space) + "c a": window 2 pairs (directed, fwd):
    // doc1: (a,b) d1, (a,c) d2, (b,c) d1; doc2: (c,a) d1
    // symmetric counts: a-b:1, b-a:1, a-c:2 (fwd a→c + mirror of c→a),
    // c-a:2, b-c:1, c-b:1
    val docs = Seq((1L, "a  b c"), (2L, "c a")).toDF("doc_id", "text")
    val got = graft.operators.CorpusScience.skipgramsOf(docs, window = 2, topK = 10)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "c", 2L), ("c", "a", 2L), ("a", "b", 1L),
      ("b", "a", 1L), ("b", "c", 1L), ("c", "b", 1L)), s"got $got")
    // window 1 drops the distance-2 (a,c) pair from doc1 only
    val w1 = graft.operators.CorpusScience.skipgramsOf(docs, window = 1, topK = 10)
      .as[(String, String, Long)].collect().toSet
    assert(w1 == Set(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L),
      ("c", "b", 1L), ("a", "c", 1L), ("c", "a", 1L)), s"got $w1")
    // the mirror branch must NOT re-run the corpus-pair join: its
    // mid-aggregate exchange is canonically identical to the forward
    // branch's, so exchange reuse serves it from cache. Assert on the
    // typed ReusedExchangeExec node (the PlanAuditSpec style), not a
    // plan-string substring, and pin the conf the guarantee rides on:
    // with AQE off, ReuseExchange is the deterministic physical rule
    // that dedups canonically-equal exchanges (AQE expresses the same
    // reuse as stage reuse, a runtime heuristic this spec is not
    // pinning).
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.CorpusScience.skipgramsOf(docs, window = 2, topK = 10)
      val reused = df.queryExecution.executedPlan.collect {
        case r: ReusedExchangeExec => r
      }
      assert(reused.nonEmpty,
        s"expected a ReusedExchangeExec for the mirror branch:\n${df.queryExecution.executedPlan.toString.take(2000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("neg sampling: ^0.75 damping, contiguous ranges partitioning [0,1]") {
    // freqs a=16, b=1: raw shares 16/17 vs 1/17; damped 16^.75=8 vs 1
    // → p = 8/9, 1/9 — the published downsampling of frequent words
    val toks = (Seq.fill(16)("a") ++ Seq("b")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "word")
    val got = graft.operators.CorpusScience.negSamplingOf(toks)
      .as[(String, Long, Double, Double, Double)].collect().toList
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == List(
      ("a", 16L, r6(8.0 / 9), 0.0, r6(8.0 / 9)),
      ("b", 1L, r6(1.0 / 9), r6(8.0 / 9), 1.0)), s"got $got")
    // ranges are contiguous and end exactly at 1.0 on a wider corpus
    val many = (1 to 40).flatMap(i => Seq.fill(i)(s"w$i")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "word")
    val rows = graft.operators.CorpusScience.negSamplingOf(many, topN = 10)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length == 10 && rows.last._5 == 1.0)
    // EXACT contiguity: cum_lo is the predecessor's rounded cum_hi by
    // construction now, so the ranges partition [0,1] with no 1e-6
    // float gaps for a binary-searching sampler to fall into
    assert(rows.head._4 == 0.0)
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(x._5 == y._4, s"gap between ${x._1} and ${y._1}: ${x._5} vs ${y._4}")
    }
  }

  test("skipgram pmi: associated pair scores above independent pair") {
    // x and y ALWAYS co-occur; z pairs with everything uniformly →
    // pmi(x,y) > pmi(x,z). Repeat docs to clear minCount.
    val docs = (0 until 10).flatMap(i =>
      Seq((i * 2L, "x y"), (i * 2L + 1, s"z w$i"))).toDF("doc_id", "text")
    val got = graft.operators.CorpusScience.skipgramPmiOf(docs, window = 2,
        minCount = 5, topK = 10)
      .as[(String, String, Long, Double)].collect()
    val byPair = got.map(r => (r._1, r._2) -> r._4).toMap
    // only x-y survives minCount=5 (20 symmetric pairs); z-w_i all 2
    assert(byPair.keySet == Set(("x", "y"), ("y", "x")), s"got $byPair")
    // pmi(x,y) = ln( (10/40) / ((10/40)(10/40)) ) = ln 4
    assert(byPair(("x", "y")) == math.rint(math.log(4.0) * 1e6) / 1e6)
    assert(byPair(("x", "y")) == byPair(("y", "x")))
  }

  // ------------------------------------------- Dunning LLR collocations

  test("dunningLlr: hand-computed G-squared on a planted micro-corpus") {
    // doc "x y x y x y": bigrams [x y, y x, x y, y x, x y] → N=5
    // for "x y": k11=3, c1(x ·)=3, c2(· y)=3, k12=0, k21=0, k22=2
    // G² = 2·(3·ln(3·5/(3·3)) + 2·ln(2·5/(2·2))) = 2·(3·ln(5/3) + 2·ln(2.5))
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val got = graft.operators.CorpusScience.dunningLlrOf(docs, minCount = 1, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val expected = 2.0 * (3.0 * math.log(5.0 / 3.0) + 2.0 * math.log(2.5))
    assert(math.abs(got("x y") - expected) < 1e-5)
  }

  test("dunningLlr: a frequent perfect collocation outranks a rare one (THE Dunning-vs-PMI property)") {
    // "a b" appears 8 times, "c d" once; both perfectly associated.
    // PMI would tie or favor the rare pair; G² must rank "a b" first.
    val docs = Seq((1L, ("a b " * 8).trim + " c d")).toDF("doc_id", "text")
    val rows = graft.operators.CorpusScience.dunningLlrOf(docs, minCount = 1, topK = 3)
      .collect().map(_.getString(0))
    assert(rows.head == "a b")
    assert(rows.indexOf("a b") < rows.indexOf("c d"))
  }

  test("dunningLlr: G-squared is nonnegative and zero cells contribute zero") {
    val docs = Seq((1L, "p q r s p q"), (2L, "r s p q r s")).toDF("doc_id", "text")
    val vals = graft.operators.CorpusScience.dunningLlrOf(docs, minCount = 1, topK = 100)
      .collect().map(_.getDouble(2))
    assert(vals.forall(_ >= -1e-9))
  }

  // --------------------------------------------------- RAKE keywords

  test("rake: stopwords delimit phrases and scores follow deg/freq (hand-computed)") {
    // stoplist contains "the"; text "deep learning the deep model" →
    // phrases: [deep learning], [deep model]
    // freq: deep 2, learning 1, model 1; deg: deep 2+2=4, learning 2, model 2
    // score(deep)=2, score(learning)=2, score(model)=2
    // phrase scores: deep learning = 4, deep model = 4
    val docs = Seq((1L, "deep learning the deep model"),
      (2L, "deep learning the deep model")).toDF("doc_id", "text")
    val got = graft.operators.CorpusScience.rakeOf(docs, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("deep learning", 2L, 4.0), ("deep model", 2L, 4.0)))
  }

  test("rake: phrases longer than maxLen are dropped") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = graft.operators.CorpusScience.rakeOf(docs, maxLen = 4, minCount = 2, topK = 10)
      .collect()
    assert(got.isEmpty) // the single 5-word run exceeds maxLen
  }

  test("rake: a phrase seen once is filtered by minCount") {
    val docs = Seq((1L, "quantum leap"), (2L, "quantum leap"), (3L, "solo phrase"))
      .toDF("doc_id", "text")
    val got = graft.operators.CorpusScience.rakeOf(docs, minCount = 2, topK = 10)
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("quantum leap"))
  }
}
