package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Driver-contract spec for the bench's stdout summary line (r14,
  * VERDICT r13 #1). The r13 regression this pins: the line grew with
  * the query surface (10 slowest + the full ladder_top map + the full
  * skipped label list) to 1,928 chars, the driver's ~1,900-char
  * capture window truncated it, and the official artifact came back
  * `parsed: null` with the headline fields gone. The summary is now
  * bounded by construction; this spec renders it at the LIVE
  * `SparkEntry.queries` surface — so growing the surface breaks THIS
  * TEST, not the round's artifact — and at adversarial shapes, and
  * asserts the two things the driver needs: the line parses as JSON
  * and fits the window with the headline fields intact.
  */
class BenchSummarySpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** Fragments shaped like Bench's real optional emissions, at
    * generous sizes (worse than any observed round).
    */
  private def fragments: Seq[String] = Seq(
    ""","x10_rot":12""",
    // contention: 4 entries, one with the r14 cold attribution
    (1 to 4).map(i =>
      s""""q_contended_query_name_$i":{"rejected":2,"ext_busy":0.412,"unresolved":false""" +
        (if (i == 1) ""","cold_suspect":true,"cold_ext_busy":0.377}""" else "}"))
      .mkString(""","contention":{""", ",", "}"),
    ""","ladder_x100_sentinel":{"dedup_containment_capped":1.551,"dedup_minhash_lsh":8.562,"bpe_train_local":8.541}""",
    ""","skew":{"rows":6166300,"window_s":13.493,"rewrite_s":3.328}""",
    ""","recall":{"embed_ann_lsh":0.512,"embed_ann_multiprobe":0.943,"embed_ivf_pq":0.381,"embed_pca_topk":0.822,"embed_ivf_kmeans":0.861}""" +
      ""","recall_clustered":{"embed_ann_lsh":0.533,"embed_ann_multiprobe":0.961,"embed_ivf_pq":0.402,"embed_pca_topk":0.851,"embed_ivf_kmeans":0.882}""",
    ""","flagship":{"x1":{"s":0.701,"mb":15.1,"mb_s":21.5},"x10":{"s":1.952,"mb":151.0,"mb_s":77.4},"x100":{"s":5.785,"mb":1510.0,"mb_s":261.0},"x1000":{"s":58.100,"mb":15100.0,"mb_s":259.9}}""",
    ""","env":{"drain_wait_s":0.000,"suite_start":{"loadavg":1.13,"mem_avail_gb":101.4},"suite_end":{"loadavg":28.01,"mem_avail_gb":88.2},"end":{"loadavg":12.40,"mem_avail_gb":90.1}}""")

  /** The r13 official artifact's skipped shape, widened: every ×10
    * carrier cut, plus the suite/sentinel/flagship markers and a
    * rung-rep cut per ladder query.
    */
  private def skippedShape(names: Seq[String]): Seq[String] =
    Seq("suite_one_warm_from:q_skipgram_pmi") ++
      names.take(24).map(n => s"ladder_x10:$n") ++
      names.take(15).map(n => s"rung_rep_cut:ladder_x100:$n:1of2") ++
      Seq("ladder_x100", "ladder_x1000", "flagship_x1000", "ladder_x100_sentinel_build")

  private def renderLive(failed: Seq[String]): String = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    BenchSummary.render(
      total = "218.239", nQueries = names.size, reps = 5,
      sfDir = "/root/testdata/sf0.1",
      failed = failed, budgetS = 1500.0, elapsedS = 1458.733, phase = "final",
      skipped = skippedShape(names),
      slowest = names.map(n => n -> 12.345), // FULL surface: render must cap
      ladderTop = Some(("target/bench_sfx1000_sf0.1_v6",
        names.take(24).map(n => n -> 99.999))), // full ×10 list: must cap
      optionalFragments = fragments,
      fullReport = "target/bench_full.json")
  }

  test("live-surface worst case: parses, fits the window, headline intact") {
    val line = renderLive(failed = Nil)
    assert(line.length < 1900, s"summary line is ${line.length} chars (>= 1900)")
    val j = mapper.readTree(line) // throws on malformed JSON
    assert(j.get("metric").asText == "total")
    assert(j.get("value").asDouble == 218.239)
    assert(j.get("n_queries").asInt == SparkEntry.queries.size)
    assert(j.get("n_queries").asInt >= 282, "surface shrank under the r13 count")
    assert(j.get("failed_n").asInt == 0)
    assert(j.get("phase").asText == "final")
    assert(j.get("full_report").asText == "target/bench_full.json")
    // caps actually applied
    assert(j.get("slowest_p50").size == BenchSummary.SlowestCap)
    assert(j.get("ladder_top").get("times").size == BenchSummary.LadderTimesCap)
    assert(j.get("ladder_top").get("more").asInt == 24 - BenchSummary.LadderTimesCap)
    // skips are per-section counts, not the label list
    assert(j.get("skipped_n").get("ladder_x10").asInt == 24)
    assert(j.get("skipped_n").get("rung_rep_cut").asInt == 15)
    assert(j.get("skipped_n").get("ladder_x100").asInt == 1)
  }

  test("adversarial failure storm: failed capped, count exact, still parses") {
    val manyFailed = SparkEntry.queries.keys.toSeq.sorted // every query failed
    val line = renderLive(failed = manyFailed)
    assert(line.length < 1900, s"summary line is ${line.length} chars (>= 1900)")
    val j = mapper.readTree(line)
    assert(j.get("failed").size == BenchSummary.FailedCap)
    assert(j.get("failed_n").asInt == manyFailed.size)
  }

  test("greedy append preserves fragment atomicity under a tiny budget") {
    // squeeze maxLen until fragments must drop: whatever survives is
    // whole fragments — the line parses at EVERY budget
    for (maxLen <- Seq(400, 600, 900, 1400)) {
      val names = SparkEntry.queries.keys.toSeq.sorted
      val line = BenchSummary.render("1.000", names.size, 5, "/root/testdata/sf0.1",
        Nil, 1500.0, 10.0, "suite", skippedShape(names),
        names.map(n => n -> 1.0), Some(("d", names.take(24).map(n => n -> 1.0))),
        fragments, "target/bench_full.json", maxLen = maxLen)
      val j = mapper.readTree(line)
      assert(j.get("n_queries").asInt == names.size, s"head lost at maxLen=$maxLen")
    }
  }

  test("skip counts section on the prefix before the first colon") {
    assert(BenchSummary.skipCountsJson(Seq("a:1", "a:2", "b", "c:x:y")) ==
      """{"a":2,"b":1,"c":1}""")
    assert(BenchSummary.skipCountsJson(Nil) == "{}")
  }
}
