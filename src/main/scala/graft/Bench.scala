package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Prints a JSON summary line after the graded suite
  * phase and again (complete) at the end of the run:
  * {"metric":"total","value":<sum of per-query p50>,"unit":"sec",
  *  "queries":{name:p50,...},                    // p50 of warm runs
  *  "stats":{name:{"cold":c,"p50":m,"p95":p,"n":N},...},
  *  "failed":[...], "reps":N, "skipped":[...],
  *  "ladder":{sfDir:{headline:sec,...},...},     // scaling behavior
  *  "sf":dir}
  *
  * Round-3 redesign (VERDICT r2 item 1): one-shot timings in a shared
  * session made per-query numbers warmup-ordering noise — code that
  * didn't change appeared to regress 10×. Each query now runs once
  * cold (recorded separately: it carries codegen+AQE warmup) and then
  * warm reps; the headline per-query number is the warm p50, so
  * deltas between rounds reflect the plan, not scheduling accidents.
  *
  * Round-12 redesign (VERDICT r11 item 1): the official r11 bench hit
  * the driver's wall-clock timeout (rc 124) and the single end-of-run
  * artifact lost EVERYTHING, including the finished suite phase. The
  * run is now governed by a hard time budget with remaining-time gates
  * between sections and between ladder queries; the artifact is written
  * after the suite phase and re-written after every section; whatever
  * does not fit is recorded in "skipped" instead of silently missing.
  * The full-depth ladder lives in committed local artifacts
  * (target/bench_full_r{N}*.json), not in the driver's budget.
  */
object Bench {
  private def pct(sorted: Array[Double], q: Double): Double =
    if (sorted.isEmpty) -1.0
    else sorted(math.min(sorted.length - 1, math.ceil(q * sorted.length).toInt - 1).max(0))

  /** Machine-state sample (1-min loadavg + available memory) emitted at
    * phase boundaries: the r7 bench artifact carried p50s up to ×10 an
    * isolated re-run of identical code with inverted cold<p50<p95
    * shapes — contamination the artifact itself couldn't prove or
    * disprove. Now every BENCH_r{N} records whether the SUITE phase ran
    * on a quiet machine, so a polluted run is attributable instead of
    * reading as a plan regression.
    */
  private def rd(p: String): String =
    try new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    catch { case _: Throwable => "" }

  private def loadAvg(): Double =
    rd("/proc/loadavg").split("\\s+").headOption.filter(_.nonEmpty).map(_.toDouble).getOrElse(-1.0)

  private def envSample(): String = {
    val load = loadAvg() match { case -1.0 => "-1"; case l => l.toString }
    val memGb = rd("/proc/meminfo").linesIterator
      .find(_.startsWith("MemAvailable")).flatMap(_.split("\\s+").lift(1))
      .map(kb => f"${kb.toDouble / 1048576.0}%.1f").getOrElse("-1")
    s"""{"loadavg":$load,"mem_avail_gb":$memGb}"""
  }

  /** r8 verdict #4: the timed suite must not start while the machine is
    * still draining a previous JVM (r8's suite_start loadavg was 7.6 —
    * the sbt-test run shutting down — and the alphabetically-early heavy
    * queries absorbed it as inverted cold<p50 shapes). Poll until 1-min
    * loadavg < `threshold` or `maxWaitSec` elapses; return the seconds
    * actually waited so the artifact records the gate's effect.
    */
  private def drainLoad(threshold: Double = 2.0, maxWaitSec: Double = 300.0): Double = {
    val t0 = System.nanoTime()
    def waited = (System.nanoTime() - t0) / 1e9
    var l = loadAvg()
    while (l >= 0 && l > threshold && waited < maxWaitSec) {
      Thread.sleep(5000)
      l = loadAvg()
    }
    waited
  }

  /** EXTERNAL cpu pressure, sampled while this JVM idles (r13, VERDICT
    * r12 #1). 1-min loadavg can't arbitrate a mid-suite spike — our own
    * local[32] tasks dominate it for a minute after every heavy query.
    * This instead diffs /proc/stat over a `ms` sleep taken BETWEEN
    * timed reps, when our executor pool is quiescent: any busy fraction
    * seen belongs to other processes (± this JVM's background threads,
    * small). Returns busy fraction in [0,1], or -1 outside procfs.
    */
  private def cpuBusyFraction(ms: Long = 200): Double = {
    def snap(): Option[(Long, Long)] =
      rd("/proc/stat").linesIterator.find(_.startsWith("cpu ")).map { l =>
        val f = l.trim.split("\\s+").drop(1).map(_.toLong)
        val idle = f(3) + (if (f.length > 4) f(4) else 0L)
        (idle, f.sum)
      }
    (for { (i0, t0) <- snap(); _ = Thread.sleep(ms); (i1, t1) <- snap() } yield {
      val dt = (t1 - t0).toDouble
      if (dt <= 0) -1.0 else 1.0 - (i1 - i0) / dt
    }).getOrElse(-1.0)
  }

  def main(args: Array[String]): Unit = {
    // r11 post-mortem: the official BENCH_r11 was rc 124 / parsed null —
    // the WORKLOAD outgrew the driver's wall-clock budget and the
    // single end-of-run artifact meant a timeout erased even the
    // already-finished suite phase. Three rules now govern the run:
    // (1) a hard time budget (SPARK_GRAFT_TIME_BUDGET_S, default 25 min
    //     — conservative vs any plausible driver timeout) with remaining-
    //     time gates between sections AND between ladder queries;
    // (2) the artifact (file + stdout summary line) is emitted the
    //     moment the graded SUITE phase completes, then re-written after
    //     every section and re-printed at the end — a kill at any point
    //     leaves a complete, parseable artifact for everything that ran;
    // (3) everything that does not fit is recorded in "skipped", never
    //     silently absent: the full ladder is committed as a local
    //     artifact (target/bench_full_r{N}.json) instead.
    val benchT0 = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - benchT0) / 1e9
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET_S", "1500").toDouble
    def remaining(): Double = budgetS - elapsed()
    val skipped = scala.collection.mutable.ListBuffer.empty[String]
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
    val spark = GraftSession.builder(master = s"local[$cpus]", appName = "graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    // ERROR, not WARN: the r11 driver tail was 100% CacheManager WARN
    // spam — if the driver greps its captured tail for the JSON line,
    // log noise printed after our line can scroll it out of the window.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (parquet reader, codegen, shuffle machinery)
    // so the first timed query isn't charged JVM startup.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    // Optional comma-separated filter for local iteration; the driver
    // never sets it. A name that matches no query is a hard error —
    // a typo must not silently print a clean-looking empty run.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // section sentinels: not queries, but runnable alone for iteration
    val sentinels = Set("skew_pair", "ladder_x10", "ladder_x100", "ladder_x1000",
      "ann_recall", "flagship_ladder", "ladder_x100_sentinel")
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet -- sentinels
      if (unknown.nonEmpty) {
        System.err.println(s"[bench] SPARK_GRAFT_ONLY names match no query: ${unknown.mkString(",")}")
        spark.stop(); sys.exit(1)
      }
    }
    def sectionOn(name: String): Boolean = only.forall(_.contains(name))

    // noop sink materializes EVERY output column — count() would let
    // Catalyst prune the expensive expressions and under-measure.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1.0 }
    }

    case class Stat(cold: Double, p50: Double, p95: Double, n: Int, failed: Boolean)
    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // ---- PHASE 1: the timed suite — the CLEAN phase (r7 verdict #2).
    // Everything expensive that is not a timed query (×10/×100 replica
    // construction, the skew shard, the clustered-recall corpus) runs
    // strictly AFTER this loop; env samples bracket it so external
    // contamination shows up in the artifact rather than masquerading
    // as a plan regression.
    val drainWaitSec = drainLoad(maxWaitSec = 120.0)
    val envSuiteStart = envSample()
    // Adaptive warm reps (r11 budget fix, tuned on the first r12
    // driver-shaped run): the suite's warm-rep cost is dominated by
    // its slowest ~20 queries, whose p50s have been stable for rounds
    // — full `reps` precision goes to the cheap majority; everything
    // over 1 s cold gets 2 warm reps. Never 1: the first r12 run gave
    // heavies a single warm rep and q_modularity absorbed an in-suite
    // contention spike (15.7 s vs its stable 4.7 s) with nothing to
    // reject it — the lower-median of 2 kills exactly that. Past 55%
    // of the budget the remainder degrades to ONE warm rep (still a
    // warm number — that run also showed cold-only p50s read 2.4× the
    // warm value, pure codegen warmup, +88 s of phantom regression);
    // only past 80% does it drop to cold-only, recorded in "skipped".
    // The suite always COMPLETES: a -1 for a never-run query is
    // indistinguishable from breakage, which r11 proved is the worst
    // outcome an artifact can have.
    val suiteSoftDeadline = budgetS * 0.55
    val suiteHardDeadline = budgetS * 0.80
    var coldOnlyFrom: Option[String] = None
    var oneWarmFrom: Option[String] = None
    // r13 (VERDICT r12 #1): the official r12 artifact accepted a 34×
    // contention spike as a graded p50 (q_dunning_llr 19.786 s official
    // vs 0.587 s drained — the machine was loaded, min-of-reps had
    // nothing clean to keep). Per-rep guard: a warm rep reading above
    // max(3× the running min, min + 1 s) is SUSPECT; if an EXTERNAL
    // cpu-busy sample (taken while this JVM idles, see cpuBusyFraction)
    // confirms outside load > 15%, the rep is REJECTED and re-run
    // (≤2 extra reps per query, ≤30 suite-wide, budget-gated) instead
    // of entering the p50. A suspect rep WITHOUT confirmed outside load
    // is kept — it may be real variance, and silently dropping slow
    // reps with no evidence would bias the suite fast. Every rejection
    // (and any query whose final p50 still reads suspect) lands in the
    // artifact's "contention" map, so a residual spike is attributable
    // instead of masquerading as a plan regression.
    case class Contention(rejected: Int, extBusy: Double, unresolved: Boolean,
      coldSuspect: Boolean = false, coldExtBusy: Double = -1.0)
    val contention = scala.collection.mutable.LinkedHashMap.empty[String, Contention]
    var extraRepsLeft = 30
    val stats = suite.map { case (name, fn) =>
      // A failed query is reported as -1 (never a normal-looking fast
      // time) and listed in "failed" so the metric line can't mask
      // breakage; remaining reps are skipped.
      val cold = runOnce(name, fn, sfDir)
      val intendedWarm =
        if (cold < 0) 0
        else if (elapsed() > suiteHardDeadline) {
          if (coldOnlyFrom.isEmpty) { coldOnlyFrom = Some(name); skipped += s"suite_cold_only_from:$name" }
          0
        }
        else if (elapsed() > suiteSoftDeadline) {
          if (oneWarmFrom.isEmpty) { oneWarmFrom = Some(name); skipped += s"suite_one_warm_from:$name" }
          math.min(reps - 1, 1)
        }
        // r14 (VERDICT r13 #2, funding option): sub-300 ms queries — the
        // cheap majority whose p50s have been rotation-stable for five
        // rounds — drop from 4 warm reps to 2. Saves ~2 reps × ~200
        // queries × ~0.15 s ≈ 60 s of suite time, which funds the ×10
        // ladder rotation below. Lower-median-of-2 still rejects a
        // single-rep spike (the q_modularity lesson), and the per-rep
        // contention guard is unchanged.
        else if (cold <= 0.3) math.min(reps - 1, 2)
        else if (cold <= 1.0) reps - 1
        else math.min(reps - 1, 2)
      var runningMin = if (cold >= 0) cold else Double.MaxValue
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Double]
      var rejected = 0
      var lastBusy = -1.0
      var extras = 0
      var failed = cold < 0
      var i = 0
      while (!failed && i < intendedWarm) {
        val tRep = runOnce(name, fn, sfDir)
        if (tRep < 0) failed = true
        else {
          val isSuspect = BenchPolicy.suspect(runningMin, tRep)
          if (isSuspect) lastBusy = cpuBusyFraction()
          val drop = isSuspect && BenchPolicy.reject(runningMin, tRep, lastBusy,
            extras, extraRepsLeft, budgetOk = remaining() > 60)
          runningMin = math.min(runningMin, tRep)
          if (drop) {
            rejected += 1; extras += 1; extraRepsLeft -= 1 // slot stays open: re-run it
          } else { accepted += tRep; i += 1 }
        }
      }
      val ok = !failed
      // With no warm runs, fall back to the cold time so the headline
      // number is still real.
      val sortedWarm = accepted.toArray.sorted
      val p50 = if (!ok) -1.0 else if (sortedWarm.isEmpty) cold else pct(sortedWarm, 0.50)
      val p95 = if (!ok) -1.0 else if (sortedWarm.isEmpty) cold else pct(sortedWarm, 0.95)
      // p50 still >3× the cleanest observation → contention outlasted
      // the bounded retries (or hit the caps): flag, don't fabricate.
      val unresolved = ok && p50 >= 0 && BenchPolicy.suspect(runningMin, p50)
      // r14 (VERDICT r13 #6): a spiked COLD rep previously landed
      // unattributed in stats.*.cold. Flag (never reject — see
      // BenchPolicy.coldSuspect) with an external busy sample; the
      // sample is taken NOW, after the warm reps, so it attributes
      // load that persisted through the query's window — a transient
      // spike that already drained still shows as cold_suspect with a
      // low busy reading, which is itself the honest record.
      val warmMin = if (accepted.nonEmpty) accepted.min else -1.0
      val coldSus = ok && BenchPolicy.coldSuspect(warmMin, cold)
      val coldBusy = if (coldSus) cpuBusyFraction() else -1.0
      if (rejected > 0 || unresolved || coldSus)
        contention(name) = Contention(rejected, lastBusy, unresolved, coldSus, coldBusy)
      name -> Stat(if (ok) cold else -1.0, p50, p95, 1 + accepted.length, !ok)
    }
    val envSuiteEnd = envSample()

    // ---- PHASE 2: skew / recall / flagship / ladder — shape evidence.
    // Sections run graded-and-cheap first; each is behind a remaining-
    // time gate and the artifact is re-written after every one.

    val headline = Seq("q1_pricing_summary", "q3_shipping_priority", "word_stats",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "embed_cosine_topk", "token_count",
      "decontaminate", "dedup_containment", "phrase_search", "embed_pq_codes")
      .filter(n => suite.exists(_._1 == n))
    val base = new java.io.File(sfDir).getParentFile
    val ladderDirs = Option(base).map(_.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf") && f.getPath != sfDir)
      .map(_.getPath).sorted :+ sfDir
    // r8 verdict #3: single-rep cold rungs under end-of-run memory
    // pressure produced non-monotone ladders (pack_shards ×10 24.4 s vs
    // ×100 12.1 s) that couldn't support scaling claims either way. Each
    // rung time is the LOWER MEDIAN of `n` reps (true median at n=3,
    // min at n=2 — a deliberate noise rejector, never an inflator) and
    // every rung carries its own env sample so a residual outlier is
    // attributable to machine state instead of reading as a plan change.
    val ladderReps = sys.env.getOrElse("SPARK_GRAFT_LADDER_REPS", "3").toInt.max(1)
    // ×100 stays at min-of-2, NOT 1 (r12 measured why): several dedup
    // queries .cache() their signature/shingle tables, so rep 1 pays
    // the build (~40 s for minhash at ×100) and rep 2 measures the
    // steady state the r11 rungs reported (3.6 s). A 1-rep rung
    // silently changes the ladder's semantics to cold-including-build;
    // and since rep 1 populates the cache, the second rep's marginal
    // cost is small — min-of-2 is nearly free relative to 1 rep.
    val ladderRepsX100 = sys.env.getOrElse("SPARK_GRAFT_LADDER_REPS_X100", "2").toInt.max(1)
    // Budget-aware median: the first rep always runs (a rung entry must
    // be a real measurement, never a placeholder); further reps only
    // while the budget allows. A budget-truncated rep count is recorded
    // in "skipped" (ADVICE r12): a 1-of-2 ×100 rung reports the
    // cache-build-inflated cold rep as the rung time, which without the
    // marker is indistinguishable from a plan regression.
    def runMedian(tag: String, name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String, n: Int): Double = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < n && (i == 0 || remaining() > 45)) { b += runOnce(name, fn, dir); i += 1 }
      if (i < n) skipped += s"rung_rep_cut:$tag:$name:${i}of$n"
      val ts = b.filter(_ >= 0).sorted.toIndexedSeq
      if (ts.isEmpty) -1.0 else ts((ts.length - 1) / 2)
    }
    case class Rung(dir: String, env: String, reps: Int, times: Seq[(String, Double)])
    var ladder = Vector.empty[Rung]
    // ×10 rotation index for this run (r14, VERDICT r13 #2); -1 until
    // the ladder section resolves it from the persisted counter.
    var x10Rot = -1
    var sentinel: Seq[(String, Double)] = Seq.empty
    var skew: Option[(Double, Double, Long)] = None
    var recall: Seq[(String, Double)] = Seq.empty
    var recallClustered: Seq[(String, Double)] = Seq.empty
    case class FlagRung(factor: Int, sec: Double, mb: Double)
    var flagship: Seq[FlagRung] = Seq.empty

    // ---- artifact emission (file after every section; stdout after the
    // suite and at the end — last printed line wins for a tail-parser,
    // and a kill at any point leaves the previous line intact) ----
    def jd(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
    def emit(phase: String, toStdout: Boolean): Unit = {
      val qs = stats.map { case (k, s) => "\"" + k + "\":" + jd(s.p50) }.mkString("{", ",", "}")
      val st = stats.map { case (k, s) =>
        "\"" + k + s"""\":{"cold":${jd(s.cold)},"p50":${jd(s.p50)},"p95":${jd(s.p95)},"n":${s.n}}"""
      }.mkString("{", ",", "}")
      val failed = stats.collect { case (k, s) if s.failed => "\"" + k + "\"" }.mkString("[", ",", "]")
      val lad = ladder.map { r =>
        "\"" + r.dir + s"""\":{"env":${r.env},"reps":${r.reps},"times":""" +
          r.times.map { case (n, v) => "\"" + n + "\":" + jd(v) }.mkString("{", ",", "}") + "}"
      }.mkString("{", ",", "}")
      val total = jd(stats.map(_._2.p50).filter(_ >= 0).sum)
      val skewJson = skew.map { case (w, r, n) =>
        s""","skew":{"rows":$n,"window_s":${jd(w)},"rewrite_s":${jd(r)}}"""
      }.getOrElse("")
      val recallJson = if (recall.isEmpty) "" else
        recall.map { case (n, v) => "\"" + n + "\":" + jd(v) }
          .mkString(""","recall":{""", ",", "}") +
          recallClustered.map { case (n, v) => "\"" + n + "\":" + jd(v) }
            .mkString(""","recall_clustered":{""", ",", "}")
      val flagshipJson = if (flagship.isEmpty) "" else
        flagship.map { r =>
          s""""x${r.factor}":{"s":${jd(r.sec)},"mb":${jd(r.mb)},"mb_s":${jd(r.mb / r.sec)}}"""
        }.mkString(""","flagship":{""", ",", "}")
      val skippedJson = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      // usually empty; non-empty means reps were rejected under
      // confirmed external load (rejected/ext_busy) or a spike outlasted
      // the bounded retries (unresolved:true) — either way the spike is
      // attributable in the artifact instead of reading as a regression
      val contentionJson = if (contention.isEmpty) "" else
        contention.map { case (k, c) =>
          val coldF = if (c.coldSuspect)
            s""","cold_suspect":true,"cold_ext_busy":${jd(c.coldExtBusy)}""" else ""
          "\"" + k + s"""\":{"rejected":${c.rejected},"ext_busy":${jd(c.extBusy)},"unresolved":${c.unresolved}$coldF}"""
        }.mkString(""","contention":{""", ",", "}")
      val sentinelJson = if (sentinel.isEmpty) "" else
        sentinel.map { case (n, v) => "\"" + n + "\":" + jd(v) }
          .mkString(""","ladder_x100_sentinel":{""", ",", "}")
      val budgetJson =
        s""","budget_s":${jd(budgetS)},"elapsed_s":${jd(elapsed())},"phase":"$phase","x10_rot":$x10Rot,"skipped":$skippedJson"""
      val envJson =
        s""","env":{"drain_wait_s":${jd(drainWaitSec)},"suite_start":$envSuiteStart,"suite_end":$envSuiteEnd,"end":${envSample()}}"""
      // The harness that runs this captures only a short stdout TAIL, so
      // the per-query document (~8 KB at 102 queries, more now) must not
      // ride on stdout: rounds 3-5 lost their bench detail to truncation
      // ("parsed": null). Split the output: the FULL document goes to a
      // file, and the printed line is a compact summary (total, failures,
      // the 10 slowest p50s, the ladder's top rung) guaranteed to fit in
      // a 2,000-char tail.
      val fullDoc = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stats":$st,"failed":$failed,"reps":$reps$budgetJson$contentionJson$sentinelJson,"ladder":$lad$skewJson$recallJson$flagshipJson$envJson,"sf":"$sfDir"}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outFile).toAbsolutePath.getParent)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullDoc + "\n")
      if (toStdout) {
        // r14 (VERDICT r13 #1): the line is BOUNDED by construction in
        // BenchSummary — r13's 1,928-char line (10 slowest + full
        // ladder_top + the 15-label skipped list) overflowed the
        // driver's capture window and the official artifact came back
        // parsed:null. Caps: slowest 5, ladder times 8, skips as
        // per-section counts; optional fragments append greedily under
        // the 1,880-char budget. Full detail is in the file artifact.
        println(BenchSummary.render(
          total = total, nQueries = stats.size, reps = reps, sfDir = sfDir,
          failed = stats.collect { case (k, s) if s.failed => k },
          budgetS = budgetS, elapsedS = elapsed(), phase = phase,
          skipped = skipped.toList,
          slowest = stats.filter(_._2.p50 >= 0).sortBy(-_._2.p50)
            .map { case (k, s) => (k, s.p50) },
          ladderTop = ladder.lastOption.map(r => (r.dir, r.times)),
          optionalFragments = Seq(s""","x10_rot":$x10Rot""", contentionJson,
            sentinelJson, skewJson, recallJson, flagshipJson, envJson),
          fullReport = outFile))
      }
    }
    // The graded number exists from this point on, whatever happens later.
    emit("suite", toStdout = true)

    def gate(label: String, needSec: Double)(body: => Unit): Unit =
      if (remaining() < needSec) skipped += label else body

    def rungTimes(tag: String, names: Seq[String], dir: String, n: Int): Seq[(String, Double)] =
      names.flatMap { nm =>
        if (remaining() < 60) { skipped += s"$tag:$nm"; None }
        else Some(nm -> runMedian(tag, nm, SparkEntry.queries(nm), dir, n))
      }
    // Untimed cache warm before a rung's first timed rep: at ×100 a
    // single-rep rung otherwise charges ~40 s of page-cache/parquet-
    // footer warmup to whichever query runs first (r12 measured
    // dedup_minhash_lsh at 43.3 s as a cold single rep vs 2.8 s as
    // r11's min-of-2 — the operator didn't change, the first rep was
    // paying the 5 GB scan warmup). The warm must MATERIALIZE every
    // column through the noop sink: a count() only touches footers and
    // row-group metadata (column pages stay cold — measured: the 44 s
    // first-query charge survived a count()-based warm), so the data
    // bytes themselves have to flow once outside the timers.
    def warmDir(dir: String): Unit =
      Option(new java.io.File(dir).listFiles).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.endsWith(".parquet"))
        .foreach(f => spark.read.parquet(f.getPath)
          .write.format("noop").mode("overwrite").save())

    // ---- ×10 / ×100 rungs past sf0.1 (skipped under SPARK_GRAFT_ONLY) ----
    // The test tree stops at sf0.1, so the dedup/similarity sublinearity
    // claim rested on a single 10× range. Extend it two decades by
    // replicating documents/embeddings — but each replica must be
    // DISJOINT from the others: naive copies would make every doc an
    // N-way near-dup and quadratically inflate the pair workload,
    // measuring the data construction instead of the operator.
    //   documents — replica r > 0 suffixes every whitespace token with a
    //   letters-only base-26 code of r: within-replica shingle-equality
    //   structure and WHITESPACE token counts are preserved EXACTLY.
    //   BPE-ish counts are preserved only for letter-ending tokens (a
    //   token ending in a digit/symbol gains one extra [a-z] run), so
    //   the token_count rung scales near- not perfectly-linearly.
    //   Cross-replica token spaces are disjoint up to the rare base
    //   token that itself ends in a replica code ("…qab") — harmless at
    //   shingle granularity, where one shared token never makes a pair
    //   of documents near-duplicates. (An alphabet ROTATION instead
    //   would cap out at 26 distinct images; the suffix scheme works
    //   for any replica count.)
    //   embeddings — replica r > 0 applies an ORTHOGONAL transform:
    //   rotate components by r mod dim, then flip odd-index signs for
    //   r >= dim. Orthogonality preserves every within-replica dot
    //   product/norm (near-dup structure identical to the base corpus);
    //   cross-replica cosines drop to random-pair level — replicas are
    //   genuinely dissimilar, so bucket/candidate-based queries measure
    //   a real N× corpus, not synthetic near-dup structure.
    def replicate(factor: Int, outDir: String, graphTables: Boolean,
        docsOnly: Boolean = false): Unit = {
      val rep = explode(sequence(lit(0), lit(factor - 1)))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val prt  = spark.read.parquet(s"$sfDir/part.parquet")
      // id-offset safety: replica ids live at r*1e7 — a base id past 1e7
      // would collide with replica 1 and corrupt the dedup ground truth
      val maxDoc = docs.agg(max("doc_id")).head.getLong(0)
      val maxVec = embs.agg(max("vec_id")).head.getLong(0)
      val maxPrt = prt.agg(max("p_partkey")).head.getLong(0)
      require(maxDoc < 10000000L && maxVec < 10000000L && maxPrt < 10000000L,
        s"replica id offset collision: max doc_id=$maxDoc vec_id=$maxVec p_partkey=$maxPrt >= 1e7")
      // graph tables (the q_pagerank input): key-offset replicas give a
      // purchase graph with factor× nodes and factor× edges as DISJOINT
      // components — rank mass never flows between replicas, so the rung
      // measures sweep cost at factor× node count, which is exactly the
      // claim (≈node-count growth) the ladder exists to evidence. Only
      // built for the ×10 rung: no ×100 query reads them, and a ×100
      // lineitem replica would dominate rung construction for nothing.
      if (graphTables) {
        def offset(table: String, keys: Seq[String]): Unit = {
          val df = spark.read.parquet(s"$sfDir/$table.parquet")
          keys.foreach { k =>
            val mx = df.agg(max(k)).head.getLong(0)
            require(mx < 10000000L, s"replica id offset collision: max $table.$k=$mx >= 1e7")
          }
          keys.foldLeft(df.withColumn("replica", rep)) { (d, k) =>
            d.withColumn(k, col(k) + col("replica") * lit(10000000L))
          }.drop("replica").write.mode("overwrite").parquet(s"$outDir/$table.parquet")
        }
        offset("customer", Seq("c_custkey"))
        offset("supplier", Seq("s_suppkey"))
        offset("orders",   Seq("o_orderkey", "o_custkey"))
        offset("lineitem", Seq("l_orderkey", "l_suppkey"))
      }
      // letters-only base-26 replica code ("qab" for r=1): a pure [a-z]
      // run keeps ws token counts identical to the base corpus (BPE
      // counts identical for letter-ending tokens — see above). Two
      // letters address 676 replicas; factors beyond that (the ×1000
      // rung) take a third letter — same scheme, one digit wider, and
      // the ≤676 dirs keep their committed-artifact contents bit-stable.
      val code =
        if (factor <= 676) concat(lit("q"),
          chr(pmod(floor(col("replica") / 26), lit(26)) + lit(97)),
          chr(pmod(col("replica"), lit(26)) + lit(97)))
        else concat(lit("q"),
          chr(pmod(floor(col("replica") / 676), lit(26)) + lit(97)),
          chr(pmod(floor(col("replica") / 26), lit(26)) + lit(97)),
          chr(pmod(col("replica"), lit(26)) + lit(97)))
      docs
        .withColumn("replica", rep)
        .withColumn("text", when(col("replica") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1"), code))))
        .withColumn("doc_id", col("doc_id") + col("replica") * lit(10000000L))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      // docsOnly (the ×1000 rung): only text-banded queries ride the
      // rung, and a 1000× embeddings tree is GBs of floats the rung
      // never reads (the orthogonal-transform family also exhausts at
      // 2·dim distinct images — past 128 replicas the embedding corpus
      // would carry synthetic cross-replica duplicates)
      if (!docsOnly) {
        val dim = 64
        val rot = transform(sequence(lit(0), lit(dim - 1)),
          i => element_at(col("embedding"), (pmod(i + col("replica"), lit(dim)) + 1).cast("int")))
        val flipped = transform(rot, (x, i) =>
          when(col("replica") >= dim && pmod(i, lit(2)) === 1, -x).otherwise(x).cast("float"))
        embs
          .withColumn("replica", rep)
          .withColumn("embedding",
            when(col("replica") === 0, col("embedding")).otherwise(flipped))
          .withColumn("vec_id", col("vec_id") + col("replica") * lit(10000000L))
          .select("vec_id", "embedding", "label")
          .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
        // part (the dedup_fuzzy input): replica names get FOUR copies of a
        // replica-distinct letter, so any two replicas of a name sit at
        // edit distance >= 4 — beyond fuzzyNamePairs' maxDist=3, keeping
        // replicas disjoint for the edit-distance ladder (26-replica cap;
        // fuzzy is only laddered at ×10)
        val nameCode = repeat(chr(pmod(col("replica"), lit(26)) + lit(97)), 4)
        prt
          .withColumn("replica", rep)
          .withColumn("p_partkey", col("p_partkey") + col("replica") * lit(10000000L))
          .withColumn("p_name", when(col("replica") === 0, col("p_name"))
            .otherwise(concat(col("p_name"), nameCode)))
          .drop("replica")
          .write.mode("overwrite").parquet(s"$outDir/part.parquet")
      }
    }

    // ---- ×100 sentinel (r13, VERDICT r12 #2): the default budget cut
    // the whole ×100 ladder from the official r12 artifact, leaving the
    // driver-graded run without a scale datapoint. This fixed three-query
    // rung runs FIRST among the shape sections — dedup_containment_capped
    // and dedup_minhash_lsh (the banded sublinearity the 100 TB claim
    // rides on) plus bpe_train_local (the production trainer) — against
    // the same ×100 replica tree the full ladder uses: reused if already
    // built, built here when the budget allows (a build paid here is
    // construction the later ladder_x100 section no longer pays).
    val sentinelQueries = Seq("dedup_containment_capped", "dedup_minhash_lsh",
      "bpe_train_local")
    if (sectionOn("ladder_x100_sentinel")) {
      val dir = s"target/bench_sfx100_${new java.io.File(sfDir).getName}_v6"
      val built = new java.io.File(s"$dir/_built")
      // measured at HEAD on this machine: fresh build + warm + the
      // three-query min-of-2 rung = 222 s total; the 300 s build
      // allowance is ~2.5× the observed build so a moderately loaded
      // machine still fits, and an overrun only squeezes later
      // sections (the artifact is already emitted)
      val runNeed = 240.0
      if (!built.exists && remaining() >= runNeed + 300.0) {
        replicate(100, dir, graphTables = false)
        java.nio.file.Files.createFile(built.toPath): Unit
      }
      if (!built.exists) skipped += "ladder_x100_sentinel_build"
      else if (remaining() < runNeed) skipped += "ladder_x100_sentinel"
      else {
        // warm only the table the sentinel reads — a full warmDir would
        // charge the budget for embeddings/part the sentinel never touches
        spark.read.parquet(s"$dir/documents.parquet")
          .write.format("noop").mode("overwrite").save()
        sentinel = rungTimes("ladder_x100_sentinel", sentinelQueries, dir, ladderRepsX100)
        emit("ladder_x100_sentinel", toStdout = false)
      }
    }

    // ---- skew demonstration: hot-key shard, window form vs rewrite ----
    // sum-over-key attached per row is the skew class AQE can't touch
    // (no partial agg for windows, no splitting a sort partition): the
    // window form serializes the hot key on one task, the salted
    // window-to-join rewrite (q_skew_share_rewrite) stays parallel.
    // Same rows out of both — the gap is pure plan.
    if (sectionOn("skew_pair")) gate("skew_pair", 120) {
      // hot key replicated 300×: ~6M-row shard, ~99% one key — small
      // enough to generate once, big enough that the window form's
      // single hot task dominates its wall-clock
      val hotCopies = 300
      val skewPath =
        s"target/bench_skew_${new java.io.File(sfDir).getName}_x$hotCopies/events_skewed.parquet"
      // reuse is keyed on a sentinel written AFTER the parquet write (the
      // ladder-rung pattern): a crash mid-write must not leave a partial
      // shard that later runs silently reuse
      val skewBuilt = new java.io.File(s"$skewPath/../_built").getCanonicalFile
      if (!skewBuilt.exists) {
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
          .select("event_id", "event_type", "value")
        val hot = ev.groupBy("event_type").count()
          .orderBy(col("count").desc, col("event_type")).head.getString(0)
        ev.withColumn("rep", explode(sequence(lit(1),
            when(col("event_type") === hot, hotCopies).otherwise(1))))
          .withColumn("event_id", col("event_id") * lit(1000L) + col("rep"))
          .drop("rep")
          // spread across real file splits: a 1-task write would leave
          // BOTH timed plans serialized at the scan, hiding the skew
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(skewPath)
        java.nio.file.Files.createFile(skewBuilt.toPath): Unit
      }
      val skewed = spark.read.parquet(skewPath)
      def time1(df: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      import graft.operators.Skew
      // unordered forms: the oracle's determinism sort is shared by both
      // plans and would dilute the delta being demonstrated; min of 2
      // reps per form rejects cold-cache noise
      val win = (1 to 2).map(_ => time1(Skew.shareWindowForm(skewed, ordered = false))).min
      val rw  = (1 to 2).map(_ => time1(Skew.shareOfKeyTotal(skewed, ordered = false))).min
      skew = Some((win, rw, skewed.count()))
      emit("skew", toStdout = false)
    }

    // ---- ANN recall vs the exact brute-force top-k, on TWO corpora ----
    // The testdata embeddings are near-random (same-label cosine ≈
    // cross-label ≈ 0), so recall there mostly measures probed fraction
    // — a trend line, not a gate. The CLUSTERED corpus (planted
    // Gaussian-ish clusters, graft.sources.Synthetic, deterministic)
    // makes the numbers mean retrieval quality: floors are spec-pinned
    // in ClusteredRecallSpec (multiprobe ≥0.9, ivf_kmeans ≥0.8, lsh
    // ≥0.5, ivf_pq ≥0.3) and this emission is what caught the r8
    // raw-vector-PQ collapse (recall 0.08 → residual fix → 0.40).
    def recallFor(dir: String): Seq[(String, Double)] = {
      val exact = SparkEntry.queries("embed_cosine_topk")(spark, dir)
        .select("query_id", "vec_id").persist()
      val nExact = exact.count().toDouble
      // embed_ivf_kmeans resolves to the LIBRARY search fn, not the
      // queries entry: since r13 that entry is the argmin verdict grid
      // (no (query_id, vec_id) columns); the recall trend here is part
      // of what the conversion left to the bench + ClusteredRecallSpec.
      val fns: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
        Seq("embed_ann_lsh", "embed_ann_multiprobe",
          "embed_ivf_pq", "embed_pca_topk").map(nm => nm -> SparkEntry.queries(nm)) :+
          ("embed_ivf_kmeans" -> ((s: SparkSession, d: String) =>
            graft.operators.Similarity.ivfKmeansTopK(graft.sources.Tables(s, d))))
      val r = fns.map { case (nm, fn) =>
        val hits = fn(spark, dir).select("query_id", "vec_id")
          .join(exact, Seq("query_id", "vec_id")).count()
        nm -> (if (nExact > 0) hits / nExact else -1.0)
      }
      exact.unpersist()
      r
    }
    if (sectionOn("ann_recall")) gate("ann_recall", 150) {
      recall = recallFor(sfDir)
      val dir = s"target/bench_clustered_${new java.io.File(sfDir).getName}_v1"
      val built = new java.io.File(s"$dir/_built")
      if (!built.exists) {
        val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
        graft.sources.Synthetic.writeClusteredCorpus(spark, dir, n)
        java.nio.file.Files.createFile(built.toPath): Unit
      }
      recallClustered = recallFor(dir)
      emit("ann_recall", toStdout = false)
    }

    // ---- flagship throughput ladder (the README's headline number) ----
    // The 30 MB/s flagship claim was a single corpus point (15 MB, one
    // measurement dominated by fixed overhead); give it the same ladder
    // discipline as the suite: ×10/×100 file-copied corpora (the
    // pipeline is a word-frequency aggregate, so replicated files just
    // multiply counts — honest scan/tokenize throughput, no synthetic
    // dedup structure to preserve), lower-median-of-N rungs, MB sizes
    // in the artifact so the rate is computable per rung.
    if (sectionOn("flagship_ladder")) gate("flagship_ladder", 180) {
      def txts(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(txts)
        else if (f.getName.endsWith(".txt")) Seq(f) else Seq.empty
      val srcFiles = txts(new java.io.File(graft.operators.ArabicCorpus.SampleDir))
      def corpusDir(factor: Int): String =
        if (factor == 1) graft.operators.ArabicCorpus.SampleDir
        else {
          val dir = new java.io.File(s"target/bench_flagship_x${factor}_v1")
          val built = new java.io.File(dir, "_built")
          if (!built.exists) {
            dir.mkdirs()
            // flat copy; the SOURCE INDEX in the name guarantees
            // uniqueness (a parent-dir prefix alone can collide at
            // deeper nesting and silently shrink the corpus while
            // mb still reports baseMb×factor)
            for ((f, i) <- srcFiles.zipWithIndex; r <- 0 until factor)
              java.nio.file.Files.copy(f.toPath,
                new java.io.File(dir, s"r${r}_f${i}_${f.getName}").toPath,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            java.nio.file.Files.createFile(built.toPath): Unit
          }
          dir.getPath
        }
      val baseMb = srcFiles.map(_.length).sum / 1e6
      // ×1000 (r14, VERDICT r13 #5): ~15 GB — the flagship throughput
      // story's third decade (it stopped at 1.5 GB / 261 MB/s). One rep:
      // at this size the corpus exceeds any plausible page-cache reuse
      // between reps, so a median of reps would measure cache state, not
      // the pipeline; the single-rep rate is the honest cold-scan
      // number (page-cache sensitivity documented in PERF_r14). The
      // 700 s gate covers the one-time 15 GB file-copy build plus the
      // run, so the rung rides only full-depth budgets and is cleanly
      // skipped (with the marker) under the default driver budget.
      flagship = Seq((1, 3), (10, 3), (100, 2), (1000, 1)).flatMap { case (factor, n) =>
        val needSec = if (factor >= 1000) 700.0 else 60.0
        if (remaining() < needSec) { skipped += s"flagship_x$factor"; None }
        else {
          val dir = corpusDir(factor)
          val ts = (1 to n).map { _ =>
            val t0 = System.nanoTime()
            graft.operators.ArabicCorpus.tokenCounts(spark, dir)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.sorted
          Some(FlagRung(factor, ts((ts.length - 1) / 2), baseMb * factor))
        }
      }
      emit("flagship", toStdout = false)
    }

    // ---- scale ladder over the test tree's sf dirs ----
    // The headline queries at every sf the test tree provides — this
    // records scaling SHAPE (the p50s above carry the precise per-query
    // signal). sf0.01 is ~10× less data than sf0.1: near-linear times
    // mean scan-bound plans, flat times mean fixed overhead dominates,
    // super-linear flags a pair-join blowup.
    gate("ladder_sf", 120) {
      ladder = ladder ++ ladderDirs.map { dir =>
        warmDir(dir)
        Rung(dir, envSample(), ladderReps,
          rungTimes(s"ladder_sf:${new java.io.File(dir).getName}", headline, dir, ladderReps))
      }
      emit("ladder_sf", toStdout = false)
    }

    // cache keyed by source sf dir — a local run at another sf must not
    // leave a stale rung for the driver's sf0.1 run; _v4: suffix-token +
    // orthogonal-embedding construction (was alphabet-rotation + additive
    // perturbation, whose embedding replicas were near-identical copies)
    //
    // ×10 order is CHEAP-FIRST so a deadline cut drops the expensive
    // tail, not the broad evidence. The list accumulates the per-round
    // additions documented in the git history (r7 verdict #5/#6, r8 #9,
    // r9, r10, r11 — curation/IR headliners, iterative ops, vocab-rank,
    // KN/Dunning bigram tables, RAKE/Rocchio/trunc-eval).
    // r12: dedup_containment_capped rides next to the uncapped form —
    // the ×100 pair is the stop-shingle lever's evidence.
    val synthQueries = Seq("dedup_minhash_lsh", "embed_cosine_topk", "embed_pq_codes",
      "bm25_search", "pack_shards", "vocab_build", "token_count",
      "dedup_ngram_jaccard", "dedup_containment", "dedup_containment_capped",
      "q_dunning_llr", "quality_kn_bigram", "corpus_curate")
    val x10Only = Seq("dedup_fuzzy", "dedup_clusters", "dedup_substring", "q_pagerank",
      "q_skipgrams", "bpe_train", "q_kcore", "embed_pca_topk",
      "q_rake", "q_rocchio", "embed_trunc_eval")
    // ×100 priority order: cheap-and-scale-critical first (the banded/
    // bucketed candidate paths whose sublinearity IS the 100 TB claim),
    // then the corpus-linear heavies, established-stable rungs last —
    // a deadline cut drops what three rounds of artifacts already pin.
    val x100Queries = Seq("dedup_minhash_lsh", "embed_cosine_topk", "embed_pq_codes",
      "bm25_search", "pack_shards", "vocab_build", "bpe_train",
      "dedup_ngram_jaccard", "dedup_containment_capped", "q_dunning_llr",
      "dedup_clusters", "token_count", "dedup_containment",
      "quality_kn_bigram", "corpus_curate")
    def rung(tag: String, factor: Int, names: Seq[String], nReps: Int,
        buildNeedSec: Double): Unit = {
      // _v6: ×10 replicas include the graph tables (q_pagerank input)
      val dir = s"target/bench_sfx${factor}_${new java.io.File(sfDir).getName}_v6"
      if (sectionOn(tag)) {
        val built = new java.io.File(s"$dir/_built")
        if (!built.exists) {
          // replica construction is itself minutes at ×100 — gate it
          // separately so a tight budget skips the whole rung up front
          // instead of timing out inside the build
          if (remaining() < buildNeedSec) { skipped += s"${tag}_build"; return }
          replicate(factor, dir, graphTables = factor <= 10, docsOnly = factor > 100)
          java.nio.file.Files.createFile(built.toPath): Unit
        }
        gate(tag, 90) {
          warmDir(dir)
          ladder = ladder :+ Rung(dir, envSample(), nReps, rungTimes(tag, names, dir, nReps))
          emit(tag, toStdout = false)
        }
      }
    }
    // r14 (VERDICT r13 #2): the official-artifact ×10 coverage was
    // thinning round over round (r12 skipped 8 items, r13 skipped 13 of
    // 24 — the suite grew inside the same 1500 s budget and the ladder's
    // fixed cheap-first order meant the SAME expensive tail fell off
    // every run). Deterministic per-run ROTATION: a counter persisted in
    // target/ (not a clock — runs must be reproducible given the
    // counter) splits the list into its even- and odd-indexed halves and
    // alternates which half runs first. Each half preserves the
    // cheap-first relative order, a run that covers one half (~12
    // queries — r13 covered 11 under the same budget BEFORE the suite
    // warm-rep trim above) covers its entire first half, and any two
    // consecutive driver-shaped runs together cover every carrier.
    // Cut queries are still recorded in "skipped"; the rotation index
    // rides the artifact (x10_rot) so any artifact's coverage is
    // reconstructible.
    val x10All = synthQueries ++ x10Only
    // counter only advances when the ×10 section actually runs, so a
    // local SPARK_GRAFT_ONLY iteration can't skew the parity the
    // driver's consecutive runs rely on
    val x10Ordered = if (!sectionOn("ladder_x10")) x10All else {
      val rotFile = java.nio.file.Paths.get(
        s"target/bench_x10_rotation_${new java.io.File(sfDir).getName}")
      val rotIdx =
        try new String(java.nio.file.Files.readAllBytes(rotFile)).trim.toInt
        catch { case _: Throwable => 0 }
      try {
        java.nio.file.Files.createDirectories(rotFile.toAbsolutePath.getParent)
        java.nio.file.Files.writeString(rotFile, (rotIdx + 1).toString): Unit
      } catch { case _: Throwable => () }
      x10Rot = rotIdx
      val (x10Even, x10Odd) = x10All.zipWithIndex.partition(_._2 % 2 == 0)
      if (rotIdx % 2 == 0) x10Even.map(_._1) ++ x10Odd.map(_._1)
      else x10Odd.map(_._1) ++ x10Even.map(_._1)
    }
    rung("ladder_x10", 10, x10Ordered, ladderReps, buildNeedSec = 360)
    // ×100 (~50 GB-scale shape at 100× sf0.1 rows): the second decade —
    // linear ×10→×100 growth is the evidence the 100 TB claim rides on.
    // min-of-2 (see ladderRepsX100 above: rep 1 pays the .cache()
    // builds, rep 2 is the steady-state number the ladder reports).
    rung("ladder_x100", 100, x100Queries, ladderRepsX100, buildNeedSec = 900)
    // ×1000 (r13): a THIRD decade for exactly the two banded-candidate
    // carriers of the 100 TB claim — 5M documents, docs-only replica
    // tree (no query here reads embeddings/part; see docsOnly above).
    // Everything corpus-linear is already pinned at ×100; what a new
    // decade can still falsify is the banded pair path silently going
    // quadratic, so only that class pays for the rung. Sized to fit the
    // tail of a 3600 s full-depth run and to be cleanly skipped (with
    // the marker) under the default driver budget. bpe_train_local is
    // deliberately absent: its vocabulary at ×1000 (~12M entries)
    // exceeds the maxVocab=5M driver guard — the guard working as
    // designed, documented here instead of tripped in a bench.
    rung("ladder_x1000", 1000, Seq("dedup_minhash_lsh", "dedup_containment_capped"),
      ladderRepsX100, buildNeedSec = 1200)

    emit("final", toStdout = true)
    spark.stop()
  }
}
