package graft

/** Bounded stdout summary line for [[Bench]] (r14, VERDICT r13 #1).
  *
  * The driver that runs the bench captures only a short stdout tail
  * (~1,900 chars observed): the r13 surface growth pushed the summary
  * line to 1,928 chars and the official artifact came back
  * `parsed: null` with the headline fields head-truncated away —
  * Bench used to WARN past 1,900 but still printed the oversized line.
  * This object replaces the warning with construction-time bounds:
  *
  *   - the mandatory HEAD carries every field the driver grades
  *     (total, n_queries, reps, sf, failed, budget/elapsed/phase,
  *     per-section skip counts, full-report path) and is small by
  *     construction — `skipped` collapses to per-SECTION counts
  *     (the full label list stays in the file artifact), `failed`
  *     is capped at 10 names plus an exact `failed_n`;
  *   - everything else (slowest p50s capped at 5, ladder top rung
  *     capped at 8 times, contention/sentinel/skew/recall/flagship/
  *     env fragments) is appended GREEDILY in priority order only
  *     while the line stays under `maxLen` — a fragment that does
  *     not fit is dropped whole, so the line is valid JSON at every
  *     prefix of the append order.
  *
  * Pure (no Spark, no clock): BenchSummarySpec renders it at the live
  * `SparkEntry.queries` surface and asserts the driver contract
  * (parseable by Jackson, < 1,900 chars) holds — growing the query
  * surface can no longer silently break artifact delivery.
  */
object BenchSummary {
  /** The driver's observed capture window is ~1,900 chars; build to
    * 1,880 so the closing brace and a trailing newline always fit.
    */
  val MaxLen = 1880
  val SlowestCap = 5
  val LadderTimesCap = 8
  val FailedCap = 10

  private def jd(v: Double): String = if (v < 0) "-1" else f"$v%.3f"

  /** Per-section counts of the skipped list: the section is the label
    * prefix before the first ':' (bare labels count under themselves).
    * r13's 15-entry list (450 chars on the line) becomes e.g.
    * {"ladder_x10":13,"suite_one_warm_from":1,"ladder_x100":1,...}.
    */
  def skipCountsJson(skipped: Seq[String]): String =
    skipped.groupBy { s =>
      s.indexOf(':') match { case -1 => s; case i => s.substring(0, i) }
    }.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v.size }
      .mkString("{", ",", "}")

  /** Render the summary line. `slowest` is the FULL descending p50
    * list (capped here); `ladderTop` the last rung's full times
    * (capped here, with a "more" count when cut); `optionalFragments`
    * are pre-rendered `,"key":...` JSON fragments appended greedily
    * in the given order. Bounded to `maxLen` by construction.
    */
  def render(total: String, nQueries: Int, reps: Int, sfDir: String,
      failed: Seq[String], budgetS: Double, elapsedS: Double, phase: String,
      skipped: Seq[String],
      slowest: Seq[(String, Double)],
      ladderTop: Option[(String, Seq[(String, Double)])],
      optionalFragments: Seq[String],
      fullReport: String,
      maxLen: Int = MaxLen): String = {
    val failedJson = failed.take(FailedCap).map("\"" + _ + "\"").mkString("[", ",", "]")
    val head = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":$nQueries,""" +
      s""""reps":$reps,"sf":"$sfDir","failed":$failedJson,"failed_n":${failed.size},""" +
      s""""budget_s":${jd(budgetS)},"elapsed_s":${jd(elapsedS)},"phase":"$phase",""" +
      s""""skipped_n":${skipCountsJson(skipped)},"full_report":"$fullReport""""
    val slowFrag =
      s""","slowest_p50":${slowest.take(SlowestCap)
        .map { case (k, v) => "\"" + k + "\":" + jd(v) }.mkString("{", ",", "}")}"""
    val ladderFrag = ladderTop.filter(_._2.nonEmpty).map { case (dir, times) =>
      val shown = times.take(LadderTimesCap)
        .map { case (n, v) => "\"" + n + "\":" + jd(v) }.mkString("{", ",", "}")
      val more = if (times.size > LadderTimesCap)
        s""","more":${times.size - LadderTimesCap}""" else ""
      s""","ladder_top":{"dir":"$dir","times":$shown$more}"""
    }.getOrElse("")
    val sb = new StringBuilder(head)
    (slowFrag +: ladderFrag +: optionalFragments).filter(_.nonEmpty).foreach { p =>
      if (sb.length + p.length + 1 <= maxLen) sb.append(p): Unit
    }
    sb.append('}')
    sb.toString
  }
}
