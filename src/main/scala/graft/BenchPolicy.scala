package graft

/** The bench suite's pure rep-acceptance policy (r13, VERDICT r12 #1),
  * extracted from the timing loop so the decision table is unit-
  * testable without a Spark session or a loaded machine. The loop in
  * [[Bench]] supplies the measurements; this object answers one
  * question per warm rep: keep it, or reject-and-re-run it.
  *
  * Shape of the rule: a rep is SUSPECT when it reads above
  * max(SpikeRatio × running-min, running-min + SpikeFloorS) — the
  * ratio catches heavy queries, the absolute floor keeps sub-second
  * queries from thrashing on ±ms noise. A suspect rep is REJECTED
  * only when an external cpu-busy sample (taken while the bench JVM
  * idles) confirms outside load; a suspect rep with no confirmed
  * outside load is KEPT, because silently dropping slow reps with no
  * evidence would bias the suite fast — the exact failure mode in the
  * other direction from the one this policy fixes (r12's accepted 34×
  * q_dunning_llr spike).
  */
object BenchPolicy {
  /** rep > SpikeRatio × min → suspect (with the floor below). */
  val SpikeRatio = 3.0
  /** ...and rep must exceed min by at least this many seconds. */
  val SpikeFloorS = 1.0
  /** external busy fraction above this (while we idle) = outside load. */
  val ExtBusyThreshold = 0.15
  /** bounded retries per query — contention that outlasts these is
    * FLAGGED (unresolved), never silently retried away.
    */
  val MaxExtrasPerQuery = 2

  def suspect(runningMin: Double, repS: Double): Boolean =
    repS > math.max(SpikeRatio * runningMin, runningMin + SpikeFloorS)

  /** Cold-rep spike rule (r14, VERDICT r13 #6): the warm guard above
    * arbitrates warm reps only, so a spiked COLD rep landed
    * unattributed in the artifact's `stats.*.cold`. Cold legitimately
    * reads 2–3× warm (codegen + AQE warmup is exactly what the cold
    * number exists to carry), so the warm thresholds would flag
    * routine warmup on most sub-second queries; a cold rep is suspect
    * only past 5× the warm minimum AND warm-min + 2 s. It is NEVER
    * rejected — cold has no running min and no replacement semantics
    * (a re-run would be warm) — only FLAGGED into the contention map
    * with an external busy sample, so a spiked cold is attributable
    * instead of reading as a codegen regression. `warmMin < 0` (no
    * successful warm rep) → nothing to compare against → not suspect.
    */
  val ColdSpikeRatio = 5.0
  val ColdSpikeFloorS = 2.0
  def coldSuspect(warmMin: Double, coldS: Double): Boolean =
    warmMin >= 0 &&
      coldS > math.max(ColdSpikeRatio * warmMin, warmMin + ColdSpikeFloorS)

  /** true → discard this rep and run a replacement. */
  def reject(runningMin: Double, repS: Double, extBusy: Double,
      extrasUsed: Int, suiteExtrasLeft: Int, budgetOk: Boolean): Boolean =
    suspect(runningMin, repS) && extBusy > ExtBusyThreshold &&
      extrasUsed < MaxExtrasPerQuery && suiteExtrasLeft > 0 && budgetOk
}
