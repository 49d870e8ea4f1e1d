package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** User-behavior sequence analytics over the events stream: activity
  * streaks (gaps-and-islands), inter-arrival burstiness, and frequent
  * within-session event sequences. These are the engagement /
  * bot-detection readouts a product-analytics pipeline runs next to
  * `q_dau_wau`/`q_retention`; all three collapse the corpus through
  * user-partitioned windows (never unpartitioned) and integer-exact
  * arithmetic. Reference has no events surface; §2.6 extension work.
  */
object Behavior {

  private def dec(c: Column): Column = c.cast("decimal(18,0)")

  // ---------------------------------------------------------- streaks

  /** Longest consecutive-day activity streak per user via
    * gaps-and-islands: distinct active days, island id =
    * epoch_day − row_number() (constant within a run of consecutive
    * days), one count per island, then a per-user rollup plus the
    * earliest start among maximal streaks. Every window is
    * USER-partitioned over the user's distinct days (≤ span days per
    * user — bounded however large the corpus); all outputs integers
    * and dates, no float lane at all.
    */
  def streaksOf(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct()
      .withColumn("epoch_day", datediff(col("day"), to_date(lit("1970-01-01"))))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = days
      .withColumn("grp", col("epoch_day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    val wu = Window.partitionBy(col("user_id"))
    islands
      .withColumn("max_streak", max(col("len")).over(wu))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"),
        min(when(col("len") === col("max_streak"), col("start_day")))
          .as("max_streak_start"))
      .orderBy("user_id")
  }

  def streaks(t: Tables): DataFrame = streaksOf(t.events)

  val streaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events
      |), islands AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp,
      |    day
      |  FROM days
      |), runs AS (
      |  SELECT user_id, grp, count(*) AS len, min(day) AS start_day
      |  FROM islands GROUP BY user_id, grp
      |), mx AS (
      |  SELECT user_id, grp, len, start_day,
      |    max(len) OVER (PARTITION BY user_id) AS max_streak
      |  FROM runs
      |)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days, count(*) AS n_streaks,
      |  max(len) AS max_streak,
      |  min(CASE WHEN len = max_streak THEN start_day END) AS max_streak_start
      |FROM mx GROUP BY user_id ORDER BY user_id""".stripMargin

  // ----------------------------------------------------- inter-arrival

  /** Inter-arrival statistics per user — the burstiness screen that
    * separates organic sessions (bursty: B → 1) from schedulers and
    * bots (regular: B → −1): consecutive-event gaps in whole seconds
    * via one user-partitioned lag, then ONE map-side-combined
    * aggregate of exact integer gap moments per user. Mean/σ divide
    * exact integers (σ² = (nΣg²−(Σg)²)/(n(n−1)) — the `q_ols_multi`
    * lane), cv = σ/μ, Goh–Barabási burstiness B = (σ−μ)/(σ+μ); all
    * ship UNROUNDED since both engines run the identical
    * int→double→sqrt→divide chain. Degenerate users (one gap, or all
    * events simultaneous) read NULL, not /0.
    */
  def interArrivalOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
    val m = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(dec(col("gap"))).as("sg"),
        sum(dec(col("gap")) * dec(col("gap"))).as("sgg"))
    val mu = col("sg").cast("double") / col("n_gaps").cast("double")
    val varNum = (col("n_gaps").cast("decimal(20,0)") * col("sgg")
      - col("sg") * col("sg")).cast("double")
    val sigma = sqrt(varNum
      / (col("n_gaps").cast("double") * (col("n_gaps") - 1).cast("double")))
    m.select(col("user_id"), col("n_gaps"),
        mu.as("mean_gap_s"),
        when(col("n_gaps") > 1, sigma).as("sd_gap_s"),
        when(col("n_gaps") > 1 && col("sg") > 0, sigma / mu).as("cv"),
        when(col("n_gaps") > 1 && (col("sg") > 0 || varNum > 0),
          (sigma - mu) / (sigma + mu)).as("burstiness"))
      .orderBy("user_id")
  }

  def interArrival(t: Tables): DataFrame = interArrivalOf(t.events)

  val interArrivalSql: String =
    """WITH secs AS (
      |  -- Spark's unix_timestamp FLOORS to whole seconds; DuckDB's epoch()
      |  -- keeps the microsecond fraction — floor each event's epoch first
      |  SELECT user_id, event_id, ts,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events
      |), gaps AS (
      |  SELECT user_id,
      |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      |  FROM secs
      |), g AS (SELECT user_id, gap FROM gaps WHERE gap IS NOT NULL
      |), m AS (
      |  SELECT user_id, count(*) AS n_gaps,
      |    sum(CAST(gap AS HUGEINT)) AS sg,
      |    sum(CAST(gap AS HUGEINT) * gap) AS sgg
      |  FROM g GROUP BY user_id
      |), s AS (
      |  SELECT user_id, n_gaps, sg,
      |    CAST(n_gaps AS HUGEINT) * sgg - sg * sg AS var_num,
      |    CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu,
      |    sqrt(CAST(CAST(n_gaps AS HUGEINT) * sgg - sg * sg AS DOUBLE)
      |      / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps - 1 AS DOUBLE))) AS sigma
      |  FROM m
      |)
      |SELECT user_id, n_gaps, mu AS mean_gap_s,
      |  CASE WHEN n_gaps > 1 THEN sigma END AS sd_gap_s,
      |  CASE WHEN n_gaps > 1 AND sg > 0 THEN sigma / mu END AS cv,
      |  CASE WHEN n_gaps > 1 AND (sg > 0 OR var_num > 0)
      |    THEN (sigma - mu) / (sigma + mu) END AS burstiness
      |FROM s ORDER BY user_id""".stripMargin

  // -------------------------------------------------- sequence patterns

  /** Frequent within-session event-type trigrams — the path-mining
    * readout behind "what do users DO right before purchasing":
    * sessions via the `q_events_sessionize` 30-minute-gap rule, then
    * consecutive (eₜ, eₜ₊₁, eₜ₊₂) triples from two leads inside the
    * (user, session) partition (leads never cross a session boundary
    * by construction), one count per pattern, deterministic top-k.
    * Counting is the only shuffle wider than the user partition and
    * it carries ≤|types|³ keys.
    */
  def seqPatternsOf(events: DataFrame, gapMinutes: Int = 30, k: Int = 25): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSecs = gapMinutes * 60L
    val sessions = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSecs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySession = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    sessions
      .withColumn("e2", lead(col("event_type"), 1).over(bySession))
      .withColumn("e3", lead(col("event_type"), 2).over(bySession))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("seq"))
      .groupBy("seq").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("seq"))
      .limit(k)
  }

  def seqPatterns(t: Tables): DataFrame = seqPatternsOf(t.events)

  def seqPatternsSql(gapMinutes: Int = 30, k: Int = 25): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > ${gapMinutes * 60}
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sessions AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged
       |), triples AS (
       |  SELECT event_type || '>' || lead(event_type, 1) OVER ws
       |      || '>' || lead(event_type, 2) OVER ws AS seq,
       |    lead(event_type, 2) OVER ws AS e3
       |  FROM sessions
       |  WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
       |)
       |SELECT seq, count(*) AS n FROM triples WHERE e3 IS NOT NULL
       |GROUP BY seq ORDER BY n DESC, seq LIMIT $k""".stripMargin

  // ------------------------------------------------ peak concurrency

  /** Peak concurrent sessions per day — the capacity-planning readout
    * ("how many sessions were open at once at the worst moment"):
    * sessions from the `q_events_sessionize` 30-minute-gap rule
    * collapse to (start_ts, end_ts) intervals; each day's peak is
    * carry-in (sessions already open at midnight) plus the maximum
    * prefix sum of that day's ±1 boundary sweep. Carry-in comes from
    * the DAY-GRID identity carry(d) = Σ_{d'<d} starts(d') − ends(d')
    * — a triangular join over the ≤|days| grid, NEVER a
    * session×day range join — and the sweep window is DAY-partitioned
    * (ends sort after starts at the same instant, so a session ending
    * exactly when another starts counts both — the closed-interval
    * convention). Every number is an exact integer. A 30-min-gap
    * session cannot span a silent day, so event days ARE the day
    * grid.
    */
  def peakConcurrencyOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSecs = gapMinutes * 60L
    val sessions = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSecs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
    val bounds = sessions
      .select(col("start_ts").as("ts"), lit(0).as("kind"), lit(1L).as("delta"))
      .unionAll(sessions
        .select(col("end_ts").as("ts"), lit(1).as("kind"), lit(-1L).as("delta")))
      .withColumn("day", to_date(date_trunc("day", col("ts"))))
    val perDay = bounds.groupBy(col("day"))
      .agg(sum(when(col("kind") === 0, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("kind") === 1, 1L).otherwise(0L)).as("n_ends"))
    val carry = perDay.as("a")
      .join(perDay.select(col("day").as("d2"), (col("n_starts") - col("n_ends")).as("net"))
        .as("b"), col("d2") < col("a.day"), "left")
      .groupBy(col("a.day").as("day"), col("a.n_starts").as("n_starts"))
      .agg(coalesce(sum(col("net")), lit(0L)).as("carry_in"))
    val wDay = Window.partitionBy(col("day"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = bounds
      .withColumn("running", sum(col("delta")).over(wDay))
      .groupBy(col("day"))
      .agg(max(col("running")).as("max_delta"))
    carry.join(peaks, "day")
      // greatest(0, max_delta): on a day whose only boundaries are ends
      // (sessions spanning midnight, none starting) every prefix sum is
      // negative and carry_in + max_delta would undercount the true
      // start-of-day concurrency — the midnight level itself must be a
      // peak candidate (ADVICE r11; shared defect, fixed in BOTH engines)
      .select(col("day"), col("n_starts"), col("carry_in"),
        (col("carry_in") + greatest(lit(0L), col("max_delta"))).as("peak"))
      .orderBy("day")
  }

  def peakConcurrency(t: Tables): DataFrame = peakConcurrencyOf(t.events)

  def peakConcurrencySql(gapMinutes: Int = 30): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > ${gapMinutes * 60}
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged
       |), sessions AS (
       |  SELECT user_id, session_id, min(ts) AS start_ts, max(ts) AS end_ts
       |  FROM numbered GROUP BY user_id, session_id
       |), bounds AS (
       |  SELECT start_ts AS ts, 0 AS kind, 1 AS delta,
       |    CAST(date_trunc('day', start_ts) AS DATE) AS day FROM sessions
       |  UNION ALL
       |  SELECT end_ts AS ts, 1 AS kind, -1 AS delta,
       |    CAST(date_trunc('day', end_ts) AS DATE) AS day FROM sessions
       |), per_day AS (
       |  SELECT day,
       |    CAST(sum(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
       |    CAST(sum(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
       |  FROM bounds GROUP BY day
       |), carry AS (
       |  SELECT a.day, a.n_starts,
       |    CAST(coalesce(sum(b.n_starts - b.n_ends), 0) AS BIGINT) AS carry_in
       |  FROM per_day a LEFT JOIN per_day b ON b.day < a.day
       |  GROUP BY a.day, a.n_starts
       |), peaks AS (
       |  SELECT day, max(running) AS max_delta FROM (
       |    SELECT day,
       |      CAST(sum(delta) OVER (PARTITION BY day ORDER BY ts, kind
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
       |    FROM bounds)
       |  GROUP BY day
       |)
       |SELECT day, n_starts, carry_in,
       |  carry_in + greatest(0, max_delta) AS peak
       |FROM carry JOIN peaks USING (day)
       |ORDER BY day""".stripMargin

  // ------------------------------------------------ cart abandonment

  /** Session abandonment rate per day — the conversion-health readout
    * next to `q_funnel`: of the day's ENGAGED sessions (those with a
    * view or click), how many ended without a purchase? One pass to
    * session ids (the shared 30-min rule), one per-session aggregate
    * of three bool_or flags, one day-grain rollup of exact counts —
    * the rate is a single division of LONGs. Sessions are dated by
    * their FIRST event (a session belongs to the day it started).
    */
  def abandonmentOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSecs = gapMinutes * 60L
    val sess = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSecs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(to_date(date_trunc("day", min(col("ts")))).as("day"),
        max((col("event_type") === "view" || col("event_type") === "click")
          .cast("int")).as("engaged"),
        max((col("event_type") === "purchase").cast("int")).as("purchased"))
    sess.groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("engaged").cast("long")).as("n_engaged"),
        sum(when(col("engaged") === 1 && col("purchased") === 0, 1L).otherwise(0L))
          .as("n_abandoned"))
      .select(col("day"), col("n_sessions"), col("n_engaged"), col("n_abandoned"),
        when(col("n_engaged") > 0,
          col("n_abandoned").cast("double") / col("n_engaged").cast("double"))
          .as("abandonment_rate"))
      .orderBy("day")
  }

  def abandonment(t: Tables): DataFrame = abandonmentOf(t.events)

  def abandonmentSql(gapMinutes: Int = 30): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > ${gapMinutes * 60}
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts, event_type,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged
       |), sess AS (
       |  SELECT user_id, session_id,
       |    CAST(date_trunc('day', min(ts)) AS DATE) AS day,
       |    max(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) AS engaged,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
       |  FROM numbered GROUP BY user_id, session_id
       |)
       |SELECT day, count(*) AS n_sessions,
       |  CAST(sum(engaged) AS BIGINT) AS n_engaged,
       |  CAST(sum(CASE WHEN engaged = 1 AND purchased = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_abandoned,
       |  CASE WHEN sum(engaged) > 0 THEN
       |    CAST(sum(CASE WHEN engaged = 1 AND purchased = 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |      / CAST(sum(engaged) AS DOUBLE) END AS abandonment_rate
       |FROM sess GROUP BY day ORDER BY day""".stripMargin
}
