package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream analytics (batch form; graft.streaming mirrors these
  * incrementally). Sessionization is the lag+cumsum pattern — one
  * shuffle on user_id serves both windows and the final aggregation.
  */
object Events {

  /** Tumbling hourly aggregation by event type. */
  def hourly(t: Tables): DataFrame =
    t.events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  val hourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY hour, event_type""".stripMargin

  /** Gap-based sessionization (30-min inactivity closes a session):
    * session start flag via lag, session id via running sum — then one
    * aggregate per (user, session).
    */
  def sessionize(t: Tables, gapMinutes: Int = 30): DataFrame = {
    val byUser  = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSecs = gapMinutes * 60L
    t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSecs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, event_id,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(event_id) AS first_event, max(event_id) AS last_event
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Funnel analysis: users progressing signup → click → purchase in
    * time order. One groupBy(user) computes all stage timestamps;
    * the funnel counts are a single global aggregate after it.
    */
  def funnel(t: Tables): DataFrame = {
    val m = t.events.groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
      min(when(col("event_type") === "click", col("ts"))).as("t_click"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    m.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("t_signup").isNotNull, 1).otherwise(0)).as("n_signup"),
      sum(when(col("t_signup") < col("t_click"), 1).otherwise(0)).as("n_signup_click"),
      sum(when(col("t_signup") < col("t_click") && col("t_click") < col("t_purchase"), 1)
        .otherwise(0)).as("n_full_funnel"))
  }

  val funnelSql: String =
    """WITH m AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id
      |)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN t_signup < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
      |  CAST(sum(CASE WHEN t_signup < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM m""".stripMargin

  /** Weekly retention: of users active in week w, how many are active
    * in w+1. Distinct (user, week) grid → self-join shifted one week.
    */
  def retention(t: Tables): DataFrame = {
    val weeks = t.events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    weeks.as("a")
      .join(weeks.as("b"),
        col("b.user_id") === col("a.user_id") &&
          col("b.week") === col("a.week") + expr("INTERVAL 7 DAYS"), "left")
      .groupBy(col("a.week").as("week"))
      .agg(countDistinct(col("a.user_id")).as("active"),
        countDistinct(col("b.user_id")).as("retained"))
      .orderBy("week")
  }

  val retentionSql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
      |)
      |SELECT a.week AS week, count(DISTINCT a.user_id) AS active,
      |  count(DISTINCT b.user_id) AS retained
      |FROM weeks a LEFT JOIN weeks b
      |  ON b.user_id = a.user_id AND b.week = a.week + INTERVAL 7 DAY
      |GROUP BY a.week ORDER BY week""".stripMargin

  /** Cohort retention triangle — the full (signup week × weeks-since)
    * matrix behind every retention heatmap, generalizing [[retention]]
    * from one-step week→week+1 to all horizons. Cohort = each user's
    * first active week (one min aggregate); activity collapses to the
    * distinct (user, week) grid; the cohort join is equi on user_id;
    * cells and cohort sizes are ≤|weeks|²-row aggregates with the size
    * table broadcast back. Exact integer counts; the rate is the only
    * double, rounded well above ulp.
    */
  def cohortMatrix(t: Tables): DataFrame = cohortMatrixOf(t.events)

  def cohortMatrixOf(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val first = weeks.groupBy("user_id").agg(min(col("week")).as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    weeks.join(first, "user_id")
      .select(col("cohort"),
        expr("datediff(week, cohort) div 7").as("weeks_since"))
      .groupBy("cohort", "weeks_since").agg(count(lit(1)).as("active_users"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("weeks_since"), col("cohort_users"),
        col("active_users"),
        round(col("active_users").cast("double") / col("cohort_users"), 6).as("rate"))
      .orderBy("cohort", "weeks_since")
  }

  val cohortMatrixSql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
      |), first AS (
      |  SELECT user_id, min(week) AS cohort FROM weeks GROUP BY 1
      |), sizes AS (
      |  SELECT cohort, count(*) AS cohort_users FROM first GROUP BY 1
      |), cells AS (
      |  SELECT f.cohort, date_diff('day', f.cohort, w.week) // 7 AS weeks_since,
      |    count(*) AS active_users
      |  FROM weeks w JOIN first f USING (user_id)
      |  GROUP BY 1, 2
      |)
      |SELECT c.cohort, CAST(c.weeks_since AS BIGINT) AS weeks_since,
      |  s.cohort_users, c.active_users,
      |  round(CAST(c.active_users AS DOUBLE) / s.cohort_users, 6) AS rate
      |FROM cells c JOIN sizes s USING (cohort)
      |ORDER BY cohort, weeks_since""".stripMargin

  /** JSON property extraction from the props column. */
  def jsonExtract(t: Tables): DataFrame =
    t.events
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull)
      .orderBy(col("event_id"))

  val jsonExtractSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** Nested-struct column paths — the Spark-first mapping of the
    * reference's dict-path helpers `dict_deep_get` / `dict_deep_set` /
    * `dict_deep_remove` (v2/core/commons.py:29-44): the reference's
    * nested-dict data model is a struct column, a dict path is a field
    * path, and the three verbs are nested field access,
    * `Column.withField`, and `Column.dropFields`. The query parses
    * events.props into a two-level struct, applies one of each verb on
    * deep paths, and reads every output THROUGH the struct — Catalyst
    * (OptimizeUpdateFields + SimplifyExtractValueOps) collapses the
    * construct/update/extract chains, so at 100 TB the dict-path
    * abstraction is free: the physical plan is the same flat projection
    * a hand-written query would get, and the scan never reads the
    * columns whose struct fields were dropped ([[StructPathsSpec]]
    * pins both properties).
    */
  def structPaths(t: Tables): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    // the nested-dict row: {user: {id, segment}, event: {type, props: {k, value}}}
    val nested = struct(
      struct(col("user_id").as("id"), (col("user_id") % 5).as("segment")).as("user"),
      struct(col("event_type").as("type"),
        struct(k.as("k"), col("value").as("value")).as("props")).as("event"))
    val meta = nested
      // dict_deep_set(meta, [event, props, k2], 2k) — new leaf on a deep path
      .withField("event.props.k2", k * 2)
      // dict_deep_set on an EXISTING deep path overwrites in place
      .withField("user.segment", col("user_id") % 7)
      // dict_deep_remove(meta, [event, props, value]) and ([user, id])
      .dropFields("event.props.value", "user.id")
    // `meta` is composed as a Column, not materialized via withColumn:
    // each extract below carries its own copy of the update chain, so
    // SimplifyExtractValueOps reduces every one to its leaf expression
    // (a shared withColumn reference defeats CollapseProject — it will
    // not triple a non-cheap named_struct — and the whole struct would
    // be built per row just to be torn apart again)
    t.events
      .filter(k.isNotNull)
      .select(col("event_id"),
        meta.getField("event").getField("props").getField("k").as("k"), // dict_deep_get
        meta.getField("event").getField("props").getField("k2").as("k2"), // get of the set leaf
        meta.getField("user").getField("segment").as("segment"))
      .orderBy("event_id")
  }

  val structPathsSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k2,
      |  user_id % 7 AS segment
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** Dense time-series resample: hourly counts per event type with the
    * MISSING hours filled as explicit zero rows — the gap-fill step
    * every downstream rate/anomaly computation needs (a gap read from
    * a sparse aggregate is indistinguishable from "no data loaded").
    * The dense (type × hour) grid is generated, not stored: the hour
    * span comes from a 1-row min/max aggregate broadcast into
    * `sequence()`+`explode`, so grid size is span×|types| — independent
    * of row count. The plan references events three times (hourly agg,
    * bounds, type list) and Catalyst prunes each to ITS OWN column set
    * — three scans reading ts and/or event_type only, each feeding a
    * map-side-combined aggregate, which beats one shared wide scan: no
    * reference reads a byte it doesn't need, and nothing corpus-sized
    * ever shuffles (plan-asserted).
    */
  private[operators] def denseHourlyOf(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    // bounds and the type list derive from the hourly AGGREGATE
    // (min/max of truncated hours ≡ truncated min/max ts; a type
    // exists iff it has ≥1 hourly row) — Catalyst then collapses each
    // into its own pruned scan + aggregate, so no branch reads columns
    // it doesn't need and only group rows ever shuffle.
    val bounds = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val grid = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour"))
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  def gapfillOf(events: DataFrame): DataFrame =
    denseHourlyOf(events).orderBy("hour", "event_type")

  def gapfill(t: Tables): DataFrame = gapfillOf(t.events)

  // one dense-series CTE shared by the gapfill and anomaly oracles
  // (the tokensCte pattern): a fix to the grid applies to both gates
  private[operators] val denseCte =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), bounds AS (
      |  SELECT min(hour) AS lo, max(hour) AS hi FROM hourly
      |), grid AS (
      |  SELECT t.event_type, g.h AS hour
      |  FROM (SELECT DISTINCT event_type FROM hourly) t
      |  CROSS JOIN bounds
      |  CROSS JOIN LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h) g
      |), dense AS (
      |  SELECT g.hour, g.event_type, coalesce(h.n_events, 0) AS n_events
      |  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hour = g.hour
      |)""".stripMargin

  val gapfillSql: String =
    s"""$denseCte
       |SELECT hour, event_type, n_events FROM dense
       |ORDER BY hour, event_type""".stripMargin

  /** Volume anomaly detection over the DENSE hourly series: hours whose
    * count sits more than kσ from that type's mean. Running on the
    * gap-filled grid is the point — a silent ingestion outage IS an
    * hour with zero events, invisible to any query over the sparse
    * aggregate. Per-type mean/stddev is a ≤|event types|-row aggregate
    * (a bounded enum, hence the broadcast hint, same policy as
    * nation/region); the z-score compare then runs map-side. The 3σ
    * boundary is safe for the cross-engine hash gate: the closest
    * (hour, type) sits 0.14 events off the cut at sf0.1 — ~11 orders
    * above stddev's merge-order ulp jitter.
    */
  def anomaliesOf(events: DataFrame, k: Double = 3.0): DataFrame = {
    val dense = denseHourlyOf(events)
    val stats = dense.groupBy(col("event_type"))
      .agg(avg(col("n_events")).as("mu"), stddev_samp(col("n_events")).as("sd"))
    dense.join(broadcast(stats), Seq("event_type"))
      .filter(abs(col("n_events") - col("mu")) > lit(k) * col("sd"))
      .select(col("hour"), col("event_type"), col("n_events"),
        round((col("n_events") - col("mu")) / col("sd"), 4).as("zscore"))
      .orderBy("hour", "event_type")
  }

  def anomalies(t: Tables, k: Double = 3.0): DataFrame = anomaliesOf(t.events, k)

  /** Multi-touch conversion attribution (ref v2's event pipelines stop
    * at extraction; this is the canonical downstream query): every
    * `purchase` is credited to the user's FIRST non-purchase touch
    * (the channel that acquired them) and to the LAST touch before the
    * purchase (the channel that converted them); purchases with no
    * prior touch are `direct`. One shuffle on user_id serves both
    * window passes — `first/last(…, ignoreNulls)` over the
    * rows-preceding frame, the exact shape DuckDB's `IGNORE NULLS`
    * mirrors — then only (channel, model, value) triples reach the
    * ≤|event types|×2-row aggregate. Per-user state only; no global
    * window, no corpus-sized shuffle.
    */
  def attributionOf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = events
      .withColumn("touch",
        when(col("event_type") =!= "purchase", col("event_type")))
      .withColumn("first_touch", first(col("touch"), ignoreNulls = true).over(byUser))
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
    touched.select(coalesce(col("first_touch"), lit("direct")).as("channel"),
        lit("first").as("model"), col("value"))
      .unionAll(touched.select(coalesce(col("last_touch"), lit("direct")).as("channel"),
        lit("last").as("model"), col("value")))
      .groupBy("channel", "model")
      .agg(count(lit(1)).as("n_conversions"), round(sum(col("value")), 2).as("revenue"))
      .orderBy("model", "channel")
  }

  def attribution(t: Tables): DataFrame = attributionOf(t.events)

  val attributionSql: String =
    """WITH touched AS (
      |  SELECT event_type, value,
      |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER w AS first_touch,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER w AS last_touch
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), credited AS (
      |  SELECT coalesce(first_touch, 'direct') AS channel, 'first' AS model, value
      |  FROM touched WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT coalesce(last_touch, 'direct') AS channel, 'last' AS model, value
      |  FROM touched WHERE event_type = 'purchase'
      |)
      |SELECT channel, model, count(*) AS n_conversions, round(sum(value), 2) AS revenue
      |FROM credited GROUP BY channel, model
      |ORDER BY model, channel""".stripMargin

  /** Path analysis: the most common 3-step event sequences across all
    * user streams — the "how do users actually move" query behind
    * funnel design. Two `lead`s over the per-user ordered stream
    * (per-user window state only, same partitioning the sessionizer
    * uses — one user_id shuffle serves both leads), then a
    * map-side-combined count over ≤ |event types|³ path keys and a
    * TakeOrdered top-k. Deterministic: (ts, event_id) orders ties,
    * (n desc, steps) orders the result.
    */
  def pathAnalysisOf(events: DataFrame, topK: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("step2", lead(col("event_type"), 1).over(w))
      .withColumn("step3", lead(col("event_type"), 2).over(w))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(topK)
  }

  def pathAnalysis(t: Tables, topK: Int = 20): DataFrame = pathAnalysisOf(t.events, topK)

  def pathAnalysisSql(topK: Int = 20): String =
    s"""WITH steps AS (
       |  SELECT event_type AS step1,
       |    lead(event_type, 1) OVER w AS step2,
       |    lead(event_type, 2) OVER w AS step3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |)
       |SELECT step1, step2, step3, count(*) AS n_paths
       |FROM steps WHERE step2 IS NOT NULL AND step3 IS NOT NULL
       |GROUP BY 1, 2, 3
       |ORDER BY n_paths DESC, step1, step2, step3
       |LIMIT $topK""".stripMargin

  /** Seasonality profile: the hour-of-day × day-of-week activity grid
    * (+ mean value) behind every traffic heatmap and staffing/capacity
    * model. One scan, one ≤168-group map-side-combined aggregate.
    */
  def seasonalityOf(events: DataFrame): DataFrame =
    events
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy("dow", "hour_of_day")

  def seasonality(t: Tables): DataFrame = seasonalityOf(t.events)

  val seasonalitySql: String =
    """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
      |  CAST(hour(ts) AS BIGINT) AS hour_of_day,
      |  count(*) AS n_events, round(avg(value), 4) AS avg_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY dow, hour_of_day""".stripMargin

  /** Daily/weekly active users + stickiness (DAU/WAU) — the canonical
    * engagement series. One scan; two distinct-count aggregates (user
    * ids shuffle once per grain, weeks are Monday-truncated on both
    * engines); the week table is tiny and joins broadcast.
    */
  def dauWauOf(events: DataFrame): DataFrame = {
    val ev = events.select(to_date(col("ts")).as("day"),
      date_trunc("week", col("ts")).cast("date").as("week"), col("user_id"))
    val dau = ev.groupBy("day", "week").agg(countDistinct(col("user_id")).as("dau"))
    val wau = ev.groupBy("week").agg(countDistinct(col("user_id")).as("wau"))
    dau.join(broadcast(wau), "week")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  def dauWau(t: Tables): DataFrame = dauWauOf(t.events)

  val dauWauSql: String =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(date_trunc('week', ts) AS DATE) AS week, user_id
      |  FROM events
      |), dau AS (SELECT day, week, count(DISTINCT user_id) AS dau FROM ev GROUP BY 1, 2),
      |wau AS (SELECT week, count(DISTINCT user_id) AS wau FROM ev GROUP BY 1)
      |SELECT day, dau.dau AS dau, wau.wau AS wau,
      |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
      |FROM dau JOIN wau ON dau.week = wau.week
      |ORDER BY day""".stripMargin

  def anomaliesSql(k: Double = 3.0): String =
    s"""$denseCte, stats AS (
       |  SELECT event_type, avg(n_events) AS mu, stddev_samp(n_events) AS sd
       |  FROM dense GROUP BY event_type
       |)
       |SELECT d.hour, d.event_type, d.n_events,
       |  round((d.n_events - s.mu) / s.sd, 4) AS zscore
       |FROM dense d JOIN stats s ON s.event_type = d.event_type
       |WHERE abs(d.n_events - s.mu) > $k * s.sd
       |ORDER BY d.hour, d.event_type""".stripMargin

  // ------------------------------------------------- session stats

  /** Session-level behavior profile: [[sessionize]]'s gap sessions
    * re-derived with duration and a conversion flag, rolled up by
    * converted/not — "do purchasing sessions look different" (longer?
    * busier?), the first question asked of any session table. The
    * per-session frame shares sessionize's one user_id shuffle; the
    * rollup is 2 groups, so exact percentiles are safe (the
    * unbounded-group path is the GK sketch).
    */
  def sessionStatsOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser  = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSecs = gapMinutes * 60L
    val sessions = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSecs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
          .as("duration_s"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
    sessions
      .groupBy(col("converted"))
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(col("n_events")), 4).as("avg_events"),
        round(avg(col("duration_s")), 4).as("avg_duration_s"),
        round(expr("percentile(duration_s, 0.5)"), 4).as("p50_duration_s"))
      .orderBy("converted")
  }

  def sessionStats(t: Tables, gapMinutes: Int = 30): DataFrame =
    sessionStatsOf(t.events, gapMinutes)

  def sessionStatsSql(gapMinutes: Int = 30): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > ${gapMinutes * 60} THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, event_type, ts,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged
       |), sessions AS (
       |  SELECT user_id, session_id, count(*) AS n_events,
       |    date_diff('second', min(ts), max(ts)) AS duration_s,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
       |  FROM numbered GROUP BY 1, 2
       |)
       |SELECT converted, count(*) AS n_sessions,
       |  round(avg(n_events), 4) AS avg_events,
       |  round(avg(duration_s), 4) AS avg_duration_s,
       |  round(quantile_cont(duration_s, 0.5), 4) AS p50_duration_s
       |FROM sessions GROUP BY 1 ORDER BY converted""".stripMargin

  // ------------------------------------------- interval overlap join

  /** Per-user session INTERVALS (first/last event ts per session) —
    * the [[sessionize]] construction kept as timestamps instead of
    * event-id bounds, shared by the overlap join below.
    */
  def sessionIntervalsOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSecs = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSecs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
  }

  /** Concurrent-session pairs: all (user_a, user_b) session pairs
    * whose intervals OVERLAP in time — the interval-interval join
    * primitive behind co-presence, ad-collision, and concurrency
    * analysis. The naive form is a non-equi self-join (quadratic per
    * time neighborhood, and a nested-loop plan in Spark); here each
    * interval explodes into the HOUR BUCKETS it covers and candidates
    * come from an EQUI self-join on the bucket — replication factor is
    * interval_length/bucket (sessions are minutes, so ~1–2), per-bucket
    * cost is quadratic only in the CONCURRENCY of that hour, and a
    * multi-bucket pair dedups by its key tuple before the exact
    * overlap predicate re-checks [t0,t1]×[t0,t1] intersection (bucket
    * co-residence is necessary, not sufficient). The bucket width is
    * the documented scale dial: denser traffic → narrower buckets.
    * The ORACLE runs the naive non-equi join directly (DuckDB IEJoin)
    * — same pairs, independently derived.
    */
  def intervalOverlapOf(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    // interval bounds become epoch MICROSECOND longs (plus second
    // floors for the output metric and hour indexes for bucketing)
    // map-side, once per session — every per-candidate predicate below
    // is then pure long arithmetic, no timestamp logic in the
    // quadratic stage. The overlap test MUST ride micros: a
    // second-truncated bound admits boundary pairs the full-precision
    // timestamps (and the oracle) reject.
    val s = sessionIntervalsOf(events, gapMinutes)
      .select(col("user_id"), col("session_id"),
        unix_micros(col("t0")).as("t0u"), unix_micros(col("t1")).as("t1u"),
        unix_timestamp(col("t0")).as("t0s"), unix_timestamp(col("t1")).as("t1s"))
      .withColumn("h0", floor(col("t0s") / 3600L))
      .withColumn("h1", floor(col("t1s") / 3600L))
    val aCols = Seq("u1", "s1", "a0u", "a1u", "a0s", "a1s", "ah0")
    // Salted bucket join (guide §2.5): the candidate stage's cost is
    // ~quadratic in per-bucket occupancy while its BYTES are tiny, so
    // AQE's bytes-based coalescing packs the whole join into one task
    // (measured: two ~1.3 s single-task stages at sf0.1). Salt the a
    // side by session hash, replicate the b side ×salts, and pin the
    // exchange with an explicit partition count so the pair work
    // spreads — output pairs are identical (each pair still meets in
    // exactly one (bucket, salt)).
    val salts = 16
    val dp = events.sparkSession.sparkContext.defaultParallelism
    val a = s.withColumn("bucket", explode(sequence(col("h0"), col("h1"))))
      .select(col("bucket") +: Seq("user_id", "session_id", "t0u", "t1u", "t0s", "t1s", "h0")
        .zip(aCols).map { case (c, n) => col(c).as(n) }: _*)
      .withColumn("salt", pmod(xxhash64(col("u1"), col("s1")), lit(salts)))
      .repartition(dp, col("bucket"), col("salt"))
    val b = s.withColumn("bucket", explode(sequence(col("h0"), col("h1"))))
      .select(col("bucket"), col("user_id").as("u2"), col("session_id").as("s2"),
        col("t0u").as("b0u"), col("t1u").as("b1u"),
        col("t0s").as("b0s"), col("t1s").as("b1s"), col("h0").as("bh0"))
      .withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
    // merge-join hint: without it AQE broadcasts the ×salts-replicated
    // b side (1.5 M-row hashed relation, ~1.7 s build per run at
    // sf0.1); the salted shuffle join is the shape that scales — both
    // sides spread by (bucket, salt), no replicated build
    a.join(b.hint("shuffle_merge"), Seq("bucket", "salt"))
      .filter(col("u1") < col("u2")
        // emit each pair from EXACTLY ONE bucket — the one containing
        // the overlap's start hour, max(h0a, h0b), which both
        // intervals cover whenever they overlap at all. This replaces
        // the multi-bucket distinct() (a candidate-set-sized shuffle)
        // with a long comparison: no dedup exchange in the plan.
        && col("bucket") === greatest(col("ah0"), col("bh0"))
        && col("a0u") <= col("b1u") && col("b0u") <= col("a1u"))
      .select(col("u1"), col("s1"), col("u2"), col("s2"),
        (least(col("a1s"), col("b1s")) - greatest(col("a0s"), col("b0s"))).as("overlap_secs"))
      .orderBy("u1", "s1", "u2", "s2")
  }

  def intervalOverlap(t: Tables, gapMinutes: Int = 30): DataFrame =
    intervalOverlapOf(t.events, gapMinutes)

  def intervalOverlapSql(gapMinutes: Int = 30): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > ${gapMinutes * 60}
       |      THEN 1 ELSE 0 END AS ns
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sess AS (
       |  SELECT user_id,
       |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
       |    ts
       |  FROM flagged
       |), iv AS (
       |  SELECT user_id, session_id, min(ts) AS t0, max(ts) AS t1
       |  FROM sess GROUP BY 1, 2
       |)
       |SELECT a.user_id AS u1, a.session_id AS s1,
       |  b.user_id AS u2, b.session_id AS s2,
       |  date_diff('second', greatest(a.t0, b.t0), least(a.t1, b.t1)) AS overlap_secs
       |FROM iv a JOIN iv b
       |  ON a.user_id < b.user_id AND a.t0 <= b.t1 AND b.t0 <= a.t1
       |ORDER BY u1, s1, u2, s2""".stripMargin

  // ------------------------------------------------ cohort revenue (LTV)

  /** Signup-cohort revenue triangle — `q_cohort_matrix` with MONEY:
    * per (first-seen week, weeks-since) cell, purchase revenue in
    * EXACT CENTS plus the running cumulative-per-user ("LTV buildup")
    * the growth team actually plots. Cohort = one min agg per user;
    * cells are a ≤\|weeks\|² grid; the cumulative is a COHORT-partitioned
    * window over that grid (never corpus-sized). Revenue sums are
    * exact DECIMAL cents; the per-user LTV divides exact integers,
    * unrounded.
    */
  def cohortRevenueOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = events
      .groupBy("user_id").agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    val cells = events
      .filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .select(col("cohort"),
        expr("datediff(date_trunc('week', ts), cohort) div 7").as("weeks_since"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("cohort", "weeks_since")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents").cast("decimal(18,0)")).as("revenue_cents"))
    val wCum = Window.partitionBy(col("cohort")).orderBy(col("weeks_since"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sizes), "cohort")
      .withColumn("cum_cents", sum(col("revenue_cents")).over(wCum))
      .select(col("cohort"), col("weeks_since"), col("cohort_users"),
        col("n_purchases"), col("revenue_cents").cast("long").as("revenue_cents"),
        (col("cum_cents").cast("double")
          / (col("cohort_users").cast("double") * 100.0)).as("cum_ltv"))
      .orderBy("cohort", "weeks_since")
  }

  def cohortRevenue(t: Tables): DataFrame = cohortRevenueOf(t.events)

  val cohortRevenueSql: String =
    """WITH first AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY 1
      |), sizes AS (
      |  SELECT cohort, count(*) AS cohort_users FROM first GROUP BY 1
      |), cells AS (
      |  SELECT f.cohort,
      |    date_diff('day', f.cohort, date_trunc('week', e.ts)) // 7 AS weeks_since,
      |    count(*) AS n_purchases,
      |    sum(CAST(CAST(round(e.value * 100) AS BIGINT) AS HUGEINT)) AS revenue_cents
      |  FROM events e JOIN first f USING (user_id)
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2
      |)
      |SELECT c.cohort, c.weeks_since, s.cohort_users, c.n_purchases,
      |  CAST(c.revenue_cents AS BIGINT) AS revenue_cents,
      |  CAST(sum(c.revenue_cents) OVER (PARTITION BY c.cohort ORDER BY c.weeks_since
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / (CAST(s.cohort_users AS DOUBLE) * 100.0) AS cum_ltv
      |FROM cells c JOIN sizes s USING (cohort)
      |ORDER BY c.cohort, c.weeks_since""".stripMargin
}
