package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sequence feature engineering over the events stream — the
  * per-entity windowed derivations an ML pipeline runs to turn a raw
  * event log into training rows. Every window is partitioned by
  * user_id (per-key state only — the repo-wide rule), with the
  * deterministic (ts, event_id) order so lag/rolling frames are
  * identical across engines and partitionings.
  */
object Features {

  /** Per-event lag features: previous event type, seconds since the
    * previous event, and the rolling mean of the last 3 event values —
    * the standard "sessionless" feature block. One shuffle on user_id
    * serves all three windows (same partitioning, same order).
    */
  def lagFeaturesOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val w3 = w.rowsBetween(-2, 0)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("secs_since_prev",
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))).cast("long"))
      .withColumn("rolling_avg_value", round(avg(col("value")).over(w3), 4))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("prev_type"), col("secs_since_prev"), col("rolling_avg_value"))
      .orderBy("event_id")
  }

  def lagFeatures(t: Tables): DataFrame = lagFeaturesOf(t.events)

  val lagFeaturesSql: String =
    """SELECT event_id, user_id, event_type,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  CAST(date_diff('second', lag(ts, 1) OVER w, ts) AS BIGINT) AS secs_since_prev,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rolling_avg_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** First-order Markov transition matrix of event types: per-user
    * (prev → next) pairs from one lag window, collapsed to a
    * |types|² grid with row-normalized probabilities — the behavioral
    * model behind next-event prediction and funnel simulation. The
    * normalizing row totals live on the tiny grid (≤|types| rows), so
    * the second window is grid-sized, never corpus-sized.
    */
  def markovTransitionsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("src")).agg(sum(col("n")).as("row_total"))
    pairs.join(totals, Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("row_total"), 6).as("p"))
      .orderBy("src", "dst")
  }

  def markovTransitions(t: Tables): DataFrame = markovTransitionsOf(t.events)

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
      |  FROM events
      |), pairs AS (
      |  SELECT src, event_type AS dst, count(*) AS n
      |  FROM seq WHERE src IS NOT NULL GROUP BY 1, 2
      |), totals AS (
      |  SELECT src, sum(n) AS row_total FROM pairs GROUP BY 1
      |)
      |SELECT p.src, p.dst, p.n, round(CAST(p.n AS DOUBLE) / t.row_total, 6) AS p
      |FROM pairs p JOIN totals t USING (src)
      |ORDER BY src, dst""".stripMargin
}
