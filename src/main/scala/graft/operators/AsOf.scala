package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of (time-series) join: match each left row to the most recent
  * right row at-or-before its timestamp, per key.
  *
  * Spark lacks a native ASOF JOIN; per the preference order this is
  * COMPOSED from built-ins rather than a custom physical operator:
  * union both sides, carry the last right-row forward with an ordered
  * window, keep left rows. One shuffle on the key, O(n log n) within
  * partitions, no range-join explosion — the same plan shape a native
  * as-of operator would produce. (The oracle uses DuckDB's native
  * ASOF JOIN, so the composition is verified against a reference
  * implementation, not itself.)
  */
object AsOf {

  /** Generic as-of: rows of `left` matched to the latest `right` row
    * with right.ts <= left.ts and equal key. Both inputs need columns
    * (id, key, ts); output: left_id, key, right_id, right_ts.
    *
    * Ties on the right side (several rows at the same (key, ts)) are
    * broken BEFORE the join by keeping the max id — an as-of match is
    * defined by (key, ts), so this loses nothing, and it forces this
    * composition and any reference engine (DuckDB's native ASOF JOIN
    * leaves the equal-timestamp choice unspecified) to the same row.
    */
  def asofJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val rightDistinct = right.groupBy(col("key"), col("ts")).agg(max(col("id")).as("id"))
    val l = left.select(col("id").as("left_id"), col("key"), col("ts"), lit(1).as("_is_left"))
    val r = rightDistinct.select(col("id").as("right_id"), col("key"), col("ts"), lit(0).as("_is_left"))
    val all = l.withColumn("right_id", lit(null).cast("long"))
      .unionByName(r.withColumn("left_id", lit(null).cast("long")), allowMissingColumns = false)
    // right rows sort before left rows at equal ts (ASOF's >= bound)
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("_is_left"), coalesce(col("left_id"), col("right_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("m_right_id", last(when(col("_is_left") === 0, col("right_id")), ignoreNulls = true).over(w))
      .withColumn("m_right_ts", last(when(col("_is_left") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1 && col("m_right_id").isNotNull)
      .select(col("left_id"), col("key"), col("m_right_id").as("right_id"),
        col("m_right_ts").as("right_ts"), col("ts"))
  }

  /** Concrete query: each purchase matched to the same user's most
    * recent prior-or-equal click, with the gap in whole seconds.
    */
  def purchaseAsofClick(t: Tables): DataFrame = {
    val ev = t.events.select(col("event_id").as("id"), col("user_id").as("key"),
      col("event_type"), col("ts"))
    val out = asofJoin(
      ev.filter(col("event_type") === "purchase").drop("event_type"),
      ev.filter(col("event_type") === "click").drop("event_type"))
    out.select(
      col("left_id").as("purchase_id"),
      col("key").as("user_id"),
      col("right_id").as("click_id"),
      (unix_timestamp(col("ts")) - unix_timestamp(col("right_ts"))).as("gap_s"))
      .orderBy("purchase_id")
  }

  val purchaseAsofClickSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT max(event_id) AS event_id, user_id, ts FROM events
      |           WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
      |       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
      |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  /** Gated query through the custom [[graft.plans.RangeJoin]] operator
    * (logical node → Strategy → sort-merge BinaryExecNode): every
    * click inside the 30-minute window before a same-user purchase.
    * The oracle is the plain inequality join DuckDB plans natively —
    * an independent execution path arriving at the same pairs, which
    * is what makes it a strong gate for the custom exec. (Spark's own
    * planner would run this as a broadcast nested-loop — the custom
    * node makes it a co-partitioned merge, O(n log n + matches).)
    */
  def qRangeJoin(t: Tables): DataFrame = {
    val e = t.events
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("user_id_r"),
        (col("ts") - expr("INTERVAL 30 MINUTES")).as("lo"), col("ts").as("hi"))
    graft.plans.RangeJoin.rangeJoin(clicks, purchases, "user_id", "ts", "lo", "hi")
      .select(col("click_id"), col("purchase_id"), col("user_id"))
      .orderBy("click_id", "purchase_id")
  }

  val qRangeJoinSql: String =
    """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
      |     p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT click_id, purchase_id, c.user_id AS user_id
      |FROM c JOIN p ON c.user_id = p.user_id
      |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
      |ORDER BY click_id, purchase_id""".stripMargin
}
