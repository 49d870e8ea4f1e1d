package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew-mitigation utilities for hot keys at scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; these
  * helpers are the explicit form for pathological skew (a handful of
  * keys holding a large fraction of rows — stop-words, null-ish ids,
  * celebrity entities), where pre-salting beats post-hoc splitting
  * because it also spreads the *aggregation* state.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hashes the whole row's
    * listed columns (not a RNG — reruns and retries stay stable).
    */
  def salt(salts: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(salts))

  /** Two-phase salted aggregation: groupBy(key, salt) partially
    * aggregates the hot key across `salts` reducers, then the tiny
    * per-salt partials re-aggregate. Counts and sums compose; pass the
    * merge expression for other aggregates.
    */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int, saltSource: Seq[String]): DataFrame =
    df.withColumn("_salt", salt(salts, saltSource.map(col): _*))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("cnt"))

  /** Gated form of [[saltedCount]]: per-event-type counts + value sums
    * through the two-phase salted aggregate. event_type is the
    * textbook hot key (a handful of values over millions of rows); the
    * salt spreads each type across 16 reducers before the tiny per-salt
    * partials re-combine. The oracle is the plain one-phase GROUP BY —
    * same answer, independent plan.
    */
  def saltedEventStats(df: DataFrame, salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(salts, Seq("event_id").map(col): _*))
      .groupBy(col("event_type"), col("_salt"))
      .agg(count(lit(1)).as("_pc"),
        sum(round(col("value") * 100).cast("long")).as("_pcents"))
      .groupBy(col("event_type"))
      .agg(sum(col("_pc")).as("n_events"),
        (sum(col("_pcents")) / lit(100.0)).as("sum_value"))
      .orderBy("event_type")

  val saltedEventStatsSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // Fixed-point "cents" form of the value column: float sums are
  // order-dependent across partitionings, so every plan variant (and
  // the DuckDB oracle) aggregates exact longs and divides once at the
  // end — identical bits from any plan.
  private val cents = round(col("value") * 100).cast("long")

  /** Per-row share of its key's total value — the WINDOW form.
    * `sum(value) OVER (PARTITION BY event_type)` is the one skew class
    * neither partial aggregation nor AQE can mitigate: a window has no
    * map-side combine, and AQE cannot split a sort partition, so EVERY
    * row of a hot key lands on one task and that task serializes the
    * stage. Kept as the oracle twin and the bench adversary for
    * [[shareOfKeyTotal]].
    */
  def shareWindowForm(events: DataFrame, ordered: Boolean = true): DataFrame = {
    val shares = events.select(col("event_id"), col("event_type"),
      round(cents / sum(cents).over(Window.partitionBy(col("event_type"))).cast("double"), 6)
        .as("share"))
    // the total order exists for the oracle hash; the bench pair times
    // the unordered form so the shared global sort can't dilute the
    // window-vs-rewrite plan difference
    if (ordered) shares.orderBy("event_id") else shares
  }

  /** Per-row share of its key's total value — the window-to-join
    * REWRITE. The per-key totals come from a salted two-phase aggregate
    * (the hot key's partials spread over `salts` reducers before the
    * tiny per-salt rows re-combine), and the handful of totals
    * broadcast-join back onto the rows: same per-row answer as
    * [[shareWindowForm]], but no task ever holds a whole key. This is
    * the scale plan for "attach a key-level aggregate to every row"
    * when the key histogram is skewed.
    */
  def shareOfKeyTotal(events: DataFrame, salts: Int = 16, ordered: Boolean = true): DataFrame = {
    val totals = events
      .withColumn("_salt", salt(salts, col("event_id")))
      .groupBy(col("event_type"), col("_salt"))
      .agg(sum(cents).as("_pcents"))
      .groupBy(col("event_type"))
      .agg(sum(col("_pcents")).as("_total_cents"))
    val shares = events.join(broadcast(totals), "event_type")
      .select(col("event_id"), col("event_type"),
        round(cents / col("_total_cents").cast("double"), 6).as("share"))
    if (ordered) shares.orderBy("event_id") else shares
  }

  val shareOfKeyTotalSql: String =
    """SELECT event_id, event_type,
      |  round(CAST(round(value * 100) AS BIGINT)
      |    / CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS share
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Salted broadcast-replicated join: the skewed fact side gets a
    * deterministic salt, the small side is replicated `salts`× with
    * every salt value, and the join keys on (key, salt) — a hot key's
    * rows now land on `salts` different reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      factSaltSource: Seq[String]): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(salts, factSaltSource.map(col): _*))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Gated form of [[saltedJoin]]: events (user_id is the skewable
    * key) joined to the customer dimension through the salt-replicated
    * plan, aggregated per market segment. The oracle is the plain
    * unsalted join — same rows, independent plan. The aggregate keeps
    * the gate row-count stable while still verifying every joined row
    * (counts + exact cents sums change if any row is lost or doubled).
    */
  def saltedJoinSegments(events: DataFrame, customer: DataFrame, salts: Int = 8): DataFrame = {
    val dim = customer.select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(events, dim, "user_id", salts, Seq("event_id"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        (sum(cents) / lit(100.0)).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  val saltedJoinSegmentsSql: String =
    """SELECT c_mktsegment, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------- key-skew report

  /** Key-skew diagnostic — the measurement that DECIDES whether the
    * salting machinery above is needed for a given join/agg key: the
    * top heavy keys with their row share, against the key-table-wide
    * mean, exact p99 and max/mean skew ratio. One map-side-combined
    * count per key; every downstream stat lives on the key table
    * (never corpus rows); the heavy-key slice is TakeOrdered. Rule of
    * thumb the report encodes: skew_ratio ≳ 10 and a top-key share
    * that dwarfs 1/|keys| → salt (or let AQE split) before the
    * shuffle melts one task. Counts exact LONGs; mean/share/ratio
    * single unrounded divisions; p99 the exact interpolating
    * percentile (`percentile` ≡ `quantile_cont`).
    */
  def keySkewOf(rows: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = rows.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.99)").as("p99_cnt"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"),
        (col("total").cast("double") / col("n_keys").cast("double")).as("mean_cnt"),
        col("p99_cnt"),
        (col("max_cnt").cast("double")
          / (col("total").cast("double") / col("n_keys").cast("double")))
          .as("skew_ratio"))
      .orderBy(col("cnt").desc, col("key"))
  }

  /** Gated form: lineitem supplier-key skew (the join key
    * `q_skew_salted_join` salts).
    */
  def keySkew(t: Tables): DataFrame = keySkewOf(t.lineitem, "l_suppkey")

  def keySkewSql(topK: Int = 10): String =
    s"""WITH counts AS (
       |  SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n_keys, sum(cnt) AS total, max(cnt) AS max_cnt,
       |    quantile_cont(cnt, 0.99) AS p99_cnt
       |  FROM counts
       |), top AS (
       |  SELECT key, cnt FROM counts ORDER BY cnt DESC, key LIMIT $topK
       |)
       |SELECT key, cnt,
       |  CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       |  CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE) AS mean_cnt,
       |  p99_cnt,
       |  CAST(max_cnt AS DOUBLE)
       |    / (CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS skew_ratio
       |FROM top CROSS JOIN stats
       |ORDER BY cnt DESC, key""".stripMargin
}
