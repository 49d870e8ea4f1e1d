package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
