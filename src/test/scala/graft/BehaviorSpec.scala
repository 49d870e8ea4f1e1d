package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Behavior

/** Unit semantics for the behavior tranche — the hash gate proves
  * engine parity; these pin the SEMANTICS on planted event streams.
  */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, ts: String, et: String = "click") =
    (id, user, Timestamp.valueOf(ts), et)

  private def toDf(rows: Seq[(Long, Long, Timestamp, String)]) =
    rows.toDF("event_id", "user_id", "ts", "event_type")

  // ---------------------------------------------------------- streaks

  test("streaks: consecutive days form one island, a gap splits it (hand-computed)") {
    // user 1: days 1,2,3 then 7,8 → streaks of 3 and 2
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-02 10:00:00"),
      ev(3, 1, "2024-03-03 10:00:00"), ev(4, 1, "2024-03-07 10:00:00"),
      ev(5, 1, "2024-03-08 10:00:00")))
    val r = Behavior.streaksOf(df).collect().head
    assert(r.getLong(r.fieldIndex("active_days")) == 5L)
    assert(r.getLong(r.fieldIndex("n_streaks")) == 2L)
    assert(r.getLong(r.fieldIndex("max_streak")) == 3L)
    assert(r.getDate(r.fieldIndex("max_streak_start")).toString == "2024-03-01")
  }

  test("streaks: multiple events in one day count that day once") {
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-01 23:00:00"),
      ev(3, 1, "2024-03-02 01:00:00")))
    val r = Behavior.streaksOf(df).collect().head
    assert(r.getLong(r.fieldIndex("active_days")) == 2L)
    assert(r.getLong(r.fieldIndex("max_streak")) == 2L)
  }

  test("streaks: tied maximal streaks pick the EARLIEST start") {
    // two 2-day streaks: Mar 1-2 and Mar 10-11
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-02 10:00:00"),
      ev(3, 1, "2024-03-10 10:00:00"), ev(4, 1, "2024-03-11 10:00:00")))
    val r = Behavior.streaksOf(df).collect().head
    assert(r.getDate(r.fieldIndex("max_streak_start")).toString == "2024-03-01")
  }

  // ----------------------------------------------------- inter-arrival

  test("interArrival: hand-computed gaps, mean, sd, cv, burstiness") {
    // gaps: 10, 30 seconds → mean 20, sample sd = sqrt(200) ≈ 14.1421
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-01 10:00:10"),
      ev(3, 1, "2024-03-01 10:00:40")))
    val r = Behavior.interArrivalOf(df).collect().head
    assert(r.getLong(r.fieldIndex("n_gaps")) == 2L)
    assert(r.getDouble(r.fieldIndex("mean_gap_s")) == 20.0)
    val sd = r.getDouble(r.fieldIndex("sd_gap_s"))
    assert(math.abs(sd - math.sqrt(200.0)) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("cv")) - sd / 20.0) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("burstiness")) - (sd - 20.0) / (sd + 20.0)) < 1e-12)
  }

  test("interArrival: perfectly regular gaps read burstiness -1 (the bot signature)") {
    val df = toDf((0 to 4).map(i => ev(i + 1, 1, f"2024-03-01 10:0$i:00")))
    val r = Behavior.interArrivalOf(df).collect().head
    assert(r.getDouble(r.fieldIndex("sd_gap_s")) == 0.0)
    assert(r.getDouble(r.fieldIndex("burstiness")) == -1.0)
  }

  test("interArrival: a single gap reads NULL sd/cv/burstiness, not /0") {
    val df = toDf(Seq(ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-01 10:00:05")))
    val r = Behavior.interArrivalOf(df).collect().head
    assert(r.isNullAt(r.fieldIndex("sd_gap_s")))
    assert(r.isNullAt(r.fieldIndex("cv")))
    assert(r.isNullAt(r.fieldIndex("burstiness")))
  }

  test("interArrival: all-simultaneous events read NULL burstiness (0/0 guard)") {
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-01 10:00:00"),
      ev(3, 1, "2024-03-01 10:00:00")))
    val r = Behavior.interArrivalOf(df).collect().head
    assert(r.getDouble(r.fieldIndex("mean_gap_s")) == 0.0)
    assert(r.isNullAt(r.fieldIndex("burstiness")))
  }

  // -------------------------------------------------- sequence patterns

  test("seqPatterns: trigrams stay inside a session (the 30-min gap cuts them)") {
    // session 1: a,b,c,d → a>b>c, b>c>d; then a 2h gap; session 2: a,b (no trigram)
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00", "a"), ev(2, 1, "2024-03-01 10:01:00", "b"),
      ev(3, 1, "2024-03-01 10:02:00", "c"), ev(4, 1, "2024-03-01 10:03:00", "d"),
      ev(5, 1, "2024-03-01 12:30:00", "a"), ev(6, 1, "2024-03-01 12:31:00", "b")))
    val got = Behavior.seqPatternsOf(df).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a>b>c", 1L), ("b>c>d", 1L)))
  }

  test("seqPatterns: counts aggregate across users and ties break by seq string") {
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00", "x"), ev(2, 1, "2024-03-01 10:01:00", "y"),
      ev(3, 1, "2024-03-01 10:02:00", "z"),
      ev(4, 2, "2024-03-01 11:00:00", "x"), ev(5, 2, "2024-03-01 11:01:00", "y"),
      ev(6, 2, "2024-03-01 11:02:00", "z")))
    val got = Behavior.seqPatternsOf(df).collect()
    assert(got.length == 1 && got.head.getString(0) == "x>y>z" && got.head.getLong(1) == 2L)
  }

  // ------------------------------------------------ peak concurrency

  test("peakConcurrency: overlapping sessions from different users stack (hand-computed)") {
    // u1 session 10:00-10:20, u2 session 10:10-10:30, u3 session 11:30-11:40
    // peak = 2 (10:10-10:20); all on one day, carry_in 0
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-01 10:20:00"),
      ev(3, 2, "2024-03-01 10:10:00"), ev(4, 2, "2024-03-01 10:30:00"),
      ev(5, 3, "2024-03-01 11:30:00"), ev(6, 3, "2024-03-01 11:40:00")))
    val r = Behavior.peakConcurrencyOf(df).collect().head
    assert(r.getLong(r.fieldIndex("n_starts")) == 3L)
    assert(r.getLong(r.fieldIndex("carry_in")) == 0L)
    assert(r.getLong(r.fieldIndex("peak")) == 2L)
  }

  test("peakConcurrency: a session ending exactly when another starts counts both (closed intervals)") {
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 10:00:00"), ev(2, 1, "2024-03-01 10:20:00"),
      ev(3, 2, "2024-03-01 10:20:00"), ev(4, 2, "2024-03-01 10:40:00")))
    val r = Behavior.peakConcurrencyOf(df).collect().head
    assert(r.getLong(r.fieldIndex("peak")) == 2L)
  }

  test("peakConcurrency: a session spanning midnight carries into the next day") {
    // continuous activity 23:50 → 00:10 (gaps ≤ 30 min → ONE session)
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 23:50:00"), ev(2, 1, "2024-03-02 00:10:00"),
      ev(3, 2, "2024-03-02 09:00:00"), ev(4, 2, "2024-03-02 09:05:00")))
    val rows = Behavior.peakConcurrencyOf(df).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(r.fieldIndex("carry_in")), r.getLong(r.fieldIndex("peak")))).toMap
    assert(rows("2024-03-01") == ((0L, 1L)))
    // day 2 starts with u1's session still open
    assert(rows("2024-03-02")._1 == 1L)
    assert(rows("2024-03-02")._2 == 1L) // u1 closes 00:10, u2 opens 09:00 — never 2 at once
  }

  test("peakConcurrency: a day with only session ends keeps the midnight level as its peak (ADVICE r11)") {
    // two sessions span midnight and both END on day 2 with nothing
    // starting: every day-2 prefix sum is negative, so the peak must be
    // the carry-in itself (the start-of-day concurrency), not
    // carry_in + max_delta which would undercount to 1
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 23:50:00"), ev(2, 1, "2024-03-02 00:10:00"),
      ev(3, 2, "2024-03-01 23:55:00"), ev(4, 2, "2024-03-02 00:05:00")))
    val rows = Behavior.peakConcurrencyOf(df).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(r.fieldIndex("carry_in")), r.getLong(r.fieldIndex("peak")))).toMap
    assert(rows("2024-03-01") == ((0L, 2L)))
    assert(rows("2024-03-02") == ((2L, 2L)))
  }

  // ------------------------------------------------ cart abandonment

  test("abandonment: engaged-no-purchase counts, purchase clears, signup-only is not engaged") {
    val df = toDf(Seq(
      // u1: view then purchase → engaged, converted
      ev(1, 1, "2024-03-01 10:00:00", "view"), ev(2, 1, "2024-03-01 10:05:00", "purchase"),
      // u2: click only → engaged, abandoned
      ev(3, 2, "2024-03-01 11:00:00", "click"),
      // u3: signup only → not engaged, not abandoned
      ev(4, 3, "2024-03-01 12:00:00", "signup")))
    val r = Behavior.abandonmentOf(df).collect().head
    assert(r.getLong(r.fieldIndex("n_sessions")) == 3L)
    assert(r.getLong(r.fieldIndex("n_engaged")) == 2L)
    assert(r.getLong(r.fieldIndex("n_abandoned")) == 1L)
    assert(r.getDouble(r.fieldIndex("abandonment_rate")) == 0.5)
  }

  test("abandonment: a session is dated by its FIRST event") {
    val df = toDf(Seq(
      ev(1, 1, "2024-03-01 23:50:00", "view"), ev(2, 1, "2024-03-02 00:05:00", "purchase")))
    val rows = Behavior.abandonmentOf(df).collect()
    assert(rows.length == 1 && rows.head.getDate(0).toString == "2024-03-01")
    assert(rows.head.getLong(rows.head.fieldIndex("n_abandoned")) == 0L)
  }

  // ------------------------------------------------ cohort revenue

  test("cohortRevenue: exact cents per cell and cumulative LTV per user (hand-computed)") {
    import org.apache.spark.sql.functions.lit
    // two users, same cohort week; purchases: u1 w0 $10.00, u1 w1 $5.50, u2 w0 $2.25
    val rows = Seq(
      (1L, 1L, Timestamp.valueOf("2024-03-04 10:00:00"), "purchase", 10.00),
      (2L, 1L, Timestamp.valueOf("2024-03-12 10:00:00"), "purchase", 5.50),
      (3L, 2L, Timestamp.valueOf("2024-03-05 10:00:00"), "purchase", 2.25))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = graft.operators.Events.cohortRevenueOf(rows).collect()
      .map(r => r.getLong(r.fieldIndex("weeks_since")) ->
        (r.getLong(r.fieldIndex("revenue_cents")), r.getDouble(r.fieldIndex("cum_ltv"))))
      .toMap
    assert(got(0L)._1 == 1225L)              // 1000 + 225 cents
    assert(got(0L)._2 == 1225.0 / (2 * 100)) // $6.125 per user
    assert(got(1L)._1 == 550L)
    assert(got(1L)._2 == 1775.0 / (2 * 100)) // cumulative $8.875
  }
}
