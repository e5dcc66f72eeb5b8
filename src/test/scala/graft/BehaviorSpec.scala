package graft

import graft.operators.Behavior
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-case fixtures for the behavioral operators (funnel, retention) —
  * the deadline/tie/ordering boundaries a product-analytics user hits first.
  * Complements the q85/q86 oracle rows (corpus-scale) and the
  * KernelProperties random-stream invariants.
  */
class BehaviorSpec extends SparkSuite {
  import spark.implicits._

  /** (user, secondsSinceEpoch, type) triples as a typed event frame. */
  private def events(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("user_id", "sec", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_type"))

  private val stages3 = Seq("view", "click", "purchase")

  private def funnelRows(df: DataFrame, windowSec: Long = 1000,
                         stages: Seq[String] = stages3) =
    Behavior.funnel(df, "user_id", "ts", "event_type", stages, windowSec)
      .orderBy("user_id")
      .collect()
      .map(r => r.getLong(0) ->
        (stages.map(s => Option(r.getAs[java.sql.Timestamp](s"t_$s"))
          .map(_.getTime / 1000L)), r.getAs[Long]("stage_reached")))
      .toMap

  test("funnel: deadline missed nulls the later stage and stops the count") {
    // click lands 2000s after view with a 1000s window -> stage 2 missed;
    // the purchase AFTER that late click must not resurrect stage 3.
    val out = funnelRows(events(
      (1L, 0L, "view"), (1L, 2000L, "click"), (1L, 2100L, "purchase")))
    assert(out(1L)._1 === Seq(Some(0L), None, None))
    assert(out(1L)._2 === 1L)
  }

  test("funnel: tie at the exact anchor timestamp is not counted") {
    // click at the view's exact ts: strictly-after excludes it; the later
    // click inside the window anchors stage 2 instead.
    val out = funnelRows(events(
      (1L, 100L, "view"), (1L, 100L, "click"), (1L, 600L, "click"),
      // user 2 has ONLY the tied click -> stage 2 never fires
      (2L, 100L, "view"), (2L, 100L, "click")))
    assert(out(1L)._1 === Seq(Some(100L), Some(600L), None))
    assert(out(1L)._2 === 2L)
    assert(out(2L)._1 === Seq(Some(100L), None, None))
    assert(out(2L)._2 === 1L)
  }

  test("funnel: the exact deadline boundary (t_prev + window) still counts") {
    val out = funnelRows(events(
      (1L, 0L, "view"), (1L, 1000L, "click"),      // == deadline: in
      (2L, 0L, "view"), (2L, 1001L, "click")))     // one past: out
    assert(out(1L)._1(1) === Some(1000L))
    assert(out(2L)._1(1) === None)
  }

  test("funnel: click before the view anchor does not count; entry requires stage 1") {
    val out = funnelRows(events(
      // user 1: click precedes their first view, nothing after -> stage 1 only
      (1L, 50L, "click"), (1L, 100L, "view"),
      // user 2: never views -> not in the funnel at all
      (2L, 10L, "click"), (2L, 20L, "purchase")))
    assert(out(1L)._1 === Seq(Some(100L), None, None))
    assert(out(1L)._2 === 1L)
    assert(!out.contains(2L))
  }

  test("funnel: 4-stage chain anchors each stage on the previous one") {
    val stages = Seq("view", "click", "cart", "purchase")
    val out = funnelRows(events(
      (1L, 0L, "view"), (1L, 400L, "click"), (1L, 900L, "cart"),
      (1L, 1500L, "purchase"),
      // user 2 stalls at cart: purchase misses cart's 1000s deadline
      (2L, 0L, "view"), (2L, 100L, "click"), (2L, 200L, "cart"),
      (2L, 1500L, "purchase")),
      windowSec = 1000, stages = stages)
    assert(out(1L)._1 === Seq(Some(0L), Some(400L), Some(900L), Some(1500L)))
    assert(out(1L)._2 === 4L)
    assert(out(2L)._1 === Seq(Some(0L), Some(100L), Some(200L), None))
    assert(out(2L)._2 === 3L)
  }

  test("funnel: duplicate stage names are rejected") {
    val ex = intercept[IllegalArgumentException] {
      Behavior.funnel(events((1L, 0L, "view")), "user_id", "ts", "event_type",
        Seq("view", "click", "view"), 1000)
    }
    assert(ex.getMessage.contains("distinct"))
  }

  test("retention: cohort week anchors on the first event, offsets in whole days") {
    // 2024-01-01 is a Monday -> its own week start; 2024-01-03 truncs to it.
    val out = Behavior.retention(events(
      (1L, 1704067200L, "e"),               // u1 first: Mon 2024-01-01 00:00
      (1L, 1704067200L + 86400L, "e"),      // u1 day 1
      (1L, 1704067200L + 7 * 86400L, "e"),  // u1 day 7
      (2L, 1704240000L, "e"),               // u2 first: Wed 2024-01-03 -> same cohort week
      (2L, 1704240000L + 86400L, "e")),     // u2 day 1
      "user_id", "ts")
      .orderBy("cohort_week", "day_offset")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("day_offset"), r.getAs[Long]("n_active")))
    assert(out === Array(
      ("2024-01-01", 0, 2L),   // both users active on their own day 0
      ("2024-01-01", 1, 2L),   // both return on day 1
      ("2024-01-01", 7, 1L)))  // only u1 returns on day 7
  }

  test("retention: same-day repeat events count the user once per cell") {
    val out = Behavior.retention(events(
      (1L, 1704067200L, "e"), (1L, 1704067200L + 3600L, "e"),
      (1L, 1704067200L + 7200L, "e")), "user_id", "ts").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_active") === 1L)
  }
}
