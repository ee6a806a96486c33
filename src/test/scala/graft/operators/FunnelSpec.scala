package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("strict sequence: steps must occur in order, strictly after") {
    val events = Seq(
      // user 1: full funnel in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: click BEFORE view — never reaches step 2
      (2L, "click", ts(1)), (2L, "view", ts(2)),
      // user 3: click at the SAME instant as view — strict > rejects it
      (3L, "view", ts(1)), (3L, "click", ts(1)),
      // user 4: view only
      (4L, "view", ts(1)),
      // user 5: no funnel events at all
      (5L, "error", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.conversionFunnel(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("view", 4L, 800000L)))     // 4 of 5 users viewed
    assert(out(2L) == (("click", 1L, 250000L)))    // only user 1 chained
    assert(out(3L) == (("purchase", 1L, 1000000L)))
  }

  test("earliest-first is order-maximal: a later first view still counts") {
    // user's earliest view is BEFORE the click, even though another view
    // comes after it — the funnel must chain through the earliest
    val events = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "view", ts(9))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.conversionFunnel(events, "user_id", "event_type",
        "ts", Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(2L) == 1L)
  }

  test("funnel plans one user-key exchange, no self-join") {
    val events = Seq((1L, "view", ts(1))).toDF("user_id", "event_type", "ts")
    val plan = Funnel.stepTimestamps(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex == 1, s"expected one user-key exchange, got $ex:\n" +
      plan.take(2000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan)
  }

  test("retentionCohorts: epoch-week cohorts, pre-signup rows excluded") {
    def day(d: Int) = new Timestamp(d * 86400000L)
    val events = Seq(
      // user 1 signs up day 0 (epoch week 0); active days 0, 8 (week 1)
      (1L, "signup", day(0)), (1L, "click", day(8)),
      // user 2 signs up day 7 (week 1); has a PRE-signup event day 3
      // that must not count, and activity day 15 (offset week 1)
      (2L, "click", day(3)), (2L, "signup", day(7)), (2L, "view", day(15)),
      // user 3 never signs up — excluded entirely
      (3L, "click", day(1))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.retentionCohorts(events, "user_id", "event_type",
        "ts", "signup")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L,   // user 1: signup week + next week
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))  // user 2: day-3 click excluded
  }

  test("empty previous step yields conv_ppm 0, not a division error") {
    val events = Seq((1L, "error", ts(1))).toDF("user_id", "event_type", "ts")
    val out = Funnel.conversionFunnel(events, "user_id", "event_type",
        "ts", Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((0L, 0L)))
  }
}
