package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest prior right row per key; inclusive at equal time") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // after r2 → matches r2
      (2L, 10L, ts("2024-01-01 08:30:00")),   // between r1 and r2 → r1
      (3L, 10L, ts("2024-01-01 08:00:00")),   // exactly r1's time → r1 (inclusive)
      (4L, 10L, ts("2024-01-01 07:59:59")),   // before any right → null
      (5L, 20L, ts("2024-01-01 12:00:00"))    // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 08:00:00"), 1.0),
      (200L, 10L, ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("r_id", "user_id", "ts", "v")
    val got = TemporalJoins.asOfJoin(left, right,
        "user_id", "user_id", "ts", "ts", Seq("r_id", "v"))
      .select(col("event_id"), col("r_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(200L), 2L -> Some(100L), 3L -> Some(100L),
      4L -> None, 5L -> None))
  }

  test("sessionize: gap starts a new session; ids are per-key sequential") {
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:10:00")),   // 10 min gap → same session
      (3L, 7L, ts("2024-01-01 11:00:00")),   // 50 min gap → new session
      (4L, 8L, ts("2024-01-01 10:00:00"))    // other key → its own session 1
    ).toDF("event_id", "user_id", "ts")
    val got = TemporalJoins.sessionize(df, "user_id", "ts", 1800L, "event_id")
      .select(col("event_id"), col("session_idx"), col("session_id"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((1L, "7#1")))
    assert(got(2L) === ((1L, "7#1")))
    assert(got(3L) === ((2L, "7#2")))
    assert(got(4L) === ((1L, "8#1")))
  }

  test("rangeJoin: inclusive lo, exclusive hi, broadcast dimension") {
    val fact = Seq((1L, 0.0), (2L, 49.999), (3L, 50.0), (4L, 150.0))
      .toDF("id", "value")
    val ranges = Seq(("a", 0.0, 50.0), ("b", 50.0, 150.0))
      .toDF("band", "lo", "hi")
    val got = TemporalJoins.rangeJoin(fact, ranges, "value", "lo", "hi")
      .select(col("id"), col("band")).as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "a", 3L -> "b"))  // 150.0 drops (hi exclusive)
  }

  test("rangeJoinBinned equals the naive inequality join; equi-plan only") {
    val rnd = new scala.util.Random(5)
    val fact = (1L to 800L).map(i => (i, rnd.nextDouble() * 100 - 50))
      .toDF("id", "value")
    val ranges = (1L to 300L).map { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (i, lo, lo + rnd.nextDouble() * 12) // spans 0..several bins of width 4
    }.toDF("range_id", "lo", "hi")
    val binned = TemporalJoins.rangeJoinBinned(fact, ranges,
        "value", "lo", "hi", binWidth = 4.0)
      .select(col("id"), col("range_id")).as[(Long, Long)].collect().toSet
    val naive = fact.join(ranges,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("id"), col("range_id")).as[(Long, Long)].collect().toSet
    assert(binned == naive && binned.nonEmpty)
    // no pair is emitted twice even when a range spans many bins
    val withDups = TemporalJoins.rangeJoinBinned(fact, ranges,
        "value", "lo", "hi", binWidth = 0.5)
      .select(col("id"), col("range_id")).as[(Long, Long)].collect()
    assert(withDups.length == withDups.toSet.size && withDups.toSet == naive)
    // the plan is an equi join on the bin key, never a nested loop
    val plan = TemporalJoins.rangeJoinBinned(fact, ranges,
        "value", "lo", "hi", 4.0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("rangeJoinBinnedAuto picks a data-derived width and matches the " +
    "naive join exactly (width invariance)") {
    val rnd = new scala.util.Random(9)
    val fact = (1L to 500L).map(i => (i, rnd.nextDouble() * 60 - 30))
      .toDF("id", "value")
    val ranges = (1L to 200L).map { i =>
      val lo = rnd.nextDouble() * 60 - 30
      (i, lo, lo + 2 + rnd.nextDouble() * 6)
    }.toDF("range_id", "lo", "hi")
    val auto = TemporalJoins.rangeJoinBinnedAuto(fact, ranges,
        "value", "lo", "hi")
      .select(col("id"), col("range_id")).as[(Long, Long)].collect()
    val naive = fact.join(ranges,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("id"), col("range_id")).as[(Long, Long)].collect().toSet
    assert(auto.length == auto.toSet.size, "auto width must not duplicate")
    assert(auto.toSet == naive && naive.nonEmpty)
  }

  test("rangeJoinBinned boundaries: lo inclusive, hi exclusive, negatives") {
    val fact = Seq((1L, -4.0), (2L, 0.0), (3L, 3.999), (4L, 4.0))
      .toDF("id", "value")
    val ranges = Seq((10L, -4.0, 4.0)).toDF("range_id", "lo", "hi")
    val got = TemporalJoins.rangeJoinBinned(fact, ranges,
        "value", "lo", "hi", binWidth = 4.0)
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L)) // 4.0 excluded at hi
  }
}
