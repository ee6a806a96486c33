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
}
