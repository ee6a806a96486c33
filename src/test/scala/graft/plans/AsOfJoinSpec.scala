package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.TemporalJoins

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of equals the composed window form on real event data") {
    val ev = Tables.t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("p_event_id"))
    val native = AsOfJoin.asOf(clicks, purchases,
        "user_id", "user_id", "ts", "ts")
      .select(col("event_id"), col("p_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    val composed = TemporalJoins.asOfJoin(clicks, purchases,
        "user_id", "user_id", "ts", "ts", Seq("p_event_id"))
      .select(col("event_id"), col("p_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native.nonEmpty && native.values.exists(_.isDefined))
    assert(native == composed)
  }

  test("backward-inclusive semantics: ties match, later rows don't, " +
    "null keys and times never match") {
    val left = Seq(
      (1L, Some(1L), Some(ts("2024-01-01 10:00:00"))), // exact tie → match
      (2L, Some(1L), Some(ts("2024-01-01 09:00:00"))), // before all → null
      (3L, Some(2L), Some(ts("2024-01-01 12:00:00"))), // latest prior wins
      (4L, Some(9L), Some(ts("2024-01-01 12:00:00"))), // keyless right → null
      (5L, None,     Some(ts("2024-01-01 12:00:00"))), // null key → null
      (6L, Some(1L), None)                             // null time → null
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "a"),
      (Some(2L), Some(ts("2024-01-01 10:00:00")), "b"),
      (Some(2L), Some(ts("2024-01-01 11:00:00")), "c"),
      (Some(2L), Some(ts("2024-01-01 13:00:00")), "d"), // after left → no
      (None,     Some(ts("2024-01-01 00:00:00")), "x"), // null right key
      (Some(9L), None,                             "y") // null right time
    ).toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "k", "t", "t")
      .select(col("id"), col("v")).as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(1L -> Some("a"), 2L -> None, 3L -> Some("c"),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("plan: AsOfJoinExec with one exchange per side, no union, no window") {
    val ev = Tables.t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val df = AsOfJoin.asOf(clicks, purchases, "user_id", "user_id", "ts", "ts")
    df.collect() // materialize through AQE so the final plan is real
    // audit the FINAL adaptive plan only (the string repeats the initial
    // plan below it, which would double-count the exchanges)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Union"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("result is partition-invariant") {
    val left = (1L to 500L).map(i => (i, i % 7, i % 50)).toDF("id", "k", "t")
    val right = (1L to 200L).map(i => (i % 7, i % 40, s"v$i"))
      .toDF("k", "t", "v")
      .groupBy("k", "t").agg(max(col("v")).as("v")) // unique per (k, t)
    val a = AsOfJoin.asOf(left, right, "k", "k", "t", "t")
      .select(col("id"), col("v")).as[(Long, Option[String])].collect().toSet
    val b = AsOfJoin.asOf(left.repartition(13), right.repartition(3),
        "k", "k", "t", "t")
      .select(col("id"), col("v")).as[(Long, Option[String])].collect().toSet
    assert(a == b && a.size == 500)
  }

  test("forward direction: earliest at-or-after right row, ties inclusive") {
    val left = Seq(
      (1L, 1L, 10L), // tie at 10 → matches "a", not the later "b"
      (2L, 1L, 11L), // next after 11 is "b"
      (3L, 1L, 99L), // nothing after → null
      (4L, 2L, 5L)   // key absent on right → null
    ).toDF("id", "k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (3L, 1L, "z"))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "k", "t", "t", forward = true)
      .select(col("id"), col("v")).as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None,
      4L -> None))
  }

  test("forward equals backward under time negation") {
    val left = (1L to 400L).map(i => (i, i % 7, i % 50)).toDF("id", "k", "t")
    val right = (1L to 150L).map(i => (i % 7, i % 40, s"v$i"))
      .toDF("k", "t", "v")
      .groupBy("k", "t").agg(max(col("v")).as("v"))
    val fwd = AsOfJoin.asOf(left, right, "k", "k", "t", "t", forward = true)
      .select(col("id"), col("v")).as[(Long, Option[String])].collect().toSet
    val neg = AsOfJoin.asOf(
        left.withColumn("t", -col("t")), right.withColumn("t", -col("t")),
        "k", "k", "t", "t")
      .select(col("id"), col("v")).as[(Long, Option[String])].collect().toSet
    assert(fwd == neg && fwd.size == 400)
  }

  test("pruning rule narrows the node and children; scans drop unused cols") {
    val ev = Tables.t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"), col("props").as("p_props"))
    val wide = AsOfJoin.asOf(clicks, purchases,
      "user_id", "p_user", "ts", "p_ts")
    val narrow = wide.select(col("event_id"), col("p_value"))
    val aj = narrow.queryExecution.optimizedPlan.collect {
      case a: AsOfJoinPlan => a
    }.head
    // survivors: event_id + the two merge columns per side + p_value
    assert(aj.output.map(_.name).sorted ==
      Seq("event_id", "p_ts", "p_user", "p_value", "ts", "user_id"),
      aj.output.mkString(","))
    assert(aj.left.output.size == 3 && aj.right.output.size == 3)
    // the dropped wide columns never reach the exchanges or the scans
    val plan = narrow.queryExecution.executedPlan.toString
    assert(!plan.contains("props"), plan)
    // and the narrowed result is exactly the wide result's projection
    val got = narrow.as[(Long, Option[Double])].collect().toSet
    assert(got == wide.collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Double]("p_value")).map(_.doubleValue)))
      .toSet)
  }

  test("output partitioning is advertised: downstream groupBy(key) " +
    "reuses the join's clustering instead of re-shuffling") {
    val left = (1L to 300L).map(i => (i, i % 7, i % 50)).toDF("id", "k", "t")
    val right = (1L to 100L).map(i => (i % 7, i % 40, i))
      .toDF("rk", "rt", "rid")
      .groupBy("rk", "rt").agg(max(col("rid")).as("rid"))
    val agg = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt")
      .groupBy(col("k")).agg(count(col("rid")).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // nothing between the aggregate and the join re-shuffles: the agg
    // consumes the advertised HashPartitioning on the output attr (tree
    // text above the AsOfJoin line = operators downstream of it)
    val aboveJoin = plan.substring(0, plan.indexOf("AsOfJoin"))
    assert(aboveJoin.contains("HashAggregate"), plan)
    assert(!aboveJoin.contains("Exchange"), plan)
  }

  test("whole-stage codegen: compiles (no silent fallback) and matches the " +
    "interpreted path, both directions") {
    def confed[T](pairs: (String, String)*)(body: => T): T = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val left = (1L to 500L).map(i => (i, i % 7, i % 50)).toDF("id", "k", "t")
    val right = (1L to 200L).map(i => (i % 7, i % 40, s"v$i"))
      .toDF("k", "t", "v")
      .groupBy("k", "t").agg(max(col("v")).as("v"))
    for (fwd <- Seq(false, true)) {
      val df = AsOfJoin.asOf(left, right, "k", "k", "t", "t", forward = fwd)
        .select(col("id"), col("v"))
      // fallback=false turns a codegen compile failure into a hard error
      // instead of a quiet interpreted run — this is the no-regression pin.
      val gen = confed("spark.sql.codegen.fallback" -> "false") {
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(plan).isDefined, plan)
        df.as[(Long, Option[String])].collect().toSet
      }
      val interp = confed("spark.sql.codegen.wholeStage" -> "false") {
        df.as[(Long, Option[String])].collect().toSet
      }
      assert(gen == interp && gen.size == 500)
    }
  }

  test("codegen parity with object-typed (string) keys, both directions") {
    // The backward path's carried-key slots hold ev.value from the copied
    // rHead; for primitive keys that's a long, but UTF8String keys store a
    // reference into the copied row's buffer — this pins that the stored
    // value stays valid across iterator advances (nothing else exercises a
    // non-primitive key through codegen).
    def confed[T](pairs: (String, String)*)(body: => T): T = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val left = (1L to 500L).map(i => (i, s"key${i % 7}", i % 50))
      .toDF("id", "k", "t")
    val right = (1L to 200L).map(i => (s"key${i % 7}", i % 40, s"v$i"))
      .toDF("k", "t", "v")
      .groupBy("k", "t").agg(max(col("v")).as("v"))
    for (fwd <- Seq(false, true)) {
      val df = AsOfJoin.asOf(left, right, "k", "k", "t", "t", forward = fwd)
        .select(col("id"), col("v"))
      val gen = confed("spark.sql.codegen.fallback" -> "false") {
        df.as[(Long, Option[String])].collect().toSet
      }
      val interp = confed("spark.sql.codegen.wholeStage" -> "false") {
        df.as[(Long, Option[String])].collect().toSet
      }
      assert(gen == interp && gen.size == 500)
    }
  }

  test("codegen parity with a multi-column (string, long) key, both " +
    "directions, vs an independent window-form baseline") {
    // Exercises EVERY carried-key slot kind at once: slot 0 holds an
    // object (UTF8String reference into the copied row), slot 1 a
    // primitive — the grouped keyCmp walk and the carried-key copies must
    // agree with the interpreted path and with a plain window computation.
    def confed[T](pairs: (String, String)*)(body: => T): T = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val left = (1L to 600L).map(i => (i, s"g${i % 5}", i % 3, i % 60))
      .toDF("id", "ka", "kb", "t")
    val right = (1L to 300L).map(i => (s"g${i % 5}", i % 3, i % 45, s"v$i"))
      .toDF("ka", "kb", "t", "v")
      .groupBy("ka", "kb", "t").agg(max(col("v")).as("v"))
      .localCheckpoint()
    // independent baseline: union-tag + last() over a time window per
    // composite key (no AsOfJoinExec involved)
    val lTag = left.select(col("ka"), col("kb"), col("t"),
      col("id"), lit(null).cast("string").as("v"), lit(1).as("side"))
    val rTag = right.select(col("ka"), col("kb"), col("t"),
      lit(null).cast("long").as("id"), col("v"), lit(0).as("side"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ka"), col("kb"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Long.MinValue, 0)
    val baseline = lTag.unionByName(rTag)
      .withColumn("vv", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("id"), col("vv").as("v"))
      .as[(Long, Option[String])].collect().toSet
    for (fwd <- Seq(false, true)) {
      val df = AsOfJoin.asOfMulti(left, right, Seq("ka", "kb"),
          Seq("ka", "kb"), "t", "t", forward = fwd)
        .select(col("id"), col("v"))
      val gen = confed("spark.sql.codegen.fallback" -> "false") {
        df.as[(Long, Option[String])].collect().toSet
      }
      val interp = confed("spark.sql.codegen.wholeStage" -> "false") {
        df.as[(Long, Option[String])].collect().toSet
      }
      assert(gen == interp && gen.size == 600,
        s"codegen/interpreted divergence on composite key (forward=$fwd)")
      if (!fwd) assert(gen == baseline,
        "backward composite-key join must match the window-form baseline")
    }
  }

  test("limit in the codegen stage short-circuits (plan compiles with the " +
    "limit guard; result is a correct subset)") {
    val left = (1L to 10000L).map(i => (i, i % 7, i % 50)).toDF("id", "k", "t")
    val right = (1L to 200L).map(i => (i % 7, i % 40, s"v$i"))
      .toDF("k", "t", "v")
      .groupBy("k", "t").agg(max(col("v")).as("v"))
    val joined = AsOfJoin.asOf(left, right, "k", "k", "t", "t")
      .select(col("id"), col("v"))
    val full = joined.as[(Long, Option[String])].collect().toMap
    val limited = joined.limit(37).as[(Long, Option[String])].collect()
    assert(limited.length == 37)
    limited.foreach { case (id, v) => assert(full(id) == v) }
  }

  test("self-lineage inputs (both sides carved from one scan) stay sound") {
    val base = (1L to 100L).map(i => (i, i % 5, i)).toDF("id", "k", "t")
    val left = base.filter(col("id") % 2 === 0)
    val right = base.filter(col("id") % 2 === 1)
      .select(col("k"), col("t"), col("id").as("rid"))
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t")
    // every left row with t >= some odd id of the same k matches the
    // greatest such odd id <= t
    val got = out.select(col("id"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    val rights = (1L to 100L).filter(_ % 2 == 1).groupBy(_ % 5)
    val expect = (1L to 100L).filter(_ % 2 == 0).map { i =>
      i -> rights.getOrElse(i % 5, Seq.empty).filter(_ <= i)
        .sorted.lastOption
    }.toMap
    assert(got == expect)
  }
}
