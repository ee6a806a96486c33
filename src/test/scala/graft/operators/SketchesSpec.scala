package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups with known cardinalities (values overlap across batches so the
  // merge must union, not add)
  private def rows(lo: Long, hi: Long) =
    (lo until hi).flatMap(v => Seq(("a", v), ("b", v % 500), ("c", v % 20)))

  test("snapshot + batch merge estimates the union, not the sum") {
    val snap = rows(0L, 3000L).toDF("g", "v")
    val batch = rows(2000L, 5000L).toDF("g", "v") // 1000 values re-seen
    val snapshot = Sketches.hllByGroup(snap, "g", "v")
    val (_, est) = Sketches.hllIncremental(snapshot, batch, "g", "v")
    val got = est.as[(String, Long)].collect().toMap
    // exact unions: a = 5000, b = 500, c = 20; HLL err ≈ 1.6% at lgK=12.
    // b (500 distinct) is past SET-mode promotion, so its union-built
    // estimate uses the composite estimator — envelope, not equality.
    assert(math.abs(got("a") - 5000L) <= 250, s"a=${got("a")}")
    assert(math.abs(got("b") - 500L) <= 25, s"b=${got("b")}")
    assert(got("c") === 20L) // LIST/SET-mode small groups stay exact
  }

  test("incremental merge lands in the error envelope of the exact union") {
    // Estimates are NOT equal across merge trees (stream-built sketches use
    // the HIP estimator, union-built the composite estimator — see the
    // Sketches scaladoc), so assert both paths against the exact unions.
    val all = rows(0L, 5000L).toDF("g", "v")
    val snapshot =
      Sketches.hllByGroup(all.filter(col("v") < 2500), "g", "v")
    val (_, inc) =
      Sketches.hllIncremental(snapshot, all.filter(col("v") >= 2500), "g", "v")
    val full = Sketches.hllEstimates(Sketches.hllByGroup(all, "g", "v"), "g")
    val exact = Map("a" -> 5000L, "b" -> 500L, "c" -> 20L)
    for (est <- Seq(inc, full); (g, n) <- est.as[(String, Long)].collect()) {
      val want = exact(g)
      assert(math.abs(n - want) <= math.max(1L, (want * 0.05).toLong),
        s"$g=$n, exact=$want")
    }
  }

  test("groups present in only one side pass through the merge") {
    val snapshot = Sketches.hllByGroup(Seq(("x", 1L), ("x", 2L)).toDF("g", "v"),
      "g", "v")
    val batchSk = Sketches.hllByGroup(Seq(("y", 9L)).toDF("g", "v"), "g", "v")
    val merged = Sketches.hllMergeSnapshots(snapshot, batchSk, "g")
    val got = Sketches.hllEstimates(merged, "g")
      .as[(String, Long)].collect().toMap
    assert(got === Map("x" -> 2L, "y" -> 1L))
  }

  // KLL: two groups over known uniform ranges, split across snapshot+batch
  // with overlap so a sum-not-union style bug would distort ranks.
  private def kllRows(lo: Long, hi: Long) =
    (lo until hi).flatMap(v => Seq(("a", v.toDouble), ("b", (v % 100).toDouble)))

  test("KLL merged quantiles land in the rank-error envelope; n is exact") {
    val all = kllRows(0L, 4000L).toDF("g", "v")
    val snapshot = Sketches.kllByGroup(all.filter(col("v") < 2000), "g", "v")
    val (_, quant) = Sketches.kllIncremental(snapshot,
      all.filter(col("v") >= 2000), "g", "v", Seq(0.1, 0.5, 0.9))
    val got = quant.as[(String, Double, Double, Long)].collect()
    assert(got.forall(_._4 == 4000L), "merged getN must be exact (counts add)")
    // group a is uniform on [0, 4000): exact q-quantile ≈ 4000q; KLL rank
    // error at k=200 is ~1.65%, so values must land within ±4% of rank
    for ((g, q, v, _) <- got) {
      val (range, offset) = if (g == "a") (4000.0, 0.0) else (100.0, 0.0)
      val exact = offset + range * q
      assert(math.abs(v - exact) <= range * 0.04,
        s"$g q=$q: got $v, exact ≈ $exact")
    }
  }

  test("theta set algebra is exact below nominal entries") {
    // a = {0..999}, b = {500..1499}: below 2^12 nominal entries a theta
    // sketch samples nothing, so every estimate is exactly right
    val df = ((0 until 1000).map(v => ("a", v.toString)) ++
      (500 until 1500).map(v => ("b", v.toString))).toDF("g", "v")
    val sk = Sketches.thetaByGroup(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("theta")).toMap
    assert(Sketches.thetaEstimate(sk("a")) === 1000.0)
    assert(Sketches.thetaEstimate(sk("b")) === 1000.0)
    assert(Sketches.thetaUnionEstimate(sk("a"), sk("b")) === 1500.0)
    assert(Sketches.thetaIntersectEstimate(sk("a"), sk("b")) === 500.0)
    assert(Sketches.thetaANotBEstimate(sk("a"), sk("b")) === 500.0)
  }

  test("theta lgK above the default survives shuffled merges uncapped") {
    // 20k distinct values at lgK=16 stay below 2^16 nominal entries, so the
    // sketch is in EXACT mode everywhere — unless some merge hop rebuilds
    // its union at the 2^12 default, which would downsample and break the
    // exact count. repartition(8) forces serialized buffer merges.
    val df = (0 until 20000).map(v => ("g", v.toString)).toDF("g", "v")
      .repartition(8)
    val sk = Sketches.thetaByGroup(df, "g", "v", lgK = 16)
    val merged = Sketches.thetaMergeSnapshots(sk, sk, "g", lgK = 16)
      .collect().map(r => r.getAs[Array[Byte]]("theta")).head
    assert(Sketches.thetaEstimate(merged) === 20000.0)
    // the driver-side union helper must not downsample them either: the
    // default auto-sizes to the inputs instead of a fixed 2^12 cap
    assert(Sketches.thetaUnionEstimate(merged, merged) === 20000.0)
  }

  test("theta snapshot merge unions, not adds; single-side groups pass") {
    val snap = Sketches.thetaByGroup(
      (0 until 800).map(v => ("x", v.toString)).toDF("g", "v"), "g", "v")
    val batch = Sketches.thetaByGroup(
      ((400 until 1200).map(v => ("x", v.toString)) :+ ("y", "solo"))
        .toDF("g", "v"), "g", "v")
    val merged = Sketches.thetaMergeSnapshots(snap, batch, "g").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("theta")).toMap
    assert(Sketches.thetaEstimate(merged("x")) === 1200.0) // union, exact
    assert(Sketches.thetaEstimate(merged("y")) === 1.0)
  }

  test("KLL groups present in only one side pass through the merge") {
    val snap = Sketches.kllByGroup(
      Seq(("x", 1.0), ("x", 2.0)).toDF("g", "v"), "g", "v")
    val batch = Sketches.kllByGroup(Seq(("y", 9.0)).toDF("g", "v"), "g", "v")
    val got = Sketches.kllQuantiles(
        Sketches.kllMergeSnapshots(snap, batch, "g"), "g", Seq(0.5))
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got("x")._2 == 2L && got("y")._2 == 1L)
    assert(got("y")._1 == 9.0, "a 1-value sketch answers exactly")
  }

  test("frequent-items guarantees hold with active purging") {
    // 2000 distinct rare items + two heavy hitters, maxMapSize 8 — the
    // sketch is purging constantly, so the bounds/no-false-negative
    // guarantees are doing real work here
    val rows = (1 to 2000).map(i => ("g", s"rare$i")) ++
      Seq.fill(900)(("g", "heavy1")) ++ Seq.fill(500)(("g", "heavy2"))
    val df = rows.toDF("g", "v")
    val items = Sketches.fiFrequentItems(
        Sketches.fiByGroup(df, "g", "v", maxMapSize = 8), "g")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    val byItem = items.map(r => r._2 -> r).toMap
    // both heavy hitters exceed max error (3400 * 3.5/8 bound is loose;
    // the sketch's own getMaximumError is what the guarantee quotes)
    val maxErr = items.head._7
    assert(900 > maxErr && byItem.contains("heavy1"),
      s"heavy1 must be returned (maxErr=$maxErr)")
    // bounds bracket the exact counts for the heavies
    assert(byItem("heavy1")._4 <= 900L && 900L <= byItem("heavy1")._5)
    if (byItem.contains("heavy2"))
      assert(byItem("heavy2")._4 <= 500L && 500L <= byItem("heavy2")._5)
    assert(items.head._6 == 3400L, "stream length is exact")
  }

  test("frequent-items sketches merge and empty groups don't crash") {
    val a = Seq(("g", "x"), ("g", "x"), ("g", "y")).toDF("g", "v")
    val b = Seq(("g", "x"), ("h", "z")).toDF("g", "v")
    val merged = Sketches.fiMergeSnapshots(
      Sketches.fiByGroup(a, "g", "v", maxMapSize = 8),
      Sketches.fiByGroup(b, "g", "v", maxMapSize = 8), "g",
      maxMapSize = 8)
    val got = Sketches.fiFrequentItems(merged, "g")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // below maxMapSize the sketch is exact: merged counts add
    assert(got(("g", "x")) == 3L && got(("g", "y")) == 1L &&
      got(("h", "z")) == 1L)
  }

  test("KLL groups with all-NULL values surface with n=0, not dropped") {
    val df = Seq(("x", Some(1.0)), ("x", Some(2.0)),
      ("z", Option.empty[Double]), ("z", Option.empty[Double]))
      .toDF("g", "v")
    val got = Sketches.kllQuantiles(
        Sketches.kllByGroup(df, "g", "v"), "g", Seq(0.5))
      .as[(String, Option[Double], Option[Double], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("x")._4 == 2L && got("x")._3.isDefined)
    assert(got.contains("z"), "empty-sketch group must not vanish")
    assert(got("z")._4 == 0L && got("z")._2.isEmpty && got("z")._3.isEmpty)
  }
}
