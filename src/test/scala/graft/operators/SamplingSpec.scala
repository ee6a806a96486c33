package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("sample is deterministic and partition-invariant") {
    val a = Sampling.sample(ids, "id", 0.3, "s1").collect().map(_.getLong(0)).sorted
    val b = Sampling.sample(ids.repartition(13), "id", 0.3, "s1")
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("sampled fraction tracks the rate (md5 prefix is uniform)") {
    for (rate <- Seq(0.1, 0.5, 0.9)) {
      val n = Sampling.sample(ids, "id", rate).count()
      val frac = n.toDouble / 20000
      assert(math.abs(frac - rate) < 0.02, s"rate=$rate got $frac")
    }
  }

  test("samples are coordinated: lower rate is a subset of higher rate") {
    val lo = Sampling.sample(ids, "id", 0.2, "s2")
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.sample(ids, "id", 0.5, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
    assert(lo.nonEmpty && hi.size > lo.size)
  }

  test("edge rates: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.sample(ids, "id", 0.0).isEmpty)
    assert(Sampling.sample(ids, "id", 1.0).count() == 20000)
  }

  test("stratified rates apply per stratum") {
    val df = ids.withColumn("grp",
      when(col("id") % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedSample(df, "id", "grp",
        Map("even" -> 0.8), defaultRate = 0.1, salt = "s3")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("even") / 10000.0 - 0.8) < 0.03)
    assert(math.abs(got("odd") / 10000.0 - 0.1) < 0.03)
  }

  test("thresholdHex: always 4 hex chars, monotone, clamped at the top") {
    val rates = ((0 to 1000).map(_ / 1000.0) ++
      Seq(0.9999, 0.99999, 0.999999, 1.0 - 1e-12)).sorted
    val hexes = rates.map(Sampling.thresholdHex)
    assert(hexes.forall(_.length == 4), "5-digit threshold would break the " +
      "lexicographic compare")
    assert(hexes == hexes.sorted, "threshold must be monotone in rate")
    // the near-1.0 band must keep ~everything, not collapse to prefix<'10000'
    val n = Sampling.sample(ids, "id", 1.0 - 1e-9).count()
    assert(n >= 19990, s"near-1.0 rate kept only $n of 20000")
  }

  test("sampling is a scan-side filter (no shuffle, no rand)") {
    val plan = Sampling.sample(ids, "id", 0.5).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("rand"), plan)
  }
}
