package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers flags the wild value, not the skewed mean's victims") {
    // group a: 9 values near 10 plus one at 1000. Mean/stddev would let
    // the 1000 inflate the threshold; MAD must still flag it and keep
    // the near-10 values unflagged.
    val df = ((1 to 9).map(i => (i.toLong, "a", 8L + (i % 5))) :+
      (10L, "a", 1000L)).toDF("id", "g", "v")
    val out = Robust.madOutliers(df, "g", col("v"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(10L), "the 1000 must be flagged")
    assert((1 to 9).forall(i => !out(i.toLong)), "inliers must not flag")
  }

  test("exact percentile interpolation: even count gives the .5 midpoint") {
    val df = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "a", 4L)).toDF("id", "g", "v")
    val med = Robust.madOutliers(df, "g", col("v"))
      .select("med").head().getDouble(0)
    assert(med == 2.5)
  }

  test("both percentile windows share one group-key exchange") {
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 3}", i.toLong))
      .toDF("id", "g", "v")
    val plan = Robust.madOutliers(df, "g", col("v"))
      .queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex == 1, s"expected one group-key exchange, got $ex:\n" +
      plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan)
  }
}
