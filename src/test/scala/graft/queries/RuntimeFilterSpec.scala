package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The 100 TB semi-join-reduction defense: when a selective dimension filter
  * feeds a shuffle join, Spark can build a bloom filter over the dim's join
  * keys at runtime and inject `might_contain` into the FACT side's scan
  * stage — fact rows that cannot match are dropped before the shuffle, which
  * is where a 100 TB join spends its time. This spec pins the configuration
  * that turns it on and proves the filter actually lands in the plan (the
  * thresholds default to cluster scale — 10 GiB application-side scan — so
  * local data needs them lowered to exercise the mechanism).
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected into the fact side of a dim join") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val fact = Tables.t(spark, sfDir, "lineitem")
      val dim = Tables.t(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val plan = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter injected:\n${plan.take(3000)}")
    }
  }

  test("bloom-filtered join returns the same rows as the plain join") {
    def run(): Long = {
      val fact = Tables.t(spark, sfDir, "lineitem")
      val dim = Tables.t(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    }
    var filtered = 0L
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      filtered = run()
    }
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      assert(run() == filtered)
    }
    assert(filtered > 0L)
  }
}
