package graft.sources.v2

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RecordDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Long, seed: Long, partitions: Int) =
    spark.read.format("graft-records")
      .option("rows", rows).option("seed", seed)
      .option("partitions", partitions).load()

  test("produces exactly `rows` records with the full Record schema") {
    val df = read(500L, 7L, 8)
    assert(df.count() === 500L)
    assert(df.schema.fieldNames.toSeq === RecordGen.schema.fieldNames.toSeq)
    assert(df.select("address.city").distinct().count() > 1)
  }

  test("output is identical for any partitioning (deterministic per id)") {
    val a = read(300L, 9L, 1).orderBy("id").collect()
    val b = read(300L, 9L, 16).orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("different seeds produce different data") {
    val a = read(100L, 1L, 4).select("email").as[String].collect().toSet
    val b = read(100L, 2L, 4).select("email").as[String].collect().toSet
    assert(a !== b)
  }

  test("column pruning reaches the scan (generation skips unread fields)") {
    val df = read(100L, 3L, 4).select("email")
    val scan = df.queryExecution.executedPlan.toString
    // the V2 scan's read schema is pruned to the single requested column
    assert(scan.contains("graft-records"), scan.take(1500))
    assert(df.collect().forall(_.getString(0).contains("@")))
    val pruned = df.queryExecution.optimizedPlan.toString
    assert(!pruned.contains("body"), pruned.take(1500))
  }

  test("values stay inside the reference domains") {
    val df = read(200L, 5L, 4)
    val bad = df.filter(
      !col("account_type").isin(graft.model.Domains.accountTypes: _*) ||
      !col("language").isin(graft.model.Domains.languages: _*) ||
      col("account_balance") < 0.0 || col("account_balance") >= 10000.0 ||
      size(col("communication_preferences")) < 1 ||
      size(col("communication_preferences")) > 4 ||
      size(col("tags")) > 3 ||
      length(col("body")) =!= graft.model.Domains.bodyLength)
    assert(bad.isEmpty)
  }
}
