package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Domains

class DataGeneratorSpec extends SparkSpec {
  import spark.implicits._

  lazy val ds = DataGenerator.generate(spark, 500L, seed = 7L).cache()

  test("generates exactly n rows with unique ids") {
    assert(ds.count() === 500L)
    assert(ds.select("id").distinct().count() === 500L)
  }

  test("value domains match the reference generator") {
    val rows = ds.collect()
    assert(rows.forall(r => Domains.accountTypes.contains(r.account_type)))
    assert(rows.forall(r => Domains.accountStatuses.contains(r.account_status)))
    assert(rows.forall(r => Domains.languages.contains(r.language)))
    assert(rows.forall(_.id.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(rows.forall(_.email.matches("[a-z]+\\.[a-z]+@[a-z.]+")))
    assert(rows.forall(_.phone_number.matches("\\+1-\\d{3}-\\d{3}-\\d{4}")))
    assert(rows.forall(_.date_of_birth.matches("\\d{4}-\\d{2}-\\d{2}")))
    assert(rows.forall(r => r.account_balance >= 0.0 && r.account_balance < 10000.0))
    assert(rows.forall(r =>
      r.communication_preferences.nonEmpty && r.communication_preferences.size <= 4))
    assert(rows.forall(r => r.tags.size <= 3))
    assert(rows.forall(_.body.length === Domains.bodyLength))
    assert(rows.forall(_.body.forall(Domains.bodyCharset.contains(_))))
  }

  test("deterministic: same seed+n gives identical rows, regardless of partitioning") {
    val again = DataGenerator.generate(spark, 500L, seed = 7L, numPartitions = 13)
    assert(ds.exceptAll(again).isEmpty && again.exceptAll(ds).isEmpty)
  }

  test("different seed gives different data") {
    val other = DataGenerator.generate(spark, 500L, seed = 8L)
    assert(ds.select("id").exceptAll(other.select("id")).count() === 500L)
  }

  test("size-targeted writer stops at the target and rows survive round-trip") {
    val out = tmpDir("gensized")
    val rows = DataGenerator.writeSized(spark, out, targetBytes = 64 * 1024L,
      batchRows = 1000L, seed = 3L)
    val back = spark.read.parquet(out)
    assert(back.count() === rows)
    // nested struct + arrays survive the parquet round-trip
    assert(back.select("address.city").distinct().count() > 1)
    assert(back.select(explode(col("communication_preferences"))).count() >= rows)
  }
}
