package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join row-for-row") {
    val fact = t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = fact.join(dim, fact("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(fact, dim, "user_id", "c_custkey",
        col("event_id"), salts = 8)
      .select(col("event_id"), col("c_mktsegment"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty)
    assert(plain.exceptAll(salted).isEmpty)
  }

  test("a hot key's rows spread across salt buckets") {
    val fact = Seq.tabulate(800)(i => (i.toLong, 42L)).toDF("row_id", "key")
    val dim = Seq((42L, "hot")).toDF("key_d", "name")
    val salted = fact.withColumn("_salt", pmod(col("row_id"), lit(8)))
    assert(salted.select("_salt").distinct().count() === 8)
    val joined = Skew.saltedJoin(fact, dim, "key", "key_d", col("row_id"), 8)
    assert(joined.count() === 800L)
  }
}
