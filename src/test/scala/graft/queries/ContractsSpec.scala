package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The contract primitives themselves — the round's hard signal rides on
  * them, so their failure modes get direct tests.
  */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  test("forAll: NULL-evaluating rows fail the invariant (no bool_and skip)") {
    val df = Seq(Some(1), Some(2), None).toDF("v")
    // v > 0 is NULL on the null row — must NOT pass
    assert(!Contracts.forAll(df, col("v") > 0))
    assert(Contracts.forAll(df.na.drop(), col("v") > 0))
    assert(!Contracts.forAll(spark.emptyDataFrame.withColumn("v", lit(1)),
      col("v") > 0))
  }

  test("checksum: order-insensitive, but multiset-sensitive") {
    val base = spark.range(0, 1000).toDF("id")
      .withColumn("s", md5(col("id").cast("string")))
    val a = Contracts.checksum(base)
    // row order / partitioning must not matter
    assert(a == Contracts.checksum(base.repartition(13)))
    assert(a == Contracts.checksum(base.orderBy(col("id").desc)))
    // an EVEN number of duplicated rows must still change it (XOR alone
    // would cancel) — the exact bug class the sum/count mix exists for
    val dupTwice = base.union(base.limit(1)).union(base.limit(1))
    assert(a != Contracts.checksum(dupTwice))
    // and any single-row change must change it
    assert(a != Contracts.checksum(base.filter(col("id") =!= 500)))
  }

  test("ranksWellFormed rejects gaps, duplicates, and overruns") {
    def f(rows: (Long, Long)*) = rows.toDF("qid", "rank")
    assert(Contracts.ranksWellFormed(f(1L -> 1L, 1L -> 2L, 2L -> 1L),
      "qid", "rank", 5))
    assert(!Contracts.ranksWellFormed(f(1L -> 1L, 1L -> 3L), "qid", "rank", 5))
    assert(!Contracts.ranksWellFormed(f(1L -> 1L, 1L -> 1L), "qid", "rank", 5))
    assert(!Contracts.ranksWellFormed(f(1L -> 2L), "qid", "rank", 5))
    assert(!Contracts.ranksWellFormed(f(1L -> 1L, 1L -> 2L), "qid", "rank", 1))
  }

  test("sameKeys detects one-sided extras in either direction") {
    val a = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val b = Seq((1L, 2L)).toDF("id_a", "id_b")
    assert(Contracts.sameKeys(a, a, Seq("id_a", "id_b")))
    assert(!Contracts.sameKeys(a, b, Seq("id_a", "id_b")))
    assert(!Contracts.sameKeys(b, a, Seq("id_a", "id_b")))
  }
}
