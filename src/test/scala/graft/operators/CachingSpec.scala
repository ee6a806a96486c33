package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Block-manager hygiene: the combinators in [[Caching]] must leave no
  * net-new persistent RDDs behind — including localCheckpoint blocks, which
  * `spark.catalog.clearCache()` does not reach.
  */
class CachingSpec extends SparkSpec {

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("withReleased frees blocks created inside the scope, keeps prior ones") {
    import spark.implicits._
    val outer = Seq(1, 2, 3).toDF("x").persist()
    outer.count() // materialize the pre-existing cache
    val before = persistentIds
    val result = Caching.withReleased(spark) {
      // an operator that checkpoints its result (materializeThenRelease
      // shape) plus an extra persist — both must be released on exit
      val mid = Seq(4, 5, 6).toDF("y").persist()
      val out = Caching.materializeThenRelease(
        mid.agg(sum(col("y")).as("s")), mid)
      out.collect().map(_.getLong(0)).sum
    }
    assert(result == 15L)
    assert(persistentIds == before,
      s"net-new persistent RDDs leaked: ${persistentIds -- before}")
    assert(outer.count() == 3) // the pre-existing cache still works
    outer.unpersist(blocking = true)
  }

  test("withReleased releases on exception too") {
    import spark.implicits._
    val before = persistentIds
    intercept[RuntimeException] {
      Caching.withReleased(spark) {
        val df = Seq(1).toDF("x").persist()
        df.count()
        throw new RuntimeException("boom")
      }
    }
    assert(persistentIds == before)
  }
}
