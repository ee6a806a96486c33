package graft.queries

import java.math.BigDecimal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

/** The exactness claim behind `decimal_agg`: money-typed aggregation in
  * decimal is EXACT — no summation-order drift — which the oracle dump can
  * no longer show directly (both engines' outputs are cast to a common
  * double representation for hash stability; see ExtendedQueries).
  */
class DecimalAggSpec extends SparkSpec {

  private def prices = t(spark, sfDir, "orders")
    .select(col("o_totalprice").cast("decimal(18,2)").as("p"))

  test("decimal sum equals the driver-side BigDecimal sum, exactly") {
    val sparkSum = prices.agg(sum(col("p"))).head().getDecimal(0)
    val reference = prices.collect()
      .map(_.getDecimal(0))
      .foldLeft(BigDecimal.ZERO)(_.add(_))
    // compareTo, not equals: scale may differ (28,2 vs accumulated), value
    // must not — to the last cent
    assert(sparkSum.compareTo(reference) == 0,
      s"spark=$sparkSum reference=$reference")
  }

  test("decimal sum is invariant under partitioning (no order drift)") {
    val a = prices.agg(sum(col("p"))).head().getDecimal(0)
    val b = prices.repartition(97).agg(sum(col("p"))).head().getDecimal(0)
    val c = prices.coalesce(1).agg(sum(col("p"))).head().getDecimal(0)
    assert(a.compareTo(b) == 0 && a.compareTo(c) == 0)
  }

  test("double summation of the same column drifts from exact at the ulp level") {
    // demonstrates WHY the decimal path exists: double sums of the same
    // multiset under different groupings need not be bit-identical
    val exact = prices.agg(sum(col("p"))).head().getDecimal(0).doubleValue()
    val asDouble = prices.agg(sum(col("p").cast("double"))).head().getDouble(0)
    // they agree only to float tolerance, not exactly-by-construction
    assert(math.abs(exact - asDouble) / exact < 1e-9)
  }
}
