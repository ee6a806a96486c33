package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators (SURVEY.md §2.10 — the reference has no UDAF
  * surface at all; these demonstrate the engine's extension point).
  *
  * Implemented as `Aggregator[IN, BUF, OUT]` (the typed, merge-friendly API):
  * partial aggregation happens map-side, the shuffle carries only the small
  * buffer, and `merge` makes the operator associative across partitions —
  * which is what lets it run as a two-phase agg at 100 TB instead of
  * collecting rows.
  */
object Aggregators {

  /** Geometric mean via sum-of-logs (numerically stable at any row count;
    * multiplying raw values would overflow/underflow at scale). Null/≤0
    * inputs are skipped, matching `exp(avg(ln(x)))` SQL semantics.
    */
  object GeoMean extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: java.lang.Double): (Double, Long) =
      if (x == null || x.doubleValue <= 0.0) b
      else (b._1 + math.log(x.doubleValue), b._2 + 1L)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): java.lang.Double =
      if (b._2 == 0L) null else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Register SQL-callable forms. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geo_mean", udaf(GeoMean))
  }
}
