package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.TemporalJoins

/** One-off decomposition of interval_join_binned's cost: quantile pass vs
  * join+agg at two widths, per scale dir.
  * Usage: tools/run.sh graft.tools.BinProbe
  */
object BinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val ev = t(spark, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("value"))
      val ranges = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("range_id"), col("value").as("lo"),
          (col("value") + 2.0).as("hi"))
      def med(f: => Unit): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
      val tq = med {
        ranges.select((col("hi") - col("lo")).as("_len"))
          .stat.approxQuantile("_len", Array(0.5), 0.01)
      }
      def agg(w: Double): Unit =
        TemporalJoins.rangeJoinBinned(clicks, ranges, "value", "lo", "hi", w)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n"), min(col("range_id")).as("f"))
          .orderBy(col("event_id")).count()
      val t05 = med(agg(0.5))
      val t20 = med(agg(2.0))
      println(f"binprobe dir=$dir quantile=$tq%.2f agg_w0.5=$t05%.2f agg_w2.0=$t20%.2f")
    }
    spark.stop()
  }
}
