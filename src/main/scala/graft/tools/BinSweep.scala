package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.TemporalJoins

/** Bin-width sweep for the binned interval join (VERDICT r8 item 8): per
  * width, the candidate volume (equi-join rows before the residual filter),
  * the exact match count (width-invariant — the oracle check), and the
  * median wall time, across scale dirs. The growth-sensitive number is
  * candidates/match: explosion rows scale with 1/width, per-bin fan-in
  * with width, and the flat optimum sits near the median interval length.
  *
  * Usage: tools/run.sh graft.tools.BinSweep [sfDir ...]
  */
object BinSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val ev = t(spark, dir, "events").localCheckpoint()
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("value"))
      val ranges = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("range_id"), col("value").as("lo"),
          (col("value") + 2.0).as("hi"))
      for (w <- Seq(0.5, 1.0, 2.0, 4.0, 8.0, 16.0)) {
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          TemporalJoins.rangeJoinBinned(clicks, ranges, "value", "lo",
            "hi", binWidth = w).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        // candidate volume re-derived exactly (no listener needed here):
        // per-bin fact-count × range-count products
        val fb = clicks.select(floor(col("value") / w).cast("long")
          .as("_bin")).groupBy("_bin").count()
        val rb = ranges.select(explode(sequence(
            floor(col("lo") / w).cast("long"),
            floor(col("hi") / w).cast("long"))).as("_bin"))
          .groupBy("_bin").count()
        val cand = fb.as("f").join(rb.as("r"), "_bin")
          .agg(sum(col("f.count") * col("r.count"))).head().getLong(0)
        val matches = TemporalJoins.rangeJoinBinned(clicks, ranges,
          "value", "lo", "hi", binWidth = w).count()
        println(f"binsweep dir=$dir width=$w%.1f candidates=$cand " +
          f"matches=$matches sec=${secs(1)}%.2f")
      }
      graft.operators.Caching.releaseAllRdds(spark)
    }
    spark.stop()
  }
}
