package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Where does the ~0.1–0.2 s/query tail floor go (r15, r14 verdict #8)?
  * Times the pieces a tail query pays in the shared bench session:
  * a no-op action, a parquet open (listing + footer schema), a 1-file
  * scan-count, and the bench's own inter-rep discipline (blocking release
  * + System.gc()).
  *
  * Usage: tools/run.sh graft.tools.SessionFloorProbe [sfDir] [reps]
  */
object SessionFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def med(label: String)(f: => Unit): Unit = {
      f // warm
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"  $label%-44s med ${xs(xs.size / 2)}%.4f  " +
        f"min ${xs.head}%.4f  max ${xs.last}%.4f")
    }
    med("spark.range(1).count")(spark.range(1).count())
    med("range agg (2-stage shuffle)") {
      spark.range(1000).groupBy(col("id") % 7).count().count()
    }
    med("read.parquet handle (list+schema only)") {
      spark.read.parquet(s"$sfDir/nation.parquet")
    }
    med("read.parquet(nation).count") {
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    }
    med("read.parquet(lineitem).filter.agg") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_quantity") > 40)
        .agg(count(lit(1))).head()
    }
    val pre = Tables.t(spark, sfDir, "nation")
    med("prebuilt handle count")(pre.count())
    med("System.gc() alone")(System.gc())
    med("releaseAllRdds(blocking) alone") {
      graft.operators.Caching.releaseAllRdds(spark, blocking = true)
    }
    med("bench inter-rep discipline + tiny query") {
      graft.operators.Caching.releaseAllRdds(spark, blocking = true)
      System.gc()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    }
    spark.stop()
  }
}
