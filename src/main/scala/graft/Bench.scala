package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional args restrict the run to the named queries (local iteration).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // Warm-up pass at the smallest scale factor: JVM/codegen/first-read costs
    // land here instead of inflating whichever timed query happens to run
    // first (janino compilation of a cold operator costs seconds).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    selected.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => }
    }
    // Drop warm-up caches (dedup/similarity operators persist intermediate
    // frames): timed queries rebuild their own, and the heap starts clean.
    spark.catalog.clearCache()
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      name -> (((System.nanoTime() - t0) / 1e9, rows))
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rows = results.map { case (k, (_, r)) => s"\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val nQueries = results.size
    // Full per-query detail goes to a stable file; stdout gets a COMPACT
    // final line only. The driver parses the last line of a bounded stdout
    // tail window — the full 87-query map is ~4 KB and lands mid-line in
    // that window, so the parseable contract line must stay short.
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"sf":"$sfDir"}"""
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":$nQueries,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full)
    catch { case _: Throwable => }
    // stop() is guarded so the contract line always prints, and printing
    // after stop() keeps it the LAST stdout line even if shutdown logs.
    try spark.stop() catch { case _: Throwable => }
    println(compact)
  }
}
