package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM growth arbiter for `tools/bench_guard.sh`: re-measures ONE
  * bench query at all three scale points in a JVM that has run nothing
  * else, so in-suite wall jitter (a neighbor query's leftover heap/block
  * state) can neither fake a super-linear flag red nor mask a real one
  * green. Prints one JSON line:
  * `{"query":name,"big":s,"small":s,"tiny":s,"steps":[r1,r2],"growth":r}`
  * where r1 = t(tiny->small), r2 = t(small->big) — each step is 10x rows,
  * so the fitted per-decade slope the guard applies its flag to is
  * sqrt(r1*r2).
  *
  * Usage: tools/run.sh graft.tools.IsolatedQueryProbe <query>
  *   [bigDir] [smallDir] [tinyDir] [reps]
  */
object IsolatedQueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: IsolatedQueryProbe <query> [big] [small] [tiny]"))
    val bigDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val smallDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val tinyDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val reps = args.lift(4).map(_.toInt).getOrElse(3)
    val fn = graft.SparkEntry.benchQueries.getOrElse(name,
      sys.error(s"unknown bench query: $name"))
    // same parallelism knob as Bench: the arbiter must measure under the
    // conditions of the suite it arbitrates
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // tiny-first warm-up: janino/first-read costs land outside the timers,
    // same as Bench's warm pass
    try fn(spark, tinyDir).count() catch { case _: Throwable => }
    def median(dir: String): Double = {
      val secs = (1 to reps).map { _ =>
        graft.operators.Caching.releaseAllRdds(spark, blocking = true)
        System.gc()
        val t0 = System.nanoTime()
        try fn(spark, dir).count() catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      math.max(secs(secs.size / 2), 1e-3)
    }
    val tiny = median(tinyDir)
    val small = median(smallDir)
    val big = median(bigDir)
    def j(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    val line = s"""{"query":"$name","big":${j(big)},"small":${j(small)},""" +
      s""""tiny":${j(tiny)},"steps":[${j(small / tiny)},${j(big / small)}],""" +
      s""""growth":${j(big / small)}}"""
    try spark.stop() catch { case _: Throwable => }
    println(line)
  }
}
