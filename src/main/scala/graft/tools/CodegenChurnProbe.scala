package graft.tools

import org.apache.spark.sql.SparkSession

/** Root-cause probe for the jaccard_prefix_join rep-1 outlier (r12
  * verdict #3): hypothesis — Spark's whole-stage-codegen class cache is a
  * bounded LRU, and the ~80 queries that run between Bench's warm pass
  * and jaccard's sorted-order turn EVICT its compiled classes, so rep 1
  * re-pays janino compilation that reps 2–3 (and any isolated probe)
  * never see.
  *
  * Protocol: warm the query at the tiny and timed dirs (exactly Bench's
  * two warm passes), optionally CHURN the codegen cache by running N
  * other bench queries once at the tiny dir, then time 3 clean-heap reps
  * at the timed dir recording the per-rep compilation count and
  * generated-bytecode delta from `CodegenMetrics`. churn=0 reproduces
  * the isolated probe; churn=60 reproduces the in-suite position.
  *
  * Usage: tools/run.sh graft.tools.CodegenChurnProbe [query] [churnN]
  *   [bigDir] [warmDir]
  */
object CodegenChurnProbe {
  def main(args: Array[String]): Unit = {
    val name = args.lift(0).getOrElse("jaccard_prefix_join")
    val churnN = args.lift(1).map(_.toInt).getOrElse(60)
    val big = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val warm = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.metrics.source.CodegenMetrics._
    def nCompiles = METRIC_COMPILATION_TIME.getCount
    def nBytes = METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount
    val fn = graft.SparkEntry.benchQueries(name)
    fn(spark, warm).count() // Bench's tiny warm pass
    fn(spark, big).count() // Bench's timed-dir pre-build pass
    val churned = graft.SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filterNot(_._1 == name).take(churnN)
    churned.foreach { case (_, f) =>
      try f(spark, warm).count() catch { case _: Throwable => }
    }
    graft.operators.Caching.releaseAllRdds(spark, blocking = true)
    val reps = (1 to 3).map { i =>
      graft.operators.Caching.releaseAllRdds(spark, blocking = true)
      System.gc()
      val (c0, b0) = (nCompiles, nBytes)
      val t0 = System.nanoTime()
      try fn(spark, big).count() catch { case _: Throwable => }
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"rep":$i,"sec":${String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(sec))},"compiles":${nCompiles - c0},""" +
        s""""classes":${nBytes - b0}}"""
    }
    try spark.stop() catch { case _: Throwable => }
    println(s"""{"query":"$name","churn":$churnN,"reps":[${
      reps.mkString(",")}]}""")
  }
}
