package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of named queries (all
  * when none given) against a scale dir — the loop for checking pushdown,
  * pruning, broadcast choice, and codegen coverage per SURVEY.md's
  * 100 TB-posture checklist.
  *
  * Usage: tools/run.sh graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.drop(1).toSet
    // SPARK_GRAFT_EXPLAIN_TIMED=1 explains the BENCHED forms (timed
    // overrides applied) instead of the contract forms — the view the
    // r14 plan audit captures, since the bench times these plans.
    val base =
      if (sys.env.get("SPARK_GRAFT_EXPLAIN_TIMED").contains("1"))
        SparkEntry.benchQueries
      else SparkEntry.queries
    val selected =
      if (only.isEmpty) base
      else base.view.filterKeys(only).toMap
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] failed: $e") }
    }
    spark.stop()
  }
}
