package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump the formatted physical plan of named queries — the .explain
  * feedback loop for plan audits. Usage:
  *   tools/run.sh graft.tools.ExplainDump <sfDir> <query> [query ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // benchQueries swaps contract forms (which reduce to a literal row,
    // hiding the operator plan) for the plain operator invocation
    args.tail.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.benchQueries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
