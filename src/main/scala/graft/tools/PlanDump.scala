package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named registered queries — the
  * .explain("formatted") audit loop without spinning up a REPL.
  *
  * Usage: tools/run.sh graft.tools.PlanDump <sfDir> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
