package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Does an eager localCheckpoint() fire Observation metrics? If yes, the
  * clustersStar convergence witness can ride the round's materializing
  * checkpoint instead of costing its own action per round (r15).
  */
object ObserveCheckpointProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("probe")
    val df = spark.range(1000)
      .observe(obs, count(lit(1)).as("n"), sum(col("id")).as("s"))
      .localCheckpoint()
    // bounded get: a timeout means the checkpoint did NOT fire it
    def tryGet(label: String): Unit = {
      val fut = scala.concurrent.Future(obs.get)(
        scala.concurrent.ExecutionContext.global)
      try {
        val m = scala.concurrent.Await.result(fut,
          scala.concurrent.duration.Duration(3, "s"))
        println(s"$label: $m")
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          println(s"$label: NOT OBSERVED (timeout)")
      }
    }
    tryGet("after eager checkpoint")
    df.count()
    tryGet("after count")
    spark.stop()
  }
}
