package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Phase breakdown of the queue-transport redrive query (r15, verdict #4):
  * where do streaming_dlq_redrive's ~3.3 s go — stream starts, micro-batch
  * machinery, the per-batch double action, or the contract tail?
  *
  * Usage: tools/run.sh graft.tools.QueuePhaseProbe [reps]
  */
object QueuePhaseProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-38s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"== rep $rep")
      val qn = s"dlq-probe-${java.util.UUID.randomUUID()}"
      val poison = "7"
      (0 until 10).foreach(i => graft.pipeline.InMemoryQueue.queue(qn)
        .add(graft.pipeline.QueueMessage(i.toString, s"""{"v":$i}""")))
      val maxReceive = 3
      def consume(queue: String, out: String, cp: String,
          failOnPoison: Boolean, single: Boolean): Boolean = try {
        val sq = spark.readStream.format("graft-queue")
          .option("queue", queue)
          .option("maxReceiveCount", maxReceive.toString)
          .option("maxMessagesPerTrigger", "1")
          .load()
          .writeStream.option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            if (single) {
              val rows = b.collect()
              if (failOnPoison && rows.exists(_.getString(0) == poison))
                throw new RuntimeException("poison")
              if (rows.nonEmpty)
                spark.createDataFrame(
                  spark.sparkContext.parallelize(rows.toSeq, 1), b.schema)
                  .write.mode("append").parquet(out)
            } else {
              if (failOnPoison && b.filter(col("id") === poison).count() > 0)
                throw new RuntimeException("poison")
              b.write.mode("append").parquet(out)
            }
            ()
          }.start()
        sq.awaitTermination()
        true
      } catch { case _: Throwable => false }
      val out = Files.createTempDirectory("dlqp-out-").toString
      val cp = Files.createTempDirectory("dlqp-ckpt-").toString
      var runs = 1
      time("run 1 (7 ok batches + poison fail)") {
        consume(qn, out, cp, failOnPoison = true, single = false)
      }
      time("runs 2..n (poison-only retries + tail)") {
        while (!consume(qn, out, cp, failOnPoison = true, single = false) &&
          runs < 10) runs += 1
      }
      val dlqName = s"$qn-dlq"
      time("contract tail (reads + redrive run)") {
        val delivered = spark.read.parquet(out).localCheckpoint()
        val dlqSnap = spark.read.format("graft-queue")
          .option("queue", dlqName).load().localCheckpoint()
        val out2 = Files.createTempDirectory("dlqp-out2-").toString
        val cp2 = Files.createTempDirectory("dlqp-ckpt2-").toString
        consume(dlqName, out2, cp2, failOnPoison = false, single = false)
        val redriven = spark.read.parquet(out2).localCheckpoint()
        require(delivered.count() == 9L && dlqSnap.count() == 1L &&
          redriven.count() == 1L)
      }
      graft.pipeline.InMemoryQueue.clear(qn)
      graft.pipeline.InMemoryQueue.clear(dlqName)
    }
    spark.stop()
  }
}
