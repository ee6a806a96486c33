package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Queue → typed rows: the reference's consumer Lambda
  * (cmd/sqs-record-consumer/main.go:27-32) only logs the batch count; we keep
  * that behavior in `count` and add the obvious next step the stub left
  * unwritten — parsing bodies back into rows with `from_json`.
  */
object Consumer {

  /** Reference behavior: "Received SQS event" with len(event.Records). */
  def count(queueName: String): Int = InMemoryQueue.size(queueName)

  /** Drain the queue and parse each JSON body against `schema`. For the
    * in-memory test queue a driver-side drain is correct (the queue lives on
    * the driver); a cluster deployment reads the real queue as a streaming
    * source instead (see graft.streaming).
    */
  def consume(spark: SparkSession, queueName: String, schema: StructType): DataFrame = {
    import spark.implicits._
    val msgs = InMemoryQueue.drain(queueName)
    spark.createDataset(msgs.map(_.body))
      .select(from_json(col("value"), schema).as("r"))
      .select(col("r.*"))
  }
}
