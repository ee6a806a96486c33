package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Micro-batch consumer — reference behavior is exactly "log the batch size"
  * (cmd/sqs-record-consumer/main.go:27-32; batch delivery via the SQS
  * event-source mapping, template.yaml:82-86). `onBatch` receives
  * (batchId, rowCount); the default just logs, like the Lambda stub.
  */
object StreamConsumer {

  def start(
      stream: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onBatch: (Long, Long) => Unit = (id, n) =>
        println(s"Received batch id=$id count=$n")): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) => onBatch(id, df.count()); () }
      .start()
}
