package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.pipeline.{InMemoryQueue, QueueMessage}

/** Queue → streaming source bridge: the consumer half of the reference's
  * architecture as a Structured Streaming SOURCE (the SQS event-source
  * mapping feeding the Lambda, template.yaml:82-86). Messages pumped from
  * the queue become micro-batch rows; downstream is any streaming transform
  * (`from_json` + windowing, `StreamConsumer`, …).
  *
  * Built on MemoryStream, which is the local stand-in with the same
  * semantics a real queue connector provides: at-least-once delivery into
  * micro-batches, arrival order preserved per poll. A cluster deployment
  * swaps this for a Kafka/Kinesis source; nothing downstream changes.
  */
class QueueStream(spark: SparkSession, queueName: String) {

  private implicit val enc: Encoder[QueueMessage] = Encoders.product[QueueMessage]
  private val ms = MemoryStream[QueueMessage](spark)

  /** The unbounded message stream. */
  def stream: Dataset[QueueMessage] = ms.toDS()

  /** Drain everything currently queued into the stream as one addition
    * (= one poll of the transport). Returns the number of messages pumped.
    */
  def pump(): Int = {
    val msgs = InMemoryQueue.drain(queueName)
    if (msgs.nonEmpty) ms.addData(msgs)
    msgs.size
  }
}
