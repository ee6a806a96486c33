package graft.pipeline

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import scala.jdk.CollectionConverters._

/** One message on the wire: record id + its JSON serialization.
  * Reference analog: an SQS `SendMessageBatchRequestEntry`
  * (cmd/parquetgo-record-processor/handler.go:60-69).
  */
case class QueueMessage(id: String, body: String)

/** Per-batch send outcome — ids that failed, mirroring SQS partial-failure
  * reporting (handler.go:89-97).
  */
case class BatchSendResult(failedIds: Seq[String])

/** Transport seam. The reference talks to SQS through a narrow client
  * interface (handler.go:39-46); we keep the same seam so tests use the
  * in-memory impl and a deployment swaps in an SQS/Kinesis client built
  * per-partition. `maxBatchSize` defaults to the AWS SendMessageBatch hard
  * limit of 10 (handler.go:23-26).
  */
trait QueueClient extends Serializable {
  def send(batch: Seq[QueueMessage]): BatchSendResult
  def maxBatchSize: Int = 10
}

/** JVM-local queue registry. In `local[n]` executors share the driver JVM, so
  * a static map gives tests a faithful queue; on a real cluster this class is
  * test-only and the `QueueClient` impl would hold a lazily-initialized SQS
  * client instead (never serialize live connections).
  */
object InMemoryQueue {
  private val queues =
    new ConcurrentHashMap[String, ConcurrentLinkedQueue[QueueMessage]]()
  // per-queue message receive counts — the SQS ApproximateReceiveCount
  // analog the streaming source's redrive policy is driven by
  private val receives =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Integer]]()

  def queue(name: String): ConcurrentLinkedQueue[QueueMessage] =
    queues.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[QueueMessage]())

  def size(name: String): Int = queue(name).size()

  def drain(name: String): Seq[QueueMessage] = {
    val q = queue(name)
    Iterator.continually(q.poll()).takeWhile(_ != null).toSeq
  }

  def clear(name: String): Unit = {
    queues.remove(name)
    receives.remove(name)
    dlqMoves.remove(name)
  }

  def all(name: String): Seq[QueueMessage] = queue(name).iterator().asScala.toSeq

  /** The [start, end) log slice, without materializing the whole queue
    * (the streaming source slices per micro-batch; copying the full log per
    * planning would make an N-message drain O(N²) driver work). Offsets
    * past Int.MaxValue fail loudly instead of wrapping.
    */
  def slice(name: String, start: Long, end: Long): Seq[QueueMessage] =
    queue(name).iterator().asScala
      .slice(Math.toIntExact(start), Math.toIntExact(end)).toSeq

  /** Record one receive of `id` on `name`; returns the new count. Counts
    * survive consumer restarts (process-lifetime), which is what lets a
    * redrive policy see "this message has failed delivery N times".
    */
  def incReceive(name: String, id: String): Int =
    receives.computeIfAbsent(name, _ => new ConcurrentHashMap[String, Integer]())
      .merge(id, Integer.valueOf(1),
        (a, b) => Integer.valueOf(a.intValue + b.intValue)).intValue

  def receiveCount(name: String, id: String): Int =
    Option(receives.get(name)).flatMap(m => Option(m.get(id)))
      .map(_.intValue).getOrElse(0)

  // (queue, id) pairs already moved to a DLQ — putIfAbsent makes the move
  // idempotent even when a scan executes several times for one batch
  private val dlqMoves =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, java.lang.Boolean]]()

  /** True exactly once per (name, id): the caller that wins performs the
    * dead-letter append; re-executions and retries see false.
    */
  def claimDlqMove(name: String, id: String): Boolean =
    dlqMoves.computeIfAbsent(name,
        _ => new ConcurrentHashMap[String, java.lang.Boolean]())
      .putIfAbsent(id, java.lang.Boolean.TRUE) == null
}

/** Accept-everything sink that never stores: the dry-run / throughput-
  * measurement client (compute cost of serialize+batch+send without queue
  * memory growth). Batch-size contract still enforced.
  */
class DiscardQueueClient extends QueueClient {
  override def send(batch: Seq[QueueMessage]): BatchSendResult = {
    require(batch.size <= maxBatchSize,
      s"batch of ${batch.size} exceeds maxBatchSize=$maxBatchSize")
    BatchSendResult(Seq.empty)
  }
}

/** In-memory client with deterministic fault injection: message ids in
  * `failFirstAttempts` fail until they have been attempted that many times
  * (exercises the retry path); ids in `poisonIds` always fail (exercises the
  * dead-letter path, reference redrive `maxReceiveCount: 5`,
  * template.yaml:10-12).
  */
class InMemoryQueueClient(
    queueName: String,
    failFirstAttempts: Map[String, Int] = Map.empty,
    poisonIds: Set[String] = Set.empty)
  extends QueueClient {

  private val attempts = new ConcurrentHashMap[String, Integer]()

  override def send(batch: Seq[QueueMessage]): BatchSendResult = {
    require(batch.size <= maxBatchSize,
      s"batch of ${batch.size} exceeds maxBatchSize=$maxBatchSize")
    val failed = batch.filter { m =>
      val n = attempts.merge(m.id, Integer.valueOf(1), (a, b) =>
        Integer.valueOf(a.intValue + b.intValue)).intValue
      poisonIds.contains(m.id) || n <= failFirstAttempts.getOrElse(m.id, 0)
    }
    val ok = batch.filterNot(m => failed.exists(_.id == m.id))
    ok.foreach(InMemoryQueue.queue(queueName).add)
    BatchSendResult(failed.map(_.id))
  }
}
