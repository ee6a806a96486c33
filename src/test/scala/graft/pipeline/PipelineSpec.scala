package graft.pipeline

import org.apache.spark.sql.Encoders

import graft.SparkSpec
import graft.model.Record
import graft.sources.DataGenerator

/** End-to-end reference parity: generate → parquet → publish (JSON, batches
  * of ≤10, retry, partial failure) → consume (count + from_json round-trip).
  * SURVEY.md §7.1 item 6.
  */
class PipelineSpec extends SparkSpec {

  def freshData(n: Long, seed: Long): (String, Long) = {
    val dir = tmpDir("pipe")
    DataGenerator.generate(spark, n, seed).write.mode("overwrite").parquet(dir)
    (dir, n)
  }

  test("publish delivers every record exactly once on the happy path") {
    val (dir, n) = freshData(137L, 1L)
    InMemoryQueue.clear("q1")
    val res = Publisher.publish(spark,
      Publisher.PublishRequest(Seq(dir)), new InMemoryQueueClient("q1"))
    assert(res.publishedRows === n)
    assert(res.failedRows === 0L)
    assert(res.paths === Seq(dir))
    assert(Consumer.count("q1") === n)
    // no duplicate deliveries
    val ids = InMemoryQueue.all("q1").map(_.id)
    assert(ids.distinct.size === ids.size)
  }

  test("transient failures are retried; only poison messages dead-letter") {
    val (dir, n) = freshData(60L, 2L)
    InMemoryQueue.clear("q2")
    val someIds = spark.read.parquet(dir).select("id")
      .limit(5).collect().map(_.getString(0)).toSeq
    val transient = someIds.take(3).map(_ -> 2).toMap // fail twice, then ok
    val poison = someIds.drop(3).toSet                 // always fail
    val res = Publisher.publish(spark,
      Publisher.PublishRequest(Seq(dir)),
      new InMemoryQueueClient("q2", transient, poison), maxAttempts = 5)
    assert(res.publishedRows === n - poison.size)
    assert(res.failedRows === poison.size.toLong)
    assert(res.deadLetters.map(_.id).toSet === poison)
    assert(Consumer.count("q2") === n - poison.size)
  }

  test("consumed JSON parses back to the exact generated records") {
    val (dir, _) = freshData(50L, 3L)
    InMemoryQueue.clear("q3")
    Publisher.publish(spark,
      Publisher.PublishRequest(Seq(dir)), new InMemoryQueueClient("q3"))
    val schema = Encoders.product[Record].schema
    val back = Consumer.consume(spark, "q3", schema)
    val orig = spark.read.parquet(dir)
    assert(back.count() === 50L)
    // full-row equality both directions (timestamps, nested struct, arrays)
    assert(back.exceptAll(orig).isEmpty)
    assert(orig.exceptAll(back).isEmpty)
  }

  test("multi-path publish processes all paths (sequential-loop parity)") {
    val (dir1, _) = freshData(20L, 4L)
    val (dir2, _) = freshData(30L, 5L)
    InMemoryQueue.clear("q4")
    val res = Publisher.publish(spark,
      Publisher.PublishRequest(Seq(dir1, dir2)), new InMemoryQueueClient("q4"))
    assert(res.publishedRows === 50L)
    assert(Consumer.count("q4") === 50L)
  }

  test("batches never exceed the SQS hard limit of 10") {
    // the client itself asserts batch size ≤ 10; a violation would throw
    val (dir, n) = freshData(95L, 6L)
    InMemoryQueue.clear("q5")
    val res = Publisher.publish(spark,
      Publisher.PublishRequest(Seq(dir)), new InMemoryQueueClient("q5"))
    assert(res.publishedRows === n)
  }
}
