package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.pipeline.{Consumer, InMemoryQueue, InMemoryQueueClient}
import graft.sources.DataGenerator

/** Streaming parity (SURVEY.md §2.9): micro-batch delivery, retry ×5, DLQ. */
class StreamingSpec extends SparkSpec {

  test("stream publisher delivers micro-batches and dead-letters poison rows") {
    val dir = tmpDir("streamsrc")
    DataGenerator.generate(spark, 40L, seed = 11L)
      .write.mode("overwrite").parquet(dir)
    val poison = spark.read.parquet(dir).select("id")
      .limit(3).collect().map(_.getString(0)).toSet

    InMemoryQueue.clear("sq1")
    val dlq = tmpDir("dlq")
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1") // backpressure knob (ST4)
      .parquet(dir)
    val q = StreamPublisher.start(stream,
      new InMemoryQueueClient("sq1", poisonIds = poison),
      dlqPath = dlq, checkpoint = tmpDir("ckpt"))
    q.awaitTermination()

    assert(InMemoryQueue.size("sq1") === 40 - poison.size)
    val deadIds = spark.read.parquet(dlq).select("id")
      .collect().map(_.getString(0)).toSet
    assert(deadIds === poison)
  }

  test("redrive re-publishes dead letters once the fault clears") {
    val dir = tmpDir("redrivesrc")
    DataGenerator.generate(spark, 20L, seed = 13L)
      .write.mode("overwrite").parquet(dir)
    val poison = spark.read.parquet(dir).select("id")
      .limit(4).collect().map(_.getString(0)).toSet

    InMemoryQueue.clear("sq2")
    val dlq = tmpDir("dlq2")
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    StreamPublisher.start(stream,
      new InMemoryQueueClient("sq2", poisonIds = poison),
      dlqPath = dlq, checkpoint = tmpDir("ckpt3")).awaitTermination()
    assert(InMemoryQueue.size("sq2") === 20 - poison.size)

    // fault cleared: a fresh client with no poison — redrive drains the DLQ
    val stillFailing = StreamPublisher.redrive(spark, dlq,
      new InMemoryQueueClient("sq2")).count()
    assert(stillFailing === 0L)
    assert(InMemoryQueue.size("sq2") === 20)
  }

  test("queue-backed streaming source: published messages flow end to end") {
    import org.apache.spark.sql.Encoders
    import graft.pipeline.Publisher
    val dir = tmpDir("qssrc")
    DataGenerator.generate(spark, 35L, seed = 15L)
      .write.mode("overwrite").parquet(dir)
    InMemoryQueue.clear("qs1")
    Publisher.publish(spark, Publisher.PublishRequest(Seq(dir)),
      new InMemoryQueueClient("qs1"))
    assert(InMemoryQueue.size("qs1") === 35)

    val qs = new QueueStream(spark, "qs1")
    // parse bodies back to typed rows inside the stream (consumer side)
    val schema = Encoders.product[graft.model.Record].schema
    val parsed = qs.stream.select(
      org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("body"), schema).as("r"))
      .select("r.*")
    val q = parsed.writeStream.format("memory").queryName("qs_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("qsckpt"))
      .start()
    assert(qs.pump() === 35)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("qs_out")
    assert(out.count() === 35L)
    assert(out.exceptAll(spark.read.parquet(dir)).isEmpty)
  }

  test("idempotent sink: a full replay produces no duplicate rows") {
    val dir = tmpDir("idemsrc")
    DataGenerator.generate(spark, 30L, seed = 14L)
      .write.mode("overwrite").parquet(dir)
    val out = tmpDir("idemout")
    def run(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
      IdempotentSink.start(stream, out, checkpoint = ckpt).awaitTermination()
    }
    run(tmpDir("idemckpt1"))
    assert(spark.read.parquet(out).count() === 30L)
    // fresh checkpoint = the source replays everything from scratch; batch
    // ids restart at 0, each batch overwrites its own directory → no dupes
    run(tmpDir("idemckpt2"))
    val replayed = spark.read.parquet(out)
    assert(replayed.count() === 30L)
    assert(replayed.select("id").distinct().count() === 30L)
  }

  test("stream consumer logs per-batch counts (reference stub behavior)") {
    val dir = tmpDir("consrc")
    DataGenerator.generate(spark, 25L, seed = 12L)
      .write.mode("overwrite").parquet(dir)
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = StreamConsumer.start(stream, checkpoint = tmpDir("ckpt2"),
      onBatch = (id, n) => { seen.add((id, n)); () })
    q.awaitTermination()
    assert(seen.size() >= 1)
    var total = 0L
    seen.forEach { case (_, n) => total += n }
    assert(total === 25L)
  }
}
