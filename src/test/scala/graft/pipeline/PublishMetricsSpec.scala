package graft.pipeline

import graft.SparkSpec

/** observe()-based publish metrics (A3 parity): plan-level counters
  * delivered via QueryExecutionListener, alongside the accumulators.
  */
class PublishMetricsSpec extends SparkSpec {

  test("observed metrics report attempted rows and bytes per publish") {
    val m = new PublishMetricsListener
    spark.listenerManager.register(m)
    try {
      val qn = s"obs-${java.util.UUID.randomUUID()}"
      val res = Publisher.publish(spark,
        Publisher.PublishRequest(Seq(s"$sfDir/nation.parquet"),
          idColumn = "n_nationkey"),
        new InMemoryQueueClient(qn))
      val (rows, bytes) = m.await()
      assert(rows == 25L)
      assert(rows == res.publishedRows + res.failedRows)
      // bytes = total serialized payload; every body is a non-empty JSON
      // object, so the floor is 2 bytes per row
      assert(bytes > rows * 2)
      val actualBytes = InMemoryQueue.all(qn).map(_.body.length.toLong).sum
      assert(bytes == actualBytes)
    } finally spark.listenerManager.unregister(m)
  }

  test("metrics include rows that dead-letter (attempted, not delivered)") {
    val m = new PublishMetricsListener
    spark.listenerManager.register(m)
    try {
      val qn = s"obs-dlq-${java.util.UUID.randomUUID()}"
      val res = Publisher.publish(spark,
        Publisher.PublishRequest(Seq(s"$sfDir/nation.parquet"),
          idColumn = "n_nationkey"),
        new InMemoryQueueClient(qn, poisonIds = Set("3", "7")))
      val (rows, _) = m.await()
      assert(rows == 25L)
      assert(res.publishedRows == 23L && res.failedRows == 2L)
    } finally spark.listenerManager.unregister(m)
  }
}
