package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache discipline for operators that persist intermediate frames feeding
  * multiple branches (both sides of a self-join, Lloyd iterations, ...).
  *
  * A bare `.persist()` with no matching unpersist leaks: across a long
  * sweep (the 87-query verify/bench run) cached blocks accumulate on the
  * heap until eviction pressure sets in. The operators instead materialize
  * their (small) result with an eager `localCheckpoint` — the intermediates
  * are consumed exactly once, then released immediately.
  *
  * The results this is applied to are pair lists / top-k tables, orders of
  * magnitude smaller than the corpus-sized intermediates being released, so
  * the checkpoint itself is cheap. On a cluster the same role is played by
  * writing the result table once and reading it back.
  */
object Caching {

  /** Eagerly compute `result`, then unpersist every frame in `cached`. */
  def materializeThenRelease(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint() // eager: intermediates consumed here
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** Drop EVERY persisted RDD in the context — including the (small) local
    * checkpoints `materializeThenRelease` leaves behind, which
    * `spark.catalog.clearCache()` does not reach (they live in the block
    * manager until the RDD is GC'd). For sweep harnesses (Verify/Bench)
    * between queries, so a long session accumulates no net-new blocks; NOT
    * for sessions whose caches must survive the call.
    *
    * `blocking = true` waits for every block removal to finish before
    * returning. Bench uses it immediately before starting a timer: the
    * default async form lets the previous query's block removal run
    * CONCURRENTLY with the next timed query, and with ~200 queries in one
    * JVM that race was measured inflating a single query's wall-clock by
    * 12x (r9's jaccard_prefix_join: 35.3 s in-suite median vs ~4 s in a
    * fresh JVM, with byte-identical candidate telemetry).
    */
  def releaseAllRdds(spark: SparkSession, blocking: Boolean = false): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking))

  /** Run `body`, then unpersist every persistent RDD it created (net-new vs
    * the snapshot at entry) — including the local-checkpoint blocks
    * `materializeThenRelease` leaves behind, which `clearCache()` cannot
    * reach. Scoped complement to the sweeping `releaseAllRdds`, for library
    * users whose sessions hold caches that must survive.
    *
    * The body must fully consume its Spark-side data (write, collect, or
    * reduce to a scalar) before returning: a frame still backed by a block
    * released here would recompute from lineage — correct for cached frames,
    * invalid for checkpointed ones whose lineage was truncated.
    */
  def withReleased[T](spark: SparkSession)(body: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) => if (!before(id)) rdd.unpersist(blocking = false) }
  }
}
