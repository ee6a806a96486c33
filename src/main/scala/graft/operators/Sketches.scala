package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for recurring ingest — the production
  * answer to "distinct users/documents per key, updated per batch, without
  * ever rescanning the corpus".
  *
  * Built on Spark's Datasketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`): a per-group sketch is a few KB
  * regardless of group cardinality, and sketches merge associatively
  * (register maxima) — merging a batch's sketches into a persisted snapshot
  * covers the same value set as sketching all data in one pass. NOTE that
  * register associativity does NOT make the ESTIMATE invariant across merge
  * trees: a stream-built sketch answers with the HIP estimator, while a
  * sketch built by union (`hll_union_agg`, or an agg over more partitions)
  * sets the out-of-order flag and answers with the composite estimator, so
  * incremental and single-pass estimates may differ by ~1-2% at lgK=12 even
  * over identical data. Contracts on this module therefore assert the lgK
  * error envelope against exact counts, never estimate equality across
  * build shapes. At 100 TB the
  * snapshot table is groups × KB — the only thing a nightly ingest reads and
  * rewrites; the corpus itself is touched exactly once, the batch it
  * arrived in. The same persisted-state pattern as `Dedup.bandIndex` /
  * `Dedup.contentKeys`.
  *
  * `lgK` trades size for error: relative standard error ≈ 1.04/√2^lgK
  * (~1.6% at the default 12). Groups in LIST/SET mode (small cardinalities)
  * are exact.
  */
object Sketches {

  /** Per-group HLL sketch table: (groupCol, hll binary). The snapshot
    * format — write this once per corpus, merge batches into it.
    */
  def hllByGroup(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Merge two sketch tables (a persisted snapshot and a new batch's
    * sketches) into an updated snapshot. Groups present in only one side
    * pass through; `allowDifferentLgK` stays off so a mis-parameterized
    * batch fails loudly instead of silently degrading precision.
    */
  def hllMergeSnapshots(snapshot: DataFrame, batch: DataFrame,
      groupCol: String): DataFrame =
    snapshot.unionByName(batch)
      .groupBy(col(groupCol))
      .agg(hll_union_agg(col("hll"), lit(false)).as("hll"))

  /** Distinct-count estimates from a sketch table. */
  def hllEstimates(sketches: DataFrame, groupCol: String,
      outCol: String = "n_distinct_est"): DataFrame =
    sketches.select(col(groupCol),
      hll_sketch_estimate(col("hll")).as(outCol))

  /** Convenience: estimates for `df` grouped by `groupCol`, incremental
    * path — sketch the batch, merge into `snapshot`, estimate. Returns
    * (updatedSnapshot, estimates); persist the snapshot for the next batch.
    */
  def hllIncremental(snapshot: DataFrame, batch: DataFrame, groupCol: String,
      valueCol: String, lgK: Int = 12): (DataFrame, DataFrame) = {
    val updated =
      hllMergeSnapshots(snapshot, hllByGroup(batch, groupCol, valueCol, lgK),
        groupCol)
    (updated, hllEstimates(updated, groupCol))
  }
}
