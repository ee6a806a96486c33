package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget packs (the
  * pre-tokenization step that turns a corpus into training context windows).
  *
  * Packing is inherently sequential — a doc's pack depends on everything
  * packed before it — so the scalable form shards first: documents are
  * hash-sharded, ordered deterministically within their shard, and packed by
  * cumulative token count. Each shard packs independently (window over
  * `partitionBy(shard)` — ONE shuffle by shard id, then a linear scan), so
  * the operator scales by adding shards exactly like any keyed aggregation;
  * there is no global order-by (which would serialize onto one partition).
  *
  * Semantics: docs are concatenated in (shard, key) order; a doc belongs to
  * the pack containing its FIRST token (`floor(preceding_tokens / budget)`).
  * Packs can therefore overflow the budget by at most one document tail —
  * the standard greedy-fill contract; the trainer truncates or splits at
  * the boundary. Deterministic: pure function of (doc set, nShards, budget).
  */
object Packing {

  /** One row per doc: (all of `df`'s columns, shard, n_tokens, pack). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0)
    // A non-integral id would cast to NULL, collapsing every row into one
    // NULL shard — a silent single-partition sequential pack. Fail instead.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"packSequences needs an integral id column for sharding; " +
        s"'$idCol' is ${idType.catalogString} — hash it to a long first")
    val shard = pmod(col(idCol).cast("long"), lit(nShards)).as("shard")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("pack",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
  }

  /** Per-pack roll-up: how full each pack is. `max_overflow` in the spec
    * asserts the ≤ one-doc-tail overflow contract.
    */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        max(col("n_tokens")).as("max_doc_tokens"))
      .withColumn("over_budget",
        greatest(col("pack_tokens") - budget, lit(0L)))
}
