package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changeset application (the MERGE INTO / CDC-upsert pattern) without a
  * table format: given a snapshot and a batch of keyed changes tagged
  * insert/update/delete, produce the next snapshot. Changes win over the
  * snapshot; deletes drop the key.
  *
  * Plan shape: one left-anti join on the key (snapshot rows whose key has
  * any change) + a union with the surviving change rows — a single hash
  * shuffle of each side on the key, no window, no global sort. At 100 TB
  * both sides bucket/partition by the key so the anti-join co-locates, and
  * the rewrite touches only the partitions a change lands in when the
  * snapshot is stored hive-partitioned by a key prefix.
  */
object Cdc {

  /** `changes` must hold one row per key, carrying the full new row image
    * plus `opCol` ∈ {"I","U","D"} (insert/update/delete — I and U are
    * treated identically: the change row image wins).
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String): DataFrame = {
    val survivors = snapshot.join(
      changes.select(col(keyCol)), Seq(keyCol), "left_anti")
    survivors.unionByName(
      changes.filter(col(opCol) =!= "D").drop(opCol))
  }
}
