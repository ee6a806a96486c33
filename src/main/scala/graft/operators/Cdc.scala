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

  /** Keyed diff of two snapshots of the same table (dataset versioning —
    * "what changed between yesterday's corpus and today's"): one row per
    * key whose row image differs, tagged `added` / `removed` / `changed`.
    * Unchanged keys are dropped. Every non-key column participates in the
    * comparison, null-safely (`<=>`): a value flipping to or from NULL is
    * a change, and NULL-valued columns on both sides are equal.
    *
    * Plan shape: one full-outer sort-merge join — a single hash shuffle of
    * each side on the key — with presence flags and the per-column
    * comparison evaluated scan-side; the unchanged majority is filtered
    * before anything downstream. At 100 TB both snapshots are partition-
    * pruned to the compared window and co-partition on the key; output is
    * proportional to the churn, not the corpus.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshot schemas differ: ${oldSnap.columns.toSeq} vs " +
        s"${newSnap.columns.toSeq}")
    val valCols = oldSnap.columns.filterNot(keyCols.contains).toSeq
    val o = oldSnap.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"_o_$c")) :+
      lit(true).as("_o_present"): _*)
    val n = newSnap.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"_n_$c")) :+
      lit(true).as("_n_present"): _*)
    val changed = valCols.map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("_o_present").isNull, lit("added"))
          .when(col("_n_present").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .as("change"): _*)
      .filter(col("change").isNotNull)
  }
}
