package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "seg", "bal")

  test("updates replace, deletes drop, inserts append") {
    val changes = Seq((2L, "b2", 99.0, "U"), (3L, "c", 30.0, "D"),
      (4L, "d", 40.0, "I")).toDF("k", "seg", "bal", "op")
    val out = Cdc.applyChanges(snap, changes, "k", "op")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (4L, "d", 40.0)))
  }

  test("empty changeset is the identity") {
    val none = Seq.empty[(Long, String, Double, String)]
      .toDF("k", "seg", "bal", "op")
    assert(Cdc.applyChanges(snap, none, "k", "op")
      .orderBy(col("k")).collect().toSeq ==
      snap.orderBy(col("k")).collect().toSeq)
  }

  test("a delete for an absent key is a no-op; an update for one inserts") {
    val changes = Seq((9L, "x", 1.0, "D"), (5L, "e", 50.0, "U"))
      .toDF("k", "seg", "bal", "op")
    val out = Cdc.applyChanges(snap, changes, "k", "op")
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L, 5L))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val newSnap = Seq((2L, "b", 21.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "seg", "bal") // 1 removed, 2 changed, 3 unchanged, 4 added
    val out = Cdc.snapshotDiff(snap, newSnap, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff compares null-safely across every non-key column") {
    val a = Seq((1L, Some("x"), Option.empty[Double]),
      (2L, Option.empty[String], Some(2.0)),
      (3L, Option.empty[String], Option.empty[Double]))
      .toDF("k", "seg", "bal")
    val b = Seq((1L, Option.empty[String], Option.empty[Double]), // seg→NULL
      (2L, Option.empty[String], Some(2.0)),                      // identical
      (3L, Option.empty[String], Some(3.0)))                      // NULL→bal
      .toDF("k", "seg", "bal")
    val out = Cdc.snapshotDiff(a, b, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed", 3L -> "changed"))
  }

  test("snapshotDiff rejects mismatched schemas; key-only tables never change") {
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(snap, snap.drop("bal"), Seq("k"))
    }
    val a = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    val b = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val out = Cdc.snapshotDiff(a, b, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 3L -> "added"))
  }
}
