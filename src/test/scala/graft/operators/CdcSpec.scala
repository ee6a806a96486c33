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
}
