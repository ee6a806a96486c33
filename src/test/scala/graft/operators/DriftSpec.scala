package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions: psi == 0 and jsd == 0 exactly") {
    val df = (1 to 1000).map(i => i.toDouble % 97).toDF("v")
    val r = Drift.numericDrift(df, df, "v", nBuckets = 10)
      .collect().head
    assert(r.getDouble(0) === 0.0) // every (q-p) term is exactly 0
    assert(r.getDouble(1) === 0.0) // every p==q==m term is ln(1)=0
  }

  test("a planted shift moves PSI past the conventional 0.25 line") {
    val ref = (1 to 2000).map(i => (i % 100).toDouble).toDF("v")
    val cur = (1 to 2000).map(i => 50.0 + (i % 100) / 2.0).toDF("v")
    val r = Drift.numericDrift(ref, cur, "v", nBuckets = 10)
      .collect().head
    assert(r.getDouble(0) > 0.25)
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) <= math.log(2.0) + 1e-12)
  }

  test("bucket edges come from the REFERENCE only") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    // current data far outside the reference range must not move edges:
    // everything lands in the top bucket
    val cur = (1 to 50).map(i => 1e6 + i).toDF("v")
    val edges = Drift.quantileEdges(ref, "v", 10)
    assert(edges.length === 9)
    assert(edges.last <= 100.0)
    val hist = Drift.histogram(cur.toDF("v"), "v", edges).collect()
    assert(hist.length === 1 && hist.head.getInt(0) === 9)
  }

  test("categorical drift: a category missing on one side enters at the " +
    "eps floor, not infinity") {
    val ref = Seq("a", "a", "b").toDF("c")
    val cur = Seq("a", "a", "a").toDF("c")
    val r = Drift.categoricalDrift(ref, cur, "c").collect().head
    assert(!r.getDouble(0).isInfinite && !r.getDouble(0).isNaN)
    assert(r.getDouble(0) > 0.0)
  }

  test("NULLs are excluded from histograms (completeness is a separate " +
    "concern)") {
    val ref = Seq(Some(1.0), Some(2.0), None).toDF("v")
    val edges = Drift.quantileEdges(ref, "v", 2)
    val hist = Drift.histogram(ref, "v", edges).collect()
    assert(hist.map(_.getLong(1)).sum === 2L)
  }

  test("drift metrics are partition-invariant") {
    val ref = (1 to 500).map(i => (i % 83).toDouble).toDF("v")
    val cur = (1 to 400).map(i => (i % 59).toDouble).toDF("v")
    def run(rp: Int, cp: Int): (Double, Double) = {
      val r = Drift.numericDrift(ref.repartition(rp), cur.repartition(cp),
        "v", nBuckets = 8).collect().head
      (math.floor(r.getDouble(0) * 1e6 + 0.5) / 1e6,
        math.floor(r.getDouble(1) * 1e6 + 0.5) / 1e6)
    }
    assert(run(1, 1) === run(7, 3))
  }
}
