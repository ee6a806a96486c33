package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference power iteration over an edge list. */
  private def refRanks(edges: Seq[(String, String)], iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val inbound = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * inbound.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank: cycle is stationary at 1/n") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 4)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === Set("a", "b", "c"))
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank redistributes dangling mass: sink graph conserves sum=1") {
    // d is a pure sink (no out-edges)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
    val iters = 5
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters,
        redistributeDangling = true)
      .as[(String, Double)].collect().toMap
    // reference iteration with uniform dangling redistribution
    val damping = 0.85
    val nodes = Seq("a", "b", "c", "d")
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val inbound = edges.groupBy(_._2)
        .view.mapValues(_.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      val dangling = nodes.filterNot(outdeg.contains).map(r).sum
      r = nodes.map(v => v -> ((1 - damping) / n +
        damping * (inbound.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    assert(got.keySet === r.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - r(k)) < 1e-12, k) }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // without the flag the same graph leaks the sink's mass — the
    // documented precondition the flag exists to lift
    val leaky = Graph.pageRank(edges.toDF("src", "dst"), iters)
      .as[(String, Double)].collect().toMap
    assert(leaky.values.sum < 1.0 - 1e-6)
  }

  test("pageRank matches the reference iteration; mass is conserved") {
    // multigraph (duplicate edge = weight 2), asymmetric in-degree
    val edges = Seq(
      ("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"),
      ("c", "b"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5)
      .as[(String, Double)].collect().toMap
    val want = refRanks(edges, iters = 5)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, k) }
    // every node has out-edges, so no mass leaks
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // b receives weight-2 traffic from a plus c's split vote: must outrank c
    assert(got("b") > got("c"))
  }
}
