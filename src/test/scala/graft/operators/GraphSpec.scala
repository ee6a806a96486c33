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

  private def lpa(edges: Seq[(Long, Long)], iters: Int = 3) =
    Graph.labelPropagation(edges.toDF("src", "dst"), iters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("labelPropagation: two triangles over a bridge split into two " +
      "communities (hand-traced synchronous rounds)") {
    // triangle {1,2,3}, triangle {4,5,6}, bridge 3-4
    val got = lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)))
    // hand trace of 3 synchronous min-tie-break rounds:
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4; r2: 1→1 2→1 3→1 4→4 5→3 6→3;
    // r3: left triangle all 1, right triangle all 3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: communities refine connected components and are " +
      "partition-invariant") {
    // two components: a 5-path and a 4-clique
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L),
      (22L, 23L))
    val labels = lpa(edges)
    // same-component nodes may split into several communities, but a label
    // can never cross a component boundary (labels only travel on edges)
    val compOf = Map(10L -> 0, 11L -> 0, 12L -> 0, 13L -> 0, 14L -> 0,
      20L -> 1, 21L -> 1, 22L -> 1, 23L -> 1)
    labels.foreach { case (node, label) =>
      assert(compOf(node) == compOf(label),
        s"label $label leaked across components to node $node")
    }
    // the clique converges to one community with the min label
    assert(Seq(20L, 21L, 22L, 23L).map(labels).toSet == Set(20L))
    val repart = Graph.labelPropagation(
        edges.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(repart == labels)
  }

  /** Driver-side brute-force per-node triangle counts. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (a min b, a max b) }
      .filter(e => e._1 != e._2).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if und((i, j)) && und((j, k)) && und((i, k))
    } yield (i, j, k)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangles(edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("triangles: two triangles sharing an edge (hand-traced counts)") {
    // {1,2,3} and {2,3,4} share edge 2-3
    val got = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangles: counts equal brute force on a skewed star-plus-clique " +
      "graph, under any edge direction/duplication, any partitioning") {
    // hub 0 connected to everything (the skew case degree-ordering
    // exists for) + a 4-clique {1,2,3,4} + a pendant path 5-6
    val base = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (0L, 6L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L))
    val expected = refTriangles(base)
    assert(expected.values.sum % 3 == 0 && expected.values.sum > 0)
    // reversed, duplicated, self-looped input must not change the counts
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 2L)) ++ base.take(3)
    assert(tri(noisy) == expected)
    val repart = Graph.triangles(
        noisy.toDF("src", "dst").repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(repart == expected)
  }

  test("triangles: a triangle-free graph (tree) returns no rows") {
    assert(tri(Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L))).isEmpty)
  }
}
