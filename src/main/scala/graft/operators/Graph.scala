package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation (PageRank power iteration).
  *
  * Each iteration is one key-partitioned join (rank onto out-edges) plus one
  * aggregation (contributions by destination) — the same shuffle shape at
  * 5 nodes or 50 M domains; nothing is collected to the driver except the
  * node count (one long, needed for the teleport term). Lineage is truncated
  * with `localCheckpoint` every iteration so a deep iteration count does not
  * stack a linearly growing plan (same discipline as
  * [[Dedup.clusterPairs]]'s label propagation).
  *
  * With `redistributeDangling = false` (default) every node must have at
  * least one out-edge (holds for transition graphs, where a node exists
  * because an event left it) — the iteration stays purely join-shaped.
  * With it on, the mass sitting on sink nodes is summed (one scalar
  * aggregate per iteration — a single double to the driver) and spread
  * uniformly, the standard PageRank dangling-node correction a web/link
  * corpus needs; sum(rank) stays 1 either way.
  */
object Graph {

  /** Ranks after `iters` power iterations at the given damping.
    * `edges` carries one row per edge (`src`, `dst`; duplicates = weight).
    * Returns (`node`, `rank`) with sum(rank) ~= 1.
    */
  def pageRank(edgesIn: DataFrame, iters: Int, damping: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame = {
    // Materialize the edge list once: without this, every iteration replays
    // the caller's derivation (for a transition graph, a scan + window per
    // iteration). On a cluster the analog is staging edges to a table.
    val edges = edgesIn.localCheckpoint(false)
    val out = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    // the one unavoidable action (n feeds the teleport literal); it also
    // materializes the lazy edge/node blocks every iteration then reuses
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    (1 to iters).foreach { _ =>
      val contrib = edges
        .join(out, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inbound"))
      // Mass currently on sink nodes (no out-edges): one anti-join + one
      // scalar aggregate; redistributed uniformly so sum(rank) stays 1.
      val danglingShare =
        if (!redistributeDangling) 0.0
        else {
          val d = ranks
            .join(out.select(col("src").as("node")), Seq("node"), "left_anti")
            .agg(sum(col("rank"))).head().getAs[Any](0) match {
              case null => 0.0
              case v: Double => v
            }
          d / n
        }
      // LAZY checkpoint (r15, the kNN-descent pattern): lineage still
      // truncates per iteration, but the rounds chain into the consumer's
      // single materializing action instead of paying one barrier job per
      // iteration. With redistributeDangling the per-iteration scalar
      // aggregate materializes each round anyway; without it the whole
      // power iteration is ONE job.
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("inbound"), lit(0.0)) + lit(danglingShare)))
            .as("rank"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** Community detection by synchronous label propagation (Raghavan et al.
    * 2007, the LPA family GraphX/GraphFrames ship): every node starts
    * labeled with itself; each round every node adopts the MOST FREQUENT
    * label among its neighbors, ties broken by the smaller label. The
    * classic async/random-order variant is run-dependent — useless under an
    * equality oracle — so this is the deterministic synchronous form with a
    * fixed round count: the result is a pure function of the edge set, and
    * a DuckDB oracle can replay the rounds as unrolled CTEs (the
    * `pagerank_transitions` posture). Communities refine connected
    * components (labels only travel along edges), which [[GraphSpec]] pins
    * against [[Dedup.clustersStar]].
    *
    * Shape at scale: edges are symmetrized once (one distinct), then each
    * round is one join (neighbor labels onto edges) + one (node, label)
    * count + one per-node argmax window — the [[pageRank]] shuffle shape,
    * O(edges) per round with lineage truncated per round. Nodes = edge
    * endpoints; isolated nodes have no neighbors to vote and stay out by
    * definition.
    */
  def labelPropagation(edgesIn: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = edgesIn.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edgesIn.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(false)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(false)
    val w = Window.partitionBy(col("a"))
      .orderBy(col("cnt").desc, col("label").asc)
    (1 to iters).foreach { _ =>
      // lazy chain (r15): fixed round count, no per-round convergence
      // check — all rounds run inside the consumer's one action, lineage
      // still truncated per round
      labels = sym
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col("a").as("node"), col("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Exact per-node triangle counts by DEGREE-ORDERED orientation (the
    * compact-forward / Cohen MapReduce algorithm, the formulation that
    * scales): orient every undirected edge from its lower-(degree, id)
    * endpoint to the higher one — an acyclic total order, so each triangle
    * has exactly one "apex" node with both out-edges, is enumerated once,
    * and (the scale point) every node's OUT-degree after orientation is
    * O(√m) regardless of how skewed the raw degree distribution is: the
    * wedge self-join that explodes quadratically on a celebrity node under
    * naive enumeration is arboricity-bounded here.
    *
    * Plan shape: degree = one agg; orientation = one broadcast-or-shuffle
    * join of edges to degrees; wedges = one self-equi-join on the apex;
    * closure = one equi-join against the oriented edge set; per-node
    * attribution = explode each triangle to its 3 corners + one count agg.
    * All joins are on single keys — the same shuffle shape at 5 nodes or
    * 5 B edges. The wedge pair is kept ordered ((deg,id) of one out-
    * neighbor < the other), so the closing edge's direction is KNOWN
    * (orientation follows the same total order) and the closure lookup is
    * a pure equi-join — no OR-condition nested loop.
    *
    * Input `edgesIn` (`src`, `dst`) is symmetrized/deduplicated/de-looped
    * here. Returns (`node`, `n_tri`) for every node on ≥1 triangle.
    */
  def triangles(edgesIn: DataFrame): DataFrame = {
    // lazy checkpoints (r15): und and oriented are each referenced by
    // several downstream subtrees of ONE consumer action — lazy blocks
    // cache on first materialization inside that job and the reuses hit
    // the cache, so the operator is a single job instead of three
    val und = edgesIn
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(false)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // Orient by (deg, id): struct comparison is lexicographic in both
    // Spark and the SQL oracle's row-value comparison.
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), "b")
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("b")).otherwise(col("a")).as("v"),
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("degb")).otherwise(col("dega")).as("degv"))
      .localCheckpoint(false)
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (struct(col("e1.degv"), col("e1.v")) <
            struct(col("e2.degv"), col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"),
        col("e2.v").as("z"))
      .join(oriented.select(col("u").as("y"), col("v").as("z")),
        Seq("y", "z"))
    // One generate, not a 3-way self-union (which would re-enumerate the
    // triangle join three times): each triangle fans out to its 3 corners.
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
