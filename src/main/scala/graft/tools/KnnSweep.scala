package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Similarity
import graft.queries.Contracts

/** Recall sweep for the all-pairs kNN graph across scale factors and
  * (nCentroids, nProbe, trainIters) — the tool behind the contract floor in
  * `PipelineQueries.sim_knn_graph`. Self-join recall differs from the
  * query-form sweeps: EVERY node is a query, so boundary nodes (whose true
  * neighbors straddle bucket borders) are fully represented instead of
  * being sampled away by a small query set.
  *
  * Usage: tools/run.sh graft.tools.KnnSweep [sfDir ...]
  */
object KnnSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val emb = t(spark, dir, "embeddings").localCheckpoint()
      val n = emb.count()
      val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding",
          k = 5)
        .select(col("qid").as("src"), col("nid").as("dst"))
        .localCheckpoint()
      // nc = 0 is the auto sqrt(n) scale setting knnGraph runs at scale
      for ((nc, np, ti) <- Seq((16, 3, 2), (16, 4, 2), (8, 3, 2),
          (16, 3, 0), (16, 6, 2), (32, 6, 2), (0, 6, 2))) {
        val t0 = System.nanoTime()
        val knn = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5,
          nCentroids = nc, nProbe = np, trainIters = ti)
        val recall = Contracts.recall(knn, exact, "src", "dst")
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"sweep dir=$dir n=$n nCentroids=$nc nProbe=$np " +
          f"trainIters=$ti recall=$recall%.3f sec=$sec%.2f")
      }
      // NN-descent variant: cheap sqrt(n)-bucket seed at a FIXED probe
      // count, then neighbor-of-neighbor refinement rounds. The sweep
      // answers: how many rounds until the 0.6 contract floor holds (with
      // margin) at each sf, and what does each round cost?
      for ((rounds, sp, skk) <- Seq((0, 2, 15), (1, 2, 15), (2, 2, 15),
          (3, 2, 15), (2, 3, 15), (2, 2, 20), (3, 2, 20), (2, 3, 20))) {
        val t0 = System.nanoTime()
        val knn = Similarity.knnGraphDescent(emb, "vec_id", "embedding",
          k = 5, rounds = rounds, seedProbe = sp, searchK = skk)
        val recall = Contracts.recall(knn, exact, "src", "dst")
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"descent dir=$dir n=$n rounds=$rounds seedProbe=$sp " +
          f"searchK=$skk recall=$recall%.3f sec=$sec%.2f")
      }
      graft.operators.Caching.releaseAllRdds(spark)
    }
    spark.stop()
  }
}
