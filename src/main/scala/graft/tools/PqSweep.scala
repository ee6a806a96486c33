package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Similarity
import graft.queries.Contracts

/** Recall/latency sweep for PQ top-k across scale factors and
  * (m, shortlistFactor) — the tool behind the contract floor in
  * `PipelineQueries.sim_pq_topk` (floors are scale-dependent; re-run this
  * before changing m/ksub/shortlistFactor or the floor).
  *
  * Usage: tools/run.sh graft.tools.PqSweep [sfDir ...]
  */
object PqSweep {
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
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        k = 5).localCheckpoint()
      for ((m, slf) <- Seq((8, 8), (16, 4), (16, 8), (32, 4))) {
        val t0 = System.nanoTime()
        val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding", k = 5,
          m = m, shortlistFactor = slf)
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = Contracts.recall(pq, brute)
        println(f"sweep dir=$dir n=$n m=$m shortlist=${slf}x " +
          f"recall=$recall%.3f sec=$sec%.2f")
      }
      for ((np, m) <- Seq((4, 16), (6, 16), (8, 16))) {
        val t0 = System.nanoTime()
        val ivfpq = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = np, m = m, shortlistFactor = 8)
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = Contracts.recall(ivfpq, brute)
        println(f"sweep dir=$dir n=$n ivfpq nProbe=$np m=$m " +
          f"recall=$recall%.3f sec=$sec%.2f")
      }
      graft.operators.Caching.releaseAllRdds(spark)
    }
    spark.stop()
  }
}
