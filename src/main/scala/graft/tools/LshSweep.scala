package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Dedup

/** Recall/latency sweep for the SRP-LSH embedding dedup across scale
  * factors and nBits — the tool behind the contract floor in
  * `PipelineQueries.dedup_embedding_lsh` (floors are scale-dependent;
  * re-run this before changing nBits/nTables or the floor).
  *
  * Usage: tools/run.sh graft.tools.LshSweep [sfDir ...]
  */
object LshSweep {
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
      // Exact pair set on the bounded subset (same bound as the contract).
      val sub = emb.filter(col("vec_id") < 300)
      val exact = Dedup.embeddingPairs(sub, "vec_id", "embedding",
        threshold = 0.4).select(col("id_a"), col("id_b")).localCheckpoint()
      val nExact = exact.count()
      for (nBits <- Seq(3, 4, 5, 6)) {
        val t0 = System.nanoTime()
        val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding",
            threshold = 0.4, nBits = nBits, nTables = 8)
          .filter(col("id_a") < 300 && col("id_b") < 300)
          .select(col("id_a"), col("id_b")).localCheckpoint()
        val sec = (System.nanoTime() - t0) / 1e9
        val hit = exact.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
        val recall = if (nExact == 0) -1.0 else hit.toDouble / nExact
        println(f"sweep dir=$dir n=$n nBits=$nBits nExact=$nExact " +
          f"hit=$hit recall=$recall%.3f sec=$sec%.2f")
      }
      // after the dir's iterations: emb/exact checkpoint blocks are done
      graft.operators.Caching.releaseAllRdds(spark)
    }
    spark.stop()
  }
}
