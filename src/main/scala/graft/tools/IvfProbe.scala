package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Micro-profile of ivfTopK: planning vs execution, nc scaling.
  * Usage: tools/run.sh graft.tools.IvfProbe <sfDir>
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.t(spark, sfDir, "embeddings")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = (maxId * 99) / 100
    val batch = emb.filter(col("vec_id") > cut)

    def run(label: String, nc: Int, reps: Int): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = Similarity.ivfTopK(emb, batch, "vec_id", "embedding", 20,
          nCentroids = nc, nProbe = 2, seed = 11L, trainIters = 0)
        val tPlan = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tPhys = System.nanoTime()
        df.count()
        val tExec = System.nanoTime()
        println(f"$label rep$i: build=${(tPlan - t0) / 1e9}%.3f " +
          f"plan=${(tPhys - tPlan) / 1e9}%.3f " +
          f"exec=${(tExec - tPhys) / 1e9}%.3f")
      }

    run("nc=16", 16, 3)
    run("nc=45", 45, 3)
    run("nc=90", 90, 3)
    spark.stop()
  }
}
