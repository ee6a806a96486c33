package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Phase-level wall-clock profile of the incremental-kNN timed path —
  * where do the ~10 s of `sim_knn_graph_incremental` bench time go?
  * Usage: tools/run.sh graft.tools.KnnIncProfile <sfDir> [reps]
  */
object KnnIncProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def nCompiles: Long = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def compileMs: Long = {
      val h = org.apache.spark.metrics.source
        .CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot
      // histogram holds per-compile ms; mean*count approximates total
      (h.getMean * nCompiles).toLong
    }
    def time[T](label: String)(f: => T): T = {
      val c0 = nCompiles
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  compiles=${nCompiles - c0}")
      r
    }

    val emb = Tables.t(spark, sfDir, "embeddings")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = (maxId * 99) / 100
    val base = emb.filter(col("vec_id") <= cut)
    val batch = emb.filter(col("vec_id") > cut)
    println(s"n=${emb.count()} cut=$cut batch=${batch.count()}")

    val path = java.nio.file.Files
      .createTempDirectory("graft-knn-prof-").toString
    time("build base graph") {
      Similarity.knnGraphDescent(base, "vec_id", "embedding", k = 5)
        .write.mode("overwrite").parquet(path)
    }

    for (rep <- 1 to reps) {
      println(s"rep $rep")
      graft.operators.Caching.releaseAllRdds(spark)
      System.gc()
      val g = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val out = time("knnGraphIncremental total") {
        val r = Similarity.knnGraphIncremental(g, base, batch,
          "vec_id", "embedding", k = 5)
        r.count()
        r
      }
      val _ = out
      val _2 = t0
    }

    // Phase split of one run (mirrors knnGraphIncremental's body).
    println("phase split")
    graft.operators.Caching.releaseAllRdds(spark)
    System.gc()
    val g0 = spark.read.parquet(path)
    val k = 5
    val kk = 4 * k
    val all = base.select(col("vec_id"), col("embedding"))
      .unionByName(batch.select(col("vec_id"), col("embedding")))
    val normed = time("normed persist+count") {
      val n = Similarity.withNorm(all, "vec_id", "embedding",
          "nid", "v_n", "n_n")
        .repartition(col("nid")).persist()
      n.count()
      n
    }
    val nc = math.max(16, math.ceil(math.sqrt(all.count().toDouble)).toInt)
    val seedNew = time("seed ivfTopK action") {
      val s0 = Similarity.ivfTopK(all, batch, "vec_id", "embedding", kk,
          nCentroids = nc, nProbe = 2, seed = 11L, trainIters = 0)
        .select(col("qid").as("src"), col("nid").as("dst"), col("cos"))
      s0.localCheckpoint()
    }
    val seedEdges = time("seedEdges checkpoint") {
      seedNew.union(seedNew.select(col("dst").as("src"),
        col("src").as("dst"), col("cos"))).localCheckpoint()
    }
    val seedChanged = seedEdges.select(col("src")).distinct()
    val keep0 = g0.join(seedChanged, Seq("src"), "left_anti")
      .select(col("src"), col("rank"), col("dst"), col("cos"),
        lit(false).as("fresh"))
    val rerank0 = Similarity.rerankFlagged(
      g0.join(seedChanged, Seq("src"), "left_semi")
        .select(col("src"), col("dst"), col("cos")),
      seedEdges, kk)
    var g = time("seed fold-in checkpoint") {
      keep0.union(rerank0).localCheckpoint()
    }
    for (r <- 1 to 2) {
      g = time(s"frontier round $r") {
        Similarity.descentRoundFlagged(g, normed, kk, 11L,
          s"prof_r$r", restrict = true)
      }
    }
    time("final filter+count") { g.filter(col("rank") <= k).count() }
    spark.stop()
  }
}
