package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Caching, Dedup}

/** Isolated A/B for the two r14 persists in
  * [[Dedup.embeddingPairsLshIncremental]] (r14 verdict item #1): the
  * full-suite artifact showed `dedup_embedding_incremental` 1.77 → 2.30 s
  * in the round that added them, while the streaming per-batch probe
  * improved — so measure the standalone timed form per persist, same
  * discipline as the bench (blocking release + GC outside the timer,
  * median of N).
  *
  * Usage: tools/run.sh graft.tools.EmbIncAbProbe [sfDir] [reps]
  */
object EmbIncAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same formula as PipelineQueries.lshBits (private there)
    def lshBits(nVecs: Long, targetBucket: Long = 100L): Int =
      math.max(3, math.ceil(
        math.log(math.max(1L, nVecs / targetBucket).toDouble) /
          math.log(2)).toInt)
    // the bench timed form, parameterized by the two cache toggles
    def run(cacheCand: Boolean, cacheVecs: Boolean): Long = {
      val emb = Tables.t(spark, sfDir, "embeddings")
      val nBits = lshBits(emb.count())
      val split = emb.agg(floor(max(col("vec_id")) * 0.8)).head().getLong(0)
      val corpus = emb.filter(col("vec_id") < split)
      val idx = Dedup.srpIndex(corpus, "vec_id", "embedding",
        nBits = nBits, nTables = 8).localCheckpoint()
      Dedup.embeddingPairsLshIncremental(emb.filter(col("vec_id") >= split),
        corpus, idx, "vec_id", "embedding", threshold = 0.4,
        nBits = nBits, nTables = 8, cacheCand = cacheCand,
        cacheVecs = cacheVecs).count()
    }
    val variants = Seq(
      ("cand+vecs (r14 shipped)", true, true),
      ("none (r13 shape)", false, false),
      ("cand only", true, false),
      ("vecs only", false, true))
    // one warm pass for codegen
    run(cacheCand = true, cacheVecs = true)
    def bench(label: String)(body: => Unit): Unit = {
      val secs = (1 to reps).map { _ =>
        Caching.releaseAllRdds(spark, blocking = true)
        System.gc()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-26s median ${secs(secs.size / 2)}%.3f  " +
        f"reps [${secs.map(x => f"$x%.3f").mkString(", ")}]")
    }
    println("== standalone timed form (80/20 split)")
    variants.foreach { case (label, c, v) =>
      bench(label) { require(run(c, v) >= 0) }
    }
    // The streaming per-batch shape (the runEmbeddingIndexStream fold's
    // batch 3): batch = 1/3 slice, corpus/index = staged prior 2/3 read
    // back from parquet at the fold's 8 shuffle partitions.
    println("== streaming per-batch shape (batch 3 of 3, sp=8)")
    val emb = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val stage = java.nio.file.Files
      .createTempDirectory("graft-embab-").toString
    (0 until 2).foreach { i =>
      val slice = emb.filter(col("vec_id") % 3 === i)
      slice.coalesce(1).write.parquet(s"$stage/corpus/b$i")
      Dedup.srpIndex(slice, "vec_id", "embedding").coalesce(1)
        .write.parquet(s"$stage/idx/b$i")
    }
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try variants.foreach { case (label, c, v) =>
      bench(label) {
        val eb = emb.filter(col("vec_id") % 3 === 2)
        Dedup.embeddingPairsLshIncremental(eb,
          spark.read.parquet(s"$stage/corpus/b*"),
          spark.read.parquet(s"$stage/idx/b*"),
          "vec_id", "embedding", 0.4,
          cacheCand = c, cacheVecs = v).count()
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevSp)
    spark.stop()
  }
}
