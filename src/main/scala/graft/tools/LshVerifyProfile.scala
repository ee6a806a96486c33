package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level breakdown of [[graft.operators.Dedup.embeddingPairsLsh]]'s
  * cost at a given scale factor — the round-11 telemetry showed its sf1
  * wall (~73 s) carries 0.3 MB of shuffle: the time is inside the
  * candidate-verify stage, and this probe separates hash+join+count
  * (candidate generation) from the full verified-pairs run so the
  * expensive half is measured, not guessed.
  *
  * Usage: tools/run.sh graft.tools.LshVerifyProfile [dir]
  */
object LshVerifyProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val nBits = math.max(3, math.ceil(
      math.log(math.max(1L, n / 100L).toDouble) / math.log(2)).toInt)
    def time[A](label: String)(f: => A): A = {
      graft.operators.Caching.releaseAllRdds(spark, blocking = true)
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm-up: janino + first read
    Dedup.embeddingPairsLsh(emb.limit(500), "vec_id", "embedding",
      threshold = 0.4, nBits = nBits, nTables = 8).count()
    time("full pairs run") {
      Dedup.embeddingPairsLsh(emb, "vec_id", "embedding",
        threshold = 0.4, nBits = nBits, nTables = 8).count()
    }
    // candidates only: same hash + bucket join via srpIndex (id, tbl,
    // bucket — no vectors carried, no cosine) — isolates candidate
    // GENERATION from VERIFY
    time("hash (srpIndex build)") {
      Dedup.srpIndex(emb, "vec_id", "embedding", nBits = nBits,
        nTables = 8).count()
    }
    time("candidates only (ids)") {
      val idx = Dedup.srpIndex(emb, "vec_id", "embedding", nBits = nBits,
        nTables = 8)
      val a = idx.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      val b = idx.select(col("tbl"), col("bucket"), col("id").as("id_b"))
      a.join(b, Seq("tbl", "bucket")).filter(col("id_a") < col("id_b"))
        .count()
    }
    // hypothesis: the observe() CollectMetrics node between the wide
    // bucket join and the cosine projection breaks whole-stage codegen,
    // so 7.4M 1.1KB joined rows cross an interpreter boundary — same
    // pipeline, no observe:
    time("wide verify, no observe") {
      graft.functions.HashExpressions.register(spark)
      val v = emb.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("n",
          sqrt(call_function("vec_dot", col("v"), col("v"))))
      val idx = Dedup.srpIndex(emb, "vec_id", "embedding", nBits = nBits,
        nTables = 8)
      def side(s: String) = idx.join(v, "id")
        .select(col("tbl"), col("bucket"), col("id").as(s"id_$s"),
          col("v").as(s"v_$s"), col("n").as(s"n_$s"))
      side("a").join(side("b"), Seq("tbl", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(call_function("vec_dot", col("v_a"), col("v_b")) /
            (col("n_a") * col("n_b")), 6).as("cos"))
        .filter(col("cos") >= 0.4)
        .groupBy(col("id_a"), col("id_b")).agg(first(col("cos")).as("cos"))
        .count()
    }
    try spark.stop() catch { case _: Throwable => }
  }
}
