package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, Similarity}

/** Measurement tool behind `sim_jl_srp_multiprobe`'s recall claims: the
  * JL(64→32) + SRP + exact-rerank serving pipeline probed across the
  * margin-guided nProbe ladder at each scale factor, recall@5 vs
  * ORIGINAL-space brute force. Run: tools/run.sh graft.tools.JlMultiProbe
  */
object JlMultiProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    sfs.foreach { dir =>
      val emb = graft.Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 10)
      val shortK = math.max(50L, emb.count() / 10).toInt
      val brute = Similarity.bruteForceTopK(emb, q, "vec_id",
        "embedding", k = 5).localCheckpoint()
      val projC = Embeddings.jlProject(emb, "embedding", 64, 32)
        .select(col("vec_id"), col("proj"))
      val projQ = Embeddings.jlProject(q, "embedding", 64, 32)
        .select(col("vec_id"), col("proj"))
      val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val recalls = Seq(1, 2, 4, 6, 10).map { np =>
        val shortlist = Similarity.srpTopK(projC, projQ, "vec_id",
          "proj", k = shortK, nBits = 4, nProbe = np)
        val pairs = shortlist.select(col("qid"), col("nid"))
          .join(v.select(col("vec_id").as("qid"), col("v").as("v_q")),
            "qid")
          .join(v.select(col("vec_id").as("nid"), col("v").as("v_n")),
            "nid")
          .select(col("qid"), col("nid"),
            round(Similarity.cosine(col("v_q"), col("v_n")), 6).as("cos"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
        val served = pairs.withColumn("rank",
            row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("qid"), col("rank"), col("nid"), col("cos"))
        f"$np->${graft.queries.Contracts.recall(served, brute)}%.2f"
      }
      println(s"$dir nProbe:recall ${recalls.mkString(" ")}")
      graft.operators.Caching.releaseAllRdds(spark)
    }
    spark.stop()
  }
}
