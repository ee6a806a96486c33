package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables.t
import graft.operators.Bpe

/** Timing probe for Bpe.train: per-merge job latency at one sf. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = t(spark, dir, "documents").localCheckpoint()
    for (n <- Seq(4, 12)) {
      val t0 = System.nanoTime()
      val (m, words) = Bpe.train(docs, "text", nMerges = n)
      val rows = words.count()
      println(f"nMerges=$n got=${m.size} vocabRows=$rows " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
