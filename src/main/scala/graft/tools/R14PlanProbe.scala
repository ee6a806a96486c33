package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** r14 plan evidence for the two cross-cutting optimizations whose plan
  * shape is invisible in a registered query's `.explain` (those operators
  * materialize internally, so their query-level plan is a checkpoint-leaf
  * scan):
  *
  *  1. "materialized orderBy": a global sort directly under an eager
  *     localCheckpoint adds `Exchange rangepartitioning` + `Sort` whose
  *     range-boundary sampling re-executes the whole child subtree.
  *     Printed here on the minhash verify-join frame, with and without
  *     the trailing orderBy — the shapes the r14 change removed/kept.
  *  2. "multi-referenced candidate subtree": embeddingPairsLshIncremental
  *     referenced its candidate frame from 5 places; the r14 fix persists
  *     it (InMemoryRelation in the final plan instead of 5 copies of the
  *     bucket-join/distinct subtree).
  *
  * Usage: tools/run.sh graft.tools.R14PlanProbe <sfDir> <outDir>
  */
object R14PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r14")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
      println(s"wrote $outDir/$name.txt (${plan.length} chars)")
    }
    val docs = Tables.t(spark, sfDir, "documents")

    // 1. the pair-verify frame (jaccardPairs body, pre-checkpoint), with
    // and without the trailing global sort
    val pairs = {
      graft.functions.HashExpressions.register(spark)
      val sh = docs.select(col("doc_id").as("id"), col("text").as("__text"))
        .repartition(8, col("id"))
        .select(col("id"),
          expr("word_shingles(split(trim(lower(__text)), '\\\\s+'), 3)")
            .as("sh"))
        .filter(size(col("sh")) > 0)
      val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
    }
    dump("pattern_pairs_sorted_before", pairs.orderBy(col("id_a"), col("id_b")))
    dump("pattern_pairs_unsorted_after", pairs)

    spark.stop()
  }
}
