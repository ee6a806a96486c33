package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Dedup

/** Timing probe for `Dedup.prefixJaccardPairs` — repeated isolated runs at
  * one sf so stage-level costs are visible without bench-suite neighbors
  * polluting GC/scheduler state. Usage: tools/run.sh
  * graft.tools.PrefixJoinProbe [sfDir] [reps]
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nReps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = t(spark, dir, "documents").localCheckpoint()
    println(s"docs=${docs.count()}")
    (0 until nReps).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val n = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5).count()
      println(f"rep=$i pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // volume probe: how big is each intermediate?
    graft.functions.HashExpressions.register(spark)
    val sh = docs
      .select(col("doc_id").as("id"), col("text").as("__text"))
      .repartition(32, col("id"))
      .select(col("id"),
        expr("word_shingles(split(trim(lower(__text)), '\\\\s+'), 3)")
          .as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    time("shingleFrame rows", sh.count())
    time("total shingles",
      sh.select(sum(size(col("sh")))).head().getLong(0))
    val toks = sh.select(col("id"), explode(col("sh")).as("tok"))
    time("exploded toks", toks.count())
    time("distinct toks", toks.select("tok").distinct().count())
    // stage-by-stage replica of prefixJaccardPairs at threshold 0.5
    import org.apache.spark.sql.expressions.Window
    val threshold = 0.5
    val grouped = sh
      .withColumn("rep", min(col("id")).over(
        Window.partitionBy(xxhash64(col("sh")),
          xxhash64(lit(7L), col("sh")))))
      .persist()
    time("collapse window rows", grouped.count())
    val reps = grouped.filter(col("id") === col("rep"))
      .select(col("rep"), col("sh")).persist()
    time("reps", reps.count())
    val rtoks = reps.select(col("rep"), explode(col("sh")).as("tok"))
    val dfreq = rtoks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ranked = rtoks.join(dfreq, "tok")
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("rep"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("rep")).orderBy(col("df"), col("tok"))))
    val prefix = ranked
      .filter(col("rk") <= col("n") - ceil(col("n") * threshold - 1e-9) + 1)
      .select(col("rep"), col("tok"), col("n"), col("rk"))
      .persist()
    time("prefix rows", prefix.count())
    // mirrors prefixJaccardPairs' EPS-loosened bounds (see Dedup.scala)
    val joined = prefix.as("a").join(prefix.as("b"),
      col("a.tok") === col("b.tok") && col("a.rep") < col("b.rep") &&
        least(col("a.n"), col("b.n")) >=
          greatest(col("a.n"), col("b.n")) * threshold - 1e-9 &&
        (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")))
          .cast("double") >=
          (col("a.n") + col("b.n")) * (threshold / (1 + threshold)) - 1e-9)
    time("raw candidate rows", joined.count())
    val candRep = joined
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b")).distinct()
      .persist()
    time("distinct candidates", candRep.count())
    val verifiedRep = candRep
      .join(reps.select(col("rep").as("rep_a"), col("sh").as("sh_a")),
        "rep_a")
      .join(reps.select(col("rep").as("rep_b"), col("sh").as("sh_b")),
        "rep_b")
      .select(col("rep_a"), col("rep_b"))
    time("verified join rows", verifiedRep.count())
    spark.stop()
  }

  private def time[A](label: String, a: => A): Unit = {
    val t0 = System.nanoTime()
    val v = a
    println(f"$label: $v (${(System.nanoTime() - t0) / 1e9}%.2f s)")
  }
}
