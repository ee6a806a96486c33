package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Phase-level profile of the two heaviest streaming folds' PER-BATCH
  * bodies (text-index append, SRP-embedding-index batch), run as plain
  * batch calls on a staged 1/3 slice — where does the ~1.3-1.9 s per
  * micro-batch actually go?
  *
  * Usage: tools/run.sh graft.tools.IndexFoldProbe <sfDir>
  */
object IndexFoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val emb = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val stage = java.nio.file.Files
      .createTempDirectory("graft-ifp-").toString

    println("== text index: batch 3 of 3 (append to 2-batch store)")
    val idx = s"$stage/ti"
    TextAnalysis.initTextIndex(spark, idx, 16)
    (0 until 2).foreach { i =>
      TextAnalysis.appendToTextIndex(docs.filter(col("doc_id") % 3 === i),
        "doc_id", "text", idx, i.toLong)
    }
    (1 to 2).foreach { rep =>
      println(s" rep $rep")
      val b = docs.filter(col("doc_id") % 3 === 2)
      time("appendToTextIndex whole") {
        TextAnalysis.appendToTextIndex(b, "doc_id", "text", idx, 2L)
      }
    }
    // manual split of the same append
    val b = docs.filter(col("doc_id") % 3 === 2)
    val nBuckets = 16
    val tf = time("tf agg localCheckpoint") {
      b.select(col("doc_id").as("doc"),
          explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
        .localCheckpoint()
    }
    time("postings write (partitionBy)") {
      tf.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$stage/p/batch=9")
    }
    time("df agg+write (partitionBy)") {
      tf.groupBy(col("bucket"), col("term")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$stage/d/batch=9")
    }
    time("postings write (repart bucket)") {
      tf.repartition(col("bucket")).write.mode("overwrite")
        .partitionBy("bucket").parquet(s"$stage/p2/batch=9")
    }
    time("df agg+write (repart bucket)") {
      tf.groupBy(col("bucket"), col("term")).agg(count(lit(1)).as("df"))
        .repartition(col("bucket")).write.mode("overwrite")
        .partitionBy("bucket").parquet(s"$stage/d2/batch=9")
    }
    val norms = time("norms agg localCheckpoint") {
      tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl")).localCheckpoint()
    }
    time("norms write") {
      norms.write.mode("overwrite").parquet(s"$stage/n/batch=9")
    }
    time("stats agg+write") {
      norms.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/s/batch=9")
    }
    // r15 single-pass form: all four stores as one null-padded union,
    // one partitioned write (store=/bucket= dirs derived at read)
    time("unified 4-store write (r15 form)") {
      val nullL = lit(null).cast("long")
      val nullDoc = lit(null).cast(tf.schema("doc").dataType)
      val nullTerm = lit(null).cast("string")
      val postings = tf.select(lit("postings").as("store"), col("bucket"),
        col("doc"), col("term"), col("tf"), nullL.as("df"), nullL.as("dl"),
        nullL.as("n_docs"), nullL.as("total_dl"))
      val dfreq = tf.groupBy(col("bucket"), col("term"))
        .agg(count(lit(1)).as("df"))
        .select(lit("df").as("store"), col("bucket"), nullDoc.as("doc"),
          col("term"), nullL.as("tf"), col("df"), nullL.as("dl"),
          nullL.as("n_docs"), nullL.as("total_dl"))
      val nm = tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
      val normsRows = nm.select(lit("norms").as("store"),
        lit(-1).as("bucket"), col("doc"), nullTerm.as("term"),
        nullL.as("tf"), nullL.as("df"), col("dl"), nullL.as("n_docs"),
        nullL.as("total_dl"))
      val stats = nm
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .select(lit("stats").as("store"), lit(-1).as("bucket"),
          nullDoc.as("doc"), nullTerm.as("term"), nullL.as("tf"),
          nullL.as("df"), nullL.as("dl"), col("n_docs"), col("total_dl"))
      postings.unionByName(dfreq).unionByName(normsRows).unionByName(stats)
        .write.mode("overwrite").partitionBy("store", "bucket")
        .parquet(s"$stage/u/batch=9")
    }

    println("== embedding index: batch 3 of 3")
    val eStage = s"$stage/emb"
    (0 until 2).foreach { i =>
      val slice = emb.filter(col("vec_id") % 3 === i)
      slice.coalesce(1).write.parquet(s"$eStage/corpus/b$i")
      Dedup.srpIndex(slice, "vec_id", "embedding").coalesce(1)
        .write.parquet(s"$eStage/idx/b$i")
    }
    (1 to 2).foreach { rep =>
      println(s" rep $rep")
      val eb = emb.filter(col("vec_id") % 3 === 2)
      val pairs = time("embeddingPairsLshIncremental") {
        Dedup.embeddingPairsLshIncremental(eb,
          spark.read.parquet(s"$eStage/corpus/b*"),
          spark.read.parquet(s"$eStage/idx/b*"),
          "vec_id", "embedding", 0.4)
      }
      time("pairs write") {
        pairs.select(col("id_a"), col("id_b"), col("cos")).coalesce(1)
          .write.mode("overwrite").parquet(s"$eStage/pairs/b2")
      }
      time("corpus write") {
        eb.coalesce(1).write.mode("overwrite")
          .parquet(s"$eStage/corpus2/b2")
      }
      time("srpIndex recompute+write") {
        Dedup.srpIndex(eb, "vec_id", "embedding").coalesce(1)
          .write.mode("overwrite").parquet(s"$eStage/idx2/b2")
      }
    }
    spark.stop()
  }
}
