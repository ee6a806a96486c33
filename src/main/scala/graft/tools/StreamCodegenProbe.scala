package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Why do the streaming index folds recompile ~10-20 codegen classes per
  * batch on EVERY bench rep while the batch queries hit the (enlarged)
  * codegen cache? This probe runs the same tiny aggregate (a) as a plain
  * batch query twice, (b) inside two separate foreachBatch streams over
  * the same staged file, printing the per-run compile count from
  * CodegenMetrics. If (b) recompiles on the second stream while (a) does
  * not, the miss is streaming-execution-specific (fresh cloned session /
  * classloader in the cache key), not source-text churn.
  *
  * Usage: tools/run.sh graft.tools.StreamCodegenProbe <sfDir>
  */
object StreamCodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.artifact.isolation.enabled", sys.env.getOrElse("PROBE_ISO", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dump each wholestage source (driver logs it at DEBUG before compiling)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen",
      org.apache.logging.log4j.Level.DEBUG)
    def nCompiles = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val stage = Files.createTempDirectory("graft-cgp-").toString
    docs.coalesce(1).write.parquet(s"$stage/in/f0.parquet")

    def body(b: DataFrame): Unit = {
      b.groupBy(col("doc_id") % 7).agg(count(lit(1)), sum(length(col("text"))))
        .write.mode("overwrite").parquet(s"$stage/out")
      ()
    }
    // batch runs
    (1 to 2).foreach { i =>
      val c0 = nCompiles
      body(spark.read.parquet(s"$stage/in/f0.parquet"))
      println(s"batch run $i compiles=${nCompiles - c0}")
    }
    // stream runs (fresh checkpoint per run, same input)
    (1 to 2).foreach { i =>
      val c0 = nCompiles
      val q = spark.readStream.schema(docs.schema)
        .parquet(s"$stage/in/*.parquet")
        .writeStream
        .option("checkpointLocation", s"$stage/ckpt$i")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val l = Thread.currentThread().getContextClassLoader
          println(s"  foreachBatch thread=${Thread.currentThread().getName}" +
            s" loader=${l.getClass.getName}@" +
            Integer.toHexString(System.identityHashCode(l)))
          body(b)
        }
        .start()
      q.awaitTermination()
      println(s"stream run $i compiles=${nCompiles - c0}")
      dumpCacheKeys()
    }
    spark.stop()
  }

  /** Reflectively dump the codegen cache's keys: how many distinct
    * classloader referents, and how many distinct source bodies.
    */
  private def dumpCacheKeys(): Unit = {
    try {
      val mod = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val inst = mod.getField("MODULE$").get(null)
      val m = mod.getDeclaredMethods.find(_.getName == "cache").get
      m.setAccessible(true)
      val cache = m.invoke(inst)
      // NonFateSharingLoadingCache wraps a guava LoadingCache in field
      val f = cache.getClass.getDeclaredFields.find(
        _.getType.getName.contains("Cache")).get
      f.setAccessible(true)
      val guava = f.get(cache)
        .asInstanceOf[com.google.common.cache.Cache[AnyRef, AnyRef]]
      import scala.jdk.CollectionConverters._
      val keys = guava.asMap().keySet().asScala.toSeq
      val loaders = new java.util.IdentityHashMap[AnyRef, AnyRef]()
      var bodies = Set[Int]()
      keys.foreach { k =>
        val t = k.asInstanceOf[(AnyRef, AnyRef)]
        val refF = t._1.getClass.getDeclaredFields.find(
          _.getName.contains("ref")).orNull
        if (refF != null) {
          refF.setAccessible(true)
          val r = refF.get(t._1) match {
            case w: java.lang.ref.WeakReference[_] =>
              w.get.asInstanceOf[AnyRef]
            case x => x
          }
          if (r != null) loaders.put(r, r)
        }
        bodies += t._2.hashCode()
      }
      println(s"  cache entries=${keys.size} " +
        s"distinct_loaders=${loaders.size} distinct_bodies=${bodies.size}")
      loaders.keySet().asScala.foreach(l => println(s"   loader: $l"))
    } catch { case e: Throwable => println(s"  [dump failed: $e]") }
  }
}
