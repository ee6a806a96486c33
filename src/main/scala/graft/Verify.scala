package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // Optional extra args restrict the dump to the named queries.
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Same codegen-cache bound as Bench (see the comment there): a
      // 264-query sweep holds far more than 100 distinct generated
      // classes, and the default cache thrashes.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // See Bench: per-streaming-run artifact isolation defeats the
      // classloader-keyed codegen cache; no session artifacts here.
      .config("spark.sql.artifact.isolation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_ISOLATION", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only).toMap
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // The driver canonicalizes dumps with pandas (sort + hash), which
        // crashes on struct/array/map cells — flatten any to JSON text.
        // Queries should already emit scalar columns (their oracles must
        // match); this guard keeps one schema slip from zeroing a round.
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
        import org.apache.spark.sql.functions.{col, to_json}
        val nonScalar = df.schema.fields.filter(_.dataType match {
          case _: StructType | _: ArrayType | _: MapType => true
          case _ => false
        })
        val flat =
          if (nonScalar.isEmpty) df
          else {
            System.err.println(
              s"[verify] $name: flattening non-scalar columns " +
                nonScalar.map(_.name).mkString(", "))
            df.select(df.schema.fields.map { f =>
              if (nonScalar.exists(_.name == f.name)) to_json(col(f.name)).as(f.name)
              else col(f.name)
            }.toSeq: _*)
          }
        flat.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // leave a marker next to where the dump would be: a FAILED query is
        // then distinguishable from a never-registered one in the artifacts
        // (both otherwise look like "no spark output" to the checker)
        try Files.writeString(Paths.get(s"$outDir/$name.parquet.FAILED"),
          String.valueOf(e))
        catch { case _: Throwable => }
      } finally {
        // includes localCheckpoint blocks clearCache() can't reach — the
        // sweep accumulates no net-new cached blocks across 88 queries
        graft.operators.Caching.releaseAllRdds(spark)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The driver's checker keys results by output directory name
    // ("<name>.parquet") while queries are registered by bare name; emit
    // every oracle under BOTH keys so either lookup convention matches
    // (round-1 lesson: bare-name-only keys → 87× "no_oracle").
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) =>
        // guard against a query name already ending in .parquet — the
        // unconditional suffix would emit duplicate JSON keys
        if (k.endsWith(".parquet")) Seq(k -> v)
        else Seq(k -> v, s"$k.parquet" -> v)
      }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
