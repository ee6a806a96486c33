package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir; reading
  * through here (rather than ad-hoc paths) keeps every query's scan going
  * through the vectorized parquet reader with pushdown/pruning intact, and
  * gives one seam where a real deployment would swap in `s3a://` paths or a
  * catalog. (Reference analog: the per-request `paths` list handed to the
  * Lambda handlers — cmd/parquetgo-record-processor/handler.go:118.)
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Some generator versions write events.ts as parquet TIMESTAMP(NANOS),
      // which Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL); with
      // nanosAsLong those arrive as raw longs and need an exact integer
      // nanos→micros conversion (a double division would lose precision at
      // 1e18 nanoseconds). Newer data is TIMESTAMP(MICROS) and needs
      // nothing — branch on the type actually read.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Normalize to TimestampType (session TZ is UTC) so every
          // downstream consumer — window(), watermarks, date arithmetic,
          // the DuckDB oracle round-trip — sees the one timestamp flavor
          // the whole query surface is contracted against.
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Multi-path scan (union of files) — the Spark-idiomatic restatement of the
    * reference's sequential per-file loop (SURVEY.md §2.7/X3).
    */
  def multi(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  /** Register every table as a temp view so `spark.sql` can run arbitrary
    * multi-table SQL against the scale dir — the catalog-shaped entry point
    * (the reference's SQL surface is one DuckDB string per file;
    * duckdb…/worker.go:14).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
