package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.sources.DataGenerator

/** Reference-parity operators (SURVEY.md §2.1/§2.2/§2.4/§2.6/§2.7): scans,
  * identity projection, metadata count, row-range partitioning, JSON
  * serialization, multi-path union, synthetic generation.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // P1: SELECT * identity scan (duckdb…/worker.go:14). Ordered by the PK so
    // the dump is deterministic.
    "scan_identity" -> ((s, dir) =>
      t(s, dir, "customer").orderBy(col("c_custkey"))),

    // A1/A2: COUNT(*) — answered from parquet footer metadata on both
    // engines (duckdb…/handler.go:65-72; pr.GetNumRows() handler.go:173).
    "count_star" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))),

    // O1: LIMIT/OFFSET row-range partition (duckdb…/worker.go:14,
    // handler.go:75-95). Total order via the lineitem PK makes the range
    // well-defined — the reference's version on an unordered file is not.
    "range_partition" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .offset(2500).limit(1000)),

    // F8/P2/S5: per-row JSON serialization (json.Marshal analog,
    // parquetgo…/handler.go:54) — key order = column order on both engines.
    "json_serialize" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          to_json(struct(col("c_custkey"), col("c_name"), col("c_acctbal")))
            .as("js"))
        .orderBy(col("c_custkey"))),

    // X3/§2.7: multi-path scan = union-all of per-file scans
    // (spark.read.parquet(paths: _*); reference loops files sequentially,
    // parquetgo…/handler.go:118).
    "multi_path_union" -> ((s, dir) =>
      graft.Tables.multi(s, Seq(s"$dir/nation.parquet", s"$dir/nation.parquet"))
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_nationkey")).as("sum_key"))
        .orderBy(col("n_regionkey"))),

    // S7: deterministic synthetic Record generation (no SQL oracle — the
    // driver records a rows-only check). Non-scalar columns (address struct,
    // preference/tag arrays) are dumped as JSON text: the driver's pandas
    // canonicalizer can only sort/hash scalar columns (round-1 lesson — the
    // nested dump crashed it). The nested shapes themselves are exercised by
    // the pipeline specs.
    "gen_records" -> ((s, _) => {
      val df = DataGenerator.generate(s, 1000L, seed = 42L).toDF()
      df.select(df.schema.fields.map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType =>
            to_json(col(f.name)).as(f.name)
          case _ => col(f.name)
        }
      }.toSeq: _*)
    }),

    // S7 as a pluggable DataSource V2 (format("graft-records")): source-level
    // partition planning + column pruning; determinism across partitionings
    // is asserted in RecordDataSourceSpec (no SQL oracle — rows-only check).
    "v2_source_records" -> ((s, _) =>
      s.read.format("graft-records")
        .option("rows", 1000).option("seed", 42).option("partitions", 8)
        .load()
        .groupBy(col("account_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("account_balance")), 2).as("bal"))
        .orderBy(col("account_type"))),

    // S5+S6+F8/F9 end-to-end: the reference's whole pipeline — parquet scan →
    // to_json → batched queue publish → consume → from_json — then an
    // aggregate over the round-tripped rows. Matching the oracle run directly
    // on the source table proves the transport is lossless.
    "publish_roundtrip" -> ((s, dir) => {
      val qn = s"roundtrip-${java.util.UUID.randomUUID()}"
      graft.pipeline.Publisher.publish(s,
        graft.pipeline.Publisher.PublishRequest(
          Seq(s"$dir/customer.parquet"), idColumn = "c_custkey"),
        new graft.pipeline.InMemoryQueueClient(qn))
      val schema = s.read.parquet(s"$dir/customer.parquet").schema
      graft.pipeline.Consumer.consume(s, qn, schema)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal"))
        .orderBy(col("c_mktsegment"))
    })
  )

  val oracles: Map[String, String] = Map(
    "scan_identity" ->
      "SELECT * FROM customer ORDER BY c_custkey",
    "count_star" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "range_partition" ->
      """SELECT * FROM lineitem
        |ORDER BY l_orderkey, l_linenumber
        |LIMIT 1000 OFFSET 2500""".stripMargin,
    "json_serialize" ->
      """SELECT c_custkey,
        |  to_json(struct_pack(c_custkey := c_custkey, c_name := c_name,
        |                      c_acctbal := c_acctbal))::VARCHAR AS js
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "multi_path_union" ->
      """SELECT n_regionkey, count(*) AS cnt, sum(n_nationkey)::BIGINT AS sum_key
        |FROM (SELECT * FROM nation UNION ALL SELECT * FROM nation)
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "publish_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
