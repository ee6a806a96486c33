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

    // S7: deterministic synthetic Record generation, driver-checked via a
    // contract row (see Contracts): every reference value-domain constraint
    // (cmd/create-test-data/main.go:97-177 — enum domains, email/phone/DOB
    // formats, balance range, array arities, 1000-char body) holds on every
    // row, ids are unique, and the output is bit-identical under a different
    // partitioning — the determinism guarantee the reference's unseeded
    // generator lacks and a distributed re-run needs.
    "gen_records" -> ((s, _) => {
      import graft.model.Domains._
      val df = DataGenerator.generate(s, 1000L, seed = 42L).toDF()
        .localCheckpoint()
      val df8 = DataGenerator.generate(s, 1000L, seed = 42L,
        numPartitions = 8).toDF()
      val domainsOk = Contracts.forAll(df,
        col("account_type").isin(accountTypes: _*) &&
          col("account_status").isin(accountStatuses: _*) &&
          col("language").isin(languages: _*) &&
          col("email").rlike("^[a-z]+\\.[a-z]+@[a-z0-9.]+$") &&
          col("phone_number").rlike("^\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}$") &&
          col("date_of_birth")
            .rlike("^19[5-9][0-9]-(0[1-9]|1[0-2])-(0[1-9]|1[0-9]|2[0-8])$") &&
          col("account_balance") >= 0.0 && col("account_balance") < 10000.0 &&
          size(col("communication_preferences")).between(1, 4) &&
          size(col("tags")).between(0, 3) &&
          length(col("body")) === bodyLength &&
          col("id").rlike("^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-" +
            "[0-9a-f]{4}-[0-9a-f]{12}$"))
      Contracts.row(s,
        "n_rows" -> df.count(),
        "domains_ok" -> domainsOk,
        "distinct_ids_ok" ->
          (df.select(col("id")).distinct().count() == 1000L),
        "partition_invariant_ok" ->
          (Contracts.checksum(df) == Contracts.checksum(df8)))
    }),

    // S7 as a pluggable DataSource V2 (format("graft-records")): the
    // contract row proves source-level partition planning is semantically
    // invisible (2-partition and 8-partition reads are bit-identical), the
    // full row count arrives, and a pruned single-column read aggregates to
    // the same distribution as the full-schema read (column pruning returns
    // the same data, just narrower).
    "v2_source_records" -> ((s, _) => {
      def rd(parts: Int) = s.read.format("graft-records")
        .option("rows", 1000).option("seed", 42).option("partitions", parts)
        .load()
      val v8 = rd(8).localCheckpoint()
      val prunedAgg = rd(8).select(col("account_type"))
        .groupBy(col("account_type")).agg(count(lit(1)).as("n"))
      val fullAgg = v8.groupBy(col("account_type")).agg(count(lit(1)).as("n"))
      Contracts.row(s,
        "n_rows" -> v8.count(),
        "partition_invariant_ok" ->
          (Contracts.checksum(v8) == Contracts.checksum(rd(2))),
        "pruned_read_matches_ok" ->
          Contracts.sameKeys(prunedAgg, fullAgg, Seq("account_type", "n")),
        "domains_ok" -> Contracts.forAll(v8,
          col("account_type").isin(graft.model.Domains.accountTypes: _*) &&
            col("account_balance") >= 0.0 &&
            col("account_balance") < 10000.0))
    }),

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
    }),

    // F8 Go-parity: serializeGoCompat's JSON is byte-compatible with Go
    // json.Marshal of the reference Record (internal/models/record.go:7-34).
    // Contract: RFC3339 seconds-resolution timestamps with no fractional
    // part, no Jackson-style trailing ".0" on whole floats anywhere in the
    // payload, and a full from_json round-trip reconstructs the source
    // frame bit-for-bit (checksum over all columns). The byte-level golden
    // lines themselves are asserted in GoJsonParitySpec.
    "gojson_parity" -> ((s, _) => {
      val df = DataGenerator.generate(s, 500L, seed = 42L).toDF()
        .localCheckpoint()
      val ser = graft.pipeline.Publisher.serializeGoCompat(df, "id")
        .toDF().localCheckpoint()
      val back = ser
        .select(from_json(col("body"), df.schema,
          Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ssXXX",
              "timeZone" -> "UTC")).as("r"))
        .select("r.*")
      Contracts.row(s,
        "n_msgs" -> ser.count(),
        "rfc3339_seconds_ok" -> Contracts.forAll(ser,
          col("body").rlike(
            "\"created_at\":\"\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z\"") &&
            col("body").rlike(
              "\"last_login_date\":\"\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z\"")),
        "whole_floats_go_style_ok" -> Contracts.forAll(ser,
          !col("body").rlike("\":-?\\d+\\.0[,}]")),
        "roundtrip_ok" ->
          (Contracts.checksum(back) == Contracts.checksum(df)))
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
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // Contract rows (see Contracts): the Spark side proves the generator /
    // V2-source invariants distributed; the oracle contributes the literal
    // expectations, making each boolean a hard driver pass/fail.
    "gen_records" ->
      """SELECT 1000::BIGINT AS n_rows, TRUE AS domains_ok,
        |  TRUE AS distinct_ids_ok,
        |  TRUE AS partition_invariant_ok""".stripMargin,

    "v2_source_records" ->
      """SELECT 1000::BIGINT AS n_rows, TRUE AS partition_invariant_ok,
        |  TRUE AS pruned_read_matches_ok, TRUE AS domains_ok""".stripMargin,

    "gojson_parity" ->
      """SELECT 500::BIGINT AS n_msgs, TRUE AS rfc3339_seconds_ok,
        |  TRUE AS whole_floats_go_style_ok, TRUE AS roundtrip_ok""".stripMargin
  )
}
