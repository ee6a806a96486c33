package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 512L

  private lazy val docs = spark.range(0, 3000).toDF("doc")
    // deterministic pseudo-random token counts in [1, 400]
    .withColumn("toks", pmod(xxhash64(col("doc")), lit(400L)) + 1L)

  private lazy val packed =
    Packing.packSequences(docs, "doc", col("toks"), budget, nShards = 8)
      .localCheckpoint()

  test("token totals are conserved and every doc is assigned exactly once") {
    assert(packed.count() == 3000)
    val in = docs.agg(sum("toks")).head().getLong(0)
    val out = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(in == out)
  }

  test("packs within a shard are contiguous from 0 with no gaps") {
    val ok = packed.groupBy("shard")
      .agg(min("pack").as("lo"), max("pack").as("hi"),
        count_distinct(col("pack")).as("nd"))
      .filter(col("lo") =!= 0 || col("nd") =!= col("hi") + 1)
    assert(ok.isEmpty)
  }

  test("greedy-fill contract: overflow is bounded by one document tail") {
    val stats = Packing.packStats(packed, budget)
    // a pack exceeds the budget only because its LAST doc straddles the
    // boundary, so the overflow is strictly less than that doc's length
    assert(stats.filter(col("over_budget") >= col("max_doc_tokens")).isEmpty)
    // and every pack except a shard's last is filled past nothing-fits:
    // its start offset is < budget by construction
    val nonTrivial = stats.filter(col("pack_tokens") > 0)
    assert(nonTrivial.count() > 0)
  }

  test("assignment is deterministic under repartitioning") {
    val again = Packing.packSequences(docs.repartition(17), "doc",
      col("toks"), budget, nShards = 8)
    assert(packed.select("doc", "shard", "pack")
      .exceptAll(again.select("doc", "shard", "pack")).isEmpty)
  }

  test("conservation and overflow bound hold across generated distributions") {
    // uniform-small, heavy-tailed, constant, and budget-sized token counts
    val shapes = Seq[(String, org.apache.spark.sql.Column)](
      "uniform" -> (pmod(xxhash64(col("doc"), lit(1)), lit(50L)) + 1L),
      "heavy" -> (pmod(xxhash64(col("doc"), lit(2)), lit(3L)) * 200L + 1L),
      "constant" -> lit(37L),
      "budget-sized" -> lit(512L))
    for ((name, toks) <- shapes) {
      val df = spark.range(0, 500).toDF("doc").withColumn("toks", toks)
      val p = Packing.packSequences(df, "doc", col("toks"), budget, 4)
      val in = df.agg(sum("toks")).head().getLong(0)
      assert(p.agg(sum("n_tokens")).head().getLong(0) == in, name)
      val stats = Packing.packStats(p, budget)
      assert(stats.filter(col("over_budget") >= col("max_doc_tokens")).isEmpty,
        s"$name: overflow exceeded one doc tail")
    }
  }

  test("non-integral id column is rejected, not silently mono-sharded") {
    val df = Seq(("a", 10L), ("b", 20L)).toDF("doc", "toks")
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(df, "doc", col("toks"), 100L, 4)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("the plan shuffles once (by shard) — no global sort") {
    val plan = Packing.packSequences(docs, "doc", col("toks"), budget, 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("lengthBucketBatches: buckets are the smallest pow2 ≥ tok, batches " +
      "are full except at most the last per bucket, pad_ppm is exact") {
    val bs = 8
    val out = Packing.lengthBucketBatches(docs, "doc", col("toks"), bs, "p1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (bucket, _, nDocs, maxTok, sumTok, padPpm) =>
      assert((bucket & (bucket - 1)) == 0 && bucket >= 1, s"bucket $bucket")
      // smallest power-of-two ≥ tok: max_tok in (bucket/2, bucket]
      assert(maxTok <= bucket && maxTok > bucket / 2,
        s"max_tok $maxTok outside ($bucket/2, $bucket]")
      assert(nDocs <= bs)
      val envelope = bucket * nDocs
      assert(padPpm == (envelope - sumTok) * 1000000L / envelope)
    }
    // at most one short batch per bucket, and it carries the max batch_id
    out.groupBy(_._1).foreach { case (bucket, batches) =>
      val short = batches.filter(_._3 < bs)
      assert(short.length <= 1, s"bucket $bucket has ${short.length} short")
      short.foreach { b =>
        assert(b._2 == batches.map(_._2).max,
          s"short batch of bucket $bucket is not the last") }
    }
    // every doc is batched exactly once
    assert(out.map(_._3).sum == docs.count())
  }

  test("lengthBucketBatches is partition-invariant") {
    val a = Packing.lengthBucketBatches(docs, "doc", col("toks"), 8, "p1")
      .collect().map(_.toSeq).toSet
    val b = Packing.lengthBucketBatches(docs.repartition(17), "doc",
        col("toks"), 8, "p1")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
