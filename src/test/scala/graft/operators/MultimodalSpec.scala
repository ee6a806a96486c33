package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media generation is deterministic across runs and partitionings") {
    val a = Multimodal.generate(spark, 50L).collect().sortBy(_.media_id)
    val b = Multimodal.generate(spark, 50L).repartition(7).collect()
      .sortBy(_.media_id)
    assert(a.length === 50)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id === y.media_id)
      assert(java.util.Arrays.equals(x.payload, y.payload))
      assert(x.meta === y.meta)
    }
  }

  test("binary payload + struct metadata survive a parquet round-trip") {
    val out = tmpDir("media")
    Multimodal.generate(spark, 30L).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === 30L)
    val schema = back.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
  }

  test("feature extraction computes exact stub features per batch") {
    val ds = Multimodal.generate(spark, 70L) // spans multiple decode batches
    val feats = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(feats.length === 70)
    assert(feats.forall(f => f.brightness > 0.0 && f.brightness < 1.0))
    assert(feats.forall(_.n_bytes === 4096))
    // spot-check one value against a local recomputation
    val r0 = ds.filter(_.media_id == 0L).head()
    val expected = r0.payload.map(_ & 0xff).sum.toDouble / r0.payload.length / 255.0
    assert(math.abs(feats(0).brightness - expected) < 1e-12)
  }

  test("frame sampling slices every payload into n frames") {
    val ds = Multimodal.generate(spark, 10L)
    val frames = Multimodal.frameSample(ds, 4).collect()
    assert(frames.length === 40)
    assert(frames.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted
      .sameElements(0 until 4)))
    assert(frames.forall(_.frame.length === 1024))
  }
}
