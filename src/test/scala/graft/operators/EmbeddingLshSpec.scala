package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingLshSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("LSH pairs are a verified subset of the exact pairs (precision 1.0)") {
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.4,
      nBits = 3, nTables = 8)
    val exact = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4)
    assert(lsh.join(exact, Seq("id_a", "id_b"), "left_anti").isEmpty)
    // and the cosines it reports are the exact ones
    val joined = lsh.as("l").join(exact.as("e"), Seq("id_a", "id_b"))
    assert(joined.filter(col("l.cos") =!= col("e.cos")).isEmpty)
  }

  test("recall: more tables recover more of the exact pair set") {
    val exact = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").cache()
    val nExact = exact.count()
    assert(nExact > 0, "test data should contain near-dup embeddings")
    def recallAt(nTables: Int): Double = {
      val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.4,
        nBits = 3, nTables = nTables).select("id_a", "id_b")
      exact.join(lsh, Seq("id_a", "id_b"), "left_semi").count().toDouble / nExact
    }
    val r1 = recallAt(1); val r8 = recallAt(8)
    assert(r8 >= r1, s"r1=$r1 r8=$r8")
    assert(r8 >= 0.6, s"recall@8tables=$r8")
    exact.unpersist()
  }

  test("near-identical vectors collide in every table (cos ≈ 1)") {
    val base = (0 until 16).map(_.toFloat)
    val tweaked = base.updated(0, 0.001f)
    val pairs = Dedup.embeddingPairsLsh(
      Seq((1L, base), (2L, tweaked)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", 0.9, nBits = 3, nTables = 1)
    assert(pairs.count() == 1)
  }

  test("each pair is emitted once despite multi-table collisions") {
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.4,
      nBits = 3, nTables = 8)
    assert(lsh.groupBy("id_a", "id_b").count().filter(col("count") > 1)
      .isEmpty)
  }
}
