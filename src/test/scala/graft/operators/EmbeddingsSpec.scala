package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen recovers a known symmetric spectrum") {
    // diag(5, 2, 1) rotated by a known orthogonal matrix keeps its spectrum
    val m = Array(
      Array(3.5, 1.5, 0.0),
      Array(1.5, 3.5, 0.0),
      Array(0.0, 0.0, 1.0)) // eigenvalues 5, 2, 1
    val (eig, vecs) = Embeddings.jacobiEigen(m)
    assert(eig.zip(Seq(5.0, 2.0, 1.0)).forall { case (a, b) =>
      math.abs(a - b) < 1e-10 })
    // eigenvectors orthonormal
    for (i <- vecs.indices; j <- vecs.indices) {
      val dot = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10, s"($i,$j)")
    }
  }

  test("first component aligns with a planted dominant direction") {
    // points spread widely along (1,1,0)/√2 with small noise elsewhere
    val rng = new scala.util.Random(5)
    val rows = (1 to 400).map { _ =>
      val a = rng.nextGaussian() * 10.0
      val n1 = rng.nextGaussian() * 0.1
      val n2 = rng.nextGaussian() * 0.1
      Seq(a / math.sqrt(2) + n1, a / math.sqrt(2) - n1, n2)
    }
    val df = rows.toDF("v")
    val model = Embeddings.fitPca(df, "v", k = 3)
    val c0 = model.components(0)
    val dir = Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0)
    val cos = math.abs(c0.zip(dir).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"first PC misaligned: cos=$cos")
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1))
  }

  test("projected variance matches eigenvalues; whitening normalizes it") {
    val emb = t(spark, sfDir, "embeddings")
    val model = Embeddings.fitPca(emb, "embedding", k = 4)
    def variances(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      (0 until 4).map { i =>
        df.select(var_pop(col("pc")(i))).head().getDouble(0)
      }
    val proj = Embeddings.project(emb, "embedding", model)
    val vs = variances(proj)
    vs.zip(model.eigenvalues).foreach { case (v, e) =>
      assert(math.abs(v - e) <= 1e-6 * math.max(e, 1.0), s"v=$v e=$e")
    }
    assert(vs.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "variance must be decreasing across components")
    val white = Embeddings.project(emb, "embedding", model, whiten = true)
    variances(white).foreach(v => assert(math.abs(v - 1.0) < 1e-6, s"v=$v"))
  }

  test("kmeans recovers well-separated blobs exactly (up to relabeling)") {
    val rng = new scala.util.Random(11)
    val centers = Seq(Seq(10.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0),
      Seq(0.0, 0.0, 10.0))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rng.nextGaussian() * 0.2))
    }
    val df = rows.toDF("vec_id", "v")
    val (assigned, cent) = Embeddings.kmeans(df, "vec_id", "v", k = 3,
      iters = 5)
    assert(cent.length == 3)
    val byBlob = assigned.select(col("vec_id"), col("cluster"))
      .as[(Long, Int)].collect()
      .groupBy { case (id, _) => id % 3 }
      .map { case (b, xs) => b -> xs.map(_._2).toSet }
    // each blob maps to exactly one cluster, and the three differ
    assert(byBlob.values.forall(_.size == 1), byBlob.toString)
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("kmeans: more iterations never hurt the mean-cosine objective") {
    val emb = t(spark, sfDir, "embeddings")
    def objective(iters: Int): Double = {
      val (assigned, cent) = Embeddings.kmeans(emb, "vec_id", "embedding",
        k = 8, iters = iters)
      val v = col("embedding").cast("array<double>")
      val best = greatest(cent.map(c =>
        call_function("vec_dot", v, typedlit(c.toSeq)) /
          sqrt(call_function("vec_dot", v, v))): _*)
      assigned.select(avg(best)).head().getDouble(0)
    }
    val o0 = objective(0); val o3 = objective(3)
    assert(o3 >= o0 - 1e-9, s"o0=$o0 o3=$o3")
  }

  test("fit is partition-invariant up to fp ulps; projection deterministic") {
    val emb = t(spark, sfDir, "embeddings")
    val m1 = Embeddings.fitPca(emb, "embedding", k = 2)
    val m2 = Embeddings.fitPca(emb.repartition(13), "embedding", k = 2)
    m1.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8 * math.max(math.abs(a), 1.0))
    }
    val p1 = Embeddings.project(emb, "embedding", m1)
      .select(col("vec_id"), round(col("pc")(0), 6).as("p"))
      .as[(Long, Double)].collect().toMap
    val p2 = Embeddings.project(emb.repartition(7), "embedding", m1)
      .select(col("vec_id"), round(col("pc")(0), 6).as("p"))
      .as[(Long, Double)].collect().toMap
    assert(p1 == p2)
  }

  test("semanticDedup keeps one representative per planted near-dup group") {
    // two tight groups around orthogonal axes plus two isolated directions;
    // within-group cosine ≈ 1, cross-group ≈ 0
    val rng = new scala.util.Random(17)
    def around(axis: Int, n: Int, base: Long) = (0 until n).map { i =>
      val v = Array.tabulate(8)(d =>
        (if (d == axis) 1.0 else 0.0) + rng.nextGaussian() * 0.01)
      (base + i, v.toSeq)
    }
    val rows = around(0, 4, 10L) ++ around(1, 3, 20L) ++
      Seq((30L, Array.tabulate(8)(d => if (d == 2) 1.0 else 0.0).toSeq),
        (31L, Array.tabulate(8)(d => if (d == 3) 1.0 else 0.0).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val (survivors, pairs) = Embeddings.semanticDedup(df, "vec_id",
      "embedding", k = 4, threshold = 0.9, iters = 3, seed = 7L)
    val kept = survivors.select("vec_id").as[Long].collect().toSet
    // group minima and the two singletons survive; group tails don't
    assert(kept === Set(10L, 20L, 30L, 31L))
    // pair audit trail covers every dropped id
    val inPairs = pairs.select(col("id_a")).union(pairs.select(col("id_b")))
      .as[Long].collect().toSet
    assert(Set(11L, 12L, 13L, 21L, 22L).subsetOf(inPairs))
  }

  test("assignMulti recovers a boundary pair the top-1 partition splits") {
    // two clear clusters on axes 0 and 1 plus a near-dup PAIR sitting on
    // the diagonal boundary, nudged so its members land in DIFFERENT top-1
    // clusters: single-probe pairs miss it, top-2 multi-probe finds it
    def v(x: Double, y: Double) = Array(x, y, 0.0, 0.0).toSeq
    val rows = Seq(
      (0L, v(1.0, 0.0)), (1L, v(0.98, 0.05)), (2L, v(0.99, -0.04)),
      (10L, v(0.0, 1.0)), (11L, v(0.05, 0.98)), (12L, v(-0.04, 0.99)),
      (20L, v(0.72, 0.69)), (21L, v(0.69, 0.72))) // the boundary pair
    val df = rows.toDF("vec_id", "embedding")
    // fixed axis centroids make the straddle deterministic: 20 → cluster 0
    // (x-heavier), 21 → cluster 1 (y-heavier)
    val cent = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val assigned = Embeddings.assign(df, "vec_id", "embedding", cent)
    val single = Embeddings.semanticPairs(assigned, "vec_id", "embedding",
      "cluster", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val multi = Embeddings.semanticPairs(
      Embeddings.assignMulti(df, "embedding", cent, probes = 2),
      "vec_id", "embedding", "cluster", threshold = 0.99)
      .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
    // cos(20,21) ≈ 0.9982 — a genuine near-dup; verify the split happened
    // (otherwise the test is vacuous) and multi-probe claws it back
    val c20 = assigned.filter(col("vec_id") === 20L)
      .select("cluster").head().getInt(0)
    val c21 = assigned.filter(col("vec_id") === 21L)
      .select("cluster").head().getInt(0)
    assert(c20 != c21, "boundary pair must straddle the top-1 partition")
    assert(!single.contains((20L, 21L)))
    assert(multi.contains((20L, 21L)))
    assert(single.subsetOf(multi), "multi-probe candidates are a superset")
  }

  test("jlProject: projection matches the hand-computed sign dot products") {
    val v = Array(1.0, 2.0, -3.0, 0.5)
    val df = Seq((1L, v.toSeq)).toDF("id", "v")
    val got = Embeddings.jlProject(df, "v", dIn = 4, dOut = 2, seed = "t")
      .select("proj").as[Seq[Double]].head()
    val scale = 1.0 / math.sqrt(2.0)
    val want = (0 until 2).map { j =>
      (0 until 4).map(i => Embeddings.jlSign("t", j, i) * v(i)).sum * scale
    }
    assert(got.zip(want).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("jlProject: JL distortion holds on deterministic pseudo-random " +
      "vectors, and the projection is a pure function of (vector, seed)") {
    // hash-derived vectors: reproducible without Random
    val vecs = (0 until 120).map { r =>
      (r.toLong, (0 until 64).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"v:$r:$i".getBytes("UTF-8"))
        (((h(0) & 0xFF) << 8 | (h(1) & 0xFF)) / 65535.0 - 0.5)
      })
    }
    val df = vecs.toDF("id", "v")
    val proj = Embeddings.jlProject(df, "v", 64, 32, "s")
      .select("id", "proj").as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map(_._2)
    val orig = vecs.map(_._2)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0 until 40; j <- (i + 1) until 40
    } yield d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    val sorted = ratios.sorted
    assert(math.abs(ratios.sum / ratios.size - 1.0) < 0.15)
    assert(sorted(sorted.size / 2) > 0.75 && sorted(sorted.size / 2) < 1.25)
    assert(sorted((sorted.size * 95) / 100) < 1.9)
    val again = Embeddings.jlProject(df.repartition(7), "v", 64, 32, "s")
      .select("id", "proj").as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map(_._2)
    assert(proj.zip(again).forall { case (a, b) => a == b })
  }
}
