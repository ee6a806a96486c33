package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic sf1 fixtures for the fourth scale decade (r10 verdict
  * item #7): `documents` / `embeddings` / `events` at 10x their sf0.1
  * volumes, matching the driver testdata's schemas and marginal
  * distributions (measured from /root/testdata/sf0.1: 31-word vocab —
  * grown to 98 Zipf-drawn types at sf1 per Heaps' law, see [[vocab]] —
  * 10..98-token docs, lang mix ~.41/.15/.15/.15/.14, 20 sources, ~0.16%
  * exact dups; dim-64 ISOTROPIC embeddings — see writeEmbeddings; 30-day
  * event window, 15 users per 1k events — 1500 users / 100k events at
  * sf0.1 — exponential-ish values).
  *
  * Why it exists: the driver's decades stop at sf0.1, and for the
  * document/embedding families the sf0.001→0.01 step is rows-FLAT (both
  * 500 docs), so the growth gate's fitted slope for those families rests
  * on a single real step. sf1 adds the decade where a scale bug would
  * actually bend (5,000→50,000 docs, 2,000→20,000 vectors, 100k→1M
  * events — clean 10x steps), without touching the read-only testdata:
  * fixtures land under /tmp and regenerate on demand.
  *
  * Determinism: one seeded java.util.Random stream per table, generated
  * driver-side (≈20 MB total — fixture generation, not an operator) and
  * written once; `ensure` is a no-op when the three files exist.
  */
object ScaleFixtures {

  val DefaultDir = "/tmp/graft_sf1"

  /** Generator fingerprint, written LAST by [[ensure]] and checked before
    * trusting an existing dir. Bump on ANY distribution change. Two
    * failure modes it closes (r11 review): a box holding fixtures from an
    * older generator (the clustered-embedding draft reproduced its
    * documented 19.1M-pair quadratic from stale /tmp state), and a crash
    * mid-generation leaving some tables complete and others partial —
    * the fingerprint lands only after every table committed.
    */
  private val Fingerprint =
    "v3-heaps-vocab docs=50000 vecs=20000x64 events=1000000 seed=421/422/423"

  /** The sf1-eligible growth queries: the headline dedup / ANN / text /
    * retrieval families (PipelineQueries.timed members that read only the
    * generated tables), one representative per family plus the
    * historically scale-flagged ones. Bench times these ONCE at sf1 (the
    * decade is informative even single-rep: multi-second walls dwarf
    * timer jitter) and the guard reads the third step.
    */
  val sf1Queries: Seq[String] = Seq(
    "dedup_minhash_pairs", "dedup_simhash_pairs", "dedup_embedding_lsh",
    "jaccard_prefix_join", "semantic_dedup", "dedup_clusters_star",
    "sim_srp_topk", "sim_ivfpq_topk", "sim_ivfpq_indexed",
    "embedding_kmeans", "bm25_indexed", "hybrid_filtered",
    "quality_classifier", "text_fingerprint", "winnow_containment_pairs",
    "retrieval_filtered_mmr", "heavy_hitters", "sim_knn_graph",
    // r11 second-session audit families (each reads only generated
    // tables): the graph/tokenizer/drift/anomaly/eval additions get the
    // fourth decade too — their realistic bend point is sf0.1 → sf1
    "graph_triangles", "unigram_train", "corpus_distinct_ngrams",
    "distribution_drift", "event_anomaly", "retrieval_ndcg")

  /** The driver data's 31-word vocabulary — the head of the sf1 Zipf. */
  private val baseVocab = Array(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "query", "big",
    "filter", "key", "window", "row", "table", "stream", "merge", "data",
    "agg", "join", "read", "write", "shuffle", "plan")

  /** sf1 vocabulary sized by Heaps' law (r11 verdict item #3): real
    * corpora grow vocabulary V ≈ K·N^β with β ≈ 0.5, so a 10x-token
    * corpus carries ~√10 ≈ 3.16x the types — the sf0.1 data's 31 words
    * over ~270k tokens extrapolate to ~98 words over 2.7M. The previous
    * fixture reused the 31-word vocab at sf1, which SATURATED every
    * shingle bucket (any 3-gram over 31 words recurs thousands of times)
    * and made the text family's fourth decade measure fixture degeneracy
    * — a 16-21x jaccard step that was the candidate floor of a
    * distribution no real corpus has, not the operator. The driver words
    * keep the head ranks (cross-query semantics — blocklists, planted
    * dups — still hit); synthetic types fill the tail.
    */
  private val vocab: Array[String] =
    baseVocab ++ (baseVocab.length until 98).map(i => f"term$i%03d")

  /** Zipf(s=1) cumulative mass over `vocab` ranks: token draws follow
    * P(rank r) ∝ 1/r — the standard fit for word frequencies — so the
    * head behaves like the sf0.1 data while the tail supplies the
    * Heaps-law type growth.
    */
  private val zipfCum: Array[Double] = {
    val w = Array.tabulate(vocab.length)(i => 1.0 / (i + 1))
    val c = w.scanLeft(0.0)(_ + _).tail
    c.map(_ / c.last)
  }

  private def zipfWord(rnd: java.util.Random): String = {
    val u = rnd.nextDouble()
    var lo = 0
    var hi = zipfCum.length - 1
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    vocab(lo)
  }

  private val langs =
    Array(("en", 0.41), ("zh", 0.56), ("es", 0.71), ("fr", 0.86),
      ("de", 1.01))

  def ensure(spark: SparkSession, dir: String = DefaultDir): Unit = {
    val d = new java.io.File(dir)
    val fp = new java.io.File(d, "_fingerprint")
    if (fp.isFile && new String(java.nio.file.Files.readAllBytes(
        fp.toPath)) == Fingerprint)
      return
    // stale generation or partial write: regenerate from scratch
    if (d.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(d)
    }
    d.mkdirs()
    writeDocuments(spark, dir, nDocs = 50000)
    writeEmbeddings(spark, dir, nVecs = 20000, dim = 64)
    writeEvents(spark, dir, nEvents = 1000000, nUsers = 15000)
    java.nio.file.Files.write(fp.toPath, Fingerprint.getBytes)
  }

  private def writeDocuments(spark: SparkSession, dir: String,
      nDocs: Int): Unit = {
    val rnd = new java.util.Random(421L)
    def lang(): String = {
      val u = rnd.nextDouble()
      langs.collectFirst { case (l, c) if u < c => l }.getOrElse("de")
    }
    var prev = ""
    val rows = (0 until nDocs).map { i =>
      val text =
        if (i > 0 && i % 625 == 624) prev // planted exact duplicate
        else {
          val n = 10 + rnd.nextInt(89)
          Seq.fill(n)(zipfWord(rnd)).mkString(" ")
        }
      prev = text
      Row(i.toLong, text, lang(), s"src${i % 20}", text.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 8), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def writeEmbeddings(spark: SparkSession, dir: String,
      nVecs: Int, dim: Int): Unit = {
    val rnd = new java.util.Random(422L)
    // ISOTROPIC gaussians, label independent of geometry — measured from
    // the driver's sf0.1 embeddings: same-label cosine mean 0.005, all
    // 920 above-0.4 pairs inside the 0.4–0.6 random tail, none above
    // 0.6. (A first draft used tight label clusters — intra-cluster
    // cos ≈ 0.91 — and dedup_embedding_lsh exploded to 19.1M pairs /
    // 519 s at sf1: a fixture-induced quadratic the real data does not
    // have.)
    val rows = (0 until nVecs).map { i =>
      val label = rnd.nextInt(10)
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      Row(i.toLong, v.toSeq, label)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 8), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def writeEvents(spark: SparkSession, dir: String,
      nEvents: Int, nUsers: Int): Unit = {
    val rnd = new java.util.Random(423L)
    val types = Array("view", "click", "purchase", "signup", "error")
    val baseMicros = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val windowMicros = 30L * 24 * 3600 * 1000000L
    val stamps = Array.fill(nEvents)(
      baseMicros + (rnd.nextDouble() * windowMicros).toLong).sorted
    val rows = (0 until nEvents).map { i =>
      val value = math.rint(-40.0 * math.log(
        1.0 - rnd.nextDouble()) * 100) / 100
      Row(i.toLong,
        java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(stamps(i) / 1000000L,
            stamps(i) % 1000000L * 1000L)),
        rnd.nextInt(nUsers).toLong, types(rnd.nextInt(types.length)),
        value, s"""{"k": ${rnd.nextInt(100)}}""")
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 8), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(DefaultDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    ensure(spark, dir)
    println(s"sf1 fixtures ready under $dir")
    spark.stop()
  }
}
