package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.HashExpressions
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators (builder mandate + SURVEY.md §7.3):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  * similarity search (brute-force + SRP-LSH), text analysis, multimodal.
  *
  * Oracle scoping: the quadratic exact forms (all-pairs Jaccard / cosine) are
  * restricted to id < 300 so the DuckDB oracle stays cheap at every sf; the
  * LSH forms run on the full table — they are the 100 TB path and are
  * verified against the exact forms in the spec suite instead of SQL.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // --- Deduplication ------------------------------------------------------
    // Exact dedup over an input with real duplicates (documents ∪ documents):
    // keep the lowest doc_id per distinct content, key = md5(text).
    "dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.exact(docs.union(docs), "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "dedup_exact_groups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.union(docs)
        .groupBy(md5(col("text")).as("content_key"))
        .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keep_id"))
        .orderBy(col("keep_id"))
    }),

    // Quadratic n-gram Jaccard on a bounded subset (oracle-checkable).
    "ngram_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text", threshold = 0.3)),

    // Pairs → clusters: connected components over the exact-Jaccard edge set
    // (bounded subset so the recursive-CTE oracle stays cheap); each node
    // reports the min doc_id of its component.
    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(
        Dedup.jaccardPairs(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", threshold = 0.3))
        .orderBy(col("id"))),

    // The complete near-dup removal: corpus minus non-representative cluster
    // members, using the exact-Jaccard edge set on the bounded subset.
    "dedup_near_keep" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
      Dedup.keepRepresentatives(docs,
          Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.3), "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // MinHash+LSH near-dup pairs on the FULL table — the scale path. The
    // spec suite asserts it finds exactly the pairs the exact form finds.
    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3)),

    // Substring-containment pairs via winnowing fingerprints, full table
    // (no SQL oracle — the winnow hash family is native; ContainmentSpec
    // asserts wrapped-copy recovery; driver records a rows-only check).
    "winnow_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.6)),

    // SimHash banding + Hamming verification (native Catalyst expression).
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)),

    // Embedding cosine near-dup pairs, bounded subset (oracle-checkable).
    "dedup_embedding_pairs" -> ((s, dir) =>
      Dedup.embeddingPairs(
        t(s, dir, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", threshold = 0.4)),

    // --- Similarity search --------------------------------------------------
    "sim_bruteforce_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // nBits sizes the bucket count to the corpus: 2^4 here (hundreds of
    // vectors); a 100 TB corpus would use 2^16+ and partition by bucket.
    "sim_srp_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.srpTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nBits = 4)
    }),

    // IVF coarse-quantizer ANN (no SQL oracle — recall vs brute force is
    // asserted in SimilaritySpec; the driver records a rows-only check).
    "sim_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nCentroids = 16, nProbe = 4,
        trainIters = 2)
    }),

    // Token frequency top-k over the whole corpus (explode → two-phase agg).
    "token_freq_topk" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)),

    // --- Text analysis ------------------------------------------------------
    "text_analysis" -> ((s, dir) =>
      TextAnalysis.analyze(t(s, dir, "documents")).orderBy(col("doc_id"))),

    // Readability-style metrics (sentence marks, words/sentence, mean word
    // length) — the cheap quality filters a corpus pipeline runs per doc.
    "text_readability" -> ((s, dir) => {
      val ws = split(trim(lower(col("text"))), "\\s+")
      val nTok = size(ws).cast("double")
      val nonspace = length(regexp_replace(col("text"), "\\s", ""))
        .cast("double")
      val marks = regexp_count(col("text"), lit("[.!?]+")).cast("double")
      t(s, dir, "documents")
        .select(col("doc_id"),
          marks.cast("long").as("n_sent_marks"),
          round(nTok / greatest(marks, lit(1.0)), 4).as("words_per_sent"),
          round(nonspace / nTok, 4).as("mean_word_len"))
        .orderBy(col("doc_id"))
    }),

    "text_fingerprint" -> ((s, dir) => {
      HashExpressions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr("simhash64(split(trim(lower(text)), '\\\\s+'))").as("simhash"),
          expr("size(winnow_fingerprint(text, 8, 4))").as("n_fingerprints"))
        .orderBy(col("doc_id"))
    }),

    // --- Multimodal (binary columns; decode stubbed, plumbing real) --------
    "multimodal_features" -> ((s, _) =>
      Multimodal.extractFeatures(Multimodal.generate(s, 200L))
        .toDF().orderBy(col("media_id"))),

    // Frame sampling: payload → per-frame binary slices; output is the frame
    // inventory (sizes, not bytes) so the dump stays small and deterministic.
    "multimodal_frames" -> ((s, _) =>
      Multimodal.frameSample(Multimodal.generate(s, 50L), nFrames = 4)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_idx")))
  )

  val oracles: Map[String, String] = Map(
    "token_freq_topk" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents))
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "dedup_exact_groups" ->
      """SELECT md5(text) AS content_key, count(*) AS copies,
        |  min(doc_id) AS keep_id
        |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "ngram_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(1, len(ws)-1),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(lower(text)), '\s+') AS ws
        |        FROM documents WHERE doc_id < 300))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_near_keep" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(1, len(ws)-1),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(lower(text)), '\s+') AS ws
        |        FROM documents WHERE doc_id < 300)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.3),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b AS src, id_a AS dst FROM p),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
        |drop_ids AS (
        |  SELECT src AS id FROM reach GROUP BY src
        |  HAVING src != least(src, min(dst)))
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id < 300 AND doc_id NOT IN (SELECT id FROM drop_ids)
        |ORDER BY doc_id""".stripMargin,

    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(1, len(ws)-1),
        |           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS s
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(lower(text)), '\s+') AS ws
        |        FROM documents WHERE doc_id < 300)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.3),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b AS src, id_a AS dst FROM p),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)
        |SELECT src AS id, least(src, min(dst))::BIGINT AS cluster
        |FROM reach GROUP BY src ORDER BY id""".stripMargin,

    "dedup_embedding_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[],
        |                               b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |  AND round(list_cosine_similarity(a.embedding::DOUBLE[],
        |                                   b.embedding::DOUBLE[]), 6) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "sim_bruteforce_topk" ->
      """SELECT qid, rank, nid, cos FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                                 c.embedding::DOUBLE[]), 6) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                     c.embedding::DOUBLE[]), 6) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "text_readability" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sent_marks,
        |  round(len(string_split_regex(trim(lower(text)), '\s+'))::DOUBLE /
        |    greatest(len(regexp_extract_all(text, '[.!?]+'))::DOUBLE, 1.0), 4)
        |    AS words_per_sent,
        |  round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
        |    len(string_split_regex(trim(lower(text)), '\s+')), 4)
        |    AS mean_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_analysis" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
        |    AS n_bpeish,
        |  length(text) AS n_chars_m,
        |  CASE
        |    WHEN en = 0 AND es = 0 AND de = 0 AND fr = 0 THEN 'und'
        |    WHEN en >= es AND en >= de AND en >= fr THEN 'en'
        |    WHEN es >= de AND es >= fr THEN 'es'
        |    WHEN de >= fr THEN 'de'
        |    ELSE 'fr' END AS lang_pred,
        |  floor((least(nt / 100.0, 1.0) * 0.4 + (en / nt) * 0.3 +
        |         least((ns / nt) / 8.0, 1.0) * 0.3) * 1e6 + 0.5) / 1e6
        |    AS quality
        |FROM (
        |  SELECT doc_id, text,
        |    len(string_split_regex(trim(lower(text)), '\s+'))::DOUBLE AS nt,
        |    length(regexp_replace(text, '\s', '', 'g'))::DOUBLE AS ns,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      w -> w IN ('the','and','of','to','a','in','is'))) AS en,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      w -> w IN ('el','la','de','que','y','en','un'))) AS es,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      w -> w IN ('der','die','und','das','ist','ein','zu'))) AS de,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      w -> w IN ('le','les','des','et','une','est','dans'))) AS fr
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
