package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-resampling data selection (DSIR-style: Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much its hashed-n-gram feature
  * distribution looks like a TARGET domain's, then keep the top-N.
  * This is the standard cheap alternative to classifier-based selection
  * for pretraining corpora — two count passes and a scan, no model.
  *
  * Method: tokens hash into `nBuckets` feature buckets; the target and raw
  * bucket distributions (add-0.5 smoothed) give a per-bucket log likelihood
  * ratio ln(p_tgt/p_raw); a document's importance weight is the sum of its
  * tokens' bucket log-ratios. High weight = looks like the target.
  *
  * Exactness: the per-bucket log-ratio is snapped to the fixed-point long
  * floor(lr·1e6 + 0.5) BEFORE any per-document summation, and a document's
  * weight is Σ n_db · lr_fx[b] over its buckets — products and sums of
  * longs, associative, so the weight and the induced selection are
  * bit-identical in any engine and any partitioning (the BM25/RRF design).
  * The doubles feeding the snap are safe: bucket counts are exact longs,
  * the smoothing constants (0.5, nBuckets/2) are binary-exact, and both
  * engines evaluate the same IEEE expression tree.
  *
  * Shape at scale: one tokenize+bucket scan feeds (a) a nBuckets-row count
  * table (two-phase agg, map-side combined) and (b) the per-(doc, bucket)
  * count table whose doc-keyed regroup is the only corpus-sized shuffle.
  * The log-ratio table is ≤ nBuckets rows and broadcasts. Global top-N
  * plans as TakeOrderedAndProject (per-partition top-N + driver merge of
  * N·partitions rows), never a single-partition sort.
  */
object Selection {

  /** Engine-portable token bucket: ascii fold of the first 4 md5 hex chars
    * (the `split_assign` idiom) mod `nBuckets`. Spark's native `hash()` is
    * Murmur3 — unreplayable in the DuckDB oracle — so the fold IS the
    * portable hash here, same as everywhere else in this library.
    */
  def tokenBucket(term: Column, nBuckets: Int): Column = {
    val h = md5(term)
    ((((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) * 31
      + ascii(substring(h, 3, 1))) * 31 + ascii(substring(h, 4, 1)))
      % nBuckets).cast("int")
  }

  /** Per-document fixed-point importance weights: (idCol, w_fx), one row
    * per input document. `targetCond` marks the in-corpus target sample
    * (e.g. a trusted domain or language); the raw distribution is the whole
    * corpus.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetCond: Column, nBuckets: Int = 64): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"), targetCond.as("is_tgt"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .withColumn("b", tokenBucket(col("term"), nBuckets))
      .localCheckpoint()
    val bc = tok.groupBy(col("b")).agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("n_tgt"))
      .localCheckpoint()
    val tots = bc.agg(sum(col("n_raw")), sum(col("n_tgt"))).head()
    val (nRaw, nTgt) = (tots.getLong(0).toDouble, tots.getLong(1).toDouble)
    val half = nBuckets / 2.0
    val lr = bc.select(col("b"),
      floor(log(((col("n_tgt") + lit(0.5)) / lit(nTgt + half)) /
          ((col("n_raw") + lit(0.5)) / lit(nRaw + half)))
        * lit(1e6) + lit(0.5)).cast("long").as("lr_fx"))
    tok.groupBy(col("doc"), col("b")).agg(count(lit(1)).as("n_db"))
      .join(broadcast(lr), "b")
      .groupBy(col("doc"))
      .agg(sum(col("n_db") * col("lr_fx")).as("w_fx"))
      .select(col("doc").as(idCol), col("w_fx"))
  }

  /** DSIR selection: all documents with their weight and a `selected` flag
    * for the top-`n` by (w_fx desc, id asc). Deterministic — the original
    * paper resamples with Gumbel noise; at pipeline scale a seeded
    * md5-noise column composed with [[Sampling.keepCond]] gives the same
    * effect reproducibly, and the top-N form keeps the oracle exact.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      targetCond: Column, n: Int, nBuckets: Int = 64): DataFrame = {
    val w = importanceWeights(docs, idCol, textCol, targetCond, nBuckets)
      .localCheckpoint()
    // TakeOrderedAndProject: per-partition top-n, driver merges n·parts ids
    val top = w.orderBy(col("w_fx").desc, col(idCol).asc).limit(n)
      .select(col(idCol))
    w.join(broadcast(top).withColumn("_sel", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("w_fx"),
        coalesce(col("_sel"), lit(false)).as("selected"))
  }

  /** Top-p (nucleus) selection per domain: within each domain, keep the
    * MINIMAL score-descending prefix of documents whose score mass reaches
    * `pPpm` parts-per-million of the domain total — "keep the top half of
    * the quality mass per language", the budgeted-by-value cousin of
    * [[Sampling.mixToTarget]]'s budgeted-by-count quotas. A kept row
    * satisfies `cum_excl · 10⁶ < total · pPpm` (exclusive cumulative
    * score, ties broken by id) — all-long arithmetic, so the kept set is
    * engine- and partition-exact; the first excluded row is exactly the one
    * whose exclusive mass already covers the target.
    *
    * Scores clamp to ≥ 0 (negative "quality" contributes nothing to mass).
    * `total · pPpm` needs total < 2⁶³/10⁶ ≈ 9.2·10¹² per domain — switch
    * both products to decimal(38,0) beyond that (the mixTemperatureSqrt
    * caveat).
    *
    * Shape at scale: ONE hash shuffle on the domain key feeds both windows
    * (the unbounded total and the running prefix share the partition spec);
    * everything else is scan-side math. Same envelope as any keyed agg; a
    * hot domain shards to (domain, pmod(hash, s)) sub-prefixes exactly like
    * packSequences' sharded scan.
    */
  def topPPerDomain(df: DataFrame, idCol: String, domainCol: String,
      scoreCol: Column, pPpm: Long): DataFrame = {
    require(pPpm > 0 && pPpm <= 1000000L, s"pPpm out of (0, 1e6]: $pPpm")
    val W = org.apache.spark.sql.expressions.Window
    val part = W.partitionBy(col(domainCol))
    val ord = part.orderBy(col("__score").desc, col(idCol).asc)
    df.withColumn("__score", greatest(scoreCol.cast("long"), lit(0L)))
      .withColumn("__tot", sum(col("__score")).over(part))
      .withColumn("__cum",
        sum(col("__score")).over(
          ord.rowsBetween(W.unboundedPreceding, W.currentRow))
          - col("__score"))
      .filter(col("__cum") * lit(1000000L) < col("__tot") * lit(pPpm))
      .drop("__score", "__tot", "__cum")
  }

  /** Curriculum ordering with domain interleaving — the deterministic
    * "easy examples first, domains round-robin" training-order assignment
    * (curriculum learning, Bengio et al. ICML'09; interleaving avoids the
    * domain clumping that a pure difficulty sort produces, which destroys
    * a run's early loss signal when one domain dominates a tier).
    *
    * `tierCol` is the caller's integer difficulty tier (bucketed token
    * count, quantile bin, classifier band — anything integer and
    * deterministic). Within each (tier, domain) cell, rows take a salted
    * md5 rank `rn`; the training order is then the lexicographic triple
    * (tier, rn, domain): all of tier 0 before tier 1, and within a tier
    * one row from every domain in turn (rn=1 for each domain, then rn=2,
    * …). The order is a pure function of (id, tier, domain, salt) —
    * partition-invariant, rerun-stable, engine-exact.
    *
    * The output carries the (tier, rn) sort key rather than a single
    * global position column: materializing a global rank would force a
    * single-partition window, and every consumer (the pack/batch writers)
    * range-partitions on the triple anyway. Shape at scale: ONE hash
    * shuffle for the (tier, domain) window; everything else is scan-side.
    */
  def curriculumInterleave(df: DataFrame, idCol: String, domainCol: String,
      tierCol: Column, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tier"), col(domainCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))),
        col(idCol))
    df.withColumn("tier", tierCol.cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
  }
}
