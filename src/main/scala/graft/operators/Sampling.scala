package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * `rand()`-based sampling is wrong for a 100 TB curation pipeline: it is
  * partition-order dependent (a re-run or AQE re-plan draws a different
  * sample), and per-stratum rates would need a shuffle or stateful RNG.
  * Hash-threshold sampling fixes both: a row is kept iff a hex prefix of
  * `md5(id || salt)` falls under the rate's threshold. That is
  *
  *  - deterministic and partition-invariant (pure function of the row),
  *  - scan-side (codegen'd column exprs, no shuffle, no RNG state),
  *  - consistent across engines (every SQL engine has md5 — which is what
  *    lets DuckDB re-derive the exact sample as the oracle),
  *  - coordinated: the same (id, salt) always lands on the same side of the
  *    threshold, so raising a stratum's rate strictly grows its sample —
  *    stable train/holdout splits across pipeline versions.
  *
  * Granularity is 16 bits (rate resolves to 1/65536); md5's avalanche makes
  * the prefix uniform regardless of id distribution.
  */
object Sampling {

  /** 4-hex-digit threshold for `rate`; rows keep iff prefix < threshold.
    * Clamped to 0xffff: a rate within half a granule of 1.0 would otherwise
    * round to 65536 → the FIVE-digit string "10000", which compares
    * lexicographically below almost every 4-hex prefix and would collapse a
    * ~100% sample to ~6%.
    */
  private[operators] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.min(math.round(rate * 65536.0).toInt, 0xffff)}%04x"
  }

  /** Keep-condition for one rate. `rate >= 1.0` keeps everything (the
    * 5-digit threshold "10000" would compare lexicographically below "ffff"
    * prefixes otherwise).
    */
  def keepCond(id: Column, rate: Double, salt: String = ""): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else substring(md5(concat(id.cast("string"), lit(salt))), 1, 4) <
      lit(thresholdHex(rate))

  /** Uniform deterministic sample at `rate`. */
  def sample(df: DataFrame, idCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.filter(keepCond(col(idCol), rate, salt))

  /** Per-stratum rates (training-mix reweighting): `rates` maps stratum
    * value → keep rate; absent strata use `defaultRate`. One scan, no
    * shuffle — the rate lookup is a constant-folded CASE chain.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = ""): DataFrame = {
    val cond = rates.foldLeft(
      when(lit(false), lit(false))) { case (acc, (stratum, rate)) =>
      acc.when(col(strataCol) === lit(stratum),
        keepCond(col(idCol), rate, salt))
    }.otherwise(keepCond(col(idCol), defaultRate, salt))
    df.filter(cond)
  }

  /** The `k` rows per group with the smallest salted-md5 rank —
    * deterministic, partition-invariant exact-k group sampling. Adds `rn`
    * (the 1-based per-group rank). One window shuffle on the group key.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Long, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** The `k` rows of the WHOLE frame with the smallest salted-md5 rank —
    * the deterministic form of reservoir sampling. Same sample as a
    * classic random reservoir in distribution (md5's avalanche makes the
    * order effectively uniform) but reproducible and engine-portable (any
    * SQL engine can replay `ORDER BY md5(id) LIMIT k`). Plans as
    * TakeOrderedAndProject (per-partition top-k, k rows to the
    * driver-side merge) — no global sort, no window.
    *
    * Operates on the ROW MULTISET: a row duplicated on `idCol` occupies
    * two of the k slots. Batch folds that can re-see rows (at-least-once
    * replay) must merge through [[reservoirMerge]], whose id-dedup gives
    * min-k its set-semilattice idempotence.
    *
    * Null ids are excluded up front: `md5(concat(null, salt))` is null and
    * Spark sorts nulls FIRST ascending, so null-id rows would
    * deterministically seize sample slots (and `reservoirMerge`'s
    * `dropDuplicates` would then keep one arbitrary null row) — a sample
    * is of identified rows only.
    */
  def exactK(df: DataFrame, idCol: String, k: Int,
      salt: String = ""): DataFrame =
    df.filter(col(idCol).isNotNull)
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
      .limit(k)

  /** Weighted exact-k sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, deterministic form): each row draws rank = -ln(u) / w with u a
    * salted-md5 uniform in (0, 1]; the k SMALLEST ranks are the sample.
    * A-ES is the standard one-pass weighted reservoir — inclusion
    * probability proportional to weight at every prefix — and the md5
    * uniform makes it reproducible, partition-invariant, and
    * engine-portable (the oracle replays the identical formula). Plans as
    * TakeOrderedAndProject like [[exactK]]: per-partition top-k, k rows to
    * the driver-side merge, no global sort.
    *
    * u = (first 13 md5 hex chars + 1) / 2^52 — 52 uniform bits, exactly
    * representable, never 0 (so ln(u) is finite). Null ids and weights
    * below 1e-6 are excluded up front: a weight of 0 can never win a
    * slot, a negative one would invert the order, and a weight under
    * ~1e-9 overflows the ×1e9 fixed-point rank (max -ln(u) ≈ 36 →
    * 3.6e19 > Long.Max), where Spark's non-ANSI cast saturates but a
    * DuckDB replay of the same formula errors — the 1e-6 floor keeps
    * the rank at least three decades inside the Long range. Rescale
    * sub-1e-6 weights before calling (ranks are scale-invariant:
    * multiplying every weight by c shifts every rank by the same
    * 1/c factor, leaving the order unchanged).
    *
    * The order key is SNAPPED to a ×1e9 fixed-point long before the sort
    * (the bm25 `score_fx` posture): `ln` is transcendental and the two
    * engines' libm may round the same input a final-ulp apart, which on a
    * raw double key could flip the k-th/(k+1)-th boundary — on the
    * snapped key an ulp difference only matters if the true rank sits
    * within ~1e-16 of a 1e-9 grid boundary. Ranks of real corpora are
    * O(1/w); collisions at the grid resolution fall to the id tie-break,
    * identically on both engines.
    *
    * A POSITIVE weight under the floor FAILS LOUDLY (scan-side
    * `raise_error`) instead of being silently excluded: a positive weight
    * is eligible by A-ES semantics, so dropping it would silently shrink
    * the eligible set (and possibly the result below k) — the caller must
    * rescale, and an exception says so where a missing row never would.
    * Zero/negative weights and null ids stay silently excluded: they can
    * never win a slot under any rescaling, so exclusion IS their
    * semantics, not a fixed-point limitation.
    */
  def weightedExactK(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, salt: String = ""): DataFrame = {
    val u = (conv(substring(
        md5(concat(col(idCol).cast("string"), lit(salt))), 1, 13),
      16, 10).cast("long") + 1).cast("double") / lit(4503599627370496.0)
    val wd = weightCol.cast("double")
    val rankFx = floor(-log(u) / wd * 1e9 + 0.5)
      .cast("long")
    val eligible = when(wd > 0 && wd < 1e-6,
      raise_error(format_string(
        "weightedExactK: positive weight %s is below the 1e-6 floor " +
          "(the x1e9 fixed-point rank overflows Long below ~1e-9) — " +
          "rescale weights by a constant first; ranks are scale-invariant",
        wd))).otherwise(wd >= 1e-6)
    df.filter(col(idCol).isNotNull && eligible)
      .orderBy(rankFx, col(idCol))
      .limit(k)
  }

  /** One step of the streaming reservoir fold: the exact-k of
    * snapshot ∪ batch, deduplicated on `idCol` first. With set semantics
    * min-k under union is a semilattice — commutative, associative and
    * IDEMPOTENT — so any batching, any arrival order, and any
    * at-least-once redelivery yields the identical sample; without the
    * dedup a replayed row would occupy two of the k slots and silently
    * shrink the distinct sample. Cost is O(snapshot + batch): k + batch
    * rows through one dedup exchange, then the TakeOrderedAndProject
    * top-k — the corpus never re-enters.
    *
    * Contract: rows are immutable per id — the usual id-keyed corpus
    * assumption. `dropDuplicates(idCol)` keeps an ARBITRARY row among
    * same-id rows, so if a redelivery carries the same id with CHANGED
    * payload columns, the surviving payload is nondeterministic (the id
    * set — the sample itself — is still exact). Project to the id, or
    * dedup upstream, if payloads can drift.
    */
  def reservoirMerge(snapshot: DataFrame, batch: DataFrame, idCol: String,
      k: Int, salt: String = ""): DataFrame =
    exactK(snapshot.unionByName(batch).dropDuplicates(Seq(idCol)), idCol, k,
      salt)

  /** Resample to a TARGET domain mix (the "40% web, 30% code, …" recipe a
    * training run specifies), downsampling only: the largest total
    * N = min over domains of floor(count_d / p_d) is achievable without
    * upsampling any domain, and each domain then keeps its
    * k_d = floor(p_d · N) smallest salted-md5 ranks — deterministic,
    * coordinated (a re-run or a grown corpus keeps prior picks stable in
    * each domain up to rank k_d), and within one row of the exact target
    * proportion per domain. Domains absent from `targets` are dropped.
    *
    * Shape: one count aggregate (domain-cardinality rows), one scalar to
    * the driver (N), a broadcast join of per-domain quotas, and one window
    * shuffle on the domain key for the ranks. The output carries `rn` (the
    * per-domain rank) alongside the source columns.
    */
  def mixToTarget(df: DataFrame, idCol: String, domainCol: String,
      targets: Map[String, Double], salt: String = ""): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(p => p > 0.0),
      "targets must be non-empty with positive proportions")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.toDF("__dom", "__p")
    // persisted across the TWO driver-side actions below (presence check,
    // N scalar); the returned plan re-derives it lazily at action time —
    // one cheap aggregate — so the cache need not outlive this call
    val quotas = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(tgt), "__dom")
      .persist()
    // Every target domain must exist in the corpus: a missing one would
    // silently drop out of the quota join and the output mix would no
    // longer be the requested one (and an empty join would surface only
    // as an opaque NPE from the min() below).
    val present = quotas.select(col("__dom"))
      .collect().map(_.getString(0)).toSet
    val missing = targets.keySet -- present
    require(missing.isEmpty,
      s"target domains absent from the corpus: ${missing.mkString(", ")}")
    // N is one row per domain reduced to a scalar — bounded driver traffic
    val nTotal = quotas
      .agg(min(floor(col("__n") / col("__p")))).head().getLong(0)
    val kd = broadcast(quotas.select(col("__dom"),
      floor(col("__p") * nTotal).as("__kd")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    val out = df.withColumn("rn", row_number().over(w).cast("long"))
      .join(kd, col(domainCol) === col("__dom"))
      .filter(col("rn") <= col("__kd"))
      .drop("__dom", "__kd")
    quotas.unpersist(blocking = false)
    out
  }

  /** Token-budget domain mixing: like [[mixToTarget]] but the `targets`
    * proportions are TOKEN shares, which is how pretraining mixes are
    * actually specified (a corpus is a token budget, not a row budget —
    * domains with systematically longer documents would otherwise be
    * over-represented). `tokenCol` is the per-row token count (so the op
    * composes with any tokenizer — exact counts, BPE estimates, chars/4).
    *
    * The total budget T = min over domains of (domain_tokens / p_d) — the
    * largest total such that every domain can fill its share from what it
    * has; each domain keeps its hash-ordered document prefix while the
    * EXCLUSIVE cumulative token count stays under floor(p_d · T), so the
    * kept set is deterministic, partition-invariant, and coordinated the
    * same way [[mixToTarget]]'s is (the hash order never changes, so a
    * bigger budget strictly grows every domain's prefix). Budgets land
    * within one document of the target share — exact proportions are
    * impossible with atomic documents.
    *
    * Shape at scale: one per-domain count agg (rows = #domains, broadcast
    * back), then ONE hash shuffle for the per-domain window — the same
    * envelope as any keyed aggregation; no global sort, no driver data.
    */
  def mixToTokenTarget(df: DataFrame, idCol: String, domainCol: String,
      tokenCol: String, targets: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(p => p > 0.0),
      "targets must be non-empty with positive proportions")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.toDF("__dom", "__p")
    val quotas = df.groupBy(col(domainCol).as("__dom"))
      .agg(sum(col(tokenCol)).as("__tok"))
      .join(broadcast(tgt), "__dom")
      .persist()
    val present = quotas.select(col("__dom"))
      .collect().map(_.getString(0)).toSet
    val missing = targets.keySet -- present
    require(missing.isEmpty,
      s"target domains absent from the corpus: ${missing.mkString(", ")}")
    val tTotal = quotas
      .agg(min(floor(col("__tok") / col("__p")))).head().getLong(0)
    val kd = broadcast(quotas.select(col("__dom"),
      floor(col("__p") * tTotal).as("__budget")))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(domainCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    val out = df
      .withColumn("__cum",
        sum(col(tokenCol)).over(w.rowsBetween(W.unboundedPreceding,
          W.currentRow)) - col(tokenCol))
      .join(kd, col(domainCol) === col("__dom"))
      .filter(col("__cum") < col("__budget"))
      .drop("__dom", "__budget", "__cum")
    quotas.unpersist(blocking = false)
    out
  }

  /** Temperature-scaled domain mixing — the multilingual-pretraining
    * upsampling form (cf. mT5 / XLM-R α-sampling): kept rows per domain are
    * proportional to sqrt(n_d) (α = 1/2), which upweights low-resource
    * domains relative to their raw share, at the largest total every domain
    * can fill from what it has. General α reduces to [[mixToTarget]] with
    * driver-computed targets; this method hard-codes α = 1/2 because it is
    * the one exponent with ENGINE-EXACT arithmetic: w_d = floor(sqrt(n_d))
    * is exact for n_d < 2^52 (IEEE sqrt is correctly rounded; pow is not),
    * and everything after is long multiply/divide —
    *   W = Σ w_d,  T = min_d (n_d·W div w_d),  budget_d = w_d·T div W
    * so the kept set (the hash-ordered per-domain prefix of `budget_d`
    * rows) is bit-reproducible in any engine, with no float normalization
    * whose summation order could flip a boundary row. budget_d ≤ n_d by
    * construction. `n_d·W` must fit a long — true through ~10^12 rows per
    * domain at 10^6 total weight; switch the two products to decimal(38,0)
    * beyond that.
    *
    * Shape at scale: one count agg (rows = #domains, collected — bounded),
    * budgets broadcast back, ONE hash shuffle for the per-domain
    * row_number window. Same envelope as any keyed aggregation.
    */
  def mixTemperatureSqrt(df: DataFrame, idCol: String, domainCol: String,
      salt: String = ""): DataFrame = {
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    require(counts.nonEmpty, "empty corpus")
    val totW = counts.map(_._3).sum
    val tTotal = counts.map { case (_, n, w) => n * totW / w }.min
    val budgets = counts.map { case (d, _, w) => (d, w * tTotal / totW) }
    val spark = df.sparkSession
    import spark.implicits._
    val kd = broadcast(budgets.toSeq.toDF("__dom", "__budget"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    df.withColumn("__rn", row_number().over(win))
      .join(kd, col(domainCol) === col("__dom"))
      .filter(col("__rn") <= col("__budget"))
      .drop("__dom", "__budget", "__rn")
  }

  /** Deterministic global shuffle order for training-example serving: a
    * total 1-based `shuffle_rank` over the whole corpus, ordered by
    * `md5(id || salt)` (id tiebreak) — the epoch-reproducible "random"
    * order every training run needs, re-derivable by any engine.
    *
    * A naive `row_number() OVER (ORDER BY hash)` collapses to a single-
    * partition sort; this is the scalable two-pass form instead:
    * range-partition on the hash (so partition p holds exactly the rows
    * ranked between the range bounds), take per-partition row numbers,
    * then add each partition's rank offset — the per-partition counts are
    * `numPartitions` rows to the driver, broadcast back as offsets. The
    * materialization point between the passes is a local checkpoint so the
    * range exchange runs once, not once per pass. This is zipWithIndex
    * re-expressed on DataFrames, keeping codegen and the columnar scan.
    *
    * `numPartitions = 0` uses `spark.sql.shuffle.partitions`; at 100 TB
    * set it so each range partition fits an executor's sort buffer.
    */
  def globalShuffle(df: DataFrame, idCol: String, salt: String = "",
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("_h", md5(concat(col(idCol).cast("string"), lit(salt))))
      .repartitionByRange(np, col("_h"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: partition sizes — ≤ np rows to the driver
    val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // pid -> exclusive prefix sum of counts = that partition's rank offset
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).init).toMap
    // pass 2: local row numbers + offset lookup. The lookup is a MAP
    // literal, not a when-chain: a fold of nested CaseWhen is
    // numPartitions deep and overflows Catalyst's recursive transforms
    // at the partition counts this operator exists for.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col("_h"), col(idCol))
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedlit(offsets), col("_pid"))
    ranged
      .withColumn("shuffle_rank",
        row_number().over(w).cast("long") + offCol)
      .drop("_h", "_pid")
  }

  /** Systematic probability-proportional-to-size (PPS) sampling: ~`n` rows
    * drawn with inclusion probability proportional to `weightCol` (clamped
    * to ≥ 1) — the weighted form of corpus subsampling (sample documents
    * proportional to token count, or to a soft-dedup weight), kept fully
    * deterministic and engine-exact.
    *
    * Classic systematic PPS: lay every row's weight end-to-end along a line
    * in the deterministic md5(id‖salt) order (id tiebreak), place sample
    * points at `off + k·step` for `step = max(W div n, 1)`, `off = step div
    * 2`, and keep each row whose interval [cum, cum+w) contains a point.
    * All arithmetic is long division on non-negative operands — the kept
    * set is bit-reproducible in any engine, and a row with w ≥ step is kept
    * with certainty (PPS's size-biased guarantee). The membership test is
    * `off + k_min·step < cum + w` with `k_min = (cum − off + step − 1) div
    * step`, whose numerator is never negative because cum ≥ 0 and
    * off ≤ step − 1.
    *
    * The exclusive cumulative weight `cum` is the [[globalShuffle]] two-pass
    * prefix sum, not a single-partition window: range-partition on the
    * hash, per-partition running sums, per-partition TOTALS (≤ numPartitions
    * rows) collected and broadcast back as offsets. Output keeps the input
    * columns plus `w` and `cum` so callers (and oracles) can pin the
    * internals.
    *
    * `numPartitions = 0` uses `spark.sql.shuffle.partitions`; at 100 TB set
    * it so each range partition fits an executor's sort buffer.
    */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: Column,
      n: Long, salt: String = "", numPartitions: Int = 0): DataFrame = {
    require(n > 0, "sample size must be positive")
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("w", greatest(weightCol.cast("long"), lit(1L)))
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit(salt))))
      .repartitionByRange(np, col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: per-partition weight totals — ≤ np rows to the driver
    val sums = ranged.groupBy(col("__pid")).agg(sum(col("w")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.map(_._1)
      .zip(sums.map(_._2).scanLeft(0L)(_ + _).init).toMap
    val total = sums.map(_._2).sum
    val step = math.max(total / n, 1L)
    val off = step / 2
    // pass 2: local running sums + broadcast offset lookup (map literal,
    // not a when-chain — the globalShuffle lesson)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("__pid")).orderBy(col("__h"), col(idCol))
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedlit(offsets), col("__pid"))
    ranged
      .withColumn("cum",
        sum(col("w")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
          - col("w") + offCol)
      .filter(lit(off) +
        expr(s"(cum - $off + $step - 1) div $step") * step <
        col("cum") + col("w"))
      .drop("__h", "__pid")
  }

  /** Soft-dedup weights (SemDeDup-adjacent "count a near-dup family once"):
    * each document's effective weight is its token count divided by its
    * near-dup CLUSTER size (long division, clamped to ≥ 1) — a family of k
    * near-duplicates contributes ~one document's worth of sampling mass
    * instead of k. `clusters` is [[Dedup.clustersStar]] output ((id,
    * cluster) for docs that appeared in a pair — the clustered minority);
    * singletons keep their full token weight. Feed the result straight into
    * [[ppsSystematic]] for the "sample as if deduplicated, without
    * dropping anything outright" curation posture.
    *
    * Shape at scale: one count agg over the minority cluster table + one
    * doc-keyed left join; token math is scan-side. No corpus-wide shuffle
    * beyond the join.
    */
  def softDedupWeights(df: DataFrame, clusters: DataFrame, idCol: String,
      tokenCol: Column): DataFrame = {
    val sizes = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__csz"))
    val labeled = clusters.join(sizes, "cluster")
      .select(col("id").as(idCol), col("__csz"))
    df.join(labeled, Seq(idCol), "left")
      .withColumn("__tok", greatest(tokenCol.cast("long"), lit(1L)))
      .withColumn("eff_w",
        greatest(expr("__tok div coalesce(__csz, 1)").cast("long"), lit(1L)))
      .drop("__csz", "__tok")
  }

  /** Deterministic uniform bucket in [0, 1e6) — the parts-per-million
    * analogue of [[splitBucket]]: the first SIX md5 hex chars (16⁶ ≈ 16.8M
    * distinct inputs, so every ppm cell is reachable) folded by the same
    * ascii·31 polynomial both engines share, mod 1e6. The fold runs in
    * long arithmetic — the polynomial peaks at ~3.0e9, past Int range.
    */
  def ppmBucket(id: Column, salt: String): Column = {
    val h = md5(concat(id.cast("string"), lit(salt)))
    val folded = (2 to 6).foldLeft(ascii(substring(h, 1, 1)).cast("long")) {
      (acc, i) => acc * 31L + ascii(substring(h, i, 1)).cast("long")
    }
    folded % 1000000L
  }

  /** Rejection sampling by a PER-ROW keep probability — the "keep each
    * document with probability equal to its quality score" curation move
    * (classifier-score thinning; e.g. the LLaMA CCNet-style quality
    * sampling). Row kept iff its [[ppmBucket]] draw is below `scorePpm`
    * (the row's keep probability in parts-per-million, clamped to
    * [0, 1e6]): score 0 never keeps, 1e6 always keeps, and the decision is
    * a pure function of (id, salt, score) — re-runs, engines, and
    * partitionings all agree, unlike `rand()`-based thinning which is
    * irreproducible by construction.
    *
    * Shape at scale: scan-side column math only — ZERO shuffles, fused
    * into whatever scan already computes the score.
    */
  def rejectionSample(df: DataFrame, idCol: String, scorePpm: Column,
      salt: String): DataFrame = {
    val clamped = greatest(lit(0L), least(scorePpm.cast("long"),
      lit(1000000L)))
    df.withColumn("score_ppm", clamped)
      .withColumn("draw_ppm", ppmBucket(col(idCol), salt))
      .filter(col("draw_ppm") < col("score_ppm"))
  }

  /** md5-fold split bucket in [0, 100) of an id — the same 4-char ascii
    * fold `split_assign` uses, factored so cluster-aware splitting buckets
    * the REPRESENTATIVE with byte-identical math.
    */
  def splitBucket(id: Column): Column = {
    val h = md5(id.cast("string"))
    ((((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) * 31
      + ascii(substring(h, 3, 1))) * 31 + ascii(substring(h, 4, 1)))
      % 100)
  }

  /** Leakage-safe train/val/test split: every member of a near-dup cluster
    * is bucketed by its cluster REPRESENTATIVE (the component-min id from
    * [[Dedup.clustersStar]]), so near-duplicates can never straddle a split
    * boundary. Plain per-doc hashing — `split_assign` — leaks: two
    * near-identical documents hash independently, and with 90/5/5 odds
    * about 1 in 5.5 near-dup pairs lands its copies in different splits,
    * putting a paraphrase of a test document into train. Bucketing the
    * representative makes the split a pure function of the CLUSTER, closing
    * that channel; singletons (no `clusters` row) represent themselves, so
    * on dup-free data this IS `split_assign`.
    *
    * `clusters` carries (id, cluster) for clustered docs only — exactly
    * [[Dedup.clustersStar]]'s output, which is doc-keyed and tiny relative
    * to the corpus (only docs that appeared in a near-dup pair). Shape at
    * scale: one doc-keyed left join against that minority table + scan-side
    * hash math; no aggregation, no extra shuffle beyond the join.
    */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    docs
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("rep", coalesce(col("cluster").cast("string"),
        col(idCol).cast("string")))
      .withColumn("split",
        when(splitBucket(col("rep")) < trainPct, "train")
          .when(splitBucket(col("rep")) < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("cluster")
  }
}
