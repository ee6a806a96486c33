package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("sample is deterministic and partition-invariant") {
    val a = Sampling.sample(ids, "id", 0.3, "s1").collect().map(_.getLong(0)).sorted
    val b = Sampling.sample(ids.repartition(13), "id", 0.3, "s1")
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("sampled fraction tracks the rate (md5 prefix is uniform)") {
    for (rate <- Seq(0.1, 0.5, 0.9)) {
      val n = Sampling.sample(ids, "id", rate).count()
      val frac = n.toDouble / 20000
      assert(math.abs(frac - rate) < 0.02, s"rate=$rate got $frac")
    }
  }

  test("samples are coordinated: lower rate is a subset of higher rate") {
    val lo = Sampling.sample(ids, "id", 0.2, "s2")
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.sample(ids, "id", 0.5, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
    assert(lo.nonEmpty && hi.size > lo.size)
  }

  test("edge rates: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.sample(ids, "id", 0.0).isEmpty)
    assert(Sampling.sample(ids, "id", 1.0).count() == 20000)
  }

  test("stratified rates apply per stratum") {
    val df = ids.withColumn("grp",
      when(col("id") % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedSample(df, "id", "grp",
        Map("even" -> 0.8), defaultRate = 0.1, salt = "s3")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("even") / 10000.0 - 0.8) < 0.03)
    assert(math.abs(got("odd") / 10000.0 - 0.1) < 0.03)
  }

  test("thresholdHex: always 4 hex chars, monotone, clamped at the top") {
    val rates = ((0 to 1000).map(_ / 1000.0) ++
      Seq(0.9999, 0.99999, 0.999999, 1.0 - 1e-12)).sorted
    val hexes = rates.map(Sampling.thresholdHex)
    assert(hexes.forall(_.length == 4), "5-digit threshold would break the " +
      "lexicographic compare")
    assert(hexes == hexes.sorted, "threshold must be monotone in rate")
    // the near-1.0 band must keep ~everything, not collapse to prefix<'10000'
    val n = Sampling.sample(ids, "id", 1.0 - 1e-9).count()
    assert(n >= 19990, s"near-1.0 rate kept only $n of 20000")
  }

  test("mixToTarget hits target proportions within one row per domain") {
    // 12000 / 6000 / 2000 rows; targets 50/30/20 → the scarce domain (c)
    // binds: N = floor(2000/0.2) = 10000 → quotas 5000/3000/2000
    val df = ids.withColumn("dom",
      when(col("id") % 10 < 6, "a").when(col("id") % 10 < 9, "b")
        .otherwise("c"))
    val got = Sampling.mixToTarget(df, "id", "dom",
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), salt = "mx")
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 5000L, "b" -> 3000L, "c" -> 2000L), got.toString)
  }

  test("mixToTarget picks are coordinated (stable under corpus growth)") {
    val df = ids.withColumn("dom", lit("a"))
    val small = df.filter(col("id") < 10000)
    val pickSmall = Sampling.mixToTarget(small, "id", "dom",
        Map("a" -> 1.0), salt = "mx").filter(col("rn") <= 100)
      .select("id").as[Long].collect().toSet
    val pickBig = Sampling.mixToTarget(df, "id", "dom",
        Map("a" -> 1.0), salt = "mx").filter(col("rn") <= 100)
      .select("id").as[Long].collect().toSet
    // the first 100 ranks of the grown corpus are drawn from the same
    // md5 order — overlap is high by construction (only ids whose hashes
    // land ahead of the old picks displace them)
    assert((pickSmall & pickBig).size >= 40, s"overlap=${(pickSmall & pickBig).size}")
  }

  test("sampling is a scan-side filter (no shuffle, no rand)") {
    val plan = Sampling.sample(ids, "id", 0.5).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("rand"), plan)
  }

  test("globalShuffle ranks are the exact md5 total order") {
    val df = ids.filter(col("id") < 3000)
    val got = Sampling.globalShuffle(df, "id", salt = "ep", numPartitions = 7)
      .orderBy(col("shuffle_rank"))
      .select("id").as[Long].collect().toSeq
    val expect = (0L until 3000L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}ep".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
    assert(got == expect)
  }

  test("globalShuffle rank is a 1..n permutation, partition-invariant") {
    val df = ids.filter(col("id") < 5000)
    val a = Sampling.globalShuffle(df, "id", "s", numPartitions = 5)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toSet
    val b = Sampling.globalShuffle(df.repartition(13), "id", "s",
        numPartitions = 11)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a.map(_._2) == (1L to 5000L).toSet)
  }

  test("globalShuffle never plans a single-partition global sort") {
    val out = Sampling.globalShuffle(ids, "id", "s", numPartitions = 8)
    val plan = out.queryExecution.executedPlan.toString
    // the rank window must partition by _pid — a global row_number would
    // surface as an empty window partition spec + SinglePartition exchange
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("mixToTokenTarget hits token shares within one document") {
    // domains with deliberately different doc lengths: A docs are 10x
    // longer, so a ROW mix at these targets would badly over-token A
    val df = (0L until 300L).map { i =>
      val dom = if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C"
      val tok = if (dom == "A") 100L else 10L
      (i, dom, tok)
    }.toDF("id", "dom", "n_tok")
    val out = Sampling.mixToTokenTarget(df, "id", "dom", "n_tok",
        Map("A" -> 0.5, "B" -> 0.3, "C" -> 0.2), salt = "s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDom = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // B binds: 1000 tokens / 0.3 → T = 3333; budgets 1666/999/666. Each
    // domain's kept tokens are within one document of its budget.
    val budgets = Map("A" -> 1666L, "B" -> 999L, "C" -> 666L)
    val docTok = Map("A" -> 100L, "B" -> 10L, "C" -> 10L)
    budgets.foreach { case (d, b) =>
      assert(byDom(d) <= b + docTok(d) && byDom(d) > b - docTok(d),
        s"$d kept ${byDom(d)} vs budget $b")
    }
  }

  test("mixToTokenTarget keeps a gap-free hash-order prefix per domain") {
    val df = (0L until 200L)
      .map(i => (i, if (i % 2 == 0) "A" else "B", 5L + i % 7))
      .toDF("id", "dom", "n_tok")
    val kept = Sampling.mixToTokenTarget(df, "id", "dom", "n_tok",
        Map("A" -> 0.6, "B" -> 0.4), salt = "s2")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"${id}s2".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Seq("A", "B").foreach { d =>
      val order = (0L until 200L)
        .filter(i => (if (i % 2 == 0) "A" else "B") == d)
        .sortBy(i => (h(i), i))
      val keptRanks = order.zipWithIndex
        .filter { case (i, _) => kept((d, i)) }.map(_._2)
      assert(keptRanks == (0 until keptRanks.length),
        s"$d kept set is not a prefix of the hash order")
    }
  }

  test("mixToTokenTarget is partition-invariant") {
    val df = (0L until 200L)
      .map(i => (i, if (i % 2 == 0) "A" else "B", 5L + i % 7))
      .toDF("id", "dom", "n_tok")
    val a = Sampling.mixToTokenTarget(df, "id", "dom", "n_tok",
      Map("A" -> 0.6, "B" -> 0.4), "s2").select("id").collect().toSet
    val b = Sampling.mixToTokenTarget(df.repartition(13), "id", "dom",
      "n_tok", Map("A" -> 0.6, "B" -> 0.4), "s2")
      .select("id").collect().toSet
    assert(a == b)
  }

  test("mixTemperatureSqrt budgets follow integer-sqrt weights and " +
      "upweight the low-resource domain") {
    // raw shares 90/9/1 (%); sqrt-weights flatten that dramatically
    val df = (0L until 10000L).map { i =>
      val dom = if (i < 9000) "big" else if (i < 9900) "mid" else "small"
      (i, dom)
    }.toDF("id", "dom")
    val kept = Sampling.mixTemperatureSqrt(df, "id", "dom", "t1")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val byDom = kept.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // replay the exact integer budget math
    val n = Map("big" -> 9000L, "mid" -> 900L, "small" -> 100L)
    val w = n.view.mapValues(v => math.sqrt(v.toDouble).toLong).toMap
    val totW = w.values.sum
    val t = n.keys.map(d => n(d) * totW / w(d)).min
    n.keys.foreach { d =>
      assert(byDom(d) == w(d) * t / totW, s"$d kept ${byDom(d)}")
    }
    // the binding domain is fully consumed; shares are far flatter than raw
    assert(byDom("small") == 100L)
    val smallShare = byDom("small").toDouble / byDom.values.sum
    assert(smallShare > 0.05, s"small share $smallShare not upweighted")
  }

  test("mixTemperatureSqrt keeps a hash-order prefix and is " +
      "partition-invariant") {
    val df = (0L until 500L)
      .map(i => (i, if (i % 5 == 0) "A" else "B")).toDF("id", "dom")
    val kept = Sampling.mixTemperatureSqrt(df, "id", "dom", "t2")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"${id}t2".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Seq("A", "B").foreach { d =>
      val order = (0L until 500L)
        .filter(i => (if (i % 5 == 0) "A" else "B") == d)
        .sortBy(i => (h(i), i))
      val keptRanks = order.zipWithIndex
        .filter { case (i, _) => kept((d, i)) }.map(_._2)
      assert(keptRanks == (0 until keptRanks.length),
        s"$d kept set is not a prefix of the hash order")
    }
    val again = Sampling.mixTemperatureSqrt(df.repartition(11), "id", "dom",
      "t2").collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(kept == again)
  }

  test("leakageSafeSplit keeps every cluster member in one split") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    // clusters: {0..9} rep 0, {100..104} rep 100 — ids chosen so the
    // members' OWN buckets differ (verified below), i.e. the clusters
    // would straddle splits under plain per-doc hashing
    val clusters = ((0L to 9L).map((_, 0L)) ++ (100L to 104L).map((_, 100L)))
      .toDF("id", "cluster")
    val out = Sampling.leakageSafeSplit(docs, clusters, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byDoc = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert((0L to 9L).map(byDoc(_)).toSet.size == 1)
    assert((100L to 104L).map(byDoc(_)).toSet.size == 1)
    assert(byDoc(0L)._1 == "0" && byDoc(100L)._1 == "100")
    // the guarded-against leak is real on this data: per-doc buckets of the
    // first cluster's members do NOT agree
    val ownBuckets = docs.filter(col("doc_id") < 10)
      .select(Sampling.splitBucket(col("doc_id"))).collect().map(_.getInt(0))
    assert(ownBuckets.distinct.length > 1)
  }

  test("leakageSafeSplit on dup-free data IS the per-doc split_assign") {
    val docs = spark.range(0, 5000).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id", "cluster")
    val out = Sampling.leakageSafeSplit(docs, none, "doc_id")
    import org.apache.spark.sql.functions.when
    val direct = docs.select(col("doc_id"),
      col("doc_id").cast("string").as("rep"),
      when(Sampling.splitBucket(col("doc_id")) < 90, "train")
        .when(Sampling.splitBucket(col("doc_id")) < 95, "val")
        .otherwise("test").as("split"))
    assert(out.collect().toSet == direct.collect().toSet)
    // and the 90/5/5 proportions roughly hold
    val n = out.filter(col("split") === "train").count()
    assert(n > 4200 && n < 4800, s"train fraction off: $n/5000")
  }

  test("leakageSafeSplit handles STRING ids (no silent all-test split)") {
    // regression: the rep used to be cast("long"), so non-numeric ids
    // became null reps and every doc silently fell through to 'test'
    val docs = spark.range(0, 500)
      .select(concat(lit("doc-"), col("id")).as("doc_id"))
    val clusters = Seq(("doc-1", "doc-0"), ("doc-2", "doc-0"))
      .toDF("id", "cluster")
    val out = Sampling.leakageSafeSplit(docs, clusters, "doc_id")
    val counts = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("train", 0L) > 400L,
      s"string ids mis-split: $counts")
    val reps = out.filter(col("doc_id").isin("doc-0", "doc-1", "doc-2"))
      .select(col("rep"), col("split")).distinct().collect()
    assert(reps.length == 1 && reps.head.getString(0) == "doc-0")
  }

  test("leakageSafeSplit is a doc-keyed join plus scan math — no agg") {
    val docs = spark.range(0, 1000).toDF("doc_id")
    val clusters = Seq((1L, 0L)).toDF("id", "cluster")
    val plan = Sampling.leakageSafeSplit(docs, clusters, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("ppsSystematic equals the single-threaded PPS replay exactly") {
    val df = (0L until 500L).map(i => (i, 1L + i % 97)).toDF("id", "wt")
    val got = Sampling.ppsSystematic(df, "id", col("wt"), n = 50,
        salt = "pp").select("id", "w", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // driver replay: same md5 order, same long interval math
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"${id}pp".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ordered = (0L until 500L).map(i => (i, 1L + i % 97))
      .sortBy { case (i, _) => (h(i), i) }
    val total = ordered.map(_._2).sum
    val step = math.max(total / 50, 1L)
    val off = step / 2
    var cum = 0L
    val expect = ordered.flatMap { case (i, w) =>
      val kMin = (cum - off + step - 1) / step
      val keep = off + kMin * step < cum + w
      val row = if (keep) Some((i, w, cum)) else None
      cum += w
      row
    }.toSet
    assert(got == expect)
    assert(got.size >= 49 && got.size <= 51, s"kept ${got.size} of ~50")
  }

  test("ppsSystematic keeps heavy rows with certainty and is " +
      "partition-invariant") {
    // one row owns ~half the total mass: w=5000 vs 499 rows of ~avg 5
    val df = (0L until 500L).map(i => (i, if (i == 7L) 5000L else 1L + i % 9))
      .toDF("id", "wt")
    val kept = Sampling.ppsSystematic(df, "id", col("wt"), n = 20, "hv")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(7L), "a row with w >= step must always be sampled")
    val again = Sampling.ppsSystematic(df.repartition(17), "id", col("wt"),
      n = 20, "hv").select("id").collect().map(_.getLong(0)).toSet
    assert(kept == again)
  }

  test("ppsSystematic never plans a single-partition sort") {
    val df = (0L until 2000L).map(i => (i, 1L + i % 13)).toDF("id", "wt")
    val plan = Sampling.ppsSystematic(df, "id", col("wt"), n = 100, "pl")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("softDedupWeights split a family's mass and leave singletons whole") {
    val docs = (0L until 20L).map(i => (i, 60L)).toDF("doc_id", "n_tok")
    // docs 0..3 form one near-dup family (rep 0); 10,11 another (rep 10)
    val clusters = (Seq(0L, 1L, 2L, 3L).map((_, 0L)) ++
      Seq(10L, 11L).map((_, 10L))).toDF("id", "cluster")
    val w = Sampling.softDedupWeights(docs, clusters, "doc_id",
        col("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(w(_) == 15L))
    assert(Seq(10L, 11L).forall(w(_) == 30L))
    assert(w(5L) == 60L)
    // family mass ≈ one doc's mass, not four docs'
    assert(Seq(0L, 1L, 2L, 3L).map(w).sum == 60L)
  }

  test("rejectionSample keep rate tracks the per-row score") {
    val df = ids.withColumn("ppm",
      when(col("id") % 2 === 0, lit(200000L)).otherwise(lit(800000L)))
    val kept = Sampling.rejectionSample(df, "id", col("ppm"), "rj")
    val even = kept.filter(col("id") % 2 === 0).count().toDouble / 10000
    val odd = kept.filter(col("id") % 2 === 1).count().toDouble / 10000
    assert(math.abs(even - 0.2) < 0.02, s"even rate $even")
    assert(math.abs(odd - 0.8) < 0.02, s"odd rate $odd")
  }

  test("rejectionSample is deterministic, partition-invariant, clamped") {
    val df = ids.withColumn("ppm", (col("id") % 3000000L) - 1000000L)
    val a = Sampling.rejectionSample(df, "id", col("ppm"), "rj2")
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.rejectionSample(df.repartition(13), "id", col("ppm"),
        "rj2").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // negative scores keep nothing; scores ≥ 1e6 keep everything
    val neg = Sampling.rejectionSample(
      ids.withColumn("ppm", lit(-5L)), "id", col("ppm"), "rj2")
    assert(neg.isEmpty)
    val full = Sampling.rejectionSample(
      ids.withColumn("ppm", lit(2000000L)), "id", col("ppm"), "rj2")
    assert(full.count() == 20000)
  }

  test("rejectionSample is scan-side: zero exchanges, no rand") {
    val plan = Sampling.rejectionSample(
        ids.withColumn("ppm", lit(500000L)), "id", col("ppm"), "rj3")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("rand"), plan)
  }

  test("ppmBucket is uniform across the ppm range") {
    val buckets = ids.select(
        Sampling.ppmBucket(col("id"), "u1").as("b"))
      .agg(min("b"), max("b"),
        sum(when(col("b") < 500000L, 1).otherwise(0)))
      .head()
    assert(buckets.getLong(0) < 10000L, s"min ${buckets.getLong(0)}")
    assert(buckets.getLong(1) > 990000L, s"max ${buckets.getLong(1)}")
    val below = buckets.getLong(2).toDouble / 20000
    assert(math.abs(below - 0.5) < 0.02, s"median skew $below")
  }

  test("exactK: k rows, partition-invariant, plans as take-ordered") {
    val one = Sampling.exactK(ids, "id", 25, "rs")
    val ids25 = one.select("id").as[Long].collect().toSet
    assert(ids25.size == 25)
    val reparted = Sampling.exactK(ids.repartition(17), "id", 25, "rs")
      .select("id").as[Long].collect().toSet
    assert(reparted == ids25)
    // per-partition top-k + driver merge, not a global sort
    assert(one.queryExecution.executedPlan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, one.queryExecution.executedPlan.toString)
  }

  test("reservoirMerge is a semilattice fold: any batching replays the " +
      "one-shot sample, and re-folding a batch is idempotent") {
    val oneShot = Sampling.exactK(ids, "id", 25, "rs")
      .select("id").as[Long].collect().toSet
    // fold three arbitrary batches through k-row snapshots
    val batches = Seq(
      ids.filter(col("id") % 3 === 0), ids.filter(col("id") % 3 === 1),
      ids.filter(col("id") % 3 === 2))
    var snap = Sampling.exactK(batches.head, "id", 25, "rs").localCheckpoint()
    batches.tail.foreach { b =>
      snap = Sampling.reservoirMerge(snap, b, "id", 25, "rs")
        .localCheckpoint()
    }
    assert(snap.select("id").as[Long].collect().toSet == oneShot)
    // at-least-once replay: re-merging an already-folded batch changes
    // nothing — this is exactly where the merge's id-dedup earns its keep
    // (min-k over the raw row MULTISET is not idempotent: the replayed
    // rows would occupy two slots each and shrink the distinct sample)
    val replay = Sampling.reservoirMerge(snap, batches.last, "id", 25, "rs")
      .select("id").as[Long].collect().toSet
    assert(replay == oneShot)
  }

  test("exactK excludes null ids (a null md5 rank sorts FIRST and would " +
      "deterministically seize sample slots)") {
    val withNulls = ids.select(
      when(col("id") % 100 === 0, lit(null)).otherwise(col("id")).as("id"))
    val sampled = Sampling.exactK(withNulls, "id", 50, "nn")
      .select("id").as[Long].collect()
    assert(sampled.length == 50)
    // the sample is exactly the sample of the non-null rows
    val clean = Sampling.exactK(ids.filter(col("id") % 100 =!= 0),
        "id", 50, "nn")
      .select("id").as[Long].collect()
    assert(sampled.sorted.sameElements(clean.sorted))
  }

  test("weightedExactK: selection tracks weight (A-ES proportionality), " +
      "deterministic and partition-invariant") {
    // 1 heavy row (w=50) among 50 light rows (w=1): P(heavy in k=1 draw)
    // = 50/100 = 0.5. Over 60 independent salts, heavy should win far
    // more often than any single light row (binomial(60, .5) vs .01).
    val df = ((0L until 50L).map(i => (i, 1L)) :+ (99L, 50L))
      .toDF("id", "w")
    val wins = (1 to 60).count { i =>
      Sampling.weightedExactK(df, "id", col("w"), 1, s"s$i")
        .select("id").as[Long].head() == 99L
    }
    assert(wins > 15 && wins < 55, s"heavy row won $wins/60 — A-ES " +
      "proportionality violated (expected ~30)")
    val once = Sampling.weightedExactK(df, "id", col("w"), 10, "fix")
      .select("id").as[Long].collect().toSet
    val again = Sampling.weightedExactK(df.repartition(7), "id",
      col("w"), 10, "fix").select("id").as[Long].collect().toSet
    assert(once == again && once.size == 10)
  }

  test("weightedExactK: zero/negative weights and null ids never win; " +
      "plan is TakeOrderedAndProject (no global sort)") {
    val df = Seq((Some(1L), 5L), (Some(2L), 0L), (Some(3L), -4L),
      (None, 1000000L), (Some(4L), 5L)).toDF("id", "w")
    val got = Sampling.weightedExactK(df, "id", col("w"), 10, "z")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
    val plan = Sampling.weightedExactK(ids.withColumn("w", lit(2L)),
        "id", col("w"), 5, "p")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("weightedExactK: a positive weight below the documented 1e-6 " +
      "floor fails loudly (silent exclusion would shrink the eligible " +
      "set below the A-ES contract); at-floor weights stay eligible") {
    val bad = Seq((1L, 1e-10), (2L, 1e-7), (3L, 0.5), (4L, 2.0))
      .toDF("id", "w")
    val ex = intercept[Exception] {
      Sampling.weightedExactK(bad, "id", col("w"), 10, "fl")
        .select("id").as[Long].collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("below the 1e-6 floor")),
      s"expected the loud floor message, got: $ex")
    // exactly at the floor is eligible — the guard is strict-below
    val ok = Seq((1L, 1e-6), (2L, 0.5)).toDF("id", "w")
    assert(Sampling.weightedExactK(ok, "id", col("w"), 10, "fl")
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
