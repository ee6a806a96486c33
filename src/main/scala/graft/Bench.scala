package graft
import org.apache.spark.sql.SparkSession

/** Collects every named `observe()` metric group that completes during the
  * bench (e.g. the PPJoin candidate counts — Dedup.PrefixJoinRawObservation):
  * operator-health numbers that are exact and stable where local wall-clock
  * is ±40% noise. Keyed by observation name; last completed query wins.
  */
private class ObservedMetricsListener
    extends org.apache.spark.sql.util.QueryExecutionListener {
  val seen = new scala.collection.concurrent.TrieMap[String, Seq[(String, Any)]]
  override def onSuccess(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      seen(name) = row.schema.fieldNames.toSeq.map(f => f -> row.getAs[Any](f))
    }
  override def onFailure(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      exception: Exception): Unit = ()
  def snapshotAndClear(spark: SparkSession): Map[String, Seq[(String, Any)]] = {
    org.apache.spark.sql.GraftSqlShim.waitListenerBusEmpty(spark)
    val out = seen.toMap
    seen.clear()
    out
  }
}

/** Per-task resource counters (shuffle bytes written/read, memory/disk
  * spill) accumulated through the listener bus: the 100 TB design grade
  * should rest on MEASURED shuffle volume, not wall-clock inference — a
  * query can be slow-but-scan-bound (fine) or fast-but-shuffle-heavy (a
  * 1000-executor problem), and wall-clock cannot tell them apart.
  */
private class ResourceListener extends org.apache.spark.scheduler.SparkListener {
  private val sw = new java.util.concurrent.atomic.AtomicLong
  private val sr = new java.util.concurrent.atomic.AtomicLong
  private val sm = new java.util.concurrent.atomic.AtomicLong
  private val sd = new java.util.concurrent.atomic.AtomicLong
  override def onTaskEnd(
      te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      sm.addAndGet(m.memoryBytesSpilled)
      sd.addAndGet(m.diskBytesSpilled)
    }
  }
  def reset(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftSqlShim.waitListenerBusEmpty(spark)
    sw.set(0); sr.set(0); sm.set(0); sd.set(0)
  }
  /** (shuffleWrite, shuffleRead, memSpilled, diskSpilled) since reset. */
  def snapshot(spark: SparkSession): (Long, Long, Long, Long) = {
    org.apache.spark.sql.GraftSqlShim.waitListenerBusEmpty(spark)
    (sw.get, sr.get, sm.get, sd.get)
  }
}

object Bench {
  /** Locale-fixed decimal rendering: the `f` interpolator formats through
    * the JVM default locale, which under comma-decimal locales would emit
    * `59,244` and break the JSON contract line.
    */
  private def jnum(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f",
      Double.box(v))

  /** Box fingerprint (r10 verdict item #3): the round's three full benches
    * of ONE tree spanned 202–243 s and the artifact gave a reader nothing
    * to attribute the 20% to. Load average, memory and page-cache state,
    * heap ceiling and CPU count make driver-vs-local deltas explainable
    * from the bench file alone.
    */
  private def envFingerprint(): String = {
    def slurp(p: String): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)))
      catch { case _: Throwable => "" }
    val load = slurp("/proc/loadavg").split("\\s+")
      .headOption.filter(_.nonEmpty).getOrElse("-1")
    val mem = slurp("/proc/meminfo").linesIterator.map(_.split("\\s+"))
      .collect { case a if a.length >= 2 => (a(0).stripSuffix(":"), a(1)) }
      .toMap
    def m(k: String) = mem.getOrElse(k, "-1")
    val rt = Runtime.getRuntime
    s"""{"load_avg":$load,"mem_free_kb":${m("MemFree")},""" +
      s""""mem_available_kb":${m("MemAvailable")},""" +
      s""""page_cache_kb":${m("Cached")},""" +
      s""""heap_max_mb":${rt.maxMemory() / 1024 / 1024},""" +
      s""""cpus":${rt.availableProcessors()}}"""
  }

  def main(args: Array[String]): Unit = {
    val envStart = envFingerprint()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // r14 (guide §1/§4 measure-first): the default 100-entry whole-stage
      // codegen cache (spark.sql.codegen.cache.maxEntries) thrashes on a
      // 264-query suite — sim_knn_graph_incremental alone holds ~200
      // distinct generated classes, so EVERY timed rep recompiled ~190
      // classes (measured: rep_compiles 190/190/190, ~2 s/rep of janino
      // wall) despite the suite- and pre-rep warm passes existing exactly
      // to absorb compilation. 4096 entries (~100–200 MB metaspace) makes
      // the warm pass effective as designed: rep_compiles → 0. Not a
      // local-only win: executors at 100 TB run the same distinct plan
      // fragments through the same 100-entry default. Parameterized for
      // deployments that want a different bound.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // r14: session artifact isolation (on by default in Spark 4) keys
      // executor classloaders by a per-STREAMING-RUN artifact uuid, and the
      // codegen cache is classloader-keyed — so every streaming query run
      // recompiled its full plan even with byte-identical sources
      // (StreamCodegenProbe: stream rerun = 7 recompiles with isolation,
      // 0 without; batch reruns always 0). This engine registers no
      // session artifacts, so isolation buys nothing and costs ~10-20
      // janino compiles per micro-batch fold. Same effect on a cluster:
      // every ingest-job restart recompiles on all executors.
      .config("spark.sql.artifact.isolation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_ISOLATION", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Cross-box wall anchor (r13 verdict #6): r13's 15% driver-vs-builder
    // wall gap was diagnosed BY HAND from sibling artifacts. This is a
    // fixed CPU+shuffle calibration — constant work (8.4M generated rows
    // hashed and shuffled into a 4096-group aggregate), zero file I/O,
    // independent of the scale factor — timed FIRST and stamped into the
    // artifact as anchor_sec, so two runs' walls can be compared
    // anchor-normalized (tools/bench_guard.sh's cross-run mode divides
    // both sides by their anchors before calling anything a regression).
    // One untimed run warms the anchor's own codegen; median of 3.
    val anchorSec = {
      import org.apache.spark.sql.functions._
      def once(): Double = {
        val t0 = System.nanoTime()
        // xxhash64 + pmod: branch-free codegen work with no ANSI
        // overflow (a raw LCG multiply raises under ANSI mode); the
        // bounded summand keeps the 8.4M-row sum far inside a long
        spark.range(1L << 23)
          .select(xxhash64(col("id")).as("h"))
          .groupBy(pmod(col("h"), lit(4096L)).as("b"))
          .agg(count(lit(1)).as("n"),
            sum(pmod(col("h"), lit(1000000L))).as("s"))
          .agg(sum(col("n"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val xs = (1 to 3).map(_ => once()).sorted
      xs(1)
    }
    // Optional args restrict the run to the named queries (local iteration).
    // benchQueries = queries with contract forms swapped for plain operator
    // output: the contract's verification baselines (exact quadratic forms,
    // recomputation joins) belong to the correctness gate, not the timer.
    val selected =
      if (args.isEmpty) SparkEntry.benchQueries
      else SparkEntry.benchQueries.view.filterKeys(args.toSet).toMap
    // Warm-up pass at the smallest scale factor: JVM/codegen/first-read costs
    // land here instead of inflating whichever timed query happens to run
    // first (janino compilation of a cold operator costs seconds).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    selected.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => }
    }
    // Drop warm-up caches (dedup/similarity operators persist intermediate
    // frames): timed queries rebuild their own, and the heap starts clean.
    // releaseAllRdds also reaches the localCheckpoint blocks that
    // clearCache() cannot (they live in the block manager until GC).
    // Caveat: releasing a checkpointed RDD logs a "lineage has been
    // truncated and cannot be recomputed" WARN — expected and harmless
    // here, because every warm-up/query result was fully consumed (counted)
    // before release and is never re-read.
    // Memoized-store serving forms (manifest stores, bm25/hybrid index
    // caches, bpe merge tables, …) build their per-dir state on first
    // call: trigger those builds at the TIMED dir here, outside the reps —
    // otherwise rep 1 times the one-off build and trips the spread
    // arbiter every round with a known-positional outlier (r11: the
    // manifest_count_only 8.2 s-build-vs-0.17 s-serve arbiter row, and
    // the bm25_filtered / bpe_encode first-rep rows, were exactly this).
    // ALL timed maps, not just the manifest family — the review caught
    // the first fix applied one level too shallow.
    (graft.queries.PipelineQueries.timed ++
        graft.streaming.StreamingQueries.timed ++
        graft.queries.FormatQueries.timed)
      .filter { case (k, _) => selected.contains(k) }
      .foreach { case (_, fn) =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      }
    spark.catalog.clearCache()
    graft.operators.Caching.releaseAllRdds(spark)
    // Median-of-3 per query: single-run timings carried ~10x jitter on
    // sub-second built-ins (r4: join_semi 0.25->2.50 s with an unchanged
    // plan) because block release + GC churn between queries lands on
    // whichever query runs next. Three runs with release + an explicit GC
    // OUTSIDE the timer make the per-query number a median over clean
    // heaps; "total" stays the sum of medians.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val obs = new ObservedMetricsListener
    spark.listenerManager.register(obs)
    // Candidate-floor observations per growth query (r11 verdict item #1):
    // the work volume any correct plan must process at that scale —
    // candidate pairs for the filter-verify joins, per-round proposals
    // for NN-descent. Captured PER SCALE STEP below so the growth gate
    // can machine-verify that a super-flag time step tracks the floor
    // (time-ratio <= k x floor-ratio) instead of trusting a NOTES
    // narrative. Missing observation names (e.g. a descent run with
    // fewer rounds) just drop out of the sum.
    val floorObsNames: Map[String, Seq[String]] = Map(
      "jaccard_prefix_join" ->
        Seq(graft.operators.Dedup.PrefixJoinRawObservation),
      "winnow_containment_pairs" ->
        Seq(graft.operators.Dedup.WinnowRawObservation),
      "dedup_embedding_lsh" ->
        Seq(graft.operators.Dedup.EmbeddingLshCandObservation),
      "interval_join_binned" ->
        Seq(graft.operators.TemporalJoins.RangeJoinCandObservation),
      "sim_knn_graph" ->
        (graft.operators.Similarity.KnnGraphCandObservation +:
          (1 to 3).map(graft.operators.Similarity.knnDescentObservation)),
      "sim_knn_graph_incremental" ->
        (1 to 3).map(graft.operators.Similarity.knnDescentIncObservation))
    def floorCand(name: String,
        snap: Map[String, Seq[(String, Any)]]): Option[Long] =
      floorObsNames.get(name).flatMap { names =>
        val vals = names.flatMap(snap.get).flatMap(_.collectFirst {
          case (_, v: Long) => v
          case (_, v: Int) => v.toLong
        })
        if (vals.isEmpty) None else Some(vals.sum)
      }
    // The measured-noisy families (r12 verdict #3 root cause, see
    // tools/CodegenChurnProbe): in-suite rep 1 inherits the position's
    // JVM state — a codegen-cache eviction burst (the ~80 queries since
    // the warm pass evict this query's classes from the bounded janino
    // LRU; churn-60 probe: 72 recompiled classes on rep 1 vs 29 steady)
    // plus block-manager/GC debt from whichever giant query ran before.
    // These families get (a) a PRE-REP warm immediately before their
    // timed reps, so the positional one-off lands outside the timer the
    // same way the suite-level warm pass intends, and (b) median-of-3 at
    // the sf1 decade (r12 verdict #1b: jaccard's 3x in-suite rep spread
    // disproves single-rep-is-fine for them).
    val noisyFamilies: Set[String] = floorObsNames.keySet + "dedup_simhash"
    def nCompiles: Long = org.apache.spark.metrics.source
      .CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    // main-suite observation accumulation (last completed query wins, as
    // before) + per-query candidate floors at the bench sf: the global
    // end-of-suite snapshot cannot attribute an observation to a query
    // when several queries share an operator, so snapshot per query
    val obsBig = scala.collection.mutable.Map[String, Seq[(String, Any)]]()
    val bigFloorCand = scala.collection.mutable.Map[String, Long]()
    // per query: (median sec, rows, spread = max-min over the reps) — the
    // spread lands in the bench file so a noisy timing is distinguishable
    // from a real regression without re-running.
    // Two order-robustness rules (r9 post-mortem): (1) queries run in
    // SORTED name order, so a query's in-suite neighbors are stable across
    // rounds (Map hash order reshuffles whenever the registry grows, which
    // silently reassigns whose leftover JVM state each query inherits);
    // (2) the release before each timed rep is BLOCKING — the async form
    // let the previous rep's block removal run concurrently inside the
    // next rep's timer (see Caching.releaseAllRdds).
    val res = new ResourceListener
    spark.sparkContext.addSparkListener(res)
    // cumulative stop-the-world GC time across all collectors — per-rep
    // deltas feed the spread arbiter's attribution field
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      var rows = -1L
      // pre-rep warm for the measured-noisy families: pays the positional
      // one-off (codegen-cache refill + inherited GC/block debt) OUTSIDE
      // the timer — rep_compiles below records what each timed rep still
      // compiled, so the exemption is measured, not asserted
      if (noisyFamilies.contains(name))
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      // reset AFTER the warm (r13 ADVICE): the warm run's shuffle/spill
      // must not land in the usage snapshot, which the comment at the
      // snapshot promises covers only the timed reps
      res.reset(spark)
      val rawC = (1 to reps).map { _ =>
        graft.operators.Caching.releaseAllRdds(spark, blocking = true)
        System.gc()
        val c0 = nCompiles
        val g0 = gcMillis
        val t0 = System.nanoTime()
        rows = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        ((System.nanoTime() - t0) / 1e9, nCompiles - c0, gcMillis - g0)
      }
      val raw = rawC.map(_._1)
      // shuffle/spill across the `reps` timed reps (the inter-rep release
      // moves blocks, it does not shuffle) — exact counters, not wall-clock
      val usage = res.snapshot(spark)
      val snap = obs.snapshotAndClear(spark)
      obsBig ++= snap
      floorCand(name, snap).foreach(v => bigFloorCand(name) = v)
      graft.operators.Caching.releaseAllRdds(spark)
      val secs = raw.sorted
      name -> ((secs(secs.size / 2), rows, secs.last - secs.head, raw,
        usage, rawC.map(_._2), rawC.map(_._3)))
    }
    // Spread arbiter (r10 verdict item #1): the growth gate cannot see the
    // r9 failure class — ONE pathological rep in-suite (jaccard shipped a
    // 29 s spread on a 7.5 s median with clean growth). Any query whose
    // rep spread exceeds max(2x median, 2 s) is re-measured HERE, at the
    // END of the suite (a different suite position, same JVM discipline):
    // a tight recheck proves the outlier was positional harness noise, a
    // wide one indicts the operator — either way the artifact carries the
    // evidence (original reps, suite position, recheck reps).
    val spreadArbiter = if (args.nonEmpty) "{}" else {
      val flagged = results.zipWithIndex.collect {
        case ((name, (med, _, sp, raw, _, compiles, gcms)), pos)
            if sp > math.max(2 * med, 2.0) =>
          (name, pos, med, sp, raw, compiles, gcms)
      }
      flagged.map { case (name, pos, med, sp, raw, compiles, gcms) =>
        // Attribution (r13 verdict #2): the arbiter re-measures but the
        // artifact never NAMED a cause — rep_compiles sat beside the row
        // unconsulted. Judge the blown rep against its siblings on the
        // two channels measured per rep: whole-stage-codegen compile
        // count (the janino-cache-eviction one-off) and stop-the-world
        // GC time (inherited heap debt). Neither → the honest verdict is
        // unattributed-environment.
        val worst = raw.indexOf(raw.max)
        val others = raw.indices.filterNot(_ == worst)
        val extraSec = raw(worst) - others.map(raw).min
        val cOthers = others.map(compiles).sorted
        val cMed = cOthers(cOthers.size / 2)
        val gOthers = others.map(gcms).sorted
        val gMed = gOthers(gOthers.size / 2)
        val attribution =
          if (compiles(worst) >= math.max(2 * cMed, 10L))
            "codegen-recompile"
          else if (gcms(worst) - gMed >= (0.5 * extraSec * 1000).toLong &&
              gcms(worst) - gMed > 200L)
            "gc-pressure"
          else "unattributed-environment"
        val fn = selected(name)
        val re = (1 to reps).map { _ =>
          graft.operators.Caching.releaseAllRdds(spark, blocking = true)
          System.gc()
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count() catch { case _: Throwable => }
          (System.nanoTime() - t0) / 1e9
        }
        graft.operators.Caching.releaseAllRdds(spark)
        val rs = re.sorted
        s""""$name":{"position":$pos,"median":${jnum(med, 3)},""" +
          s""""spread":${jnum(sp, 3)},""" +
          s""""original":[${raw.map(jnum(_, 3)).mkString(",")}],""" +
          s""""worst_rep":$worst,""" +
          s""""worst_rep_compiles":${compiles(worst)},""" +
          s""""worst_rep_gc_ms":${gcms(worst)},""" +
          s""""attribution":"$attribution",""" +
          s""""recheck":[${re.map(jnum(_, 3)).mkString(",")}],""" +
          s""""recheck_median":${jnum(rs(rs.size / 2), 3)},""" +
          s""""recheck_spread":${jnum(rs.last - rs.head, 3)}}"""
      }.mkString("{", ",", "}")
    }
    spark.sparkContext.removeSparkListener(res)
    val resultMap =
      results.map { case (n, (med, rows, sp, _, _, _, _)) =>
        n -> ((med, rows, sp))
      }.toMap
    // Observed-metric telemetry for the timed pass at sfDir (the scale-
    // growth pass below snapshots its own at the small sf).
    def telemetryJson(m: Map[String, Seq[(String, Any)]]): String =
      m.toSeq.sortBy(_._1).map { case (name, fields) =>
        val fs = fields.map {
          case (f, v: Long) => s"\"$f\":$v"
          case (f, v: Int) => s"\"$f\":$v"
          case (f, v: Double) => s"\"$f\":${jnum(v, 6)}"
          case (f, v) => s"\"$f\":\"${String.valueOf(v)}\""
        }.mkString(",")
        s"\"$name\":{$fs}"
      }.mkString("{", ",", "}")
    // per-query snapshots above + any spread-arbiter re-run residue:
    // same last-wins semantics the single end-of-suite snapshot had
    val telemetryBig =
      telemetryJson((obsBig ++ obs.snapshotAndClear(spark)).toMap)
    val qs = results.map { case (k, (v, _, _, _, _, _, _)) =>
      s"\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val rows = results.map { case (k, (_, r, _, _, _, _, _)) =>
      s"\"" + k + "\":" + r
    }.mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, _, sp, _, _, _, _)) =>
      s"\"" + k + "\":" + jnum(sp, 3)
    }.mkString("{", ",", "}")
    // raw per-rep wall times in RUN order (reps(0) ran first): with the
    // medians alone a blown rep is invisible; with these the spread
    // arbiter's "which rep blew up" question is answerable from the file
    val repsJson = results.map { case (k, (_, _, _, raw, _, _, _)) =>
      s""""$k":[${raw.map(jnum(_, 3)).mkString(",")}]"""
    }.mkString("{", ",", "}")
    val resourcesJson = results.map { case (k, (_, _, _, _, u, _, _)) =>
      s""""$k":{"shuffle_write_b":${u._1},"shuffle_read_b":${u._2},""" +
        s""""spill_mem_b":${u._3},"spill_disk_b":${u._4}}"""
    }.mkString("{", ",", "}")
    // per-rep whole-stage-codegen compilation counts, run order (the r12
    // verdict #3 attribution channel: a blown rep whose compile count
    // dwarfs its siblings' is the janino-cache-eviction one-off the
    // CodegenChurnProbe measured, not an operator regression)
    val repCompilesJson = results.map { case (k, (_, _, _, _, _, cs, _)) =>
      s""""$k":[${cs.mkString(",")}]"""
    }.mkString("{", ",", "}")
    // per-rep stop-the-world GC milliseconds, run order — the second
    // attribution channel the spread arbiter consults
    val repGcJson = results.map { case (k, (_, _, _, _, _, _, gs)) =>
      s""""$k":[${gs.mkString(",")}]"""
    }.mkString("{", ",", "}")
    // run order = sorted names; recorded so "suite position" in the
    // arbiter rows resolves to neighbors without re-deriving
    val suiteOrder = results.map(r => s""""${r._1}"""")
      .mkString("[", ",", "]")
    val total =
      if (results.nonEmpty) results.map(_._2._1).sum else 0.0
    val nQueries = results.size
    // IVF recall/latency sweep (untimed extra): how the ANN quality/cost
    // trade-off moves across the (nCentroids, nProbe) grid on this scale
    // factor's embeddings. Recorded in the bench file only.
    val sweep = if (args.isEmpty) {
      import org.apache.spark.sql.functions.col
      val emb = Tables.t(spark, sfDir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = graft.operators.Similarity
        .bruteForceTopK(emb, q, "vec_id", "embedding", k = 5).localCheckpoint()
      // floors (r14, pq_sweep parity): IVF recall on this gaussian data
      // tracks the probed fraction nProbe/nCentroids; measured
      // 0.16–0.68 across sf0.01/0.1, floors sit at ~half the measured
      // minimum per point. Deterministic (hash-ordered sample + Lloyd),
      // so a false row is a direct guard red like pq_sweep's.
      val grid = Seq((8, 1, 0.08), (8, 2, 0.2), (16, 1, 0.08),
        (16, 4, 0.25), (32, 4, 0.22), (32, 8, 0.33))
      val entries = grid.map { case (nc, np, floor) =>
        val t0 = System.nanoTime()
        // consumed exactly once (by the recall join) — no checkpoint needed,
        // and Dataset.unpersist would not release checkpoint blocks anyway
        val ivf = graft.operators.Similarity.ivfTopK(emb, q, "vec_id",
          "embedding", k = 5, nCentroids = nc, nProbe = np, trainIters = 2)
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = graft.queries.Contracts.recall(ivf, brute)
        s"""{"nCentroids":$nc,"nProbe":$np,"sec":${jnum(sec, 3)},""" +
          s""""recall":${jnum(recall, 3)},"floor":${jnum(floor, 2)},""" +
          s""""ok":${recall >= floor}}"""
      }
      graft.operators.Caching.releaseAllRdds(spark)
      entries.mkString("[", ",", "]")
    } else "[]"
    // PQ/OPQ arm of the recorded recall/latency sweep (r13 verdict #5):
    // the ivf_sweep records the nProbe trade-off; this records the code-
    // size one (m × ksub, plus the OPQ rotation arm) so the 100 TB
    // serving-tier choice is data-driven from the artifact. Each row
    // asserts its recall floor ("ok") — recall here is DETERMINISTIC
    // (seeded codebooks, fixed sample), so tools/bench_guard.sh goes red
    // on a false row with no wall-jitter arbiter needed. Floors sit at
    // ~half the MEASURED minimum across sf0.01/sf0.1 (the ivf_sweep
    // rule): pq m8 0.62/0.42, m16x16 0.82/0.84, m16x64 1.0/0.96,
    // m32x16 1.0/0.96, opq 0.82/0.58 — the r13 NOTES lesson holds,
    // statistical floors are scale-dependent (opq's first cut at 0.6
    // was above its own sf0.1 measurement).
    val pqSweep = if (args.isEmpty) {
      import org.apache.spark.sql.functions.col
      val emb = Tables.t(spark, sfDir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val brute = graft.operators.Similarity
        .bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .localCheckpoint()
      val grid = Seq(("pq", 8, 16, 0.2), ("pq", 16, 16, 0.4),
        ("pq", 16, 64, 0.45), ("pq", 32, 16, 0.45), ("opq", 16, 16, 0.3))
      val entries = grid.map { case (arm, m, ksub, floor) =>
        val t0 = System.nanoTime()
        val served = (if (arm == "opq")
          graft.operators.Similarity.opqTopK(emb, q, "vec_id",
            "embedding", k = 5, m = m, ksub = ksub, shortlistFactor = 8)
        else
          graft.operators.Similarity.pqTopK(emb, q, "vec_id",
            "embedding", k = 5, m = m, ksub = ksub, shortlistFactor = 8))
          .localCheckpoint()
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = graft.queries.Contracts.recall(served, brute)
        s"""{"arm":"$arm","m":$m,"ksub":$ksub,"sec":${jnum(sec, 3)},""" +
          s""""recall":${jnum(recall, 3)},"floor":${jnum(floor, 2)},""" +
          s""""ok":${recall >= floor}}"""
      }
      graft.operators.Caching.releaseAllRdds(spark)
      entries.mkString("[", ",", "]")
    } else "[]"
    // Scale-growth detector (untimed extra): re-time the scale-sensitive
    // operator families (dedup/ANN/text/embedding — PipelineQueries.timed —
    // plus the full streaming family, whose state-store/watermark costs
    // have their own growth behavior the batch families can't stand in
    // for) at TWO smaller scale factors and report both growth steps per
    // query: r1 = t(tinyDir->smallDir), r2 = t(smallDir->sfDir). Rows grow
    // 10x per step, so a per-decade ratio far above ~10-15 flags
    // super-linear behavior (the fixed-nBits class of scale bug)
    // mechanically instead of by judge audit — and with two steps a
    // legitimately quadratic-in-OUTPUT query (high on both steps, e.g.
    // interval_join_binned's match count on a fixed value domain) is
    // distinguishable from a one-off wall spike (high on one step only):
    // the guard's fitted slope is the geometric mean of the steps.
    // Medians again — a single sub-second run at sf0.01 would put timer
    // jitter in the denominator. (streaming_dlq_redrive generates its own
    // fixed 10-message queue, so its ratio hovers near 1 — included for
    // uniformity, read accordingly.)
    val (scaleGrowth, scaleGrowthSteps, scaleGrowthFloors, telemetrySmall,
        guardJson) =
      if (args.isEmpty) {
      val smallDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
        "/root/testdata/sf0.01")
      val tinyDir = sys.env.getOrElse("SPARK_GRAFT_TINY_DIR",
        "/root/testdata/sf0.001")
      // Join/layout tier added r8 (verdict item): these carry the round-6/7
      // operator work and have their own growth behavior (exchange-free
      // bucketed plans, binned interval fan-out, zipWithIndex passes) that
      // the dedup/ANN families can't stand in for.
      val joinTier = Seq("asof_join_native", "asof_join_bucketed",
        "interval_join_binned", "global_shuffle_order", "dataset_diff",
        "dedup_clusters_incremental", "multimodal_frames")
      // Audit/eval tier added r11 session 2: the graph / tokenizer /
      // drift / anomaly / ranking-eval additions have growth shapes
      // (wedge closure, lattice EM, reference-bucket scans, trailing
      // windows, per-query DCG joins) none of the other tiers stands in
      // for; all read only the generated tables, so they take the sf1
      // decade too (ScaleFixtures.sf1Queries).
      val auditTier = Seq("graph_triangles", "unigram_train",
        "corpus_distinct_ngrams", "distribution_drift", "event_anomaly",
        "retrieval_ndcg")
      // Timed overrides LAST: a key present in both a contract map and a
      // timed map must resolve to the timed form here, or the growth
      // ratio's small-sf denominator would time the contract while the
      // numerator timed the operator.
      val growthQueries =
        graft.streaming.StreamingQueries.queries.view
          .filterKeys(_.startsWith("streaming_")).toMap ++
        (joinTier ++ auditTier)
          .flatMap(n => SparkEntry.benchQueries.get(n).map(n -> _)) ++
        graft.queries.PipelineQueries.timed ++
        graft.streaming.StreamingQueries.timed
      // accumulate the small/tiny/sf1 observation snapshots for
      // telemetry_small (last completed query wins, as before) — the
      // per-measurement snapshotAndClear below is what attributes each
      // candidate floor to its (query, scale point)
      val obsSmallAcc =
        scala.collection.mutable.Map[String, Seq[(String, Any)]]()
      // (median sec, rows, candidate floor or -1) at one scale point
      def measureAt(name: String,
          fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
          dir: String): (Double, Long, Long) = {
        var rows = -1L
        val secs = (1 to reps).map { _ =>
          graft.operators.Caching.releaseAllRdds(spark, blocking = true)
          // same pre-timer discipline as the big-sf loop: GC debt from the
          // previous rep must not land inside the small/tiny denominators,
          // or the fitted growth slope deflates toward a false green
          System.gc()
          val t0 = System.nanoTime()
          rows = try fn(spark, dir).count()
          catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val snap = obs.snapshotAndClear(spark)
        obsSmallAcc ++= snap
        (math.max(secs(secs.size / 2), 1e-3), rows,
          floorCand(name, snap).getOrElse(-1L))
      }
      val haveTiny = new java.io.File(tinyDir).isDirectory && tinyDir != sfDir
      // Fourth decade (r10 verdict item #7): self-generated deterministic
      // sf1 fixtures (documents/embeddings/events at 10x sf0.1 — see
      // ScaleFixtures; for the document/embedding families this is the
      // only clean 10x step, the driver decades are rows-flat below
      // sf0.1). One rep per query: at multi-second walls timer jitter is
      // small relative to the signal, and a slope that bends between 0.1
      // and 1 — the realistic failure point — shows up regardless.
      val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
        graft.tools.ScaleFixtures.DefaultDir)
      val haveSf1 =
        sys.env.get("SPARK_GRAFT_SKIP_SF1").isEmpty && {
          try { graft.tools.ScaleFixtures.ensure(spark, sf1Dir); true }
          catch { case _: Throwable => false }
        }
      // Two runs, SECOND timed: a memoized serving form pays its one-off
      // per-dir store build on the first call at a fresh dir, and a cold
      // single rep would compare build+serve at sf1 against the
      // serve-only sfDir median — a false slope the fresh-JVM arbiter
      // would then CONFIRM (it does the same cold rep) instead of clear.
      // For non-memoized forms run 2 is an ordinary rep, so the
      // discipline is uniform. The measured-noisy families get
      // MEDIAN-OF-3 timed reps (r12 verdict #1b: single-rep at the sf1
      // decade shipped an 18.1x jaccard step whose in-suite siblings
      // spanned 3x — "multi-second walls drown jitter" is disproved for
      // exactly these queries); everything else stays single-rep, the
      // sf1 pass is already the suite's longest extra.
      def onceAt(name: String,
          fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
          dir: String): (Double, Long, Long) = {
        val warmOk = try { fn(spark, dir).count(); true }
          catch { case _: Throwable => false }
        if (!warmOk) return (-1.0, -1L, -1L) // never time a crash
        val nReps = if (noisyFamilies.contains(name)) reps else 1
        var rows = -1L
        val secs = (1 to nReps).map { _ =>
          graft.operators.Caching.releaseAllRdds(spark, blocking = true)
          System.gc()
          val t0 = System.nanoTime()
          rows = try fn(spark, dir).count()
            catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val snap = obs.snapshotAndClear(spark)
        obsSmallAcc ++= snap
        if (rows >= 0)
          (math.max(secs(secs.size / 2), 1e-3), rows,
            floorCand(name, snap).getOrElse(-1L))
        else (-1.0, -1L, -1L)
      }
      if (new java.io.File(smallDir).isDirectory && smallDir != sfDir) {
        obs.snapshotAndClear(spark) // drop sweep/envelope noise before small
        val measured = growthQueries.toSeq
          .sortBy(_._1).flatMap { case (name, fn) =>
            // rows >= 0 = the query SUCCEEDED at sfDir (failures time the
            // crash, which would make the growth ratio nonsense)
            resultMap.get(name).filter(_._2 >= 0).map {
              case (bigSec, bigRows, _) =>
                val small = measureAt(name, fn, smallDir)
                val tiny =
                  if (haveTiny) measureAt(name, fn, tinyDir)
                  else (-1.0, -1L, -1L)
                val huge =
                  if (haveSf1 &&
                      graft.tools.ScaleFixtures.sf1Queries.contains(name))
                    onceAt(name, fn, sf1Dir)
                  else (-1.0, -1L, -1L)
                (name, bigSec, bigRows, small, tiny, huge)
            }
          }
        graft.operators.Caching.releaseAllRdds(spark)
        val ratios = measured.map { case (name, big, _, small, _, _) =>
          s""""$name":${jnum(big / small._1, 2)}"""
        }
        val steps = measured.collect {
          case (name, big, _, small, tiny, huge) if tiny._1 > 0 =>
            val base = Seq(jnum(small._1 / tiny._1, 2),
              jnum(big / small._1, 2))
            val all =
              if (huge._1 > 0) base :+ jnum(huge._1 / big, 2) else base
            s""""$name":[${all.mkString(",")}]"""
        }
        // Per-point floor telemetry (r11 verdict item #1), arrays aligned
        // with the scale points [tiny, small, big(, sf1)]: output rows for
        // every growth query, plus the candidate/proposal volume for the
        // floorObsNames families. The guard's worst-step arbitration reads
        // these to verify a super-flag time step tracks the floor.
        val floors = measured.map {
          case (name, _, bigRows, small, tiny, huge) =>
            val hasSf1 = huge._1 > 0
            val rowsPts = Seq(tiny._2, small._2, bigRows) ++
              (if (hasSf1) Seq(huge._2) else Nil)
            val candField =
              if (floorObsNames.contains(name)) {
                val candPts =
                  Seq(tiny._3, small._3,
                    bigFloorCand.getOrElse(name, -1L)) ++
                    (if (hasSf1) Seq(huge._3) else Nil)
                s""","cand":[${candPts.mkString(",")}]"""
              } else ""
            s""""$name":{"rows":[${rowsPts.mkString(",")}]$candField}"""
        }
        // In-artifact guard (r12 verdict #1a): the SHIPPED bench file
        // carries its own arbitration — r12's driver artifact held an
        // 18.14x step its recorded floor refuted, and the guard's green
        // hash predated the file, so the round shipped an unarbitrated
        // flag. This mirrors tools/bench_guard.sh exactly (flag
        // threshold, fitted window, FLOOR_K=2, cand-authoritative
        // floors); any step the floor refuses is re-measured HERE at the
        // end of the growth pass (different suite position, clean heap,
        // median-of-reps per scale point) and the verdict row lands in
        // the artifact. The guard script accepts an embedded GREEN as
        // the arbitration; its fresh-JVM probe remains the fallback for
        // absent or RED rows.
        val flagLimit =
          sys.env.getOrElse("SPARK_GRAFT_GROWTH_FLAG", "12").toDouble
        val guardRows = measured.flatMap {
          case (name, big, bigRows, small, tiny, huge) if tiny._1 > 0 =>
            val stepsV = Seq(small._1 / tiny._1, big / small._1) ++
              (if (huge._1 > 0) Seq(huge._1 / big) else Nil)
            val fit = if (stepsV.size >= 3) stepsV.takeRight(2) else stepsV
            val slope = math.exp(fit.map(math.log).sum / fit.size)
            val worst = fit.max
            if (slope <= flagLimit && worst <= flagLimit) None
            else {
              val hasSf1 = huge._1 > 0
              val useCand = floorObsNames.contains(name)
              val pts: Seq[Long] =
                if (useCand)
                  Seq(tiny._3, small._3,
                    bigFloorCand.getOrElse(name, -1L)) ++
                    (if (hasSf1) Seq(huge._3) else Nil)
                else Seq(tiny._2, small._2, bigRows) ++
                  (if (hasSf1) Seq(huge._2) else Nil)
              val tail = pts.takeRight(fit.size + 1)
              val offending = fit.zipWithIndex.filter(_._1 > flagLimit)
              val floorOk = offending.forall { case (r, i) =>
                tail(i) > 0 && tail(i + 1) > 0 &&
                  r <= 2.0 * (tail(i + 1).toDouble / tail(i))
              }
              val head = s""""$name":{"slope":${jnum(slope, 2)},""" +
                s""""worst":${jnum(worst, 2)},""" +
                s""""floor":"${if (useCand) "cand" else "rows"}""""
              if (floorOk) Some(s"""$head,"status":"floor_cleared"}""")
              else {
                val fn = growthQueries(name)
                val dirs =
                  if (hasSf1) Seq(smallDir, sfDir, sf1Dir)
                  else Seq(tinyDir, smallDir, sfDir)
                val re = dirs.map(d => measureAt(name, fn, d)._1)
                val reSteps = re.sliding(2).map(w => w(1) / w(0)).toSeq
                val reSlope =
                  math.exp(reSteps.map(math.log).sum / reSteps.size)
                val verdict =
                  if (reSlope <= flagLimit && reSteps.max <= flagLimit)
                    "GREEN" else "RED"
                Some(s"""$head,"status":"arbitrated","isolated":{""" +
                  s""""points_sec":[${re.map(jnum(_, 3))
                    .mkString(",")}],""" +
                  s""""steps":[${reSteps.map(jnum(_, 2))
                    .mkString(",")}],""" +
                  s""""verdict":"$verdict"}}""")
              }
            }
          case _ => None
        }
        val guard = s"""{"flag":${jnum(flagLimit, 1)},"floor_k":2.0,""" +
          s""""queries":{${guardRows.mkString(",")}}}"""
        (ratios.mkString("{", ",", "}"), steps.mkString("{", ",", "}"),
          floors.mkString("{", ",", "}"),
          telemetryJson((obsSmallAcc ++ obs.snapshotAndClear(spark)).toMap),
          guard)
      } else ("{}", "{}", "{}", "{}", "{}")
    } else ("{}", "{}", "{}", "{}", "{}")
    // Last snapshot taken — drop the listener so the envelope pass below
    // (and anything after) runs without it; leaving it registered is
    // harmless in a one-shot main but wrong as a pattern to copy.
    spark.listenerManager.unregister(obs)
    // Publish-envelope throughput (untimed extra): the reference's only
    // published number is ~1 GiB serialized+published in 900 s on a 512 MB
    // Lambda (BASELINE.md). Same work here: scan → to_json → ≤10-message
    // batches → send, measured through the observe() metrics; the discard
    // client isolates compute from queue memory.
    // MEDIAN-OF-3 with per-rep arrays (r11 verdict item #2): the r11
    // driver artifact shipped a single-shot 7.5 MB/s — a 5x drop from the
    // builder's same-tree 51.9 — with no reps and no spread, the one
    // headline number outside every guard's jurisdiction. Same discipline
    // as the queries now: reps recorded, median reported, and
    // tools/bench_guard.sh applies a spread rule + a 20 MB/s median floor
    // with a fresh-JVM envelope arbiter.
    val envelope = if (args.isEmpty) {
      val envReps = (1 to reps).map { _ =>
        graft.operators.Caching.releaseAllRdds(spark, blocking = true)
        System.gc()
        val m = new graft.pipeline.PublishMetricsListener
        spark.listenerManager.register(m)
        try {
          val t0 = System.nanoTime()
          graft.pipeline.Publisher.publish(spark,
            graft.pipeline.Publisher.PublishRequest(
              Seq(s"$sfDir/lineitem.parquet"), idColumn = "l_orderkey"),
            new graft.pipeline.DiscardQueueClient)
          val sec = (System.nanoTime() - t0) / 1e9
          val (prows, pbytes) = m.await()
          (sec, prows, pbytes)
        } finally spark.listenerManager.unregister(m)
      }
      val secs = envReps.map(_._1).sorted
      val medSec = secs(secs.size / 2)
      val (prows, pbytes) = (envReps.head._2, envReps.head._3)
      val mbpsReps = envReps.map(r => r._3 / 1e6 / r._1)
      s"""{"rows":$prows,"bytes":$pbytes,"sec":${jnum(medSec, 3)},""" +
        s""""mb_per_sec":${jnum(pbytes / 1e6 / medSec, 1)},""" +
        s""""reps_sec":[${envReps.map(r => jnum(r._1, 3)).mkString(",")}],""" +
        s""""reps_mb_per_sec":[${mbpsReps.map(jnum(_, 1)).mkString(",")}],""" +
        s""""spread_sec":${jnum(secs.last - secs.head, 3)}}"""
    } else "{}"
    // Full per-query detail goes to a stable file; stdout gets a COMPACT
    // final line only. The driver parses the last line of a bounded stdout
    // tail window — the full 87-query map is ~4 KB and lands mid-line in
    // that window, so the parseable contract line must stay short.
    val envEnd = envFingerprint()
    // Run-id stamp (r12 verdict #8): a monotonic counter (persisted in
    // .bench_run_seq) plus an env-fingerprint hash. The full artifact is
    // written BOTH to the stable latest path (what sweep/guard/driver
    // read) AND to an immutable bench_out.<run_id>.json sibling — a smoke
    // run can overwrite the pointer but can never destroy a closing
    // artifact again (the r12 single-copy clobber trap).
    val runId = {
      val seqFile = java.nio.file.Paths.get(".bench_run_seq")
      val prev =
        try new String(java.nio.file.Files.readAllBytes(seqFile))
          .trim.toLong
        catch { case _: Throwable => 0L }
      // Atomic claim (r13 ADVICE): the bare read-modify-write let two
      // concurrent benches claim the same id and clobber each other's
      // immutable sibling — the exact failure the sibling exists to
      // prevent. CREATE_NEW on a per-id claim file is the atomic
      // primitive: the first process to create `.bench_run_claims/<id>`
      // owns it; a loser walks forward to the next free id. The pointer
      // file stays best-effort (it only seeds the next scan's start).
      val claims = java.nio.file.Paths.get(".bench_run_claims")
      try java.nio.file.Files.createDirectories(claims)
      catch { case _: Throwable => }
      var next = prev + 1
      var claimed = false
      while (!claimed && next < prev + 10000) {
        try {
          java.nio.file.Files.createFile(claims.resolve(next.toString))
          claimed = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => next += 1
          case _: Throwable => claimed = true // unwritable fs: best effort
        }
      }
      try java.nio.file.Files.writeString(seqFile, next.toString)
      catch { case _: Throwable => }
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(envStart.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      s"$next-$h"
    }
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","run_id":"$runId","anchor_sec":${jnum(anchorSec, 3)},"queries":$qs,"rows":$rows,"spread":$spreads,"reps":$repsJson,"rep_compiles":$repCompilesJson,"rep_gc_ms":$repGcJson,"suite_order":$suiteOrder,"spread_arbiter":$spreadArbiter,"resources":$resourcesJson,"env_start":$envStart,"env_end":$envEnd,"ivf_sweep":$sweep,"pq_sweep":$pqSweep,"scale_growth":$scaleGrowth,"scale_growth_steps":$scaleGrowthSteps,"scale_growth_floors":$scaleGrowthFloors,"guard":$guardJson,"telemetry":$telemetryBig,"telemetry_small":$telemetrySmall,"publish_envelope":$envelope,"sf":"$sfDir"}"""
    // r15 (r14 verdict #2): the total-only contract line left the driver's
    // PERF with no per-query table, no geomean and no per-query scaling —
    // everything it needed sat one line up in the full artifact. Additions
    // only: per-query median walls (3 decimals — the full-precision map
    // stays in the artifact) and the per-rep codegen-compile counts, so a
    // regressed-looking query is attributable from the contract line alone.
    val qsCompact = results.map { case (k, (v, _, _, _, _, _, _)) =>
      s""""$k":${jnum(v, 3)}"""
    }.mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${jnum(total, 3)},"unit":"sec",""" +
        s""""n_queries":$nQueries,"run_id":"$runId",""" +
        s""""anchor_sec":${jnum(anchorSec, 3)},"queries":$qsCompact,""" +
        s""""rep_compiles":$repCompilesJson,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full)
    catch { case _: Throwable => }
    try {
      val immutable =
        if (outFile.endsWith(".json"))
          outFile.stripSuffix(".json") + s".$runId.json"
        else s"$outFile.$runId"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(immutable), full)
    } catch { case _: Throwable => }
    // stop() is guarded so the contract line always prints, and printing
    // after stop() keeps it the LAST stdout line even if shutdown logs.
    try spark.stop() catch { case _: Throwable => }
    println(compact)
  }
}
