package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Contracts

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def writeFiles(rows: Seq[(Long, Long)], path: String,
      nFiles: Int): Unit =
    Layout.layoutWriteExact(rows.toDF("k", "v"),
      Seq(col("k"), col("v")), path, nFiles)

  test("pruned range read equals full-scan filter and skips files") {
    val tbl = tmpDir("man-tbl-")
    val man = tmpDir("man-idx-")
    // keys 0..999 clustered into 8 contiguous files
    writeFiles((0L until 1000L).map(k => (k, k * 2)), s"$tbl/d0", 8)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    val (df, nRead, nTotal) = Manifest.prunedRead(spark, man, "k", 100L, 220L)
    assert(nTotal == 8L)
    assert(nRead < nTotal) // a 12% key range cannot touch all 8 files
    val full = Manifest.fullRead(spark, man)
      .filter(col("k").between(100L, 220L))
    assert(Contracts.checksum(df) == Contracts.checksum(full))
    assert(df.count() == 121L)
  }

  test("append tracks new files without rescanning; compaction invisible") {
    val tbl = tmpDir("man-tbl2-")
    val man = tmpDir("man-idx2-")
    writeFiles((0L until 600L).map(k => (k, k)), s"$tbl/d0", 4)
    writeFiles((600L until 1000L).map(k => (k, k)), s"$tbl/d1", 2)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("k"), man)
    val m = Manifest.readManifest(spark, man)
    assert(m.count() == 6L)
    assert(m.agg(sum(col("nrows"))).head().getLong(0) == 1000L)
    // a range entirely inside the appended batch reads only its files
    val (df, nRead, nTotal) = Manifest.prunedRead(spark, man, "k", 820L, 980L)
    assert(nTotal == 6L && nRead <= 2L)
    val chk = Contracts.checksum(df.localCheckpoint())
    Manifest.compactManifest(spark, man)
    val (df2, nRead2, nTotal2) =
      Manifest.prunedRead(spark, man, "k", 820L, 980L)
    assert(nTotal2 == 6L && nRead2 == nRead)
    assert(Contracts.checksum(df2) == chk)
    val segs = new java.io.File(man).listFiles()
      .filter(f => f.isDirectory && Segments.isSegment(f.getName))
    assert(segs.map(_.getName).toSeq == Seq("b-1"))
  }

  test("replayed append is idempotent under an explicit batch id") {
    val tbl = tmpDir("man-tbl3-")
    val man = tmpDir("man-idx3-")
    writeFiles((0L until 300L).map(k => (k, k)), s"$tbl/d0", 3)
    writeFiles((300L until 400L).map(k => (k, k)), s"$tbl/d1", 1)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("k"), man,
      batchId = 7L)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("k"), man,
      batchId = 7L) // at-least-once redelivery
    val m = Manifest.readManifest(spark, man)
    assert(m.count() == 4L)
    assert(m.agg(sum(col("nrows"))).head().getLong(0) == 400L)
  }

  test("asOf reads reconstruct every snapshot; compaction expires them " +
      "loudly") {
    val tbl = tmpDir("man-tbl5-")
    val man = tmpDir("man-idx5-")
    writeFiles((0L until 300L).map(k => (k, k)), s"$tbl/d0", 2)
    writeFiles((300L until 500L).map(k => (k, k)), s"$tbl/d1", 1)
    writeFiles((500L until 900L).map(k => (k, k)), s"$tbl/d2", 2)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("k"), man,
      batchId = 1)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d2"), Seq("k"), man,
      batchId = 2)
    assert(Manifest.fullRead(spark, man, asOf = 0).count() == 300L)
    val snap1 = Manifest.fullRead(spark, man, asOf = 1)
      .select("k").as[Long].collect().toSet
    assert(snap1 == (0L until 500L).toSet)
    assert(Manifest.fullRead(spark, man).count() == 900L)
    // pruning inside a historical snapshot: a range beyond the snapshot's
    // data reads nothing even though LATER segments cover it
    val (df, nRead, nTotal) =
      Manifest.prunedRead(spark, man, "k", 600L, 700L, asOf = 1)
    assert(nTotal == 3L && nRead == 0L && df.count() == 0L)
    Manifest.compactManifest(spark, man)
    assert(Manifest.fullRead(spark, man).count() == 900L)
    intercept[IllegalArgumentException] {
      Manifest.readManifestAsOf(spark, man, 1L)
    }
  }

  test("2-D box prune over a z-ordered layout: correct and fewer opens " +
      "than a linear layout for the same box") {
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = rows.toDF("x", "y")
    val zTbl = tmpDir("man-z-")
    val lTbl = tmpDir("man-l-")
    val zMan = tmpDir("man-zm-")
    val lMan = tmpDir("man-lm-")
    Layout.zorderWriteExact(df, "x", "y", s"$zTbl/d0", 16)
    // linear layout: same data ordered by x only
    Layout.layoutWriteExact(df, Seq(col("x"), col("y")), s"$lTbl/d0", 16)
    Manifest.buildManifest(spark, s"$zTbl/d0", Seq("x", "y"), zMan)
    Manifest.buildManifest(spark, s"$lTbl/d0", Seq("x", "y"), lMan)
    val (zDf, zRead, zTot) =
      Manifest.prunedReadBox(spark, zMan, "x", 16L, 31L, "y", 16L, 31L)
    val (lDf, lRead, lTot) =
      Manifest.prunedReadBox(spark, lMan, "x", 16L, 31L, "y", 16L, 31L)
    assert(zTot == 16L && lTot == 16L)
    assert(zDf.count() == 256L && lDf.count() == 256L)
    assert(zDf.select("x", "y").as[(Long, Long)].collect().toSet ==
      (for (x <- 16L to 31L; y <- 16L to 31L) yield (x, y)).toSet)
    // the geometric claim: every linear file spans ALL y, so the box
    // touches every file whose x range intersects; the z-ordered files
    // are tight in both dimensions and fewer open
    assert(zRead < lRead,
      s"zorder opened $zRead files, linear opened $lRead")
  }

  test("append-first ingest works on a fresh store; stray non-segment " +
      "entries are ignored by reads and compaction") {
    val tbl = tmpDir("man-tbl6-")
    val man = s"${tmpDir("man-idx6-")}/store" // does not exist yet
    writeFiles((0L until 200L).map(k => (k, k)), s"$tbl/d0", 2)
    // no prior buildManifest: the first default-id append lands as b0
    Manifest.appendToManifest(spark, Seq(s"$tbl/d0"), Seq("k"), man)
    assert(Manifest.fullRead(spark, man).count() == 200L)
    // a stray dir whose name starts with b but is not b<number>
    new java.io.File(s"$man/backup").mkdirs()
    new java.io.File(s"$man/backup/keep.txt").createNewFile()
    assert(Manifest.fullRead(spark, man).count() == 200L)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d0"), Seq("k"), man,
      batchId = 1L)
    Manifest.compactManifest(spark, man)
    assert(new java.io.File(s"$man/backup/keep.txt").exists(),
      "compaction must not swallow non-segment entries")
    val segs = new java.io.File(man).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("b-?\\d+"))
    assert(segs.map(_.getName).toSeq == Seq("b-1"))
  }

  test("countOnly answers count(*) and null counts manifest-only, " +
      "composing with time travel") {
    val tbl = tmpDir("man-cnt-tbl-")
    val man = tmpDir("man-cnt-idx-")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType, nullable = true)))
    def slice(lo: Long, hi: Long) = spark.createDataFrame(
      spark.sparkContext.parallelize((lo until hi).map(k =>
        Row(k, if (k % 5 == 0) null else Long.box(k)))), schema)
    slice(0, 300).coalesce(2).write.parquet(s"$tbl/d0")
    slice(300, 400).coalesce(1).write.parquet(s"$tbl/d1")
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("v"), man)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("v"), man,
      batchId = 1)
    val all = Manifest.countOnly(spark, man, "v").head()
    assert(all.getLong(0) == 400L)
    assert(all.getLong(1) == 80L) // multiples of 5 in [0, 400)
    assert(all.getLong(2) == 320L)
    // historical snapshot counts without opening a single data file
    val asOf0 = Manifest.countOnly(spark, man, "v", asOf = 0).head()
    assert(asOf0.getLong(0) == 300L && asOf0.getLong(1) == 60L)
    // the aggregate's plan scans the manifest store, never the table
    val plan = Manifest.countOnly(spark, man, "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("man-cnt-idx-") && !plan.contains("man-cnt-tbl-"),
      plan.take(2000))
  }

  test("glob metacharacters in data-file names round-trip through serving") {
    // serving feeds input_file_name() strings back to spark.read.parquet,
    // which GLOBS each path: an unescaped "part-[0]-{a}.parquet" would
    // resolve to the nonexistent "part-0-a.parquet" and fail (or, worse,
    // silently read a different file that happens to match)
    val tbl = tmpDir("man-glob-")
    val man = tmpDir("man-globidx-")
    (0L until 100L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$tbl/d0")
    val dir = new java.io.File(s"$tbl/d0")
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(dir, "part-[0]-{a}.parquet")))
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    assert(Manifest.fullRead(spark, man).count() == 100L)
    val (df, nRead, nTotal) = Manifest.prunedRead(spark, man, "k", 10L, 20L)
    assert(df.count() == 11L)
    assert(nRead == 1L && nTotal == 1L)
  }

  test("deleteRange rewrites only affected files; history, counts and " +
      "later appends stay consistent") {
    val tbl = tmpDir("man-del-tbl-")
    val man = tmpDir("man-del-idx-")
    // keys 0..999 clustered into 8 contiguous files (125 keys each)
    writeFiles((0L until 1000L).map(k => (k, k * 2)), s"$tbl/d0", 8)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    val preFiles = Manifest.readManifest(spark, man).select("file")
      .as[String].collect().toSet
    val (nAff, nTot, nDel) = Manifest.deleteRange(spark, man, "k",
      100L, 220L, s"$tbl/rw", Seq("k"))
    assert(nTot == 8L)
    assert(nAff == 2L, "keys 100..220 live in exactly 2 of the 8 files")
    assert(nDel == 121L)
    val served = Manifest.fullRead(spark, man)
    assert(served.count() == 879L)
    assert(served.select("k").as[Long].collect().toSet ==
      ((0L until 100L) ++ (221L until 1000L)).toSet)
    // copy-on-write: the 6 untouched files are served from their original
    // paths; only the 2 affected ones were replaced
    val postFiles = Manifest.readManifest(spark, man).select("file")
      .as[String].collect().toSet
    assert((preFiles intersect postFiles).size == 6)
    // time travel: the pre-delete snapshot still serves every row
    assert(Manifest.fullRead(spark, man, asOf = 0).count() == 1000L)
    // manifest-only counting reflects the deletion
    assert(Manifest.countOnly(spark, man, "k").head().getLong(0) == 879L)
    // a later plain append (whose segment has no `removed` column) mixes
    // with the DML segment under mergeSchema in BOTH directions
    writeFiles((1000L until 1100L).map(k => (k, k)), s"$tbl/d1", 1)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("k"), man)
    assert(Manifest.fullRead(spark, man).count() == 979L)
  }

  test("deleting every row of the affected files writes no rewrite files, " +
      "only tombstones") {
    val tbl = tmpDir("man-del2-tbl-")
    val man = tmpDir("man-del2-idx-")
    // 4 files of exactly 250 contiguous keys each
    writeFiles((0L until 1000L).map(k => (k, k)), s"$tbl/d0", 4)
    val (nAff, _, nDel) = {
      Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
      Manifest.deleteRange(spark, man, "k", 0L, 249L, s"$tbl/rw", Seq("k"))
    }
    assert(nAff == 1L && nDel == 250L)
    val served = Manifest.fullRead(spark, man)
    assert(served.count() == 750L)
    assert(served.agg(min(col("k"))).head().getLong(0) == 250L)
    assert(Manifest.readManifest(spark, man).count() == 3L,
      "no rewrite file rows: the affected file was fully deleted")
    // an out-of-range delete is a no-op
    val (a2, t2, d2) =
      Manifest.deleteRange(spark, man, "k", 5000L, 6000L, s"$tbl/rw2",
        Seq("k"))
    assert(a2 == 0L && t2 == 3L && d2 == 0L)
  }

  test("mergeInto replaces matched keys, inserts the rest, and rewrites " +
      "only files that can hold an update key") {
    val tbl = tmpDir("man-mrg-tbl-")
    val man = tmpDir("man-mrg-idx-")
    // keys 0..999 clustered into 8 contiguous files
    writeFiles((0L until 1000L).map(k => (k, k)), s"$tbl/d0", 8)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    // updates: correct v for keys 100..120; inserts: new keys 2000..2004
    val upd = ((100L to 120L).map(k => (k, -1L)) ++
      (2000L until 2005L).map(k => (k, k))).toDF("k", "v")
    val (nAff, nTot, nUpd) = Manifest.mergeInto(spark, man, upd, "k",
      s"$tbl/rw", Seq("k"))
    assert(nTot == 8L && nUpd == 26L)
    assert(nAff == 1L, "keys 100..120 live in exactly 1 of the 8 files")
    val served = Manifest.fullRead(spark, man)
    assert(served.count() == 1005L)
    assert(served.filter(col("k").between(100L, 120L))
      .select("v").as[Long].collect().toSet == Set(-1L))
    assert(served.filter(col("k") >= 2000L).count() == 5L)
    // untouched keys keep their original values
    assert(served.filter(col("k") === 500L).select("v").as[Long]
      .collect().toSeq == Seq(500L))
    // pre-merge snapshot intact
    assert(Manifest.fullRead(spark, man, asOf = 0).count() == 1000L)
    // a key matched in MULTIPLE rows is fully replaced (key non-unique)
    val tbl2 = tmpDir("man-mrg2-tbl-")
    val man2 = tmpDir("man-mrg2-idx-")
    Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$tbl2/d0")
    Manifest.buildManifest(spark, s"$tbl2/d0", Seq("k"), man2)
    Manifest.mergeInto(spark, man2, Seq((1L, 99L)).toDF("k", "v"), "k",
      s"$tbl2/rw", Seq("k"))
    val got = Manifest.fullRead(spark, man2)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 99L), (2L, 20L)),
      "both rows under key 1 must be replaced by the single update row")
  }

  test("vacuum refuses on an un-compacted store, then removes exactly the " +
      "dead files") {
    val tbl = tmpDir("man-vac-tbl-")
    val man = tmpDir("man-vac-idx-")
    writeFiles((0L until 400L).map(k => (k, k)), s"$tbl/d0", 4)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Manifest.deleteRange(spark, man, "k", 0L, 99L, s"$tbl/rw", Seq("k"))
    // history still addressable -> vacuum must refuse
    intercept[IllegalArgumentException] {
      Manifest.vacuumTable(spark, man, Seq(tbl))
    }
    val chk = Contracts.checksum(Manifest.fullRead(spark, man)
      .localCheckpoint())
    Manifest.compactManifest(spark, man)
    val n = Manifest.vacuumTable(spark, man, Seq(tbl))
    assert(n == 1L, "exactly the one fully-deleted original file is dead")
    assert(Contracts.checksum(Manifest.fullRead(spark, man)) == chk)
    assert(Manifest.fullRead(spark, man).count() == 300L)
  }

  test("optimize merges the small-file tail into right-sized files and is " +
      "idempotent") {
    val tbl = tmpDir("man-opt-tbl-")
    val man = tmpDir("man-opt-idx-")
    // 6 small files of 10 rows + 1 big file of 100 rows
    (0 until 6).foreach { i =>
      writeFiles((i * 10L until (i + 1) * 10L).map(k => (k, k)),
        s"$tbl/s$i", 1)
    }
    writeFiles((100L until 200L).map(k => (k, k)), s"$tbl/big", 1)
    Manifest.buildManifest(spark, s"$tbl/s0", Seq("k"), man)
    (1 until 6).foreach(i => Manifest.appendToManifest(spark,
      Seq(s"$tbl/s$i"), Seq("k"), man, batchId = i))
    Manifest.appendToManifest(spark, Seq(s"$tbl/big"), Seq("k"), man,
      batchId = 6)
    val preChk = Contracts.checksum(Manifest.fullRead(spark, man)
      .localCheckpoint())
    val (nMerged, nCreated) = Manifest.optimizeSmallFiles(spark, man,
      s"$tbl/opt", Seq("k"), targetRows = 50L, minRows = 25L)
    assert(nMerged == 6L && nCreated == 2L) // ceil(60 / 50) = 2
    assert(Contracts.checksum(Manifest.fullRead(spark, man)) == preChk)
    val m = Manifest.readManifest(spark, man)
    assert(m.count() == 3L) // 2 merged + 1 big
    // the merged files are >= minRows, so a second run is a no-op
    val (n2, _) = Manifest.optimizeSmallFiles(spark, man, s"$tbl/opt2",
      Seq("k"), targetRows = 50L, minRows = 25L)
    assert(n2 == 0L)
    // the pre-optimize snapshot still lists the small files
    assert(Manifest.readManifestAsOf(spark, man, 6L).count() == 7L)
  }

  test("bloom index: no false negatives on present keys, absent keys open " +
      "at most the fpp tail") {
    val tbl = tmpDir("man-bloom-tbl-")
    val idx = tmpDir("man-bloom-idx-")
    // hash-distributed layout: zone maps are useless for point lookups
    (0L until 512L).map(k => (k, k * 3)).toDF("k", "v")
      .repartition(8, col("k")).write.mode("overwrite")
      .parquet(s"$tbl/d0")
    Manifest.buildBloomIndex(spark, s"$tbl/d0", "k", idx,
      expectedPerFile = 10000L)
    val full = spark.read.parquet(s"$tbl/d0")
    (0L until 512L by 37L).foreach { key =>
      val (df, nRead, nTotal) = Manifest.bloomPrunedRead(spark, idx, "k", key)
      assert(nTotal == 8L)
      assert(nRead >= 1L, s"key $key: the holding file must survive")
      assert(df.select("v").as[Long].collect().toSeq == Seq(key * 3),
        s"key $key served wrong rows")
    }
    // absent key: zero rows regardless of false-positive file opens
    val (dfAbs, nReadAbs, _) =
      Manifest.bloomPrunedRead(spark, idx, "k", 100000L)
    assert(dfAbs.count() == 0L)
    assert(nReadAbs <= 2L, "fpp=0.01 over 8 files should open ~0 extras")
    // equality with the exact filter on a present key
    val (df42, _, _) = Manifest.bloomPrunedRead(spark, idx, "k", 42L)
    assert(Contracts.checksum(df42) ==
      Contracts.checksum(full.filter(col("k") === 42L)))
  }

  test("NDV index: merged estimate is accurate under heavy cross-file " +
      "duplication, the case where per-file counts cannot add") {
    val tbl = tmpDir("man-ndv-tbl-")
    val idx = tmpDir("man-ndv-idx-")
    // 4000 rows over only 500 distinct keys, hash-scattered across 8
    // files: summing per-file distincts would give ~8×500; the sketch
    // union must land near 500
    val rows = (0L until 4000L).map(k => (k % 500L, k))
    rows.toDF("k", "v").repartition(8, col("v"))
      .write.mode("overwrite").parquet(s"$tbl/d0")
    Manifest.buildNdvIndex(spark, s"$tbl/d0", "k", idx)
    val est = Manifest.ndvEstimateAll(spark, idx).head()
    assert(est.getLong(1) == 8L)
    assert(math.abs(est.getLong(0) - 500L) <= 25L,
      s"estimate ${est.getLong(0)} off by >5% from 500")
    // determinism: the estimate is a pure function of the stored blobs
    val again = Manifest.ndvEstimateAll(spark, idx).head().getLong(0)
    assert(again == est.getLong(0))
  }

  test("NDV append equals rebuild: incremental ingest loses nothing") {
    val tbl = tmpDir("man-ndva-tbl-")
    val inc = tmpDir("man-ndva-inc-")
    val reb = tmpDir("man-ndva-reb-")
    writeFiles((0L until 300L).map(k => (k, k % 120L)), s"$tbl/d0", 3)
    writeFiles((300L until 500L).map(k => (k, k % 120L)), s"$tbl/d1", 2)
    Manifest.buildNdvIndex(spark, s"$tbl/d0", "v", inc)
    Manifest.appendToNdvIndex(spark, Seq(s"$tbl/d1"), "v", inc)
    Manifest.buildNdvIndex(spark, tbl, "v", reb)
    val a = Manifest.ndvEstimateAll(spark, inc).head()
    val b = Manifest.ndvEstimateAll(spark, reb).head()
    assert(a.getLong(0) == b.getLong(0))
    assert(a.getLong(1) == 5L && b.getLong(1) == 5L)
    // replayed append (same batchId) overwrites its own segment: no drift
    Manifest.appendToNdvIndex(spark, Seq(s"$tbl/d1"), "v", inc, batchId = 1L)
    val replay = Manifest.ndvEstimateAll(spark, inc).head()
    assert(replay.getLong(0) == a.getLong(0) && replay.getLong(1) == 5L)
  }

  test("NDV range composition merges only zone-map-surviving files") {
    val tbl = tmpDir("man-ndvr-tbl-")
    val man = tmpDir("man-ndvr-man-")
    val idx = tmpDir("man-ndvr-idx-")
    // keys 0..799 clustered into 8 contiguous files of 100; the NDV
    // column collapses each k to k/10 → 10 distinct per file, 80 total
    writeFiles((0L until 800L).map(k => (k, k / 10L)), s"$tbl/d0", 8)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Manifest.buildNdvIndex(spark, s"$tbl/d0", "v", idx)
    val all = Manifest.ndvEstimateAll(spark, idx).head()
    assert(all.getLong(1) == 8L)
    assert(math.abs(all.getLong(0) - 80L) <= 4L)
    // a 25% key range touches 2 of 8 files → ~20 distinct v
    val r = Manifest.ndvEstimateForRange(spark, idx, man, "k", 0L, 199L)
      .head()
    assert(r.getLong(1) == 2L, s"expected 2 surviving files, ${r.getLong(1)}")
    assert(math.abs(r.getLong(0) - 20L) <= 2L)
  }

  test("quantile index: range-merged estimates land in the exact " +
      "envelope, n is exact, append equals rebuild") {
    val tbl = tmpDir("man-q-tbl-")
    val man = tmpDir("man-q-man-")
    val inc = tmpDir("man-q-inc-")
    val reb = tmpDir("man-q-reb-")
    // keys 0..799 clustered into 8 files; v = k so quantiles are known
    writeFiles((0L until 600L).map(k => (k, k)), s"$tbl/d0", 6)
    writeFiles((600L until 800L).map(k => (k, k)), s"$tbl/d1", 2)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("k"), man)
    Manifest.buildQuantileIndex(spark, s"$tbl/d0", "v", inc)
    Manifest.appendToQuantileIndex(spark, Seq(s"$tbl/d1"), "v", inc)
    Manifest.buildQuantileIndex(spark, tbl, "v", reb)
    // a 25% key range → 2 surviving files → v uniform on [0, 200)
    val est = Manifest.quantileEstimateForRange(spark, inc, man,
        "k", 0L, 199L, Seq(0.5))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(est.length == 1)
    assert(est.head._3 == 200L) // n exact
    assert(math.abs(est.head._2 - 100.0) <= 8.0,
      s"range median ${est.head._2} outside the k=200 envelope of 100")
    // incremental store serves the same answer as a rebuilt one
    val rebEst = Manifest.quantileEstimateForRange(spark, reb, man,
        "k", 0L, 199L, Seq(0.5))
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(rebEst.head._2 == 200L)
    assert(math.abs(rebEst.head._1 - est.head._2) <= 8.0)
  }

  test("unified one-scan build: bloom + ndv stores byte-equal to their " +
      "per-family builds, kll holds n-exact + rank envelope (its " +
      "compaction is randomized), plan carries exactly one FileScan") {
    val tbl = tmpDir("man-u-tbl-")
    // 800 rows PER FILE — above the KLL k=200 so compaction (the
    // randomized part) is actually exercised, not dodged
    writeFiles((0L until 6400L).map(k => (k, k * 3 % 101)), s"$tbl/d0", 8)
    val (bA, nA, kA) = (tmpDir("man-u-ba-"), tmpDir("man-u-na-"),
      tmpDir("man-u-ka-"))
    val (bB, nB, kB) = (tmpDir("man-u-bb-"), tmpDir("man-u-nb-"),
      tmpDir("man-u-kb-"))
    Manifest.buildBloomIndex(spark, s"$tbl/d0", "k", bA)
    Manifest.buildNdvIndex(spark, s"$tbl/d0", "k", nA)
    Manifest.buildQuantileIndex(spark, s"$tbl/d0", "v", kA)
    Manifest.buildFileIndexes(spark, s"$tbl/d0", "k", "v", bB, nB, kB)
    val plan = Manifest.fileIndexRows(spark, Seq(s"$tbl/d0"), "k", "v")
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan.take(2000))
    def byteEq(a: String, b: String, c: String): Unit = {
      val va = spark.read.parquet(a).select(col("file"), col(c))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
        .toMap
      val vb = spark.read.parquet(b).select(col("file"), col(c))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
        .toMap
      assert(va.keySet == vb.keySet, s"$c: file sets differ")
      assert(va.size == 8)
      va.foreach { case (f, bytes) =>
        assert(java.util.Arrays.equals(bytes, vb(f)), s"$c differs at $f")
      }
    }
    byteEq(s"$bA/b0", s"$bB/b0", "bloom")
    byteEq(s"$nA/b0", s"$nB/b0", "ndv_sketch")
    // KLL: n exact and both stores' whole-table medians inside the rank
    // envelope of the exact data (v is k*3%101 — near-uniform on [0,101))
    val man = tmpDir("man-u-man-")
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Seq(kA, kB).foreach { idx =>
      val est = Manifest.quantileEstimateForRange(spark, idx, man,
          "k", 0L, 6399L, Seq(0.5)).head()
      assert(est.getLong(2) == 6400L, s"$idx: n not exact")
      assert(math.abs(est.getDouble(1) - 50.0) <= 8.0,
        s"$idx: median ${est.getDouble(1)} outside the envelope of 50")
    }
  }

  test("unified append after a per-family append that drifted the " +
      "segment sets: the auto batchId is the max across ALL THREE " +
      "stores, so no store's existing segment is overwritten") {
    val tbl = tmpDir("man-ud-tbl-")
    writeFiles((0L until 400L).map(k => (k, k % 7)), s"$tbl/d0", 2)
    writeFiles((400L until 800L).map(k => (k, k % 7)), s"$tbl/d1", 2)
    writeFiles((800L until 1200L).map(k => (k, k % 7)), s"$tbl/d2", 2)
    val (bp, np, kp) = (tmpDir("man-ud-b-"), tmpDir("man-ud-n-"),
      tmpDir("man-ud-k-"))
    Manifest.buildFileIndexes(spark, s"$tbl/d0", "k", "v", bp, np, kp)
    // per-family append touches ONLY the NDV store → its b1 exists, the
    // bloom/kll stores still end at b0
    Manifest.appendToNdvIndex(spark, Seq(s"$tbl/d1"), "k", np)
    val ndvB1Files = spark.read.parquet(s"$np/b1")
      .select(col("file")).as[String].collect().toSet
    assert(ndvB1Files.forall(_.contains("/d1/")))
    // unified append with AUTO batchId must land at b2 everywhere (max
    // nextBatchId across the three stores), never clobber ndv/b1
    Manifest.appendToFileIndexes(spark, Seq(s"$tbl/d2"), "k", "v",
      bp, np, kp)
    val after = spark.read.parquet(s"$np/b1")
      .select(col("file")).as[String].collect().toSet
    assert(after == ndvB1Files, "unified append clobbered ndv/b1")
    Seq(bp, np, kp).foreach { p =>
      val seg = spark.read.parquet(s"$p/b2").select(col("file"))
        .as[String].collect()
      assert(seg.nonEmpty && seg.forall(_.contains("/d2/")),
        s"$p/b2 should hold exactly the d2 batch")
    }
  }

  test("incremental re-layout: only curve-overlapping files rewritten, " +
      "disjoint files untouched by name, served rows identical, and the " +
      "result is a fixed point (second run rewrites nothing)") {
    val tbl = tmpDir("man-inc-tbl-")
    val man = tmpDir("man-inc-man-")
    // unique (x, y) grid → unique hilbert keys → ntile files point-touch
    // at most, never strictly overlap
    val base = spark.range(1L << 12).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.hilbertWriteExact(base, "x", "y", s"$tbl/d0", 8)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("x", "y"), man)
    // an unsorted append confined to one quadrant: it overlaps the sorted
    // files covering that quadrant's curve span, and nothing else
    val extra = spark.range(1L << 12, (1L << 12) + 512L).select(
      (col("id") % 16 + 48).as("x"),
      ((col("id") / 16).cast("long") % 16 + 48).as("y"))
    extra.repartition(2, col("x"))
      .write.mode("overwrite").parquet(s"$tbl/d1")
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("x", "y"), man)
    val liveBefore = Manifest.readManifest(spark, man)
      .select(col("file")).as[String].collect().toSet
    val allBefore = Manifest.fullRead(spark, man)
    val chkBefore = Contracts.checksum(
      allBefore.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n")))
    val (rewritten, created, clusters) = Manifest.optimizeLayoutIncremental(
      spark, man, s"$tbl/rw", "x", "y", Seq("x", "y"), curve = "hilbert")
    assert(clusters >= 1L && rewritten >= 3L,
      s"the appended files + overlapped tail must rewrite ($rewritten)")
    assert(rewritten < liveBefore.size,
      "incremental must NOT rewrite every live file")
    assert(created > 0L)
    val liveAfter = Manifest.readManifest(spark, man)
      .select(col("file")).as[String].collect().toSet
    val untouched = liveBefore.intersect(liveAfter)
    assert(untouched.nonEmpty &&
      untouched.size.toLong == liveBefore.size - rewritten,
      "disjoint files must survive under their original names")
    val chkAfter = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n")))
    assert(chkAfter == chkBefore, "served rows must be identical")
    // fixed point: rewritten cluster segments are disjoint again
    val again = Manifest.optimizeLayoutIncremental(
      spark, man, s"$tbl/rw2", "x", "y", Seq("x", "y"), curve = "hilbert")
    assert(again == ((0L, 0L, 0L)),
      s"second incremental run must be a no-op, got $again")
  }

  test("incremental re-layout in 3-D (zCol set): only the appended " +
      "corner's overlap cluster rewrites, serving identical, fixed point") {
    val tbl = tmpDir("man-inc3-tbl-")
    val man = tmpDir("man-inc3-man-")
    val base = spark.range(1L << 12).select(
      (col("id") % 16).as("x"), ((col("id") / 16) % 16).cast("long").as("y"),
      (col("id") / 256).cast("long").as("z"))
    Layout.hilbert3WriteExact(base, "x", "y", "z", s"$tbl/d0", 8)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("x", "y", "z"), man)
    // append confined to the top corner octant — a bounded curve span
    val extra = spark.range(1L << 12, (1L << 12) + 256L).select(
      (col("id") % 8 + 8).as("x"),
      ((col("id") / 8).cast("long") % 8 + 8).as("y"),
      ((col("id") / 64).cast("long") % 8 + 8).as("z"))
    extra.repartition(2, col("x"))
      .write.mode("overwrite").parquet(s"$tbl/d1")
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("x", "y", "z"),
      man)
    val liveBefore = Manifest.readManifest(spark, man)
      .select(col("file")).as[String].collect().toSet
    val chkBefore = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y"), col("z")).agg(count(lit(1)).as("n")))
    val (rewritten, _, clusters) = Manifest.optimizeLayoutIncremental(
      spark, man, s"$tbl/rw", "x", "y", Seq("x", "y", "z"),
      curve = "hilbert", zCol = "z")
    assert(clusters >= 1L && rewritten < liveBefore.size)
    val chkAfter = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y"), col("z")).agg(count(lit(1)).as("n")))
    assert(chkAfter == chkBefore)
    assert(Manifest.optimizeLayoutIncremental(spark, man, s"$tbl/rw2",
      "x", "y", Seq("x", "y", "z"), curve = "hilbert",
      zCol = "z") == ((0L, 0L, 0L)))
  }

  test("incremental re-layout production form (deterministic = false): " +
      "cluster rewrites through the range-shuffle writer, partial " +
      "rewrite, identical serving, fixed point") {
    val tbl = tmpDir("man-incp-tbl-")
    val man = tmpDir("man-incp-man-")
    val base = spark.range(1L << 12).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.hilbertWriteExact(base, "x", "y", s"$tbl/d0", 8)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("x", "y"), man)
    val extra = spark.range(1L << 12, (1L << 12) + 512L).select(
      (col("id") % 16 + 48).as("x"),
      ((col("id") / 16).cast("long") % 16 + 48).as("y"))
    extra.repartition(2, col("x"))
      .write.mode("overwrite").parquet(s"$tbl/d1")
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("x", "y"), man)
    val liveBefore = Manifest.readManifest(spark, man)
      .select(col("file")).as[String].collect().toSet
    val chkBefore = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n")))
    val (rewritten, created, clusters) = Manifest.optimizeLayoutIncremental(
      spark, man, s"$tbl/rw", "x", "y", Seq("x", "y"), curve = "hilbert",
      deterministic = false)
    assert(clusters >= 1L && rewritten < liveBefore.size && created > 0L)
    val liveAfter = Manifest.readManifest(spark, man)
      .select(col("file")).as[String].collect().toSet
    assert(liveBefore.intersect(liveAfter).nonEmpty,
      "disjoint files must survive under their original names")
    assert(Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))) == chkBefore)
    // the range partitioner routes equal keys to one partition, so the
    // production rewrite's files are key-disjoint — still a fixed point
    assert(Manifest.optimizeLayoutIncremental(spark, man, s"$tbl/rw2",
      "x", "y", Seq("x", "y"), curve = "hilbert",
      deterministic = false) == ((0L, 0L, 0L)))
  }

  test("budgeted incremental re-layout: a planted whole-table overlap " +
      "cluster drains across >= 2 calls of <= maxClusterFiles rewrites, " +
      "serving identical between every call, terminal fixed point") {
    val tbl = tmpDir("man-bud-tbl-")
    val man = tmpDir("man-bud-man-")
    // hash-scattered write: every file spans ~the full curve range →
    // ONE overlap cluster covering the whole 6-file table
    val df = spark.range(1L << 12).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    df.repartition(6, col("x") * 31 + col("y"))
      .write.mode("overwrite").parquet(s"$tbl/d0")
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("x", "y"), man)
    val chk0 = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n")))
    var passes = 0
    var done = false
    while (!done && passes < 12) {
      val (rw, _, cls) = Manifest.optimizeLayoutIncremental(spark, man,
        s"$tbl/rw$passes", "x", "y", Seq("x", "y"), curve = "hilbert",
        deterministic = false, maxClusterFiles = 3)
      if (rw == 0L) done = true
      else {
        passes += 1
        assert(rw <= 3L * cls,
          s"pass $passes rewrote $rw files across $cls clusters — " +
            "the per-cluster budget of 3 was exceeded")
        assert(Contracts.checksum(Manifest.fullRead(spark, man)
          .groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("n"))) == chk0,
          s"serving diverged after budgeted pass $passes")
      }
    }
    assert(done, "budgeted OPTIMIZE failed to reach a fixed point in 12 " +
      "passes — the peel is not making progress")
    assert(passes >= 2,
      s"a 6-file whole-table cluster under budget 3 must take >= 2 " +
        s"calls, took $passes")
  }

  test("byte-budgeted incremental re-layout: the peel prefix respects " +
      "maxClusterBytes (2-file floor), drains multi-pass, serving " +
      "identical, terminal fixed point") {
    val tbl = tmpDir("man-bb-tbl-")
    val man = tmpDir("man-bb-man-")
    val df = spark.range(1L << 12).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    df.repartition(6, col("x") * 31 + col("y"))
      .write.mode("overwrite").parquet(s"$tbl/d0")
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("x", "y"), man)
    // budget ~ 40% of the table: a whole-table cluster must peel in
    // roughly 2-file slices even though the FILE budget is unlimited
    val total = new java.io.File(s"$tbl/d0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val budget = (total * 2) / 5
    val chk0 = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n")))
    var passes = 0
    var done = false
    while (!done && passes < 16) {
      val (rw, _, _) = Manifest.optimizeLayoutIncremental(spark, man,
        s"$tbl/rw$passes", "x", "y", Seq("x", "y"), curve = "hilbert",
        deterministic = false, maxClusterBytes = budget)
      if (rw == 0L) done = true
      else {
        passes += 1
        assert(Contracts.checksum(Manifest.fullRead(spark, man)
          .groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("n"))) == chk0,
          s"serving diverged after byte-budgeted pass $passes")
      }
    }
    assert(done, "byte-budgeted OPTIMIZE failed to converge in 16 passes")
    assert(passes >= 2,
      s"a whole-table cluster over a 40% byte budget must take >= 2 " +
        s"calls, took $passes")
  }

  test("incremental re-layout tolerates null layout keys: an all-null " +
      "file is rangeless (left in place like a disjoint file), mixed " +
      "null rows rewrite with their cluster and are never dropped") {
    val tbl = tmpDir("man-null-tbl-")
    val man = tmpDir("man-null-man-")
    val base = spark.range(1L << 10).select(
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
    Layout.hilbertWriteExact(base, "x", "y", s"$tbl/d0", 4)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("x", "y"), man)
    // d1: an overlapping append that carries some NULL-x rows; d2: a
    // file where EVERY row is null on x (null kmin/kmax — the r13
    // ADVICE NPE shape)
    val mixed = spark.range(64).select(
      when(col("id") % 4 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 32).as("x"),
      (col("id") % 32).as("y"))
    mixed.coalesce(1).write.mode("overwrite").parquet(s"$tbl/d1")
    spark.range(16).select(lit(null).cast("long").as("x"),
        col("id").as("y"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tbl/d2")
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1", s"$tbl/d2"),
      Seq("x", "y"), man)
    val allNullFile = Manifest.readManifest(spark, man)
      .select(col("file")).as[String].collect()
      .filter(_.contains("/d2/")).toSet
    assert(allNullFile.size == 1)
    val nBefore = Manifest.fullRead(spark, man).count()
    val nullXBefore = Manifest.fullRead(spark, man)
      .filter(col("x").isNull).count()
    val (rewritten, _, clusters) = Manifest.optimizeLayoutIncremental(
      spark, man, s"$tbl/rw", "x", "y", Seq("x", "y"), curve = "hilbert")
    assert(clusters >= 1L && rewritten >= 2L)
    val liveAfter = Manifest.readManifest(spark, man)
      .select(col("file")).as[String].collect().toSet
    assert(allNullFile.subsetOf(liveAfter),
      "the all-null file must be left in place by name")
    assert(Manifest.fullRead(spark, man).count() == nBefore,
      "rows dropped by the null-tolerant rewrite")
    assert(Manifest.fullRead(spark, man)
      .filter(col("x").isNull).count() == nullXBefore,
      "null-key rows dropped by the cluster rewrite")
  }

  test("optimizeLayout production form (deterministic = false): the " +
      "range-shuffle rewrite serves identical rows, still prunes the " +
      "box read, and the manifest lifecycle is unchanged") {
    val tbl = tmpDir("man-pr-tbl-")
    val man = tmpDir("man-pr-man-")
    val df = spark.range(1L << 13).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    df.repartition(8, col("x").cast("string"))
      .write.mode("overwrite").parquet(s"$tbl/d0")
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("x", "y"), man)
    val (_, opensBefore, _) = Manifest.prunedReadBox(spark, man,
      "x", 0L, 31L, "y", 0L, 15L)
    val preChk = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n")))
    val (rewritten, created) = Manifest.optimizeLayout(spark, man,
      s"$tbl/rw", "x", "y", Seq("x", "y"), 8, curve = "hilbert",
      deterministic = false)
    assert(rewritten == 8L && created > 1L)
    val (_, opensAfter, totalAfter) = Manifest.prunedReadBox(spark, man,
      "x", 0L, 31L, "y", 0L, 15L)
    assert(opensAfter < opensBefore,
      s"production re-layout must prune: $opensAfter vs $opensBefore")
    assert(totalAfter == created)
    val postChk = Contracts.checksum(Manifest.fullRead(spark, man)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n")))
    assert(postChk == preChk)
  }

  test("optimizeLayout curve registry rejects an unknown curve") {
    val tbl = tmpDir("man-cv-tbl-")
    val man = tmpDir("man-cv-man-")
    writeFiles((0L until 100L).map(k => (k, k)), s"$tbl/d0", 2)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    intercept[IllegalArgumentException] {
      Manifest.optimizeLayout(spark, man, s"$tbl/rw", "k", "v",
        Seq("k"), 2, curve = "peano")
    }
  }

  test("history: build/append/delete segments account exactly; " +
      "compaction collapses the view to one b-1 row") {
    val tbl = tmpDir("man-h-tbl-")
    val man = tmpDir("man-h-man-")
    writeFiles((0L until 400L).map(k => (k, k)), s"$tbl/d0", 4)
    writeFiles((400L until 600L).map(k => (k, k)), s"$tbl/d1", 2)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    Manifest.appendToManifest(spark, Seq(s"$tbl/d1"), Seq("k"), man)
    Manifest.deleteRange(spark, man, "k", 0L, 99L, s"$tbl/rw", Seq("k"))
    val h = Manifest.history(spark, man)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(h.keySet == Set("b0", "b1", "b2"))
    assert(h("b0") == ((4L, 0L, 400L)))
    assert(h("b1") == ((2L, 0L, 200L)))
    // keys 0..99 = exactly the first of 4 clustered files: pure tombstone
    assert(h("b2")._2 == 1L && h("b2")._3 == 0L)
    Manifest.compactManifest(spark, man)
    val hc = Manifest.history(spark, man)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(hc.toSeq == Seq(("b-1", 500L)))
  }

  test("empty prune window returns a schema-stable empty frame") {
    val tbl = tmpDir("man-tbl4-")
    val man = tmpDir("man-idx4-")
    writeFiles((0L until 100L).map(k => (k, k)), s"$tbl/d0", 2)
    Manifest.buildManifest(spark, s"$tbl/d0", Seq("k"), man)
    val (df, nRead, _) = Manifest.prunedRead(spark, man, "k", 5000L, 6000L)
    assert(nRead == 0L)
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.count() == 0L)
  }
}
