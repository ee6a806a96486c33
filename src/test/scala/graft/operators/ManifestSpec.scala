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
