package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted file-level zone-map manifest — Delta/Iceberg-style data
  * skipping built from plain parquet. One row per data file carries the
  * file's row count and per-column [min, max]; a range query consults the
  * manifest FIRST and reads only the files whose interval intersects the
  * predicate. This is the scan-planning move the reference's
  * one-file-at-a-time handler never needs (it is handed its input key,
  * `cmd/parquetgo-record-processor/handler.go:104`) but a 100 TB table
  * cannot live without: footer min/max stats prune ROW GROUPS only after
  * every file is opened and listed — the manifest prunes the LISTING, so
  * planning cost is O(surviving files), not O(all files), and a narrow
  * range over a clustered layout (see [[Layout]]) opens a handful of files
  * out of hundreds of thousands.
  *
  * Store shape matches the repo's other persisted stores (text index,
  * gram-df, SRP, IVF-PQ): batchId-keyed `b<N>` segments — the initial
  * build is `b0`, each append lands stats for ONLY the new files as an
  * overwrite-mode `b<id>` segment (history is never re-scanned; replayed
  * appends rewrite their own rows), and [[Dedup.compactSegmentDirs]]
  * merges segments back to one (rows are disjoint: a data file's stats
  * row lives in exactly one segment). The manifest IS the table listing:
  * a file is part of the table iff a manifest row names it, so
  * build+append defines the snapshot the same way an Iceberg manifest
  * list does.
  *
  * Scale notes: stats are computed by one distributed scan that projects
  * ONLY the stats columns (parquet columnar reads keep the pass cheap) and
  * groups by `input_file_name()` — per-file state, so shuffle volume is
  * one row per file. At 100 TB / 512 MB files the manifest is ~200k rows —
  * the pruned file list collects to the driver exactly like every file
  * listing Spark's own FileIndex already does.
  */
object Manifest {

  /** Per-file stats of the parquet files under `paths`: one row per file
    * with `nrows` and `min_<c>` / `max_<c>` / `nulls_<c>` for each of
    * `statsCols` (Iceberg manifests carry per-file row and null counts
    * alongside the zone maps — they answer `count(*)` and IS NULL-heavy
    * predicates with ZERO file opens, see [[countOnly]]). The scan
    * projects only `statsCols`.
    */
  private def fileStats(spark: SparkSession, paths: Seq[String],
      statsCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("nrows") +:
      statsCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
          count(when(col(c).isNull, lit(1))).as(s"nulls_$c")))
    // recursiveFileLookup: stats must cover every file under the path,
    // including plain (non key=value) nested batch dirs like d0/d1/… —
    // partition-discovery listing alone does not promise that. Stats
    // columns are data columns, so losing partition-column inference here
    // costs nothing.
    spark.read.option("recursiveFileLookup", "true").parquet(paths: _*)
      .select(input_file_name().as("file") +: statsCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build the manifest over every parquet file currently under
    * `tablePath` (recursive) and persist it as segment `b0` of
    * `manifestPath`. Rebuild-in-place semantics: existing segments are
    * wiped first — a rebuild defines a fresh snapshot, and a stale append
    * segment surviving it would resurrect files the rebuild chose to drop.
    */
  def buildManifest(spark: SparkSession, tablePath: String,
      statsCols: Seq[String], manifestPath: String): Unit = {
    val mp = new org.apache.hadoop.fs.Path(manifestPath)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(mp)) fs.delete(mp, true)
    fileStats(spark, Seq(tablePath), statsCols)
      .coalesce(1).write.mode("overwrite").parquet(s"$manifestPath/b0")
  }

  /** Append stats for NEWLY LANDED data files — exactly the given paths —
    * as one `b<batchId>` overwrite segment. O(new files): history is never
    * re-scanned. A caller-supplied `batchId` (e.g. a streaming batch id)
    * makes at-least-once replay idempotent; the default takes
    * max-existing+1.
    */
  def appendToManifest(spark: SparkSession, newPaths: Seq[String],
      statsCols: Seq[String], manifestPath: String,
      batchId: Long = -1L): Unit = {
    if (newPaths.isEmpty) return
    val mp = new org.apache.hadoop.fs.Path(manifestPath)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bid = if (batchId >= 0) batchId else {
      // a fresh store (no prior build) is legitimate in the manifest-IS-
      // the-table ingest pattern: first default-id append lands as b0
      val existing =
        if (!fs.exists(mp)) Array.empty[Long]
        else fs.listStatus(mp)
          .map(_.getPath.getName).flatMap(segmentId).filter(_ >= 0)
      if (existing.isEmpty) 0L else existing.max + 1
    }
    fileStats(spark, newPaths, statsCols)
      .coalesce(1).write.mode("overwrite").parquet(s"$manifestPath/b$bid")
  }

  /** Segment merge — identical contract to the sibling stores (snapshot
    * the list once, merged segment lands at `b-1` outside the replayable
    * batchId keyspace).
    */
  def compactManifest(spark: SparkSession, manifestPath: String): Unit =
    Dedup.compactSegmentDirs(spark, manifestPath)

  /** The current manifest: union of all segments, one row per data file. */
  def readManifest(spark: SparkSession, manifestPath: String): DataFrame =
    readManifestAsOf(spark, manifestPath, Long.MaxValue)

  /** The manifest AS OF batch `asOf` — time travel, the way Iceberg's
    * snapshot list gets it: because the manifest IS the table listing and
    * appends are immutable batchId-keyed segments, the table at batch N is
    * simply the union of segments with id ≤ N. No data file is rewritten
    * or tombstoned, so every historical snapshot reads at full scan speed
    * and prunes like the current one. Compaction is the snapshot-expiry
    * horizon: it collapses segments into `b-1` (always included here), so
    * snapshots older than the last compaction are no longer addressable —
    * run compaction at the cadence your audit window allows, exactly like
    * Iceberg's expire-snapshots.
    */
  /** Segment name → batch id; None for anything that is not a `b<number>`
    * segment (a stray `backup/` dir or interrupted-rename leftover must be
    * IGNORED, not crash every subsequent read with a NumberFormatException).
    * Shared definition: [[Segments.id]].
    */
  private def segmentId(name: String): Option[Long] = Segments.id(name)

  private def segmentPathsAsOf(spark: SparkSession, manifestPath: String,
      asOf: Long): Seq[String] = {
    val mp = new org.apache.hadoop.fs.Path(manifestPath)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(mp).map(_.getPath)
      .flatMap(p => segmentId(p.getName).map(id => (id, p)))
    // a compacted store has collapsed its history into b-1: serving a
    // finite asOf from it would silently return the MERGED listing (too
    // many files) instead of the snapshot — fail loudly, like reading an
    // expired Iceberg snapshot
    require(asOf == Long.MaxValue || !all.exists(_._1 == -1L),
      s"snapshot asOf=$asOf expired: compaction collapsed $manifestPath's " +
        "history into b-1; only the current listing is addressable")
    val segs = all.filter(_._1 <= asOf).map(_._2.toString)
    require(segs.nonEmpty,
      s"no manifest segment at or below batch $asOf under $manifestPath")
    segs.toSeq
  }

  def readManifestAsOf(spark: SparkSession, manifestPath: String,
      asOf: Long): DataFrame =
    spark.read.parquet(segmentPathsAsOf(spark, manifestPath, asOf): _*)

  /** File identity is `input_file_name()`'s PERCENT-ENCODED URI string,
    * and serving feeds paths back to `spark.read.parquet`, which applies
    * Hadoop GLOB expansion to every path. Two traps compose: (1) the raw
    * URI form points at a file that does not exist under its literal name
    * (`part-[0].parquet` comes back as `part-%5B0%5D.parquet`), and
    * (2) after decoding, glob metacharacters `* ? [ ] { } \` in the real
    * name would expand to the wrong file set (or none). So: decode the
    * URI (scheme + authority preserved, path percent-decoded), then
    * backslash-escape the metacharacters so Hadoop's glob matcher reads
    * the path literally.
    */
  private def globEscape(uriStr: String): String = {
    val u = new java.net.URI(uriStr)
    val sb = new StringBuilder
    if (u.getScheme != null) sb.append(u.getScheme).append(':')
    if (u.getAuthority != null) sb.append("//").append(u.getAuthority)
    sb.append(u.getPath) // getPath DECODES the percent escapes
    sb.toString.replaceAll("([*?\\[\\]{}\\\\])", "\\\\$1")
  }

  /** Shared prune tail: select the per-file stats columns, keep files
    * passing `keep`, read exactly those, apply the residual row filter.
    * An empty prune window still returns a schema-stable empty frame (read
    * one manifest'd file, keep no rows); a manifest that names NO files at
    * all is unservable — there is no schema to stabilize on — and fails
    * loudly instead of with a bare head() NoSuchElementException.
    */
  private def prunedBy(spark: SparkSession, manifestPath: String, asOf: Long,
      statCols: Seq[String], keep: DataFrame => DataFrame,
      residual: Column): (DataFrame, Long, Long) = {
    val m = readManifestAsOf(spark, manifestPath, asOf)
      .select(col("file") +: statCols.map(col): _*)
      .localCheckpoint() // tiny (one row/file); probed twice below
    val total = m.count()
    require(total > 0,
      s"manifest at $manifestPath names no files — nothing to serve")
    val surviving = keep(m)
      .select(col("file")).collect().map(r => globEscape(r.getString(0)))
      .toSeq
    val df =
      if (surviving.isEmpty)
        spark.read
          .parquet(globEscape(m.select(col("file")).head().getString(0)))
          .filter(lit(false))
      else spark.read.parquet(surviving: _*)
    (df.filter(residual), surviving.size.toLong, total)
  }

  /** Serve `statsCol BETWEEN lo AND hi` from the manifest: prune the file
    * list to files whose [min, max] intersects [lo, hi], read only those,
    * and apply the residual row filter (zone maps prune files, not rows).
    * Returns the result plus (files read, files total) so callers — and
    * the driver contract — can grade the pruning, not just the answer.
    */
  def prunedRead(spark: SparkSession, manifestPath: String, statsCol: String,
      lo: Any, hi: Any, asOf: Long = Long.MaxValue): (DataFrame, Long, Long) =
    prunedBy(spark, manifestPath, asOf,
      Seq(s"min_$statsCol", s"max_$statsCol"),
      _.filter(col(s"min_$statsCol") <= lit(hi) &&
        col(s"max_$statsCol") >= lit(lo)),
      col(statsCol).between(lit(lo), lit(hi)))

  /** Two-dimensional box prune: files whose [min, max] interval intersects
    * the query range in BOTH stats columns. This is where the manifest
    * composes with [[Layout]]'s z-ordering: a Morton-clustered layout makes
    * every file's box tight in both dimensions at once, so a 2-D selective
    * box opens a handful of files where a linear sort only prunes its
    * leading column — the manifest turns that geometric property into
    * skipped file OPENS, not just skipped row groups.
    */
  def prunedReadBox(spark: SparkSession, manifestPath: String,
      xCol: String, xLo: Any, xHi: Any, yCol: String, yLo: Any, yHi: Any,
      asOf: Long = Long.MaxValue): (DataFrame, Long, Long) =
    prunedBy(spark, manifestPath, asOf,
      Seq(s"min_$xCol", s"max_$xCol", s"min_$yCol", s"max_$yCol"),
      _.filter(col(s"min_$xCol") <= lit(xHi) &&
        col(s"max_$xCol") >= lit(xLo) &&
        col(s"min_$yCol") <= lit(yHi) && col(s"max_$yCol") >= lit(yLo)),
      col(xCol).between(lit(xLo), lit(xHi)) &&
        col(yCol).between(lit(yLo), lit(yHi)))

  /** Manifest-ONLY aggregates: `count(*)` plus `statsCol`'s null and
    * non-null counts, answered entirely from the stats table — zero data
    * files are opened (the plan's only scan is the manifest itself). This
    * is the Iceberg metadata-table count path at file-set scale, and the
    * file-set generalization of the reference's own footer-metadata count
    * (`cmd/duckdb-record-processor/handler.go:65-72` answers COUNT(*)
    * from one file's parquet footer without decoding rows). At 100 TB a
    * `count(*)` or `count(c IS NOT NULL)` over 200k files costs one scan
    * of a 200k-row manifest instead of 200k file opens.
    */
  def countOnly(spark: SparkSession, manifestPath: String, statsCol: String,
      asOf: Long = Long.MaxValue): DataFrame = {
    // mergeSchema + a loud completeness check: a long-lived store whose
    // older segments were built before the null-count columns existed
    // must not pick one footer's schema at random (AnalysisException or
    // silent undercount depending on which) — read the union schema and
    // refuse if ANY file-stats row lacks the counts this aggregate sums.
    val segs = segmentPathsAsOf(spark, manifestPath, asOf)
    val m = spark.read.option("mergeSchema", "true").parquet(segs: _*)
    val nc = s"nulls_$statsCol"
    require(m.columns.contains(nc),
      s"manifest at $manifestPath carries no null-count stats for " +
        s"'$statsCol' — rebuild it with statsCols including the column")
    val incomplete =
      m.filter(col(nc).isNull || col("nrows").isNull).count()
    require(incomplete == 0,
      s"$incomplete file-stats rows in $manifestPath predate the " +
        s"null-count stats for '$statsCol' — rebuild the manifest; " +
        "summing through them would silently undercount")
    m.agg(
      sum(col("nrows")).as("n_rows"),
      sum(col(nc)).as("n_nulls"),
      (sum(col("nrows")) - sum(col(nc))).as("n_not_null"))
  }

  /** Full-listing read of every file the manifest names (as of `asOf`) —
    * the unpruned baseline [[prunedRead]] is graded against, and the
    * time-travel read when `asOf` pins a historical snapshot.
    */
  def fullRead(spark: SparkSession, manifestPath: String,
      asOf: Long = Long.MaxValue): DataFrame = {
    val files = readManifestAsOf(spark, manifestPath, asOf)
      .select(col("file")).collect().map(r => globEscape(r.getString(0)))
      .toSeq
    require(files.nonEmpty,
      s"manifest at $manifestPath names no files — nothing to serve")
    spark.read.parquet(files: _*)
  }
}
