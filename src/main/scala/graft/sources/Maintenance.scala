package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Table-maintenance operators a long-lived 100 TB pipeline needs around its
  * datasets (the reference has none — its Lambda writes one file and exits).
  */
object Maintenance {

  /** Compact a parquet directory's small files into ~`targetFileBytes`
    * outputs: read → coalesce to ceil(totalBytes/target) → rewrite →
    * atomic-ish swap (write to a sibling temp dir, then replace). Streaming
    * micro-batch sinks and per-partition writers both produce file counts
    * proportional to tasks×triggers; unchecked, scans degrade to
    * open/close overhead per tiny file.
    *
    * `coalesce` (not `repartition`): merging files needs no shuffle, only
    * fewer write tasks. Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(dir: Path): Array[Path] =
      fs.listStatus(dir).map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet"))
    val before = parquetFiles(p)
    val totalBytes = before.map(fs.getFileStatus(_).getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(p.getParent, s".${p.getName}.compact-tmp")
    fs.delete(tmp, true)
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: remove originals, move compacted files in
    before.foreach(fs.delete(_, false))
    parquetFiles(tmp).foreach(f => fs.rename(f, new Path(p, f.getName)))
    fs.delete(tmp, true)
    (before.length, parquetFiles(p).length)
  }
}
