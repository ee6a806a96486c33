package graft.sources

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {

  test("compactParquet merges small files and preserves rows exactly") {
    val dir = tmpDir("compact")
    // 16 write tasks → 16 small files
    DataGenerator.generate(spark, 400L, seed = 21L, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.count()
    val beforeIds = before.select("id").collect().map(_.getString(0)).sorted

    val (nBefore, nAfter) =
      Maintenance.compactParquet(spark, dir, targetFileBytes = 512L * 1024 * 1024)
    assert(nBefore === 16)
    assert(nAfter === 1)

    val after = spark.read.parquet(dir)
    assert(after.count() === beforeRows)
    assert(after.select("id").collect().map(_.getString(0)).sorted
      === beforeIds)
  }
}
