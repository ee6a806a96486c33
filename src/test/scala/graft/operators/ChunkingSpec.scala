package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docOf(n: Int) = Seq((1L, (0 until n).map("w" + _).mkString(" ")))
    .toDF("doc_id", "text")

  private def chunks(n: Int, w: Int, s: Int) =
    Chunking.chunk(docOf(n), "doc_id", "text", w, s)
      .orderBy(col("chunk_id")).collect()

  test("short doc yields exactly one whole-doc chunk") {
    val c = chunks(10, 64, 48)
    assert(c.length == 1 && c(0).getLong(2) == 10L)
  }

  test("chunk count and sizes follow the sliding-window formula") {
    // n=150, w=64, s=48: starts 0,48,96 -> sizes 64,64,54
    val c = chunks(150, 64, 48)
    assert(c.map(_.getLong(2)).toSeq == Seq(64L, 64L, 54L))
    // exact multiple: n=112 -> starts 0,48 -> sizes 64,64
    assert(chunks(112, 64, 48).map(_.getLong(2)).toSeq == Seq(64L, 64L))
    // one past a window: n=65 -> last chunk holds the tail with overlap
    assert(chunks(65, 64, 48).map(_.getLong(2)).toSeq == Seq(64L, 17L))
  }

  test("every token is covered and consecutive chunks overlap by w-s") {
    val n = 200; val w = 64; val s = 48
    val rows = Chunking.chunk(docOf(n), "doc_id", "text", w, s)
      .orderBy(col("chunk_id")).collect()
    val lastStart = (rows.length - 1) * s
    assert(lastStart + rows.last.getLong(2) == n) // tail reaches the end
    rows.sliding(2).foreach { case Array(a, b) =>
      val overlap = a.getLong(1) * s + a.getLong(2) - b.getLong(1) * s
      assert(overlap == (w - s).toLong || a.getLong(2) < w)
    }
  }

  test("chunking is deterministic and partition-invariant") {
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val a = graft.queries.Contracts.checksum(
      Chunking.chunk(docs, "doc_id", "text", 64, 48))
    val b = graft.queries.Contracts.checksum(
      Chunking.chunk(docs.repartition(7), "doc_id", "text", 64, 48))
    assert(a == b)
  }
}
