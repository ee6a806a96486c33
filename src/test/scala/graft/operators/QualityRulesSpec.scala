package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** The Gopher-style `quality_rules` battery: repetition must actually
  * detect repeated text, and the corpus must exercise both keep branches.
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(df: org.apache.spark.sql.DataFrame) = {
    // run the registered query body against a temp dir holding the frame
    val dir = tmpDir("qr")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("quality_rules")(spark, dir)
  }

  test("a doc made of one repeated phrase scores near-total repetition") {
    val docs = Seq(
      (1L, Seq.fill(40)("spam spam wonderful spam").mkString(" ")),
      (2L, (0 until 80).map(i =>
        s"word${('a' + i % 26).toChar}${('a' + i / 26).toChar}")
        .mkString(" "))).toDF("doc_id", "text")
    val out = rules(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(4))).toMap
    assert(out(1L)._1 > 0.9, s"repeated doc rep_ratio=${out(1L)._1}")
    assert(!out(1L)._2, "repeated doc must be dropped")
    assert(out(2L)._1 == 0.0 && out(2L)._2, "unique doc must be kept")
  }

  test("non-alphabetic and degenerate-token docs fail their rules") {
    val docs = Seq(
      (1L, (1 to 50).map(i => s"$i%$i").mkString(" ")), // symbols, no alpha
      (2L, Seq.fill(50)("a b c d e f g h i j").mkString(" "))) // 1-char tokens
      .toDF("doc_id", "text")
    val out = rules(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L)._1 == 0.0 && !out(1L)._3, "symbol doc must fail alpha rule")
    assert(out(2L)._2 < 2.0 && !out(2L)._3, "1-char tokens fail length rule")
  }

  test("the shipped corpus exercises both keep branches") {
    val out = SparkEntry.queries("quality_rules")(spark, sfDir)
    val kept = out.filter(col("keep")).count()
    val dropped = out.filter(!col("keep")).count()
    assert(kept > 0 && dropped > 0, s"kept=$kept dropped=$dropped")
  }
}
