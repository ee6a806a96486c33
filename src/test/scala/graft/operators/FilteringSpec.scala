package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FilteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "a quick brown foxtrot dance"),   // substring, not token-aligned
    (3L, "QUICK   Brown fox here"),        // case + whitespace noise
    (4L, "brown fox quick"),               // phrase words present, order off
    (5L, "nothing to see"),
    (6L, "edge quick brown"),              // phrase at end of text
    (7L, "quick brown starts the text")    // phrase at start of text
  ).toDF("doc_id", "text")

  test("phrase match is word-boundary-exact, case/whitespace-insensitive") {
    val out = Filtering.blocklistAnnotate(docs, "text", Seq("quick brown"))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // foxtrot's "quick brown fox..." prefix IS token-aligned on 2 only if
    // the bigram appears — it does ("a quick brown foxtrot"): dropped.
    assert(!out(1) && !out(2) && !out(3) && !out(6) && !out(7))
    assert(out(4) && out(5))
  }

  test("substring inside a longer token never matches") {
    val d = Seq((1L, "the session starts"), (2L, "use ssh here"))
      .toDF("doc_id", "text")
    val out = Filtering.blocklistAnnotate(d, "text", Seq("ssh"))
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1), "'ssh' inside 'session' must not match")
    assert(!out(2))
  }

  test("hits preserve blocklist order and count every fired phrase") {
    val d = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val hits = Filtering
      .blocklistAnnotate(d, "text",
        Seq("gamma delta", "alpha beta", "missing phrase"))
      .select("hits").head().getSeq[String](0)
    assert(hits == Seq("gamma delta", "alpha beta"))
  }

  test("blocklistFilter is a scan-side filter: zero exchanges, no UDF") {
    val plan = Filtering
      .blocklistFilter(docs, "text", Seq("quick brown", "ssh"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }

  test("blocklistHitsLarge equals the scan-side form on the same list") {
    val phrases = Seq("quick brown", "ssh", "nothing to see",
      "unicorn rainbow")
    val viaScan = docs.select(col("doc_id"),
        explode(Filtering.phraseHits(col("text"), phrases)).as("phrase"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val viaLarge = Filtering.blocklistHitsLarge(docs, "doc_id", "text",
        phrases.toDF("phrase"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(viaLarge.sameElements(viaScan))
    assert(viaScan.nonEmpty)
  }

  test("blocklistHitsLarge drops phrases with corpus-absent tokens early") {
    val phrases = Seq("unicorn rainbow", "quick unicorn").toDF("phrase")
    // neither phrase has all tokens in the corpus → zero candidates, and
    // the verify stage must see no rows at all
    assert(Filtering.blocklistHitsLarge(docs, "doc_id", "text", phrases)
      .isEmpty)
  }

  test("filter ≡ annotate.filter(keep) and empty blocklist is rejected") {
    val viaFilter = Filtering
      .blocklistFilter(docs, "text", Seq("quick brown"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val viaAnnotate = Filtering
      .blocklistAnnotate(docs, "text", Seq("quick brown"))
      .filter(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    assert(viaFilter.sameElements(viaAnnotate))
    intercept[IllegalArgumentException] {
      Filtering.blocklistFilter(docs, "text", Seq.empty)
    }
  }
}
