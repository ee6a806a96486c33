package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the missing
  * piece between "count tokens with a BPE-ish regex" and an actual learned
  * subword vocabulary (Sennrich et al., ACL 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * The Spark-first shape: the corpus is touched exactly ONCE, to build the
  * word-frequency table (word, cnt) — the classic BPE reduction, bounded by
  * VOCABULARY size, not corpus size (at 100 TB the distinct-word table of
  * even web-scale text is millions of rows — trivially distributed, never
  * driver-resident). Each merge step is then:
  *
  *   1. one weighted aggregate over the word table: adjacent symbol pairs,
  *      `sum(cnt)` per pair (map-side combinable; pair cardinality is
  *      bounded by distinct adjacent symbol pairs, ≪ vocab · avg word len);
  *   2. an argmax collect of ONE row (count desc, then lexicographic —
  *      exact integer counts make the winner partition-invariant, so
  *      training is deterministic under any data layout);
  *   3. a greedy left-to-right in-place merge of that pair in every word's
  *      symbol array (`aggregate` HOF — per-word arrays are tiny, and the
  *      word table is vocab-bounded, so interpreted evaluation is off the
  *      corpus-scale hot path by construction).
  *
  * Each iteration localCheckpoints the word table and releases its
  * predecessor (the `clustersStar` lineage pattern — 20+ chained
  * transformations would otherwise stack projections into one
  * ever-deepening plan).
  *
  * Merged tokens never cross word boundaries (the `</w>` terminator is a
  * symbol like any other, so end-of-word units like `st</w>` are learnable
  * — exactly Sennrich's formulation).
  */
object Bpe {

  /** One learned merge: at `step`, (left, right) → left+right, which
    * covered `count` weighted occurrences when chosen.
    */
  final case class Merge(step: Int, left: String, right: String, count: Long)

  /** (word, cnt, syms) — words lowercased and whitespace-split, symbols =
    * characters plus the `</w>` terminator.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        concat(
          transform(sequence(lit(1), length(col("w"))),
            i => col("w").substr(i, lit(1))),
          array(lit("</w>"))))

  /** Adjacent (left, right) symbol pairs of one row's array, empty when
    * fewer than two symbols (sequence() would otherwise run DESCENDING for
    * stop < start and fabricate pairs).
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        j => struct(element_at(syms, j).as("l"),
          element_at(syms, j + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** Greedy left-to-right merge of adjacent (l, r) into `lr` within one
    * symbol array. A fresh merge result never re-matches as `l` in the same
    * pass unless it literally equals `l` — standard BPE single-pass
    * semantics.
    */
  private def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) &&
            x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Train `nMerges` merges over `df(textCol)`. Returns the ordered merge
    * list and the final word table (word, cnt, syms) under the learned
    * vocabulary. Stops early when no adjacent pair occurs at least twice.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int)
      : (Seq[Merge], DataFrame) =
    trainOnWords(wordTable(df, textCol), nMerges)

  /** Train on a prebuilt [[wordTable]] — callers that already materialized
    * the table (e.g. for corpus statistics) avoid a second corpus scan,
    * keeping the "corpus touched exactly once" promise.
    */
  def trainOnWords(table: DataFrame, nMerges: Int)
      : (Seq[Merge], DataFrame) = {
    val merges = Seq.newBuilder[Merge]
    var words = table.localCheckpoint()
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val top = words
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        step += 1
        merges += Merge(step, l, r, n)
        val next = words
          .withColumn("syms", mergePair(col("syms"), l, r))
          .localCheckpoint()
        words.unpersist(blocking = false)
        words = next
      }
    }
    (merges.result(), words)
  }

  /** Max weighted adjacent-pair count of a word table — [[trainOnWords]]'s
    * stop condition made externally checkable: training legitimately stops
    * early iff this is < 2 on the final table.
    */
  def maxPairCount(words: DataFrame): Long = {
    val r = words
      .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("n"))
      .agg(max(col("n"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Apply an already-learned merge list to a word table — the ENCODE side
    * (subword segmentation of new text under a fixed vocabulary).
    *
    * Single-pass rank-table form: the merge list becomes ONE broadcast
    * (left, right) → rank map, and each word is segmented by repeatedly
    * merging its lowest-rank adjacent pair (all occurrences, greedy
    * left-to-right — the exact per-step semantics of [[mergePair]]) until
    * no pair remains in the table. That is provably the same segmentation
    * as replaying the merges in training order: merging pair P only
    * creates adjacencies involving the new token P.l+P.r, whose own pairs
    * were necessarily learned LATER (a pair can only be learned once both
    * its tokens exist), and never re-creates an adjacency of older tokens
    * (tokens only grow) — so lowest-rank-first is training order,
    * restricted to the pairs this word actually contains.
    *
    * Why it replaces the fold-per-merge form: a real vocabulary is tens of
    * thousands of merges, and one `aggregate` HOF projection per merge is
    * O(nMerges) chained projections — Catalyst recursion and per-merge
    * full-table passes break long before the data does. This is one
    * projection and one job at ANY vocabulary size; per-word cost is
    * O(merges-applied × word length), on the vocab-bounded word table,
    * never the corpus. (A UDF is acceptable exactly here for the same
    * reason interpreted `aggregate` was: the word table is off the
    * corpus-scale hot path by construction.)
    */
  def encode(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val ranks: Map[(String, String), Int] = merges.iterator.zipWithIndex
      .map { case (m, i) => ((m.left, m.right), i) }.toMap
    val bc = words.sparkSession.sparkContext.broadcast(ranks)
    val enc = udf { syms: Seq[String] =>
      val rank = bc.value
      var cur: Array[String] = syms.toArray
      var running = cur.length >= 2
      while (running) {
        var bestRank = Int.MaxValue
        var bestL: String = null
        var bestR: String = null
        var i = 0
        while (i < cur.length - 1) {
          val r = rank.getOrElse((cur(i), cur(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestL = cur(i); bestR = cur(i + 1) }
          i += 1
        }
        if (bestRank == Int.MaxValue) running = false
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          cur.foreach { x =>
            if (out.nonEmpty && out.last == bestL && x == bestR)
              out(out.length - 1) = bestL + bestR
            else out += x
          }
          cur = out.toArray
          running = cur.length >= 2
        }
      }
      cur.toSeq
    }
    words.withColumn("syms", enc(col("syms")))
  }
}
