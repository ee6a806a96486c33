package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-boolean contract frames for operators whose raw output has no SQL
  * oracle (LSH/ANN families, native hash fingerprints, synthetic sources,
  * multimodal plumbing).
  *
  * Technique (the `approx_ok` pattern): the query computes the operator's
  * REAL output distributed, reduces it to a one-row frame of boolean
  * invariants (plus a row-count column the oracle derives independently from
  * the same parquet tables), and the oracle emits literal TRUE for each
  * boolean. The driver's row/schema/hash compare then turns each invariant
  * into a hard pass/fail signal instead of a rows-only check. Every scalar
  * pulled to the driver here is a single aggregate value — the heavy lifting
  * (pair joins, top-k, checksums) stays distributed.
  */
object Contracts {

  /** One-row frame from named driver-side scalars (Boolean / Long). */
  def row(s: SparkSession, cols: (String, Any)*): DataFrame =
    s.range(1).select(cols.map { case (n, v) =>
      (v match {
        case b: Boolean => lit(b)
        case l: Long    => lit(l)
        case i: Int     => lit(i.toLong)
        case other      => lit(other)
      }).as(n)
    }: _*)

  /** TRUE iff `cond` holds on every row (FALSE on an empty frame — an
    * operator that produced nothing has not demonstrated its invariant).
    * A row where `cond` evaluates to NULL counts as FAILING: `bool_and` is
    * a SQL aggregate that skips NULL inputs, so without the inner coalesce a
    * NULL field would silently exempt its row from the invariant.
    */
  def forAll(df: DataFrame, cond: Column): Boolean =
    df.agg(coalesce(bool_and(coalesce(cond, lit(false))), lit(false)))
      .head().getBoolean(0)

  /** TRUE iff the two frames hold the same key set (both directions empty
    * after anti-joins). `cols` must exist in both.
    */
  def sameKeys(a: DataFrame, b: DataFrame, cols: Seq[String]): Boolean = {
    val pa = a.select(cols.map(col): _*)
    val pb = b.select(cols.map(col): _*)
    pa.join(pb, cols, "left_anti").isEmpty &&
      pb.join(pa, cols, "left_anti").isEmpty
  }

  /** Order-insensitive 64-bit content checksum of the whole frame, mixing
    * (count, sum, xor) of per-row hashes over every column. Struct/array/
    * timestamp columns hash natively; two frames with equal checksums are
    * (modulo hash collision) multiset-identical — the distributed analog of
    * "dump both and diff". XOR alone is NOT enough: any even-multiplicity
    * row difference cancels (h ^ h = 0), so a bug duplicating one row twice
    * would pass; the count and sum components break that cancellation. The
    * sum runs in decimal because ANSI mode makes long-sum overflow throw.
    */
  def checksum(df: DataFrame): Long = {
    val r = df.select(xxhash64(df.columns.map(col).toSeq: _*).as("h"))
      .agg(count(lit(1)),
        coalesce(sum(col("h").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)),
        coalesce(expr("bit_xor(h)"), lit(0L)))
      .head()
    val n = r.getLong(0)
    val s = r.getDecimal(1).toBigInteger.longValue()
    val x = r.getLong(2)
    java.lang.Long.rotateLeft(n * 0x9E3779B97F4A7C15L, 17) ^
      (s * 0xC2B2AE3D27D4EB4FL) ^ x
  }

  /** Per-query rank column is exactly 1..count(qid) — the well-formedness of
    * any top-k output (no gaps, no duplicates, starts at 1).
    */
  def ranksWellFormed(topk: DataFrame, qidCol: String, rankCol: String,
      k: Int): Boolean =
    forAll(
      topk.groupBy(col(qidCol)).agg(
        count(lit(1)).as("n"), min(col(rankCol)).as("lo"),
        max(col(rankCol)).as("hi"), count_distinct(col(rankCol)).as("nd")),
      col("lo") === 1 && col("hi") === col("n") &&
        col("nd") === col("n") && col("n") <= k)

  /** Recall of `approx` against `exact` on (qid, nid) pairs. */
  def recall(approx: DataFrame, exact: DataFrame,
      qid: String = "qid", nid: String = "nid"): Double = {
    val e = exact.select(col(qid), col(nid))
    val hit = e.join(approx.select(col(qid), col(nid)), Seq(qid, nid),
      "left_semi").count()
    val total = e.count()
    if (total == 0) 0.0 else hit.toDouble / total
  }
}
