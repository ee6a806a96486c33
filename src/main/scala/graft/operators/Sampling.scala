package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * `rand()`-based sampling is wrong for a 100 TB curation pipeline: it is
  * partition-order dependent (a re-run or AQE re-plan draws a different
  * sample), and per-stratum rates would need a shuffle or stateful RNG.
  * Hash-threshold sampling fixes both: a row is kept iff a hex prefix of
  * `md5(id || salt)` falls under the rate's threshold. That is
  *
  *  - deterministic and partition-invariant (pure function of the row),
  *  - scan-side (codegen'd column exprs, no shuffle, no RNG state),
  *  - consistent across engines (every SQL engine has md5 — which is what
  *    lets DuckDB re-derive the exact sample as the oracle),
  *  - coordinated: the same (id, salt) always lands on the same side of the
  *    threshold, so raising a stratum's rate strictly grows its sample —
  *    stable train/holdout splits across pipeline versions.
  *
  * Granularity is 16 bits (rate resolves to 1/65536); md5's avalanche makes
  * the prefix uniform regardless of id distribution.
  */
object Sampling {

  /** 4-hex-digit threshold for `rate`; rows keep iff prefix < threshold.
    * Clamped to 0xffff: a rate within half a granule of 1.0 would otherwise
    * round to 65536 → the FIVE-digit string "10000", which compares
    * lexicographically below almost every 4-hex prefix and would collapse a
    * ~100% sample to ~6%.
    */
  private[operators] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.min(math.round(rate * 65536.0).toInt, 0xffff)}%04x"
  }

  /** Keep-condition for one rate. `rate >= 1.0` keeps everything (the
    * 5-digit threshold "10000" would compare lexicographically below "ffff"
    * prefixes otherwise).
    */
  def keepCond(id: Column, rate: Double, salt: String = ""): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else substring(md5(concat(id.cast("string"), lit(salt))), 1, 4) <
      lit(thresholdHex(rate))

  /** Uniform deterministic sample at `rate`. */
  def sample(df: DataFrame, idCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.filter(keepCond(col(idCol), rate, salt))

  /** Per-stratum rates (training-mix reweighting): `rates` maps stratum
    * value → keep rate; absent strata use `defaultRate`. One scan, no
    * shuffle — the rate lookup is a constant-folded CASE chain.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = ""): DataFrame = {
    val cond = rates.foldLeft(
      when(lit(false), lit(false))) { case (acc, (stratum, rate)) =>
      acc.when(col(strataCol) === lit(stratum),
        keepCond(col(idCol), rate, salt))
    }.otherwise(keepCond(col(idCol), defaultRate, salt))
    df.filter(cond)
  }
}
