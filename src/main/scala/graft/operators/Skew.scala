package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins. AQE's skew-join splitting
  * handles most cases at runtime; the explicit salt is for the pathological
  * hot key known in advance (one user/session/document holding percent-scale
  * row share), where pre-spreading beats re-planning.
  */
object Skew {

  /** Salted equi-join: the fact side spreads each key over `salts` reducers
    * (salt derived deterministically from `saltSource`, e.g. a row id); the
    * dim side is replicated `salts` times so every (key, salt) pair finds
    * its match. Join output is identical to the unsalted join; shuffle
    * pressure per hot key drops by `salts`×. Dim replication costs
    * |dim|·salts rows — use for dim tables, not fact-fact joins.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(saltSource, lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
