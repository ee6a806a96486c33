package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** The repo-wide fixed-point rounding grains — ONE definition. The
  * 6-decimal grain is a cross-engine CONTRACT constant: the DuckDB oracle
  * compares stringified values, so every float aggregate must round with
  * the identical formula on both sides (`floor(x·1e6 + 0.5) / 1e6`), and
  * a change of grain or rounding rule must land everywhere at once.
  */
object Fixed {
  def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
  def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
}
