package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Scan-side membership probe against a pre-built Bloom filter — the sketch
  * form of a broadcast-semi-join prefilter.
  *
  * The filter rides along as a referenced object: the driver builds it once
  * (`df.stat.bloomFilter`, a distributed treeAggregate), the expression
  * serializes it to each executor with the plan, and codegen probes it with
  * one `mightContainLong` call per row — no UDF dispatch, no shuffle, and
  * the whole-stage span stays intact. At ~10 bits/item the filter for 100 M
  * reference keys is ~120 MB where the exact broadcast set would be GBs.
  *
  * One-sided error: `mightContainLong` has no false negatives, so a bloom
  * prefilter never drops a true match; false positives (rate `fpp`) either
  * pass to an exact verify stage or are accepted as over-flagging.
  */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint, got ${other.catalogString}")
  }
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloom", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomExpressions {

  // Monotone per-JVM ids: identityHashCode is NOT collision-free across two
  // live objects, and a collision would silently rebind an unanalyzed
  // Column to the wrong filter.
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Column form: TRUE when `c` (bigint) might be in `bf`; never a false
    * negative.
    *
    * The filter object cannot ride through SQL text, and every public
    * Column-from-Expression bridge is `private[sql]`, so the expression is
    * bound by registering a session temp function whose builder closes over
    * `bf` — unique name per binding, so concurrent filters never collide.
    * The few bytes of registry metadata per binding are left in place (the
    * Column may be analyzed long after this returns).
    */
  def bloomMightContain(spark: SparkSession, c: Column,
      bf: BloomFilter): Column = {
    val name = s"graft_bloom_probe_${nextId.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      exprs => BloomMightContain(exprs.head, bf), "built-in")
    call_function(name, c)
  }
}
