package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Product-quantization plan-side expressions. The codebook (trained
  * driver-side on a bounded sample) rides into each expression as a
  * referenced flat array — the same object-reference mechanism as
  * [[BloomMightContain]] — so encoding and table building are single fused
  * loops inside whole-stage codegen instead of m·ksub interpreted
  * struct/sort/HOF expressions per row.
  */
abstract class PqCodebookExpression extends BinaryExpression {
  def cb: Array[Double]
  def m: Int
  def ksub: Int
  def sub: Int

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double> vec, double norm), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def nullable: Boolean = left.nullable || right.nullable

  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.NativeKernels.$kernel($v, $n, $cbRef, $m, $ksub, $sub)")
  }
}

/** `array<int>` of m codes: nearest codebook entry per subspace of v/n. */
case class PqEncode(left: Expression, right: Expression, cb: Array[Double],
    m: Int, ksub: Int, sub: Int) extends PqCodebookExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def kernel: String = "pqEncode"
  override protected def nullSafeEval(v: Any, n: Any): Any =
    NativeKernels.pqEncode(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Double], cb, m, ksub, sub)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqEncode = copy(left = l, right = r)
}

/** `array<double>` of m·ksub subspace dot products of v/n vs the codebook. */
case class PqLut(left: Expression, right: Expression, cb: Array[Double],
    m: Int, ksub: Int, sub: Int) extends PqCodebookExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def kernel: String = "pqLut"
  override protected def nullSafeEval(v: Any, n: Any): Any =
    NativeKernels.pqLut(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Double], cb, m, ksub, sub)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqLut = copy(left = l, right = r)
}

object PqExpressions {

  private def bind(spark: SparkSession, cb: Array[Double], tag: String,
      vec: Column, norm: Column,
      mk: (Array[Double], Expression, Expression) => Expression): Column = {
    // codebook objects cannot ride through SQL text — bind via a session
    // temp function whose builder references them weakly; names reuse per
    // live codebook (see BloomExpressions / TempFnNames). `mk` builds from
    // the codebook it is HANDED, never a captured one — capturing cb in the
    // closure would pin it against the weak design.
    val name = TempFnNames.register[Array[Double]](spark, s"graft_pq_${tag}",
      cb, (o, exprs) => mk(o, exprs.head, exprs(1)))
    call_function(name, vec, norm)
  }

  def pqEncode(spark: SparkSession, vec: Column, norm: Column,
      cb: Array[Double], m: Int, ksub: Int, sub: Int): Column =
    bind(spark, cb, "encode", vec, norm,
      (o, v, n) => PqEncode(v, n, o, m, ksub, sub))

  def pqLut(spark: SparkSession, vec: Column, norm: Column,
      cb: Array[Double], m: Int, ksub: Int, sub: Int): Column =
    bind(spark, cb, "lut", vec, norm,
      (o, v, n) => PqLut(v, n, o, m, ksub, sub))
}
