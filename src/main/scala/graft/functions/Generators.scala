package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (UDTF surface, SURVEY §2.10): expand a token
  * array into one output row per n-gram window, `(pos, ngram)`.
  *
  * The built-in route to the same rows is posexplode over a shingle array
  * (`word_shingles` keeps only DISTINCT shingles, so it cannot feed this;
  * the HOF `transform(sequence(...))` formulation materializes a per-row
  * n-gram array before exploding and pays the interpreted-lambda tax noted
  * on `MinHashSig`). A native `Generator` streams the windows straight out
  * of the unsafe array — no intermediate array allocation per row.
  *
  * Generators run under `GenerateExec`, which consumes the iterator lazily
  * inside the surrounding WholeStageCodegen span; `CodegenFallback` here
  * only affects how the generator itself is evaluated, and generator
  * evaluation is once-per-input-row (not per-output-row), so the fallback
  * is off the per-element hot path.
  */
case class NgramGenerate(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngram_gen window must be >= 1, got $n")

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("ngram", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_gen requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      if (len < n) Iterator.empty
      else Iterator.tabulate(len - n + 1) { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        InternalRow(i, UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): NgramGenerate =
    copy(child = c)
}
